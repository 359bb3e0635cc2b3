"""Parquet table loaders for the driver's star schema.

All queries read through these helpers so scan behavior is uniform:
column pruning and predicate pushdown reach the parquet reader (verify
with ``df.explain("formatted")`` — look for ReadSchema / PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic SF.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in parquet → read as epoch-nanos long
        # (spark.sql.legacy.parquet.nanosAsLong) and rebuild a
        # microsecond-precision TIMESTAMP_NTZ (source data is µs-grained,
        # so the ns→µs truncation is lossless).
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df
