"""Reshape operators: pivot, unpivot, and stratified sampling.

The reference has no relational surface (SURVEY.md §2.2); these cover
the wide↔long reshaping and corpus-subsampling operations a training-
data pipeline needs around the core query set.

Scale notes:

* ``pivot`` with an explicit value list compiles to one hash aggregate
  with N conditional aggregates — a single shuffle, no per-value scan.
  Never call pivot without the value list at scale: Spark must then
  run a distinct job over the pivot column first.
* ``unpivot`` is a generate/explode projection — map-side only, no
  shuffle.
* Stratified sampling uses a deterministic hash gate, not
  ``sample()``'s RNG: reproducible across runs, partitionings, and
  engines (oracle-checkable), and embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from ._det import dsum, sql_dsum

_STATUSES = ("F", "O", "P")


@register(
    "reshape_pivot",
    oracle=f"""
SELECT o_orderpriority,
       {", ".join(
           f"CAST(SUM(CAST(CASE WHEN o_orderstatus = '{s}' THEN o_totalprice END "
           f"AS DECIMAL(18,6))) AS DOUBLE) AS total_{s}" for s in _STATUSES)},
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
    doc="PIVOT (long → wide): total order value per priority, one "
    "column per order status. The explicit value list keeps it a "
    "single hash aggregate with 3 conditional sums — one shuffle, no "
    "pre-pass distinct job on the pivot column.",
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"),
        )
    )
    renamed = pivoted.select(
        "o_orderpriority",
        *[F.col(s).alias(f"total_{s}") for s in _STATUSES],
    )
    counts = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return renamed.join(counts, "o_orderpriority")


@register(
    "reshape_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, val
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
  FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
  FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
  FROM lineitem WHERE l_orderkey < 100
) t
""",
    doc="UNPIVOT (wide → long): three measure columns melt into "
    "(metric, val) rows. Compiles to an Expand projection — map-side "
    "only, zero shuffle; the key-range filter bounds oracle size.",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )


@register(
    "reshape_sample_stratified",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n_sampled, {sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem
WHERE md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR))
      LIKE '0%'
GROUP BY l_returnflag
""",
    doc="Stratified ~1/16 sample via a deterministic hash gate on the "
    "row key (md5 first hex digit = '0'): reproducible across runs, "
    "partitionings, and engines, unlike sample()'s per-partition RNG. "
    "Per-stratum counts verify the gate; this is the corpus-"
    "subsampling primitive (sample by hash of document id) used to cut "
    "training corpora without coordination — embarrassingly parallel, "
    "no shuffle before the verification aggregate.",
)
def reshape_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        ":", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return (
        li.where(F.md5(key).startswith("0"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"), dsum("l_quantity", "sum_qty"))
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "profile_column_stats",
    oracle="""
SELECT 'l_quantity' AS col, COUNT(*) AS n_rows,
       CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
       COUNT(DISTINCT l_extendedprice),
       CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*), COUNT(l_discount), COUNT(DISTINCT l_discount),
       CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_tax', COUNT(*), COUNT(l_tax), COUNT(DISTINCT l_tax),
       CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE)
FROM lineitem
""",
    doc="Column profiling (the ANALYZE/data-quality pass every warehouse "
    "runs before heavy queries): per-column row/non-null/distinct "
    "counts and min/max, computed in ONE scan — a single wide "
    "aggregate row (count_distinct expands to per-column partial "
    "aggregates map-side), then unpivoted driver-side from one row. "
    "The oracle re-scans per column; the engine plan reads the table "
    "once no matter how many columns are profiled, which is the "
    "difference that matters at 100 TB.",
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.count(c).alias(f"{c}__n_nonnull"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(c).cast("double").alias(f"{c}__min_val"),
            F.max(c).cast("double").alias(f"{c}__max_val"),
        ]
    row = li.agg(*aggs).collect()[0]
    out = [
        (
            c,
            row[f"{c}__n_rows"],
            row[f"{c}__n_nonnull"],
            row[f"{c}__n_distinct"],
            row[f"{c}__min_val"],
            row[f"{c}__max_val"],
        )
        for c in _PROFILE_COLS
    ]
    return spark.createDataFrame(
        out,
        "col string, n_rows long, n_nonnull long, n_distinct long, "
        "min_val double, max_val double",
    )
