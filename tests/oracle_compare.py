"""Local mirror of the driver's Spark-vs-DuckDB correctness compare.

For each registered query: run the Spark plan and the oracle SQL on the
same parquet tables, sort columns by name, sort rows, and compare
values. Used by tests/test_oracle_parity.py so oracle drift is caught
locally before the driver's per-round gate.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from data_ingestion_pimcore_spark.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


def _norm(v: Any) -> Any:
    """Normalize a cell for comparison (timestamps → isoformat, floats kept)."""
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()
    s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
    if s_cols != d_cols:
        return False, f"column mismatch: spark={s_cols} duck={d_cols}"
    if len(sdf) != len(ddf):
        return False, f"row count mismatch: spark={len(sdf)} duck={len(ddf)}"
    s_rows = sorted(
        (tuple(str(_norm(v)) for v in row) for row in sdf[s_cols].itertuples(index=False)),
    )
    d_rows = sorted(
        (tuple(str(_norm(v)) for v in row) for row in ddf[d_cols].itertuples(index=False)),
    )
    if s_rows != d_rows:
        diffs = [
            f"  spark={a}\n   duck={b}"
            for a, b in zip(s_rows, d_rows)
            if a != b
        ][:3]
        return False, "value mismatch (first diffs):\n" + "\n".join(diffs)
    return True, f"ok ({len(sdf)} rows)"
