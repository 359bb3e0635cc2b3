"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ingestion-manifest query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registered operator
inventory (SURVEY.md §2) with DuckDB oracle SQL for every
SQL-expressible operator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_pimcore_spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: end-to-end ingestion chunk manifest on sf0.001.

    source scan → canonical projection → chunk assignment → per-chunk
    integrity manifest (chunk_id, checksum, record count) — the
    reference's whole dataflow as one declarative plan.
    """
    q = registry.queries()
    fn = q.get("ingest_chunk_manifest") or q["q1_pricing_summary"]
    return fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return registry.oracles()


def query_gates() -> dict[str, str]:
    """Gate linkage for the queries absent from ``oracle_sql()`` —
    every approximate-by-construction query maps to the ORACLE-BEARING
    companion query that externally verifies it (e.g. ``agg_approx`` →
    ``agg_sketch_bounds``: the companion recomputes the sketch IN-PLAN
    next to its exact counterpart and hash-matches an all-TRUE bound
    oracle). A correctness artifact row reading ``err: no_oracle`` for
    a key of this dict is gated through its value's row in the same
    artifact; the same linkage is stamped into each such query's own
    output as a literal ``gated_by`` column. Validated at load time:
    every target exists and carries an oracle."""
    return registry.gates()
