"""Central query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a
named query: a callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL
string. ``__spark_entry__`` exposes the registry to the driver; tests
and ``bench.py`` iterate it.

Cross-engine determinism rules used throughout the ops modules:

* Floating aggregation is order-dependent, so every SUM/AVG over doubles
  casts its (bit-identical, row-level-computed) double input to
  ``DECIMAL(18,6)`` first, sums exactly, and casts the final value back
  to double. Both Spark and DuckDB perform correctly-rounded
  double→decimal conversion and exact decimal addition, so results are
  bit-identical regardless of row order or partitioning.
* Every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver's comparator matches columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _load_ops()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in all_queries().values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}


_LOADED = False


def _load_ops() -> None:
    """Import every ops module so its @register calls run."""
    global _LOADED
    if _LOADED:
        return
    from .ops import (  # noqa: F401
        curation,
        dedup,
        extensibility,
        ingestion_queries,
        multimodal,
        relational,
        reshape,
        similarity,
        textops,
        timeseries,
        tpch_extra,
    )

    _LOADED = True
