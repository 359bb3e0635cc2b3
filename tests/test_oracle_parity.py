"""Every registered query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + columns +
order-insensitive values) so drift is caught locally first.
"""

from __future__ import annotations

import pytest

from data_ingestion_pimcore_spark import registry
from tests.oracle_compare import compare, duckdb_conn

SF = "/root/testdata/sf0.001"

_QUERIES = registry.all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, con, name):
    q = _QUERIES[name]
    ok, msg = compare(q.fn(spark, SF), con, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = _QUERIES[name]
    df = q.fn(spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
