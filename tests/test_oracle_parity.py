"""Every registered query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + columns +
order-insensitive values) so drift is caught locally first.

It also enforces the registry-wide scalar-output rule: the driver's
canonicalizer sorts result cells with pandas, which raises
``TypeError: unhashable type`` on list/dict cells — so no registered
query may emit an ArrayType/MapType/StructType column (round-4 erred
``agg_approx``/``scalar_array_funcs`` this way). Flatten arrays into
scalar columns or ``array_join``/``to_json`` them instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from data_ingestion_pimcore_spark import registry
from tests.oracle_compare import compare, duckdb_conn

SF = "/root/testdata/sf0.001"

_QUERIES = registry.all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


def _assert_scalar_schema(df, name):
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} break the driver's "
        "canonicalizer — flatten to scalars or array_join/to_json them"
    )


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, con, name):
    q = _QUERIES[name]
    df = q.fn(spark, SF)
    _assert_scalar_schema(df, name)
    ok, msg = compare(df, con, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = _QUERIES[name]
    df = q.fn(spark, SF)
    _assert_scalar_schema(df, name)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
