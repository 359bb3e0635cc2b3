"""Global plan lint: scale-discipline rules enforced over EVERY
registered query's physical plan, not just the hand-picked plan tests.

Rules (the brief's scale mandates, mechanized):

* No ``CartesianProduct`` anywhere — an unconstrained all-pairs join
  cannot survive a 100x scale-up. (Broadcast nested-loop joins with a
  tiny build side are allowed; they appear as BroadcastNestedLoopJoin.)
* No row-at-a-time Python UDFs (``BatchEvalPython``) — Python in the
  hot path must be Arrow-vectorized (``ArrowEvalPython`` /
  mapInPandas / mapInArrow / applyInPandas), which these plans show
  under different operator names.

Queries that legitimately cannot expose a pre-execution plan (their
fn() runs streaming drains or returns a localCheckpoint/createDataFrame
result whose plan is a scan of computed rows) are linted on whatever
plan the returned DataFrame carries — a materialized RDD scan trivially
passes, which is correct: their heavy lifting was itself built from
DataFrame ops asserted elsewhere.
"""

from __future__ import annotations

import pytest

from data_ingestion_pimcore_spark import registry

SF = "/root/testdata/sf0.001"

_QUERIES = registry.all_queries()


def _plan_of(spark, name: str) -> str:
    df = _QUERIES[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_plan_lint(spark, name):
    plan = _plan_of(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan (use Arrow-vectorized forms)"
    )
