"""Edge-case tests for the analytics operators (oracle parity covers the
happy path at sf0.001; these pin the boundary semantics)."""

from __future__ import annotations

import datetime
import os
import tempfile

import pytest


def _write_events(spark, rows, tmp):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))


def test_funnel_strictly_after_semantics(spark):
    """A click BEFORE the first view must not count as stage 2; a
    purchase before the first qualifying click must not count as
    stage 3. Only strictly-increasing chains advance the funnel."""
    from data_ingestion_pimcore_spark.ops.timeseries import ts_funnel_pattern

    t0 = datetime.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: proper chain view(1) < click(2) < purchase(3)
        (1, ts(1), 1, "view", 0.0, "{}"),
        (2, ts(2), 1, "click", 0.0, "{}"),
        (3, ts(3), 1, "purchase", 0.0, "{}"),
        # user 2: click precedes first view -> stuck at stage 1
        (4, ts(1), 2, "click", 0.0, "{}"),
        (5, ts(2), 2, "view", 0.0, "{}"),
        # user 3: purchase precedes click -> stuck at stage 2
        (6, ts(1), 3, "view", 0.0, "{}"),
        (7, ts(2), 3, "purchase", 0.0, "{}"),
        (8, ts(3), 3, "click", 0.0, "{}"),
        # user 4: no view at all -> stage 0
        (9, ts(1), 4, "click", 0.0, "{}"),
        (10, ts(2), 4, "purchase", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, rows, tmp)
        got = {
            r.user_id: r.reached_stage
            for r in ts_funnel_pattern(spark, tmp).collect()
        }
    assert got == {1: 3, 2: 1, 3: 2, 4: 0}


def test_funnel_same_timestamp_not_after(spark):
    """Equal timestamps do not satisfy the strictly-after predicate."""
    from data_ingestion_pimcore_spark.ops.timeseries import ts_funnel_pattern

    t = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t, 1, "view", 0.0, "{}"),
        (2, t, 1, "click", 0.0, "{}"),  # same instant as the view
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, rows, tmp)
        (row,) = ts_funnel_pattern(spark, tmp).collect()
    assert row.reached_stage == 1 and row.click_ts is None


def test_median_twopass_constant_column(spark):
    """All-equal values collapse every bin to width zero; the guard must
    keep the binning well-defined and return the constant."""
    from data_ingestion_pimcore_spark.ops.analytics import agg_median_twopass
    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as tmp:
        spark.range(101).select(
            F.lit(42.5).alias("l_extendedprice")
        ).write.mode("overwrite").parquet(os.path.join(tmp, "lineitem.parquet"))
        (row,) = agg_median_twopass(spark, tmp).collect()
    assert row.median_price == 42.5 and row.n_rows == 101


def test_median_twopass_matches_sorted_kth(spark):
    """Random-ish (deterministic hash) values: the two-pass result must
    equal the ceil(n/2)-th smallest computed by brute sort."""
    from data_ingestion_pimcore_spark.ops.analytics import agg_median_twopass
    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as tmp:
        vals = (
            spark.range(5001)
            .select(
                (F.xxhash64("id") % 100000 / 7.0).alias("l_extendedprice")
            )
        )
        vals.write.mode("overwrite").parquet(os.path.join(tmp, "lineitem.parquet"))
        (row,) = agg_median_twopass(spark, tmp).collect()
        data = sorted(v.l_extendedprice for v in vals.collect())
        expect = data[(len(data) + 1) // 2 - 1]
    assert row.median_price == expect
