"""User-extension (UDAF) and file-sink surfaces.

The reference has no user-extension surface (hard-coded pipeline,
SURVEY.md §2.2 "UDF/UDAF/UDTF: No") and exactly one sink — the ordered
HTTP callback (`app/services/json_reader.py:138-196`). This module
rounds out both categories:

* a grouped-aggregate **Pandas UDAF** (`pandas_udf` with a Series →
  scalar function): the Arrow-batched slow-path escape hatch for
  aggregation logic the built-in functions can't express. One Arrow
  transfer per (group × column), not per row.
* **file sinks**: partitioned parquet and JSONL round-trips. Writes go
  through the normal DataFrameWriter so at 100 TB each executor writes
  its own partition files in parallel; the queries read their own
  output back and aggregate it, proving the round-trip preserves the
  data (count + exact sums), with the read benefiting from partition
  pruning on the partition column.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from ._det import DEC, dsum, sql_dsum


@register(
    "udaf_median_quantity",
    oracle="""
SELECT l_returnflag,
       MEDIAN(l_quantity) AS median_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Grouped-aggregate Pandas UDAF: per-group median, a holistic "
    "aggregate Spark has no exact built-in for (percentile_approx is "
    "approximate). The pandas_udf receives each group's column as one "
    "Arrow batch — vectorized, no per-row Python. Median is order-"
    "insensitive, so the result is engine-deterministic with no decimal "
    "trick needed. At 100 TB a single group's values must fit one "
    "executor (holistic aggregates always do); low-cardinality group "
    "keys like returnflag keep that bounded only via two-level "
    "pre-aggregation — documented tradeoff of exact medians anywhere.",
)
def udaf_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    @F.pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        # Spark disallows mixing grouped-agg pandas UDFs with JVM
        # aggregates in one agg(); the count rides along as a UDAF.
        return len(v)

    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            median_udaf("l_quantity").alias("median_qty"),
            count_udaf("l_quantity").alias("n"),
        )
    )


@register(
    "sink_partitioned_parquet",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n, {sql_dsum('l_extendedprice', 'sum_price')}
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Partitioned-parquet sink round-trip: write lineitem partitioned "
    "by l_returnflag (each executor writes its partitions directly — no "
    "driver funnel, layout = one directory per key), read it back, and "
    "aggregate. Matching the oracle computed on the ORIGINAL table "
    "proves the sink is lossless. The read-back groupBy on the "
    "partition column needs no shuffle of file contents beyond the agg "
    "itself, and a filter on l_returnflag would prune whole directories "
    "(partition pruning).",
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.mkdtemp(prefix="sink_pq_"), "lineitem")
    try:
        (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
            .write.mode("overwrite")
            .partitionBy("l_returnflag")
            .parquet(out)
        )
        return (
            spark.read.parquet(out)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                dsum("l_extendedprice", "sum_price"),
            )
            .localCheckpoint()  # materialize before the temp dir is removed
        )
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)


@register(
    "sink_jsonl_roundtrip",
    oracle="""
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
""",
    doc="JSONL (newline-delimited JSON) sink round-trip over the "
    "documents table: the interchange format of LLM data pipelines. "
    "Write splits across executors (one .json part-file per task), "
    "read back with schema inference, aggregate per language. Counts "
    "and exact integer sums matching the original table prove the "
    "text round-trip is lossless for the full unicode document corpus.",
)
def sink_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.mkdtemp(prefix="sink_jsonl_"), "documents")
    try:
        load(spark, sf_dir, "documents").write.mode("overwrite").json(out)
        return (
            spark.read.json(out)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)


@register(
    "udf_scalar_arrow",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount < 0.03 THEN 'low'
            WHEN l_discount < 0.07 THEN 'mid'
            ELSE 'high' END AS discount_band,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
    doc="Scalar Arrow-batched pandas UDF (completes the extension "
    "surface next to the UDAF and UDTF): banding + net-price logic "
    "vectorized over numpy inside the worker, one Arrow batch per "
    "transfer — the 10-100x-over-row-at-a-time path the engine "
    "prescribes wherever Python scalar logic is unavoidable. The "
    "banding is deliberately SQL-expressible so the UDF machinery "
    "itself is what the oracle checks.",
)
def udf_scalar_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf("string")
    def band(discount: pd.Series) -> pd.Series:
        return pd.Series(
            np.select(
                [discount < 0.03, discount < 0.07],
                ["low", "mid"],
                default="high",
            ),
            index=discount.index,
        )

    @F.pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        # No rounding: raw IEEE-double product is bitwise-reproducible by
        # any SQL engine, while ROUND half-even (numpy) vs half-away
        # (DuckDB) would diverge on exact .xx5 ties.
        return price * (1.0 - discount)

    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        band("l_discount").alias("discount_band"),
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "join_bucketed_colocated",
    oracle=f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 'sum_price')}
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
""",
    doc="Bucketed co-located join: both sides are written with "
    "bucketBy(8, custkey) via the catalog writer, then joined on the "
    "bucket key. Because the two scans report identical hash "
    "partitioning, the sort-merge join needs NO Exchange on either "
    "side (asserted by tests/test_plans.py) — the shuffle was paid "
    "once at write time. This is THE pattern for a 100 TB fact table "
    "repeatedly joined on the same key: bucket at ingest, and every "
    "subsequent join/agg on that key is shuffle-free. Oracle computes "
    "the same join from the raw tables, proving the bucketed layout "
    "is lossless.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # External tables at a fresh temp location: a managed table would
    # collide with a stale spark-warehouse/ directory left by a killed
    # session (LOCATION_ALREADY_EXISTS), since the new session's
    # catalog no longer knows the table but the files persist.
    ot, ct = "bjc_orders", "bjc_customer"
    base = tempfile.mkdtemp(prefix="bjc_")
    for t in (ot, ct):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
            .write.mode("overwrite")
            .option("path", f"{base}/{ot}")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable(ot)
        )
        (
            load(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment")
            .write.mode("overwrite")
            .option("path", f"{base}/{ct}")
            .bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable(ct)
        )
        orders = spark.table(ot)
        cust = spark.table(ct).where(F.col("c_mktsegment") == "BUILDING")
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice", "sum_price"),
            )
            .localCheckpoint()  # materialize before the tables are dropped
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {ct}")
        shutil.rmtree(base, ignore_errors=True)


@register(
    "sink_csv_roundtrip",
    oracle=f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 'sum_total')}
FROM orders
GROUP BY o_orderpriority
""",
    doc="CSV sink round-trip over orders: header-on write split across "
    "executors, read back with an explicit schema (never inference in "
    "production — one pass saved, types locked), aggregate per "
    "priority. Exact counts and decimal-summed totals matching the "
    "original parquet prove the text round-trip is lossless including "
    "float formatting. CSV is the lowest-common-denominator interchange "
    "format the reference's Excel surface implies (SURVEY §2.2 scans).",
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.mkdtemp(prefix="sink_csv_"), "orders")
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    try:
        src.write.mode("overwrite").option("header", "true").csv(out)
        return (
            spark.read.schema(src.schema)
            .option("header", "true")
            .csv(out)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice", "sum_total"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)


@register(
    "sink_orc_roundtrip",
    oracle=f"""
SELECT l_linestatus, COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice', 'sum_price')},
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY l_linestatus
""",
    doc="ORC sink round-trip over lineitem: Spark's second columnar "
    "format (native vectorized ORC reader/writer, predicate pushdown "
    "and column pruning like parquet). Write splits across executors, "
    "read back, aggregate per linestatus; counts, exact decimal price "
    "sums, and integer quantity sums matching the ORIGINAL parquet "
    "prove the cross-format round-trip is lossless. At 100 TB the "
    "choice between ORC and parquet is a layout decision, not a "
    "semantics one — this query pins that.",
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.mkdtemp(prefix="sink_orc_"), "lineitem")
    src = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_linestatus"
    )
    try:
        src.write.mode("overwrite").orc(out)
        return (
            spark.read.orc(out)
            .groupBy("l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dsum("l_extendedprice", "sum_price"),
                F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)


def quant_scales_batch(b: "pa.RecordBatch") -> "pa.RecordBatch":
    """Per-vector quantization-scale kernel over one Arrow batch.

    Slice-safe: a sliced ListArray keeps its parent's offset base while
    ``list_flatten`` rebases values to 0, so offsets are rebased before
    segmenting. ``reduceat`` runs over NONEMPTY list starts only —
    empty lists contribute no values, so nonempty starts delimit exact
    segments, no index can point past the value buffer, and empty lists
    yield scale 0 deterministically.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    emb = b.column(b.schema.get_field_index("embedding"))
    vals = pc.abs(pc.list_flatten(emb)).to_numpy(zero_copy_only=False)
    offs = emb.offsets.to_numpy(zero_copy_only=False).astype("int64")
    offs = offs - offs[0]
    starts = offs[:-1]
    dims = (offs[1:] - starts).astype("int64")
    max_abs = np.zeros(len(starts), dtype="float64")
    nonempty = dims > 0
    if nonempty.any():
        max_abs[nonempty] = np.maximum.reduceat(
            vals.astype("float64"), starts[nonempty]
        )
    return pa.RecordBatch.from_arrays(
        [
            b.column(b.schema.get_field_index("vec_id")),
            pa.array(dims, pa.int64()),
            pa.array(np.floor(max_abs * 1_000_000).astype("int64")),
        ],
        names=["vec_id", "dim", "scale_micro"],
    )


@register(
    "udf_map_in_arrow",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS max_abs,
         LEN(embedding) AS dim
  FROM embeddings
)
SELECT vec_id, dim,
       CAST(FLOOR(max_abs * 1000000) AS BIGINT) AS scale_micro
FROM q
""",
    doc="mapInArrow extension point (the third Arrow API next to the "
    "pandas UDF/UDAF/UDTF): per-vector int8 quantization scale derived "
    "with pyarrow compute directly on RecordBatches — no pandas "
    "conversion at all, the zero-copy path for binary/tensor columns. "
    "The arithmetic (per-vector max |v|, the symmetric-quantization "
    "scale, emitted as floor-to-micro integers so both engines agree "
    "bit-exactly) is deliberately SQL-expressible so the oracle checks the "
    "Arrow machinery end-to-end; the real workload swaps in the "
    "full quantize kernel with the same batch shape.",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pyarrow as pa

    def scales(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for b in batches:
            yield quant_scales_batch(b)

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(scales, schema="vec_id long, dim long, scale_micro long")


@register(
    "pipeline_observe_metrics",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       CAST(COUNT(CASE WHEN o_totalprice > 400000 THEN 1 END) AS BIGINT)
         AS n_large,
       CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT)
         AS n_urgent
FROM orders
""",
    doc="In-flight pipeline metrics via df.observe(): row counts, sums, "
    "and data-quality counters ride the SAME job as the real work — no "
    "second pass over the data, which at 100 TB is the difference "
    "between free observability and doubling the bill. The observed "
    "plan here is a pass-through write-side scan (consumed by a count "
    "action); the metrics come back through the Observation handle and "
    "are emitted as a 1-row DataFrame the oracle recomputes directly. "
    "This is how the ingestion pipeline would report per-batch "
    "validation counters (nulls, out-of-range, quarantined) without a "
    "dedicated metrics job.",
)
def pipeline_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    o = load(spark, sf_dir, "orders")
    obs = Observation("ingest_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_price"),
        F.count(F.when(F.col("o_totalprice") > 400000, 1)).alias("n_large"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias(
            "n_urgent"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()  # the "real" job
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                float(m["sum_price"]),
                int(m["n_large"]),
                int(m["n_urgent"]),
            )
        ],
        "n_rows long, sum_price double, n_large long, n_urgent long",
    )


@register(
    "pipeline_cached_fanout",
    oracle="""
WITH enriched AS (
  SELECT l.l_extendedprice * (1 - l.l_discount) AS net, o.o_orderpriority
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= DATE '1995-01-01'
), by_prio AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(net AS DECIMAL(18,6))) AS DOUBLE) AS prio_net,
         COUNT(*) AS prio_rows
  FROM enriched GROUP BY o_orderpriority
), total AS (
  SELECT CAST(SUM(CAST(net AS DECIMAL(18,6))) AS DOUBLE) AS total_net,
         COUNT(*) AS total_rows
  FROM enriched
)
SELECT p.o_orderpriority, p.prio_net, p.prio_rows, t.total_net, t.total_rows
FROM by_prio p CROSS JOIN total t
""",
    doc="Cache-and-fan-out: an expensive enriched intermediate (join + "
    "filter + net-price projection) is persisted ONCE and consumed by "
    "two independent aggregates — without persist() Spark recomputes "
    "the join per consumer, exactly the recompute trap the triangle "
    "counter's localCheckpoint also guards against. persist() (lazy, "
    "lineage kept, memory-and-disk) is the right tool when consumers "
    "run in the same job graph; localCheckpoint (eager, lineage cut) "
    "when re-planning cost or lineage depth is the problem. The plan "
    "test pins InMemoryTableScan appearing for both consumers. At "
    "100 TB the same decision appears as: materialize the intermediate "
    "to a table when many jobs share it; cache when one job fans out.",
)
def pipeline_cached_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1995-01-01")
    )
    enriched = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
            "o_orderpriority",
        )
        .persist()
    )
    dec_net = F.col("net").cast("decimal(18,6)")
    by_prio = enriched.groupBy("o_orderpriority").agg(
        F.sum(dec_net).cast("double").alias("prio_net"),
        F.count(F.lit(1)).alias("prio_rows"),
    )
    total = enriched.agg(
        F.sum(dec_net).cast("double").alias("total_net"),
        F.count(F.lit(1)).alias("total_rows"),
    )
    # total is a 1-row aggregate: pin the broadcast so the AQE-off
    # plan matches the BroadcastNestedLoopJoin AQE would pick.
    out = by_prio.crossJoin(F.broadcast(total)).localCheckpoint()
    enriched.unpersist()
    return out


@register(
    "sink_wap_publish",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n,
       {sql_dsum('o_totalprice', 'sum_price')},
       TRUE AS audit_passed
FROM orders WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
""",
    doc="Write-Audit-Publish: stage the open-orders snapshot to an "
    "unpublished directory, audit the STAGED bytes (read-back count + "
    "exact-decimal sum vs the same aggregate on the source plan), and "
    "only then publish with one atomic directory rename — readers never "
    "see a partial or failed write, the invariant WAP exists for. The "
    "audit re-reads what was actually written (catching codec/layout "
    "corruption, not just plan bugs); a mismatch raises before publish "
    "so the failure mode is 'nothing published', never 'bad data "
    "published'. Per-partition audit totals come from one hash "
    "aggregate each; rename cost is O(1) regardless of data size — the "
    "same contract as the reference's ACK-before-commit (K2: no false "
    "progress, SURVEY §2.1).",
)
def sink_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = tempfile.mkdtemp(prefix="wap_")
    stage = os.path.join(root, "_staging", "orders_open")
    final = os.path.join(root, "published", "orders_open")
    try:
        src = (
            load(spark, sf_dir, "orders")
            .where(F.col("o_orderstatus") == "O")
            .select("o_orderkey", "o_orderpriority", "o_totalprice")
        )
        src.write.mode("errorifexists").parquet(stage)

        audit_cols = [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("s"),
        ]
        expect = src.agg(*audit_cols).collect()[0]
        staged = spark.read.parquet(stage)
        got = staged.agg(*audit_cols).collect()[0]
        if (expect["n"], expect["s"]) != (got["n"], got["s"]):
            raise RuntimeError(f"WAP audit failed: {expect} != {got}")

        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.rename(stage, final)  # the atomic publish

        return (
            spark.read.parquet(final)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                dsum("o_totalprice", "sum_price"),
                F.lit(True).alias("audit_passed"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "udf_grouped_regression",
    # identical semantics to stats_regression_by_group (ops/analytics.py)
    # — same oracle, different engine path: grouped-map applyInPandas
    # instead of built-in aggregates.
    oracle=None,  # set below to analytics._REG_SQL to avoid duplication
    doc="Grouped-map applyInPandas surface demo: per-group OLS "
    "regression computed INSIDE an Arrow-batched Python function, "
    "bit-identical to the pure-SQL oracle because the sufficient "
    "statistics are summed with exact decimal.Decimal arithmetic "
    "(values carry <=2 decimals, so Decimal(str(x)) reconstructs the "
    "exact DECIMAL(15,2) the oracle sums) and the derived statistics "
    "repeat the oracle's IEEE double ops and ROUNDs. The grouped-map "
    "path ships each group once over Arrow — the escape hatch for "
    "per-group model fitting the built-ins can't express. SCALE "
    "CAVEAT (this is a surface demo, deliberately kept on the shared "
    "oracle's 3-value key): grouped-map materializes each WHOLE group "
    "in one executor's memory, so at 100 TB a 3-group key means ~33 TB "
    "per task — unusable. Production grouped-map fits need a key whose "
    "group size stays bounded as data grows (per-entity keys like "
    "l_partkey: ~30 lines/part at every SF), or the sufficient-"
    "statistics aggregate form (stats_regression_by_group, "
    "ops/analytics.py), which is the same math with O(1) state per "
    "group and no Python stage. Use THAT shape at scale; this query "
    "exists to prove the Arrow grouped-map path gives bit-identical "
    "results when you genuinely need per-group Python.",
)
def udf_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import Decimal

        n = len(pdf)
        xs = [Decimal(str(v)) for v in pdf["l_quantity"]]
        ys = [Decimal(str(v)) for v in pdf["l_extendedprice"]]
        sx = float(sum(xs))
        sy = float(sum(ys))
        sxx = float(sum(x * x for x in xs))
        sxy = float(sum(x * y for x, y in zip(xs, ys)))
        syy = float(sum(y * y for y in ys))
        nd = float(n)
        slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
        intercept = (sy - slope * sx) / nd
        corr = (nd * sxy - sx * sy) / (
            (nd * sxx - sx * sx) ** 0.5 * (nd * syy - sy * sy) ** 0.5
        )
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n": [n],
                "slope": [round(slope, 9)],
                "intercept": [round(intercept, 4)],
                "corr_xy": [round(corr, 12)],
            }
        )

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        fit,
        schema="l_returnflag string, n long, slope double, "
        "intercept double, corr_xy double",
    )


# late-bind the shared oracle (module import order: analytics registers
# first; avoid duplicating the SQL text)
def _bind_grouped_regression_oracle() -> None:
    from ..registry import _REGISTRY
    from .analytics import _REG_SQL

    q = _REGISTRY["udf_grouped_regression"]
    _REGISTRY["udf_grouped_regression"] = type(q)(
        name=q.name, fn=q.fn, oracle=_REG_SQL, doc=q.doc
    )


_bind_grouped_regression_oracle()


MANIFEST_BUCKETS = 8


@register(
    "profile_partition_manifest",
    oracle=f"""
SELECT CAST(o_orderkey % {MANIFEST_BUCKETS} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
FROM orders
GROUP BY 1
""",
    doc="Data-skipping manifest built from the FILE METADATA column: "
    f"orders is written partitioned by bucket (o_orderkey % "
    f"{MANIFEST_BUCKETS}), read back, and the per-partition stats "
    "(row count, key min/max, priority cardinality) are keyed by the "
    "bucket value parsed out of Spark's hidden _metadata.file_path — "
    "the manifest every lakehouse table format maintains so scans can "
    "prune files by predicate before reading a byte. Matching the "
    "oracle computed directly on the source proves the partitioned "
    "layout is lossless AND the metadata-column plumbing reports the "
    "true file-to-partition mapping. Per-bucket stats are "
    "deterministic (bucket = key mod); per-FILE counts deliberately "
    "are not emitted (files per bucket depend on write parallelism).",
)
def profile_partition_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.mkdtemp(prefix="manifest_"), "orders")
    try:
        (
            load(spark, sf_dir, "orders")
            .select(
                "o_orderkey",
                "o_orderpriority",
                (F.col("o_orderkey") % MANIFEST_BUCKETS).alias("bucket"),
            )
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out)
        )
        back = spark.read.parquet(out).select(
            "o_orderkey",
            "o_orderpriority",
            F.regexp_extract(
                F.col("_metadata.file_path"), r"bucket=(\d+)", 1
            )
            .cast("long")
            .alias("bucket"),
        )
        return (
            back.groupBy("bucket")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.min("o_orderkey").cast("long").alias("min_key"),
                F.max("o_orderkey").cast("long").alias("max_key"),
                F.countDistinct("o_orderpriority")
                .cast("long")
                .alias("n_priorities"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
