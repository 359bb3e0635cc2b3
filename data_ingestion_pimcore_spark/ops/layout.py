"""Storage-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

At 100 TB, the cheapest query is the one that never reads the data:
parquet row-group min/max stats prune scans, but only if rows with
similar key values are physically adjacent. A single-column sort
clusters one dimension perfectly and scatters every other; a Z-order
(bit-interleaved Morton code) sort clusters ALL participating
dimensions approximately, so range predicates on ANY of them hit a
small fraction of files/row groups. This is the layout step behind
Delta/Iceberg `OPTIMIZE ZORDER BY` — here expressed as plain
DataFrame ops: compute the Morton code, range-partition + sort by it,
write. The code computation is exact integer bit arithmetic, so the
DuckDB oracle replays it bit-for-bit.

`tests/test_plans.py::test_zorder_layout_concentrates_matches` proves
the point the stats would exploit: after Z-order layout, a 2-D range
predicate's matching rows live in a small subset of files, while the
same predicate on an unclustered layout touches every file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

Z_BITS = 8  # bits per dimension: 256x256 grid, 16-bit Morton code


def morton_col(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` of x (even positions) and y (odd
    positions) into a Morton code — pure integer arithmetic, identical
    in any engine: z = Σ_i ((x>>i)&1)·4^i · 1 + ((y>>i)&1)·4^i · 2."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
            + (
                F.shiftright(y, i).bitwiseAND(F.lit(1))
                * F.lit(1 << (2 * i + 1))
            )
        )
    return z


def sql_morton(x: str, y: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, x: str, y: str, n_files: int, bits: int = Z_BITS
) -> DataFrame:
    """Cluster ``df`` for 2-D skipping on (x, y): Morton code →
    range-partition into ``n_files`` + sort within partitions. One
    shuffle, paid once at write time — the same cost profile as any
    OPTIMIZE/compaction pass; every later scan with a predicate on x
    or y prunes against tight per-file min/max stats."""
    zc = morton_col(
        F.col(x).bitwiseAND(F.lit((1 << bits) - 1)),
        F.col(y).bitwiseAND(F.lit((1 << bits) - 1)),
        bits,
    )
    return (
        df.withColumn("__z", zc)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


@register(
    "layout_zorder",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       CAST(l_partkey % 256 AS BIGINT) AS px,
       CAST(l_suppkey % 256 AS BIGINT) AS sx,
       CAST({sql_morton("(l_partkey % 256)", "(l_suppkey % 256)")} AS BIGINT)
           AS zval
FROM lineitem
""",
    doc="Z-order (Morton) code over (l_partkey, l_suppkey) low bytes — "
    "the clustering key behind multi-dimensional data skipping "
    "(OPTIMIZE ZORDER BY in table formats). Pure codegen'd integer "
    "bit arithmetic per row, no shuffle; the DuckDB oracle replays "
    "the interleave bit-for-bit. zorder_layout() turns the code into "
    "an actual file layout (range-partition + sort, one write-time "
    "shuffle); the plan test proves matching rows concentrate into "
    "few files under a 2-D range predicate.",
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    px = F.col("l_partkey").bitwiseAND(F.lit(255))
    sx = F.col("l_suppkey").bitwiseAND(F.lit(255))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        px.cast("long").alias("px"),
        sx.cast("long").alias("sx"),
        morton_col(px, sx).cast("long").alias("zval"),
    )


TARGET_FILE_ROWS = 50_000  # compaction target (stands in for 128 MB)


@register(
    "layout_compact_small_files",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY o_orderpriority
""",
    doc="Small-file compaction: a table fragmented into hundreds of "
    "tiny files (every streaming/per-batch writer produces this) is "
    "rewritten into row-count-targeted files via repartition, and the "
    "aggregate over the compacted copy must match the oracle over the "
    "ORIGINAL — compaction may only change layout, never content. The "
    "small-files problem is THE silent 100 TB killer: each file costs "
    "a namenode/listing entry, a scan task, and a footer read, so a "
    "million 100 KB files can make planning slower than scanning. "
    "Production cadence: compact when file count per partition exceeds "
    "a threshold, target spark.sql.files.maxPartitionBytes-sized "
    "outputs; the file-count collapse itself is pinned by pytest "
    "(tests/test_plans.py::test_compaction_reduces_file_count).",
)
def layout_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    import os
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="compact_")
    frag, packed = os.path.join(base, "frag"), os.path.join(base, "packed")
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    try:
        # fragment: the pathological many-tiny-files layout
        src.repartition(64).write.mode("overwrite").parquet(frag)
        fragged = spark.read.parquet(frag)
        n = fragged.count()
        n_out = max(1, math.ceil(n / TARGET_FILE_ROWS))
        fragged.repartition(n_out).write.mode("overwrite").parquet(packed)
        return (
            spark.read.parquet(packed)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                .cast("double")
                .alias("sum_price"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
