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


# ------------------------------------------------------- Hilbert curve

H_BITS = 6  # 64x64 grid — keeps the unrolled expression chain compact


def hilbert_frame(df: DataFrame, x: Column, y: Column, bits: int = H_BITS) -> DataFrame:
    """Unrolled Hilbert xy→d transform (s-rotation variant, validated
    bijective with unit steps in tests): adds an ``hval`` column.

    Each level is materialized as real columns via ``withColumns`` —
    building one nested Column expression instead makes the tree grow
    ~4x per level (x and y feed four sites of the next level), which
    put Catalyst analysis into minutes at 6 levels; as named columns
    the per-level expressions stay O(1) and CollapseProject keeps
    them (aliases referenced repeatedly and non-cheap are not
    inlined). Pure integer CASE/bit codegen — no UDF, no shuffle."""
    reserved = {"__hx", "__hy", "__hd", "hval"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"hilbert_frame reserved column names already present: "
            f"{sorted(reserved)} — rename them before calling (the "
            "transform writes __hx/__hy/__hd scratch and an hval output)"
        )
    df = df.withColumns({"__hx": x, "__hy": y, "__hd": F.lit(0).cast("long")})
    hx, hy, hd = F.col("__hx"), F.col("__hy"), F.col("__hd")
    for j in range(bits - 1, -1, -1):
        s = 1 << j
        rx = F.shiftright(hx, j).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, j).bitwiseAND(F.lit(1))
        flip = (ry == 0) & (rx == 1)
        xp = F.when(flip, F.lit(s - 1) - hx).otherwise(hx)
        yp = F.when(flip, F.lit(s - 1) - hy).otherwise(hy)
        df = df.withColumns(
            {
                "__hd": hd + F.lit(s * s) * (rx * 3).bitwiseXOR(ry),
                "__hx": F.when(ry == 0, yp).otherwise(xp),
                "__hy": F.when(ry == 0, xp).otherwise(yp),
            }
        )
    return df.withColumnRenamed("__hd", "hval").drop("__hx", "__hy")


def sql_hilbert_ctes(src: str, bits: int = H_BITS) -> tuple[str, str]:
    """DuckDB CTE chain mirroring hilbert_cols level by level. ``src``
    must yield columns (x, y) plus any passthrough columns; returns
    (cte_sql, final_cte_name) where the final CTE carries (…, x, y, d).
    All level expressions reference the PREVIOUS level's columns (the
    REPLACE list evaluates against the source row), exactly like the
    Column-chain on the Spark side."""
    parts = [f"hin AS (SELECT *, CAST(0 AS BIGINT) AS d FROM ({src}))"]
    prev = "hin"
    for j in range(bits - 1, -1, -1):
        s_ = 1 << j
        cte = f"h{j}"
        parts.append(
            f"""{cte} AS (
  SELECT * REPLACE (
    CASE WHEN ((y >> {j}) & 1) = 0
         THEN CASE WHEN ((x >> {j}) & 1) = 1 THEN {s_ - 1} - y ELSE y END
         ELSE x END AS x,
    CASE WHEN ((y >> {j}) & 1) = 0
         THEN CASE WHEN ((x >> {j}) & 1) = 1 THEN {s_ - 1} - x ELSE x END
         ELSE y END AS y,
    d + {s_ * s_} * xor(((x >> {j}) & 1) * 3, (y >> {j}) & 1) AS d
  )
  FROM {prev}
)"""
        )
        prev = cte
    return ",\n".join(parts), prev


_HILBERT_SRC = """
SELECT l_orderkey, l_linenumber,
       CAST(l_partkey % 64 AS BIGINT) AS x,
       CAST(l_suppkey % 64 AS BIGINT) AS y
FROM lineitem
"""
_H_CTES, _H_FINAL = sql_hilbert_ctes(_HILBERT_SRC)


@register(
    "layout_hilbert",
    oracle=f"""
WITH {_H_CTES}
SELECT l_orderkey, l_linenumber, d AS hval
FROM {_H_FINAL}
""",
    doc="Hilbert-curve clustering key over (l_partkey, l_suppkey) — "
    "the locality-better alternative to Z-order: consecutive Hilbert "
    "indices are ALWAYS grid-adjacent (unit steps, asserted by test), "
    "where Morton codes jump across the plane at power-of-two "
    "boundaries, so Hilbert layouts give tighter per-file min/max "
    "envelopes for 2-D skipping (what Databricks liquid clustering "
    "moved to). The xy→d transform is the s-rotation recurrence "
    "unrolled into 6 levels of pure integer CASE/bit codegen — no "
    "UDF, no shuffle; the DuckDB oracle replays the identical "
    "level chain CTE by CTE, so the transform is pinned bit-for-bit. "
    "zorder_layout()'s range-partition + sort write path applies "
    "unchanged with this code as the key.",
)
def layout_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber",
                                                "l_partkey", "l_suppkey")
    x = (F.col("l_partkey") % 64).cast("long")
    y = (F.col("l_suppkey") % 64).cast("long")
    return (
        hilbert_frame(li, x, y)
        .select("l_orderkey", "l_linenumber", F.col("hval").cast("long").alias("hval"))
    )


# -------------------------------------- rectangular Hilbert variant

RECT_BITS_X = 8  # 256-wide long axis
RECT_BITS_Y = 4  # 16-tall short axis


def hilbert_frame_rect(
    df: DataFrame,
    x: Column,
    y: Column,
    bits_x: int = RECT_BITS_X,
    bits_y: int = RECT_BITS_Y,
) -> DataFrame:
    """Hilbert key for a RECTANGULAR 2^bits_x x 2^bits_y domain (the
    square transform wastes the grid when one key has far more
    distinct values than the other — e.g. 200k parts vs 10k
    suppliers). Decomposition: the long axis splits into
    2^(bits_x-bits_y) square super-cells traversed in plain x order,
    each filled by the square Hilbert curve on (x mod 2^bits_y, y).
    Continuity needs NO reflection because this square variant enters
    at (0,0) and exits at (2^bits_y - 1, 0): each cell's exit is
    grid-adjacent to the next cell's entry, so consecutive
    rect-Hilbert indices remain unit steps across the whole rectangle
    (property-tested). Same pure integer CASE/bit codegen, no UDF."""
    if bits_x < bits_y:
        raise ValueError("long axis must be x: need bits_x >= bits_y")
    mask = (1 << bits_y) - 1
    cell = 1 << (2 * bits_y)  # points per super-cell
    inner = hilbert_frame(df, x.bitwiseAND(F.lit(mask)), y, bits_y)
    return inner.withColumn(
        "hval",
        F.shiftright(x, bits_y).cast("long") * F.lit(cell) + F.col("hval"),
    )


_HILBERT_RECT_SRC = f"""
SELECT l_orderkey, l_linenumber,
       CAST(l_partkey % {1 << RECT_BITS_X} AS BIGINT) AS xw,
       CAST(l_partkey % {1 << RECT_BITS_X} % {1 << RECT_BITS_Y} AS BIGINT) AS x,
       CAST(l_suppkey % {1 << RECT_BITS_Y} AS BIGINT) AS y
FROM lineitem
"""
_HR_CTES, _HR_FINAL = sql_hilbert_ctes(_HILBERT_RECT_SRC, RECT_BITS_Y)


@register(
    "layout_hilbert_rect",
    oracle=f"""
WITH {_HR_CTES}
SELECT l_orderkey, l_linenumber,
       (xw // {1 << RECT_BITS_Y}) * {1 << (2 * RECT_BITS_Y)} + d AS hval
FROM {_HR_FINAL}
""",
    doc="Rectangular-domain Hilbert clustering key over "
    f"(l_partkey % {1 << RECT_BITS_X}, l_suppkey % {1 << RECT_BITS_Y}) "
    "— the x-y-asymmetric variant for key pairs with very different "
    "cardinalities, where forcing a square grid either truncates the "
    "long axis or wastes the short one. Super-cells along the long "
    "axis chain square Hilbert fills with unit-step continuity "
    "(entry/exit alignment proven by the same adjacency property "
    "test as the square curve); the DuckDB oracle replays the inner "
    "square levels CTE by CTE and adds the super-cell prefix "
    "arithmetically, pinning the transform bit for bit.",
)
def layout_hilbert_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    x = (F.col("l_partkey") % (1 << RECT_BITS_X)).cast("long")
    y = (F.col("l_suppkey") % (1 << RECT_BITS_Y)).cast("long")
    return hilbert_frame_rect(li, x, y).select(
        "l_orderkey",
        "l_linenumber",
        F.col("hval").cast("long").alias("hval"),
    )
