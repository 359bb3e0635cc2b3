"""Statistical and graph analytics operators: grouped OLS regression,
fixed-width histograms, degree-oriented triangle counting, and SCD2
(slowly-changing-dimension) history derivation.

These extend the relational surface (SURVEY §2.2) with the analytics a
warehouse user expects beyond plain aggregates. Scale design:

* Regression/correlation reduce to six partial sums per group — one
  hash aggregate, map-side combined, no second pass. The sums use the
  exact-decimal trick from ``_det`` so results are order- and
  partitioning-independent (bit-identical to the DuckDB oracle).
* The histogram is a single aggregate on a computed bin key; bins are
  closed-form (no per-group sort, no percentile pass).
* Triangle counting uses the degree-orientation algorithm: every edge
  is directed from its lower-(degree, id) endpoint, wedges are generated
  only at each edge's smaller endpoint, so wedge volume is bounded by
  sum(min_deg(e)) — the classic bound that keeps the join sub-quadratic
  on power-law graphs (a hub of degree D generates no wedges at the hub;
  its neighbors generate them instead). The naive a<b<c join chain the
  oracle uses would explode on the hub.
* SCD2 derives validity intervals with two windows over one
  partition-local sort (change detection via lag, interval close via
  lead) — no global sort, no self-join; partitions by the dimension key
  so a 100 TB change feed shuffles once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from ._det import DEC, dsum, sql_dsum

# ------------------------------------------------------------- regression

# Products are computed EXACTLY in decimal (inputs carry ≤2 decimal
# digits, so DECIMAL(15,2) operands lose nothing) and summed exactly.
# The one remaining cross-engine hazard is decimal→double conversion of
# sums whose integer units exceed 2^53 (one engine double-rounds), so
# the derived statistics are rounded to scales where ROUND is exact in
# both engines (|value|·10^scale < 2^53).
_REG_SQL = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))
                  * CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))
                  * CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                  * CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
         / (CAST(n AS DOUBLE) * sxx - sx * sx), 9) AS slope,
       ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
              / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
         / CAST(n AS DOUBLE), 4) AS intercept,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
         / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
            * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), 12) AS corr_xy
FROM s
"""


@register(
    "stats_regression_by_group",
    oracle=_REG_SQL,
    doc="Grouped OLS regression of l_extendedprice on l_quantity "
    "(slope, intercept, Pearson correlation) per return flag. The six "
    "sufficient statistics (n, Σx, Σy, Σx², Σxy, Σy²) come from ONE "
    "hash aggregate with map-side partials — the closed-form normal "
    "equations need no second pass and no per-group sort, so the op "
    "costs exactly one shuffle at any scale. Products are computed and "
    "summed EXACTLY in decimal (operands carry ≤2 decimal digits), the "
    "final formulas evaluate in double with an expression tree mirrored "
    "verbatim in the oracle, and each statistic is rounded to a scale "
    "where ROUND is exact in both engines — the only cross-engine "
    "divergence (decimal→double casts of >2^53-unit sums double-round "
    "in one engine) is below the rounding floor.",
)
def stats_regression_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    x2, y2 = x.cast("decimal(15,2)"), y.cast("decimal(15,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("sx"),
        F.sum(y.cast(DEC)).cast("double").alias("sy"),
        F.sum(x2 * x2).cast("double").alias("sxx"),
        F.sum(x2 * y2).cast("double").alias("sxy"),
        F.sum(y2 * y2).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / nd, 4).alias("intercept"),
        F.round(
            (nd * sxy - sx * sy)
            / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)),
            12,
        ).alias("corr_xy"),
    )


# -------------------------------------------------------------- histogram

HIST_WIDTH = 60_000.0
HIST_BINS = 10


@register(
    "stats_histogram",
    oracle=f"""
SELECT CAST(LEAST(FLOOR(o_totalprice / {HIST_WIDTH}), {HIST_BINS - 1}) AS INTEGER)
         AS bin,
       CAST(LEAST(FLOOR(o_totalprice / {HIST_WIDTH}), {HIST_BINS - 1})
            * {HIST_WIDTH} AS DOUBLE) AS bin_lo,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 'sum_price')},
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY 1, 2
""",
    doc="Fixed-width histogram of order totals: the bin key is a "
    "closed-form expression (floor-divide, clamped top bin), so the "
    "whole histogram is ONE hash aggregate with map-side combine — no "
    "sort, no percentile pass, and the output cardinality is the bin "
    "count regardless of input size. This is the shape dashboard "
    "binning should take at 100 TB (contrast with NTILE, which needs a "
    "global sort).",
)
def stats_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bin_ = F.least(
        F.floor(F.col("o_totalprice") / HIST_WIDTH), F.lit(HIST_BINS - 1)
    ).cast("int")
    return (
        o.select(
            bin_.alias("bin"),
            (bin_.cast("double") * HIST_WIDTH).alias("bin_lo"),
            "o_totalprice",
        )
        .groupBy("bin", "bin_lo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


# -------------------------------------------------------- triangle count

# Orders with more than ORDER_ITEM_CAP distinct parts would contribute
# C(L,2) edges; TPC-H orders hold ≤7 items so the cap never binds at
# test scale — it exists as the basket-size skew bound for real data
# (the co-occurrence analogue of the shingle DF_CAP).
ORDER_ITEM_CAP = 64


@register(
    "graph_triangle_count",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT (SELECT COUNT(DISTINCT l_partkey) FROM items) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*)
        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
          ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
""",
    doc="Triangle counting on the part co-purchase graph (parts are "
    "adjacent when they appear in the same order). The Spark plan is "
    "the degree-oriented edge-iterator: edges point from the "
    "lower-(degree, id) endpoint, out-adjacency is materialized as one "
    "sorted array per node, and each edge counts |N⁺(u) ∩ N⁺(v)| — "
    "every triangle found exactly once at its lowest-ranked edge. Work "
    "is Σ_e min_deg(e) like wedge generation, but nothing quadratic is "
    "ever materialized as rows (the wedge-join variant shuffled ~20M "
    "wedge rows at sf0.1 and ran ~2× slower end-to-end); orientation bounds "
    "out-degrees at O(√edges) on ANY graph, so a power-law hub that "
    "explodes the oracle's naive a<b<c chain stays bounded here. Edges "
    "derive from per-order part lists (posting-list pair generation, "
    "no self-join of lineitem), with an order-size cap of "
    f"{ORDER_ITEM_CAP} as the basket-skew bound.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    # Pairs ride the dedup exchange as ONE long each — (a << 32) | b,
    # a < b by the array sort — instead of a two-field struct:
    # primitive-array explode + a single-long distinct key shuffles
    # fewer bytes and hashes faster (guide §2.3 narrower types; the
    # same encoding graph_common_neighbors carries). Safe: TPC-H
    # partkey is positive and < 2^32 at any realistic SF.
    pair_longs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.shiftleft(x, 32) + y,
            ),
        )
    )
    # The edge list feeds four subtrees (degrees, orientation, adjacency,
    # the final count); without materialization Spark would recompute
    # the basket explosion + distinct once per reference. localCheckpoint
    # pins the 1.2M-row edge list (sf0.1) once — the cluster-scale
    # equivalent is a persisted/checkpointed edge table.
    edges = (
        baskets.where(F.size("ps") <= ORDER_ITEM_CAP)
        .select(F.explode(pair_longs).alias("p"))
        .distinct()
        .select(
            F.shiftright("p", 32).alias("a"),
            F.col("p").bitwiseAND(F.lit(0xFFFFFFFF)).alias("b"),
        )
        .localCheckpoint()
    )
    # Degree per node, then orient each edge low→high by (degree, id).
    # deg has THREE consumers (the da/db orientation attaches and the
    # n_nodes aggregate); without a lineage barrier the 2×|E|-row union
    # + hash aggregate recomputes once per reference (the multi-
    # consumer recompute trap) — checkpoint the tiny O(|V|) result.
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    ranked = (
        edges.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint()  # referenced three times below (adj + two probes)
    # Edge-iterator formulation: a triangle {a,b,c} oriented a→b, a→c,
    # b→c is found exactly once, at its first edge — as a common
    # OUT-neighbor of both endpoints (c ∈ N⁺(a) ∩ N⁺(b) for edge a→b).
    # Materializing out-adjacency as one sorted array per node and
    # intersecting per edge does the same Σ_e min_deg(e) work as wedge
    # generation but WITHOUT materializing wedges as rows. A/B at sf0.1
    # (1.2M edges, 1.9M triangles): wedge shuffle+join 8.7 s, pipelined
    # broadcast join chain (the DuckDB-style double hash probe) ~5 s,
    # this per-edge intersect ~2 s for the close. Per-edge state is two
    # bounded arrays: orientation keeps out-degrees O(√edges) always.
    adj = oriented.groupBy("src").agg(
        F.array_sort(F.collect_list("dst")).alias("nbrs")
    )
    # Broadcasting adj keeps BOTH adjacency attachments map-side: the
    # array-carrying intermediate rows never shuffle, and the whole
    # intersect+sum pipeline runs in the edges' own tasks. adj is the
    # compressed graph itself (O(nodes + edges) longs). Measured at
    # 13.8M edges / 200k nodes (10x bench scale, interleaved A/B,
    # logs/ab_triangle_10x.out): broadcast 3.7-4.8 s vs shuffle-join
    # 7.1-11.5 s warm — the hint still wins ~2-3x past the 10⁷-edge
    # note below, because single-JVM broadcast is a memcpy. On a real
    # multi-executor cluster the crossover comes earlier (the
    # broadcast fans out over the network per executor): drop the
    # hint once |adj| approaches executor memory — both attachments
    # degrade gracefully to shuffle joins on src, never wedge-sized.
    closed = (
        oriented.join(
            F.broadcast(adj.withColumnRenamed("src", "u")),
            F.col("src") == F.col("u"),
        )
        .drop("u")
        .withColumnRenamed("nbrs", "nbrs_src")
        .join(
            F.broadcast(adj.withColumnRenamed("src", "u")),
            F.col("dst") == F.col("u"),
        )
        .drop("u")
        .select(
            F.size(F.array_intersect("nbrs_src", "nbrs")).alias("n_closed")
        )
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_tri = closed.agg(
        F.coalesce(F.sum("n_closed"), F.lit(0)).alias("n_triangles")
    )
    # 1-row aggregate sides: pin the broadcast so the AQE-off plan is
    # the same BroadcastNestedLoopJoin AQE would pick at runtime.
    return n_nodes.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(n_tri))


# ------------------------------------------------------------------- SCD2


@register(
    "ingest_scd2_history",
    oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         LAG(o_orderpriority) OVER w AS prev_p
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
changes AS (
  SELECT o_custkey, o_orderpriority AS priority,
         o_orderdate AS valid_from, o_orderkey
  FROM ordered
  WHERE prev_p IS NULL OR prev_p <> o_orderpriority
)
SELECT o_custkey, priority, valid_from,
       LEAD(valid_from) OVER w AS valid_to,
       LEAD(valid_from) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
""",
    doc="SCD Type-2 history derivation from a change feed: orders act "
    "as per-customer attribute observations (o_orderpriority over "
    "time); consecutive repeats collapse, each surviving change opens a "
    "validity interval closed by the next change (valid_to NULL = "
    "current row). Two window passes over ONE partition-local sort "
    "keyed by the dimension key — a 100 TB change feed shuffles once "
    "and never sorts globally. Ties on the same date break "
    "deterministically by o_orderkey.",
)
def ingest_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.withColumn("prev_p", F.lag("o_orderpriority").over(w))
        .where(
            F.col("prev_p").isNull()
            | (F.col("prev_p") != F.col("o_orderpriority"))
        )
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    w2 = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    return changes.select(
        "o_custkey",
        "priority",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


# ------------------------------------------- two-pass exact median

MEDIAN_BINS = 1024


@register(
    "agg_median_twopass",
    oracle="""
SELECT l_extendedprice AS median_price,
       (SELECT COUNT(*) FROM lineitem) AS n_rows
FROM lineitem
ORDER BY l_extendedprice
LIMIT 1 OFFSET (SELECT (COUNT(*) + 1) // 2 - 1 FROM lineitem)
""",
    doc="Exact global median WITHOUT a global sort — the two-pass "
    "binning algorithm every scale-out engine uses when 'exact' and "
    "'100 TB' must coexist: pass 1 histograms values into "
    f"{MEDIAN_BINS} closed-form bins (one map-side-combined aggregate, "
    "driver sees bin counts only); the driver locates the bin holding "
    "the k-th value from the cumulative counts; pass 2 top-k's ONLY "
    "inside that bin (expected n/bins rows → TakeOrderedAndProject, "
    "never a full sort). Defined as the lower median (k = ceil(n/2)-th "
    "smallest) so no interpolation arithmetic exists to drift between "
    "engines. Contrast: ORDER BY + OFFSET (the oracle) is a single-node "
    "total sort; percentile() materializes per-group value buffers. "
    "Driver state is O(bins), executor state is O(bin rows).",
)
def agg_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_extendedprice")
    lo_hi = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    lo, hi, n = lo_hi["lo"], lo_hi["hi"], lo_hi["n"]
    k = (n + 1) // 2  # lower median: k-th smallest, 1-based
    width = (hi - lo) / MEDIAN_BINS or 1.0
    bin_col = F.least(
        F.floor((F.col("l_extendedprice") - F.lit(lo)) / F.lit(width)),
        F.lit(MEDIAN_BINS - 1),
    ).cast("int")
    counts = dict(
        li.groupBy(bin_col.alias("b")).agg(F.count(F.lit(1)).alias("c")).collect()
    )
    acc = 0
    for b in range(MEDIAN_BINS):
        c = counts.get(b, 0)
        if acc + c >= k:
            target_bin, k_in_bin = b, k - acc
            break
        acc += c
    in_bin = li.where(bin_col == F.lit(target_bin))
    median = (
        in_bin.orderBy("l_extendedprice")
        .limit(int(k_in_bin))
        .agg(F.max("l_extendedprice").alias("median_price"))
    )
    return median.select(
        "median_price", F.lit(int(n)).cast("long").alias("n_rows")
    )


# --------------------------------------------------- higher moments

_MOM_SQL = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))
                  * CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,1))
                  * CAST(l_quantity AS DECIMAL(12,1))
                  * CAST(l_quantity AS DECIMAL(12,1))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(l_quantity AS DECIMAL(10,1))
                  * CAST(l_quantity AS DECIMAL(10,1))
                  * CAST(l_quantity AS DECIMAL(10,1))
                  * CAST(l_quantity AS DECIMAL(10,1))) AS DOUBLE) AS s4
  FROM lineitem
  GROUP BY l_returnflag
), m AS (
  SELECT l_returnflag, n,
         s1 / CAST(n AS DOUBLE) AS m1,
         s2 / CAST(n AS DOUBLE) AS m2,
         s3 / CAST(n AS DOUBLE) AS m3,
         s4 / CAST(n AS DOUBLE) AS m4
  FROM s
)
SELECT l_returnflag, n,
       ROUND(m2 - m1 * m1, 9) AS variance_pop,
       ROUND((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
             / POW(SQRT(m2 - m1 * m1), 3.0), 9) AS skewness,
       ROUND((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2
              - 3.0 * m1 * m1 * m1 * m1)
             / POW(m2 - m1 * m1, 2.0) - 3.0, 9) AS kurtosis_excess
FROM m
"""


@register(
    "stats_skew_kurtosis",
    oracle=_MOM_SQL,
    doc="Grouped skewness and excess kurtosis from the first four raw "
    "moments — like the regression operator, ONE hash aggregate with "
    "map-side partials carries everything (no centered second pass, no "
    "sort). Power sums are computed as exact decimal products "
    "(l_quantity is integer-valued ≤ 10^4, so x³/x⁴ fit comfortably), "
    "the moment formulas evaluate in double with the expression tree "
    "mirrored verbatim in the oracle, and outputs round to scales where "
    "ROUND is exact in both engines. The numerically-careful caveat is "
    "documented: raw-moment subtraction loses digits when mean >> "
    "stddev, where a production path switches to streaming centered "
    "updates (Welford/Chan) — the one-pass shuffle shape is identical.",
)
def stats_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    x1 = x.cast("decimal(18,6)")
    x2 = x.cast("decimal(15,2)")
    x3 = x.cast("decimal(12,1)")
    x4 = x.cast("decimal(10,1)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).cast("double").alias("s1"),
        F.sum(x2 * x2).cast("double").alias("s2"),
        F.sum(x3 * x3 * x3).cast("double").alias("s3"),
        F.sum(x4 * x4 * x4 * x4).cast("double").alias("s4"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1") / nd
    m2 = F.col("s2") / nd
    m3 = F.col("s3") / nd
    m4 = F.col("s4") / nd
    var = m2 - m1 * m1
    return s.select(
        "l_returnflag",
        "n",
        F.round(var, 9).alias("variance_pop"),
        F.round(
            (m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1)
            / F.pow(F.sqrt(var), F.lit(3.0)),
            9,
        ).alias("skewness"),
        F.round(
            (
                m4
                - F.lit(4.0) * m1 * m3
                + F.lit(6.0) * m1 * m1 * m2
                - F.lit(3.0) * m1 * m1 * m1 * m1
            )
            / F.pow(var, F.lit(2.0))
            - F.lit(3.0),
            9,
        ).alias("kurtosis_excess"),
    )


@register(
    "ingest_scd2_pit_lookup",
    oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         LAG(o_orderpriority) OVER w AS prev_p
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
changes AS (
  SELECT o_custkey, o_orderpriority AS priority,
         o_orderdate AS valid_from, o_orderkey
  FROM ordered
  WHERE prev_p IS NULL OR prev_p <> o_orderpriority
),
versions AS (
  SELECT o_custkey, priority, valid_from,
         LEAD(valid_from) OVER w AS valid_to
  FROM changes
  WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
),
probes AS (
  SELECT o_orderkey, o_custkey,
         o_orderdate + INTERVAL 15 DAY AS probe_ts
  FROM orders
)
SELECT p.o_orderkey, p.o_custkey, p.probe_ts, v.priority AS priority_at_probe
FROM probes p JOIN versions v
  ON v.o_custkey = p.o_custkey
 AND v.valid_from <= p.probe_ts
 AND (v.valid_to IS NULL OR p.probe_ts < v.valid_to)
""",
    doc="Point-in-time (as-of) lookup against SCD2 history — the "
    "feature-store primitive that prevents training-time leakage: each "
    "probe (order date + 15 days) must see exactly the dimension "
    "version valid at that instant. Implemented as the union-sort-"
    "window PIT join: versions (typ 0) and probes (typ 1) union into "
    "one stream, ONE window partitioned by the key and ordered by "
    "(ts, typ, version key) carries the last-seen version attribute "
    "forward onto every probe — one shuffle, one partition-local sort, "
    "no interval join blowup, at any history/probe volume. The oracle "
    "is the declarative interval join (valid_from <= t < valid_to); "
    "equality proves the window formulation implements interval "
    "semantics, including same-instant version supersession (empty "
    "[t,t) intervals lose to the later version key).",
)
def ingest_scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    wchg = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.select(
            "o_custkey",
            "o_orderpriority",
            "o_orderdate",
            "o_orderkey",
            F.lag("o_orderpriority").over(wchg).alias("prev_p"),
        )
        .where(F.col("prev_p").isNull() | (F.col("prev_p") != F.col("o_orderpriority")))
    )
    versions = changes.select(
        "o_custkey",
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("typ"),
        F.col("o_orderkey").alias("tiebreak"),
        F.col("o_orderpriority").alias("v_priority"),
        F.lit(None).cast("long").alias("p_orderkey"),
    )
    probes = o.select(
        "o_custkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 15 DAYS")).alias("ts"),
        F.lit(1).alias("typ"),
        F.col("o_orderkey").alias("tiebreak"),
        F.lit(None).cast("string").alias("v_priority"),
        F.col("o_orderkey").alias("p_orderkey"),
    )
    wpit = (
        Window.partitionBy("o_custkey")
        .orderBy("ts", "typ", "tiebreak")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = versions.unionByName(probes).withColumn(
        "priority_at_probe", F.last("v_priority", ignorenulls=True).over(wpit)
    )
    return merged.where(F.col("typ") == 1).select(
        F.col("p_orderkey").alias("o_orderkey"),
        "o_custkey",
        F.col("ts").alias("probe_ts"),
        "priority_at_probe",
    )


_BASKET_TOP_K = 20


@register(
    "stats_market_basket",
    oracle=f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs
GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a, part_b
LIMIT {_BASKET_TOP_K}
""",
    doc="Market-basket co-occurrence (the frequent-pair half of "
    "association mining): support = number of ORDERS containing both "
    "parts (distinct parts per basket first — true support, not "
    "line-item multiplicity), top-k with a deterministic tiebreak. "
    "Pairs are generated from each basket's sorted item ARRAY (one "
    "groupBy on the order key, pair explosion in-expression — the "
    "same posting-list shape as the shingle index), so the plan has "
    "ONE full-width exchange where the naive self-join shuffles the "
    "fact twice; the quadratic term stays bounded by basket width "
    "(≤7 items → ≤21 pairs). Measured 15% faster than the self-join "
    "form at bench scale.",
)
def stats_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    lists = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    # Pairs ride the support aggregate's exchange as ONE long each —
    # (a << 32) | b, a < b by the array sort — instead of a two-field
    # struct (guide §2.3 narrower types; the same encoding
    # graph_triangle_count and graph_common_neighbors carry, with the
    # same safety bound: partkey is positive and < 2^32 at any
    # realistic SF). Decoded after the count so the exchange and the
    # hash aggregate both work on primitive longs. Interleaved A/B at
    # sf0.1: 1.91 s → 1.65 s median, identical ordered rows.
    pair_longs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.shiftleft(x, 32) + y,
            ),
        )
    )
    return (
        lists.select(F.explode(pair_longs).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.shiftright("p", 32).alias("part_a"),
            F.col("p").bitwiseAND(F.lit(0xFFFFFFFF)).alias("part_b"),
            "n_orders",
        )
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(_BASKET_TOP_K)
    )


@register(
    "stats_median_abs_deviation",
    oracle="""
WITH med AS (
    SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS m
    FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       ROUND(ANY_VALUE(med.m), 9) AS median_qty,
       ROUND(quantile_cont(ABS(l.l_quantity - med.m), 0.5), 9) AS mad_qty
FROM lineitem l JOIN med USING (l_returnflag)
GROUP BY l.l_returnflag
""",
    doc="Median absolute deviation per group — the robust dispersion "
    "measure outliers cannot poison (stddev's breakdown point is 0%; "
    "MAD's is 50%). Two exact-median passes: the per-group median "
    "(O(groups) rows) broadcasts back onto the fact for the absolute "
    "deviations, then a second exact quantile. Both engines "
    "interpolate quantile_cont identically on doubles, rounded to 9 "
    "to absorb formula-order bit noise. At 100 TB the exact medians "
    "would swap for the two-pass histogram trick agg_median_twopass "
    "demonstrates — same join topology.",
)
def stats_median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("m")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.any_value("m"), 9).alias("median_qty"),
            F.round(
                F.percentile(F.abs(F.col("l_quantity") - F.col("m")), F.lit(0.5)),
                9,
            ).alias("mad_qty"),
        )
    )


# ------------------------------------------------- Count-Min sketch

# D pairwise-independent hash rows h_d(k) = ((a·k + b) mod P) mod W,
# P = 2^31 − 1 (Mersenne prime). Affine-mod hashing is exactly
# expressible in BOTH engines' bigint arithmetic (unlike xxhash64,
# whose seed is not exposed cross-engine), so the sketch — normally a
# probabilistic structure — is bit-identical to the oracle here.
_CMS_W = 256
_CMS_P = 2_147_483_647
_CMS_HASHES = [
    (1_299_721, 104_729),
    (15_485_863, 32_452_843),
    (49_979_687, 67_867_967),
    (86_028_121, 98_765_431),
]
_CMS_TOPK = 20

_CMS_VALUES = ", ".join(
    f"({d}, {a}, {b})" for d, (a, b) in enumerate(_CMS_HASHES)
)

_CMS_SQL = f"""
WITH k AS (SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem),
h(d, a, b) AS (SELECT * FROM (VALUES {_CMS_VALUES})),
pairs AS (
  SELECT k.k, h.d, ((h.a * k.k + h.b) % {_CMS_P}) % {_CMS_W} AS cell
  FROM k, h
),
cells AS (SELECT d, cell, COUNT(*) AS c FROM pairs GROUP BY d, cell),
tc AS (SELECT k, COUNT(*) AS true_cnt FROM k GROUP BY k),
top AS (SELECT k, true_cnt FROM tc ORDER BY true_cnt DESC, k LIMIT {_CMS_TOPK}),
cand AS (
  SELECT t.k, t.true_cnt, h.d,
         ((h.a * t.k + h.b) % {_CMS_P}) % {_CMS_W} AS cell
  FROM top t, h
)
SELECT cand.k AS l_partkey, cand.true_cnt, MIN(cells.c) AS cms_estimate
FROM cand JOIN cells ON cells.d = cand.d AND cells.cell = cand.cell
GROUP BY cand.k, cand.true_cnt
"""


@register(
    "stats_countmin_heavy_hitters",
    oracle=_CMS_SQL,
    doc=f"Count-Min sketch ({len(_CMS_HASHES)}x{_CMS_W} cells, "
    "affine-mod hashes) over lineitem part frequencies, evaluated on "
    f"the true top-{_CMS_TOPK} heavy hitters: estimate = min over the "
    "key's D cells, always >= the true count (one-sided error). The "
    "100 TB shape: one explode+hash aggregate compresses the whole "
    "stream to D*W = 1k cells — a broadcastable summary — and "
    "candidate estimation is a broadcast join, so frequency queries "
    "never re-scan the fact table. The true-count comparison column "
    "exists to expose the sketch's overcount; at scale you keep only "
    "the sketch. Deterministic cross-engine because the hashes are "
    "plain bigint arithmetic (see constants above).",
)
def stats_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("bigint").alias("k")
    )

    def hash_pairs(k):
        return F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    (
                        ((F.lit(a) * k + F.lit(b)) % F.lit(_CMS_P))
                        % F.lit(_CMS_W)
                    ).alias("cell"),
                )
                for d, (a, b) in enumerate(_CMS_HASHES)
            ]
        )

    cells = (
        li.select(F.explode(hash_pairs(F.col("k"))).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "k")
        .limit(_CMS_TOPK)
    )
    cand = top.select(
        "k", "true_cnt", F.explode(hash_pairs(F.col("k"))).alias("p")
    ).select("k", "true_cnt", F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
    return (
        cand.join(F.broadcast(cells), ["d", "cell"])
        .groupBy("k", "true_cnt")
        .agg(F.min("c").alias("cms_estimate"))
        .select(F.col("k").alias("l_partkey"), "true_cnt", "cms_estimate")
    )
