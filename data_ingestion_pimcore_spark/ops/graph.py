"""Iterative graph operators over a customer↔supplier trade graph:
fixed-iteration PageRank and multi-source BFS min-hop distances.

The graph: one undirected edge per distinct (customer, supplier) pair
that traded (orders ⋈ lineitem), encoded as directed edges both ways.
Node ids are disjoint integers (customer → 2k, supplier → 2k+1) so the
oracle can rebuild the identical graph in pure SQL.

Scale design (SURVEY §2.3 extension surface):

* Both algorithms are rounds of *equi-joins on the edge key* — the
  canonical Pregel-as-join shape. Each round shuffles edges once on
  ``src``; no crossJoin, no driver-side adjacency. At 100 TB the edge
  table is pre-bucketed on ``src`` so every round reuses one exchange.
* ``localCheckpoint(eager=False)`` truncates the lineage each round so
  the plan stays O(1) instead of O(rounds) (same pattern as
  ``dedup_connected_components``, ops/dedup.py).
* PageRank contributions ``rank/outdeg`` are IEEE-divided in double
  (bit-identical across engines), then summed EXACTLY as
  DECIMAL(25,15) per `_det`'s order-insensitivity rule, so the result
  is bit-identical to the unrolled-CTE DuckDB oracle regardless of
  partitioning.
* BFS keeps only the frontier per round (anti-join against visited):
  traffic is O(frontier edges), not O(all pairs); 4 rounds bound the
  work like the reference bounds retries — explicit, not data-driven.

Reference parity: the reference has no graph surface (SURVEY §2.2 —
"Joins: No"); these extend the engine's beyond-reference inventory
alongside triangle counting (analytics.py) and connected components
(dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

_N_ITER = 3
_MAX_HOPS = 4

# Node-sized tables (rank contribs, labels, frontier, visited) are
# broadcast into the per-round edge joins only while they plausibly
# fit executor/driver memory. Above this row count the hint is
# dropped AUTOMATICALLY and each round degrades to the edge-key
# shuffle join the docstrings describe (round-7 advice: the
# hard-coded hint overrode autoBroadcastJoinThreshold
# unconditionally, so at large |V| the 'degrade' required a code
# edit — now it's a data-driven gate). 4M rows × ~24 B built ≈
# 100 MB, well under executor budgets here while far beyond every
# measured point where broadcast still beats shuffle (BASELINE.md
# records the 1× and 10× A/B readings).
NODE_BROADCAST_LIMIT = 4_000_000


def _bcast_nodes(df: DataFrame, n_nodes: int) -> DataFrame:
    """Broadcast hint gated on the measured node count."""
    return F.broadcast(df) if n_nodes <= NODE_BROADCAST_LIMIT else df


def _node_count_bound(spark: SparkSession, sf_dir: str) -> int:
    """Upper bound on |V| of the trade graph: every node is a customer
    or a supplier, so customers + suppliers bounds the node count.
    Both counts are metadata-only parquet jobs (row counts from file
    footers, no data scan), where the exact ``deg.count()`` the r11
    code used to size the broadcast gate cost a full graph
    materialization job per query (guide §1.2: don't compute things
    you throw away). An upper bound is the conservative direction for
    a broadcast gate: it can only drop the hint early, never broadcast
    something bigger than measured.

    Synthetic graph fixtures ship only orders+lineitem; there the
    (coarser but equally metadata-only) bound is one custkey per order
    row plus one suppkey per lineitem row."""
    try:
        return (
            load(spark, sf_dir, "customer").count()
            + load(spark, sf_dir, "supplier").count()
        )
    except Exception:
        return (
            load(spark, sf_dir, "orders").count()
            + load(spark, sf_dir, "lineitem").count()
        )

# Shared SQL fragments: the bidirected trade graph and its out-degrees.
_SQL_GRAPH = """
edges AS (
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
bi AS (
    SELECT src, dst FROM edges
    UNION
    SELECT dst AS src, src AS dst FROM edges
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM bi GROUP BY src)
"""


def _trade_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(bidirected edge DataFrame, out-degree DataFrame).

    The build joins the slim 2-column orders projection to lineitem.
    Broadcasting the orders side removes the build's largest exchange
    (measured −24% on the whole query); at a scale where orders stops
    fitting a broadcast, drop the hint and bucket both fact tables on
    the order key instead — the rest of the algorithm is unchanged.
    """
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        lineitem.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    bi = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = bi.groupBy("src").agg(F.count("*").alias("outdeg"))
    return bi, deg


def _pagerank_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank round (DuckDB CTE body)."""
    return f"""
{out} AS (
    SELECT b.dst AS node,
           CAST(0.15 AS DOUBLE)
             + CAST(0.85 AS DOUBLE)
               * CAST(SUM(CAST(r.rank / d.outdeg AS DECIMAL(25,15)))
                      AS DOUBLE) AS rank
    FROM bi b
    JOIN {prev} r ON b.src = r.node
    JOIN deg d ON b.src = d.src
    GROUP BY b.dst
)"""


_PAGERANK_SQL = (
    "WITH "
    + _SQL_GRAPH
    + ", r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS rank FROM deg),"
    + ",".join(_pagerank_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_N_ITER))
    + f"""
SELECT node, ROUND(rank, 12) AS rank
FROM r{_N_ITER}
"""
)


@register(
    "graph_pagerank",
    oracle=_PAGERANK_SQL,
    doc=f"PageRank ({_N_ITER} synchronous rounds, damping 0.85) on the "
    "bidirected customer↔supplier trade graph. Each round is one "
    "shuffle-join of the edge table with the current rank vector plus "
    "a hash aggregate on dst — the Pregel-as-join shape that scales "
    "linearly in edges. Contributions divide in IEEE double and sum "
    "as DECIMAL(25,15), so three rounds stay bit-identical to the "
    "unrolled-CTE oracle. Lineage truncated per round via "
    "localCheckpoint. Beyond-reference surface (SURVEY §2.2 has no "
    "graph ops).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-round contributions are computed NODE-side (ranks ⋈ degrees,
    # |V| rows) and broadcast into the edge join, instead of joining
    # degrees onto the |E|-row edge table every round — one edge join
    # per round, zero edge shuffles. A/B interleaved at sf0.1: 3.37 s
    # vs 3.62 s steady min and far less first-run variance (3.8 s vs
    # 6.7 s). Past NODE_BROADCAST_LIMIT the _bcast_nodes gate drops
    # the hint automatically — the plan degrades to ONE shuffle join
    # per round on src, still better than the two-join edge-side
    # shape. Division
    # rank/outdeg happens once per node instead of once per edge: the
    # identical IEEE value replicated, so the decimal contribution sum
    # is unchanged (bit-identical to the unrolled-CTE oracle).
    #
    # r12: the per-round localCheckpoint is GONE. _N_ITER is a fixed 3,
    # so the un-truncated plan is a bounded 3-level tree — and every
    # round's output has exactly ONE consumer (the next round's
    # contrib join), so nothing is recomputed: each broadcast exchange
    # materializes its subtree once per execution. Dropping the three
    # materialization jobs + the deg.count() sizing job (now a
    # metadata-only bound) measured 2.36 s vs 3.42 s interleaved at
    # sf0.1, bit-identical output (guide §1.2 / §2.4: fewer jobs,
    # fewer materialization passes). Loops with DATA-DEPENDENT round
    # counts (k-core) or multi-consumer round state (BFS) keep their
    # checkpoints — this is safe only because rounds are few, fixed,
    # and single-consumer.
    bi, deg = _trade_graph(spark, sf_dir)
    n_nodes = _node_count_bound(spark, sf_dir)
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("rank"))
    for _ in range(_N_ITER):
        rankdeg = ranks.join(deg, F.col("node") == F.col("src")).select(
            F.col("node").alias("csrc"),
            (F.col("rank") / F.col("outdeg")).alias("contrib"),
        )
        ranks = (
            bi.join(_bcast_nodes(rankdeg, n_nodes), F.col("src") == F.col("csrc"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(0.15)
                    + F.lit(0.85)
                    * F.sum(F.col("contrib").cast("decimal(25,15)")).cast(
                        "double"
                    )
                ).alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
        )
    return ranks.select("node", F.round("rank", 12).alias("rank"))


_BFS_SQL = (
    "WITH RECURSIVE "
    + _SQL_GRAPH
    + f""",
seeds AS (
    SELECT DISTINCT c_custkey * 2 AS node FROM customer WHERE c_nationkey = 1
),
walk(node, hop) AS (
    SELECT node, 0 FROM seeds
    UNION
    SELECT b.dst, w.hop + 1
    FROM walk w JOIN bi b ON b.src = w.node
    WHERE w.hop < {_MAX_HOPS}
)
SELECT node, CAST(MIN(hop) AS INTEGER) AS hops
FROM walk
GROUP BY node
"""
)


@register(
    "graph_bfs_hops",
    oracle=_BFS_SQL,
    doc=f"Multi-source BFS: min-hop distance (≤{_MAX_HOPS}) from every "
    "nation-1 customer over the trade graph. Frontier expansion is a "
    "join + distinct + anti-join-against-visited per round, so each "
    "round's shuffle is O(frontier edges) — the standard distributed "
    "BFS; visited/frontier are localCheckpointed so lineage stays "
    "O(1). Oracle is a recursive CTE with min-hop aggregation.",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    bi, _deg = _trade_graph(spark, sf_dir)
    # Frontier/visited are bounded by |V|: the metadata-only customer+
    # supplier row-count bound sizes both broadcast gates below
    # (NODE_BROADCAST_LIMIT degrade) — the old deg.count() paid a full
    # graph-build job just to size a hint. BFS KEEPS its per-round
    # localCheckpoints: visited has two consumers per round (anti-join
    # probe + union) and nxt two (union + next frontier), so without
    # truncation each would recompute.
    n_nodes = _node_count_bound(spark, sf_dir)
    customer = load(spark, sf_dir, "customer")
    seeds = (
        customer.where(F.col("c_nationkey") == 1)
        .select((F.col("c_custkey") * 2).alias("node"))
        .distinct()
    )
    # Frontier and visited are node-sized (≤|V|) while bi is edge-sized:
    # broadcasting both into the expansion keeps every round's edge scan
    # map-side (no edge shuffle). A/B interleaved at sf0.1: 2.40 s vs
    # 2.74 s min, identical results. On a graph whose node count
    # exceeds NODE_BROADCAST_LIMIT both _bcast_nodes gates drop their
    # hints automatically — the plan degrades to the standard
    # O(frontier edges) shuffle joins this docstring describes.
    visited = seeds.withColumn("hops", F.lit(0)).localCheckpoint(eager=False)
    frontier = visited.select("node")
    for k in range(1, _MAX_HOPS + 1):
        nxt = (
            bi.join(_bcast_nodes(frontier, n_nodes), F.col("src") == F.col("node"))
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(
                _bcast_nodes(visited.select(F.col("node").alias("vn")), n_nodes),
                F.col("node") == F.col("vn"),
                "left_anti",
            )
            .withColumn("hops", F.lit(k))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return visited.select("node", F.col("hops").cast("int").alias("hops"))


# ------------------------------------------ common-neighbor projection

CN_DF_CAP = 128  # stop-customer cap: a degree-L customer yields L^2 pairs
CN_TOPK = 50


@register(
    "graph_common_neighbors",
    oracle=f"""
WITH el AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
deg AS (SELECT s, COUNT(*) AS d FROM el GROUP BY s),
keep AS (SELECT c FROM el GROUP BY c HAVING COUNT(*) <= {{CN_DF_CAP}}),
pairs AS (
  SELECT a.s AS supp_a, b.s AS supp_b, COUNT(*) AS shared
  FROM el a JOIN el b ON a.c = b.c AND a.s < b.s
  JOIN keep k ON k.c = a.c
  GROUP BY a.s, b.s
)
SELECT p.supp_a, p.supp_b,
       CAST(p.shared AS BIGINT) AS shared_customers,
       CAST(p.shared AS DOUBLE) / (da.d + db.d - p.shared) AS jaccard
FROM pairs p
JOIN deg da ON da.s = p.supp_a
JOIN deg db ON db.s = p.supp_b
ORDER BY jaccard DESC, supp_a, supp_b
LIMIT {{CN_TOPK}}
""".format(CN_DF_CAP=CN_DF_CAP, CN_TOPK=CN_TOPK),
    doc="Bipartite one-mode projection with common-neighbor Jaccard — "
    "the classic link-prediction / similarity score: two suppliers "
    "are similar when they share customers; report the top-50 "
    "strongest pairs (deterministic tiebreak on ids). Same capped "
    "posting-list shape as dedup_ngram_jaccard transplanted to the "
    "trade graph: per-customer supplier lists generate pairs "
    f"in-array, customers with more than {CN_DF_CAP} suppliers are "
    "stop-nodes dropped before pair generation (a degree-L hub "
    "yields L^2 pairs under ANY exact algorithm — the projection's "
    "skew bound), denominators keep uncapped true degrees. All "
    "counts integer; one row-local double division; the top-k "
    "compiles to TakeOrderedAndProject, no global sort.",
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    el = (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)  # referenced by lists AND degrees
    )
    deg = el.groupBy("s").agg(F.count("*").alias("d"))
    # repartition BEFORE the quadratic pair fan-out: the lists
    # aggregate's output is tiny (one row per customer), so AQE
    # coalesces it to ~one partition — and the O(L²)-per-row explode
    # below then runs single-threaded (the late-projection trap from
    # the verify recipe, here manifesting post-exchange). One cheap
    # round-robin exchange of the list rows unlocks the full shuffle
    # width for the expensive stage (guide §2.5 input-skew fix).
    # Interleaved A/B at sf0.1: 6.85 s → 3.18 s. At cluster scale the
    # lists table is large and the exchange stays proportionally
    # negligible next to the pair fan-out it parallelizes.
    lists = (
        el.groupBy("c")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
        .where((F.size("ss") > 1) & (F.size("ss") <= CN_DF_CAP))
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions"))
        )
    )
    # Pairs ride as ONE long each — (a << 32) | b — instead of a
    # two-field struct: primitive-array explode + long hash-agg keys
    # beat struct rows measurably (interleaved A/B on top of the
    # repartition: 3.18 s → 2.82 s; guide §2.3 narrower types).
    # Safe: TPC-H suppkey is positive and < 2^32 at any realistic SF
    # (10k per SF unit → 2^32 would need SF ~400k, a 400 PB dataset).
    pair_longs = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + F.lit(2), F.size(F.col("ss"))),
                lambda y: F.shiftleft(x, 32) + y,
            ),
        )
    )
    pairs = (
        lists.select(F.explode(pair_longs).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("shared"))
        .select(
            F.shiftright("p", 32).alias("supp_a"),
            F.col("p").bitwiseAND(F.lit(0xFFFFFFFF)).alias("supp_b"),
            "shared",
        )
    )
    da = deg.select(F.col("s").alias("supp_a"), F.col("d").alias("da"))
    db = deg.select(F.col("s").alias("supp_b"), F.col("d").alias("db"))
    jac = F.col("shared").cast("double") / (
        F.col("da") + F.col("db") - F.col("shared")
    )
    return (
        pairs.join(da, "supp_a")
        .join(db, "supp_b")
        .select(
            "supp_a",
            "supp_b",
            F.col("shared").cast("long").alias("shared_customers"),
            jac.alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "supp_a", "supp_b")
        .limit(CN_TOPK)
    )


# ------------------------------------------------- label propagation

_LPA_ROUNDS = 2


def _lpa_round_sql(prev: str, out: str) -> str:
    """One synchronous LPA round (DuckDB CTE body): each node takes the
    most frequent label among its neighbors, ties to the SMALLEST
    label — the total-order tie-break that makes LPA deterministic."""
    return f"""
n_{out} AS (
    SELECT b.src AS v, l.lbl, COUNT(*) AS c
    FROM bi b JOIN {prev} l ON l.v = b.dst
    GROUP BY b.src, l.lbl
),
{out} AS (
    SELECT v, lbl FROM (
        SELECT v, lbl,
               ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn
        FROM n_{out}
    ) WHERE rn = 1
)"""


_LPA_SQL = (
    "WITH "
    + _SQL_GRAPH
    + ", l0 AS (SELECT src AS v, src AS lbl FROM deg),"
    + ",".join(_lpa_round_sql(f"l{i}", f"l{i + 1}") for i in range(_LPA_ROUNDS))
    + f"""
SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM l{_LPA_ROUNDS}
GROUP BY lbl
"""
)


@register(
    "graph_label_propagation",
    oracle=_LPA_SQL,
    doc=f"Community detection by synchronous label propagation over "
    f"the trade graph, {_LPA_ROUNDS} rounds: every node adopts the "
    "most frequent label among its neighbors, ties broken to the "
    "smallest label — the deterministic total-order variant (classic "
    "LPA's random tie-break makes runs incomparable; min-label ties "
    "keep the result a pure function of the graph, hence a full hash "
    "oracle). Each round is the Pregel-as-join shape the module's "
    "header describes: one equi-join of edges to the label table on "
    "dst, one (node,label) count aggregate, one max_by per node — "
    "all shuffles on the edge/node key, no adjacency materialized, "
    "lineage truncated per round. max_by(struct(c, -lbl)) compiles "
    "the argmax+tie-break into a single aggregate (no window over "
    "the neighbor-label table).",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    bi, deg = _trade_graph(spark, sf_dir)
    # Metadata-only broadcast gate (see _node_count_bound); r12 also
    # drops the per-round localCheckpoint for the same reason as
    # graph_pagerank: _LPA_ROUNDS is a fixed 2 and each round's label
    # table has exactly one consumer, so the un-truncated plan is a
    # bounded 2-level tree with zero recompute.
    n_nodes = _node_count_bound(spark, sf_dir)
    labels = deg.select(F.col("src").alias("v"), F.col("src").alias("lbl"))
    for _ in range(_LPA_ROUNDS):
        # The label table is |V| rows (node, label) — broadcast it into
        # the edge join like pagerank's contribs and BFS' frontier:
        # interleaved A/B at sf0.1 (16k nodes / 1.17M edges) measured
        # 2.4-3.1 s shuffle-join vs 1.4-1.7 s broadcast per run. Past
        # NODE_BROADCAST_LIMIT the _bcast_nodes gate drops the hint and
        # the plan degrades to the edge-key shuffle join automatically.
        nbr = (
            bi.join(_bcast_nodes(labels, n_nodes), bi["dst"] == labels["v"])
            .groupBy(bi["src"].alias("node"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        # argmax count, tie -> smallest label: max of (c, -lbl)
        labels = (
            nbr.groupBy("node")
            .agg(
                F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))).alias(
                    "best"
                )
            )
            .select(
                F.col("node").alias("v"), (-F.col("best.neg")).alias("lbl")
            )
        )
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count("*").cast("long").alias("n_nodes")
    )


# ------------------------------------------------------ k-core peeling

KCORE_K = 8
KCORE_ROUNDS = 12


def _kcore_round_sql(prev: str, out: str) -> str:
    """One peeling round (DuckDB CTE body): drop nodes with degree <
    k, keep only edges between survivors. Each round's edge set is
    MATERIALIZED: every round references its predecessor three times,
    so inlined CTEs would expand 3^rounds scans — at the 12-round cap
    that's half a million parquet opens. Materialization makes the
    unrolled oracle O(rounds), same as the engine loop."""
    return f"""
{out} AS MATERIALIZED (
    SELECT e.src, e.dst FROM {prev} e
    JOIN (SELECT src FROM {prev} GROUP BY src
          HAVING COUNT(*) >= {KCORE_K}) a ON a.src = e.src
    JOIN (SELECT src FROM {prev} GROUP BY src
          HAVING COUNT(*) >= {KCORE_K}) b ON b.src = e.dst
)"""


_KCORE_SQL = (
    "WITH "
    + _SQL_GRAPH
    + ", e0 AS MATERIALIZED (SELECT src, dst FROM bi),"
    + ",".join(
        _kcore_round_sql(f"e{i}", f"e{i + 1}") for i in range(KCORE_ROUNDS)
    )
    + f"""
SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_core_nodes,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_core_edges
FROM e{KCORE_ROUNDS}
"""
)


def _kcore_peel(edges: DataFrame, k: int, max_rounds: int) -> tuple[DataFrame, int]:
    """Peel until the edge set stops changing or the round cap hits.

    Convergence is detected by the same order-independent edge-set
    fingerprint (COUNT + BIT_XOR of xxhash64) the star connected-
    components loop uses (ops/dedup._edge_fingerprint) — one extra
    single-job aggregate per round buys an exact fixpoint on any graph
    the cap reaches, so the cap is a safety BOUND, not the termination
    rule. A converged round is idempotent, so stopping at fingerprint
    repeat equals running every remaining round. Returns (core edges,
    rounds actually executed)."""
    from data_ingestion_pimcore_spark.ops.dedup import (
        _CC_DRIVER_EDGE_LIMIT,
        _edge_fingerprint,
    )

    fp = _edge_fingerprint(edges)
    rounds = 0
    for _ in range(max_rounds):
        if fp[0] == 0:  # already empty — nothing left to peel
            break
        if fp[0] <= _CC_DRIVER_EDGE_LIMIT:
            # r13 (r12 verdict item 6): once the surviving edge set fits
            # the same bounded-collect gate the CC driver fast path uses
            # (~8192 edges ≈ 128 KB), the remaining rounds are pure job
            # overhead — each distributed round costs 1 aggregate + 2
            # joins + 1 fingerprint job to contract a driver-page-sized
            # graph. The gate check reuses the fingerprint count the
            # loop already computes (zero extra jobs); the driver peel
            # below runs the IDENTICAL round rule to the same remaining-
            # round cap, so early rounds distributed + tail rounds on
            # the driver equals running every round distributed. At
            # bench scale the k=8 trade-graph core never dwindles below
            # the gate (probe: 1.17M edges at sf0.1, fixpoint in 2
            # rounds), so this branch is exercised by the synthetic-
            # graph pytest pin, not the bench.
            return _kcore_peel_driver(edges, k, max_rounds - rounds, rounds)
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        # keep has TWO consumers (the src and dst survivor joins) and
        # Spark plans the degree aggregate once per reference —
        # checkpoint so the node-sized survivor set is computed once
        # per round (interleaved whole-loop A/B at sf0.1: ~10.2 s →
        # ~4.7 s median; final edge fingerprints identical).
        keep = (
            deg.where(F.col("deg") >= k)
            .select("src")
            .localCheckpoint(eager=False)
        )
        edges = (
            edges.join(keep.withColumnRenamed("src", "u"), edges["src"] == F.col("u"))
            .drop("u")
            .join(keep.withColumnRenamed("src", "u"), edges["dst"] == F.col("u"))
            .drop("u")
            .localCheckpoint(eager=False)
        )
        rounds += 1
        new_fp = _edge_fingerprint(edges)
        if new_fp == fp:
            break
        fp = new_fp
    return edges, rounds


def _kcore_peel_driver(
    edges: DataFrame, k: int, rounds_left: int, rounds_done: int
) -> tuple[DataFrame, int]:
    """Finish the peel on the driver for a gate-bounded edge set: the
    same per-round rule (drop nodes with current degree < k, keep edges
    between survivors) over the collected bidirected edge list, capped
    at the SAME remaining round budget so the result is identical to
    running those rounds distributed. Edge sets only shrink, so a
    stable count is a fixpoint. Returns the surviving edges as an
    inline ``VALUES`` relation (never ``createDataFrame`` — Python-RDD-
    backed relations re-fork workers per evaluating job)."""
    es = [(int(r["src"]), int(r["dst"])) for r in edges.collect()]
    rounds = rounds_done
    for _ in range(rounds_left):
        if not es:
            break
        deg: dict[int, int] = {}
        for s, _d in es:
            deg[s] = deg.get(s, 0) + 1
        keep = {n for n, c in deg.items() if c >= k}
        nxt = [(s, d) for s, d in es if s in keep and d in keep]
        rounds += 1
        if len(nxt) == len(es):
            break
        es = nxt
    spark = edges.sparkSession
    if not es:
        return (
            spark.sql(
                "SELECT * FROM VALUES (0L, 0L) AS t(src, dst) WHERE 1 = 0"
            ),
            rounds,
        )
    values = ",".join(f"({s}L,{d}L)" for s, d in es)
    return (
        spark.sql(f"SELECT * FROM VALUES {values} AS t(src, dst)"),
        rounds,
    )


@register(
    "graph_k_core",
    oracle=_KCORE_SQL,
    doc=f"k-core peeling (k={KCORE_K}): each round drops nodes whose "
    "CURRENT degree is below k and keeps only edges between survivors "
    "— the standard densest-region extractor (spam rings, core "
    "community mining). The loop runs to the exact fixpoint, detected "
    "by edge-set fingerprint repeat (COUNT + BIT_XOR of xxhash64, the "
    "same convergence test as dedup_connected_components_star), with "
    f"KCORE_ROUNDS={KCORE_ROUNDS} as a safety BOUND only — a "
    "converged round is idempotent, so early-stop equals running "
    "every remaining round, and the unrolled-CTE oracle at the cap "
    "agrees wherever the fixpoint is reached within it (adversarial "
    "chains needing O(n) rounds would need the cap raised — the one "
    "remaining documented bound, same contract as BFS' hop cap). Each "
    "round is one degree aggregate plus two semi-join-shaped equi "
    "joins on the edge endpoints plus one fingerprint aggregate; "
    "lineage truncates per round.",
)
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    bi, _deg = _trade_graph(spark, sf_dir)
    edges, _rounds = _kcore_peel(bi, KCORE_K, KCORE_ROUNDS)
    return edges.agg(
        F.countDistinct("src").cast("long").alias("n_core_nodes"),
        (F.count("*") / 2).cast("long").alias("n_core_edges"),
    )
