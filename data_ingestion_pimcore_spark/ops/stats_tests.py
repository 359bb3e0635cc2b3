"""Statistical hypothesis tests and distribution analytics: chi-square
independence, two-sample Kolmogorov–Smirnov, degree distribution of the
trade graph, and exponentially-weighted recency smoothing.

These close out the "statistics a warehouse analyst expects" family
(SURVEY §2.2 beyond-reference analytics, next to stats_regression /
stats_histogram / stats_skew_kurtosis in ops/analytics.py). Reference
parity: the reference computes no statistics beyond record counts
(/root/reference/app/services/json_reader.py:92 keeps a running total);
everything here is engine-mandated extension surface.

Scale design:

* Chi-square reduces to ONE hash aggregate over the contingency cells
  (cardinality = |priority| x |status|, tiny regardless of input size)
  followed by windows over that tiny cell table — marginals never touch
  the fact table again, so the whole test costs one map-side-combined
  shuffle at any SF.
* The KS statistic needs a global ECDF, which naively means a global
  sort. Instead: pre-aggregate per distinct value (first shuffle,
  combiner-friendly), range-repartition the distinct values, compute
  per-partition prefix sums, and add broadcast per-partition offsets —
  the same distributed prefix-sum shape as reshape_shuffle_global, so
  no single-task sort anywhere. The 32-row offset table is the only
  driver-independent serial step.
* EWMA weights for a bounded horizon (last 8 events/user) are exact
  decimal literals — no cross-engine Math.pow hazard — and the fold
  becomes one weighted sum per user: window + aggregate share a single
  hash partitioning on user_id (one shuffle total, AQE reuses the
  exchange).
* Degree distribution reuses the shared trade-graph builder
  (ops/graph.py): a groupBy on the already-aggregated degree table.

Cross-engine determinism: counts are integers; every double division
is a single row-local IEEE op; every sum of doubles goes through the
exact-decimal trick (`_det`); weights are exact decimals. Results are
bit-identical to the DuckDB oracles regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

# ----------------------------------------------------------- chi-square

_CHI2_SQL = """
WITH obs AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS obs
  FROM orders GROUP BY o_orderpriority, o_orderstatus
),
cell AS (
  SELECT obs,
         o_orderpriority,
         o_orderstatus,
         SUM(obs) OVER (PARTITION BY o_orderpriority) AS rt,
         SUM(obs) OVER (PARTITION BY o_orderstatus) AS ct,
         SUM(obs) OVER () AS n
  FROM obs
)
SELECT
  ROUND(CAST(SUM(CAST(
      (obs - CAST(rt * ct AS DOUBLE) / n) * (obs - CAST(rt * ct AS DOUBLE) / n)
      / (CAST(rt * ct AS DOUBLE) / n)
    AS DECIMAL(25,12))) AS DOUBLE), 6) AS chi2,
  (COUNT(DISTINCT o_orderpriority) - 1)
    * (COUNT(DISTINCT o_orderstatus) - 1) AS dof,
  CAST(SUM(obs) AS BIGINT) AS n
FROM cell
"""


@register(
    "stats_chi_square",
    oracle=_CHI2_SQL,
    doc="Chi-square test of independence between order priority and "
    "order status. One hash aggregate builds the contingency table "
    "(tiny: |priority| x |status| cells); marginals and the grand "
    "total come from windows over that cell table, so the fact table "
    "is scanned exactly once at any SF. Expected counts use the exact "
    "integer product rt*ct divided once in double (identical IEEE op "
    "in both engines); per-cell contributions sum via the exact-"
    "decimal trick. Cells absent from the data contribute nothing on "
    "either engine (identical construction), so parity holds even "
    "when a (priority,status) combination never occurs.",
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    obs = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("obs")
    )
    cell = (
        obs.withColumn(
            "rt", F.sum("obs").over(Window.partitionBy("o_orderpriority"))
        )
        .withColumn("ct", F.sum("obs").over(Window.partitionBy("o_orderstatus")))
        .withColumn("n", F.sum("obs").over(Window.partitionBy()))
    )
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    contrib = (F.col("obs") - exp) * (F.col("obs") - exp) / exp
    return cell.agg(
        F.round(F.sum(contrib.cast("decimal(25,12)")).cast("double"), 6).alias(
            "chi2"
        ),
        (
            (F.countDistinct("o_orderpriority") - F.lit(1))
            * (F.countDistinct("o_orderstatus") - F.lit(1))
        ).alias("dof"),
        F.sum("obs").cast("long").alias("n"),
    )


def _global_running(pts: DataFrame, value_col: str, cols: list[str]) -> DataFrame:
    """Distributed global running totals ordered by ``value_col``:
    range-repartition the (pre-aggregated, distinct-value) rows so each
    partition holds a contiguous value range, compute per-partition
    local prefix sums, and lift them to global with a broadcast 32-row
    per-partition offset table — no single-task global sort. Returns
    the input columns plus ``cum_<c>`` (inclusive running total) and
    ``tot_<c>`` (grand total) for each requested column. The range
    boundary sampling is nondeterministic, so the ranged frame is
    localCheckpointed and every cumulative derives from ONE
    materialization (partitioning never affects the returned values —
    only which partition computed them)."""
    ranged = pts.repartitionByRange(32, value_col).withColumn(
        "pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=False)
    per_part = ranged.groupBy("pid").agg(
        *[F.sum(c).alias(f"p_{c}") for c in cols]
    )
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_part.select(
        "pid",
        *[
            F.coalesce(F.sum(f"p_{c}").over(woff), F.lit(0)).alias(f"off_{c}")
            for c in cols
        ],
        *[
            F.sum(f"p_{c}").over(Window.partitionBy()).alias(f"tot_{c}")
            for c in cols
        ],
    )
    wloc = (
        Window.partitionBy("pid")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = ranged.join(F.broadcast(offsets), "pid")
    for c in cols:
        out = out.withColumn(c + "_cum", F.col(f"off_{c}") + F.sum(c).over(wloc))
    return out.select(
        *pts.columns,
        *[F.col(c + "_cum").alias(f"cum_{c}") for c in cols],
        *[F.col(f"tot_{c}") for c in cols],
    )


# ------------------------------------------------- two-sample KS test

_KS_SQL = """
WITH pts AS (
  SELECT o_totalprice AS v,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS c2
  FROM orders
  WHERE o_orderstatus IN ('F', 'O')
  GROUP BY o_totalprice
),
cum AS (
  SELECT SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum1,
         SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum2,
         SUM(c1) OVER () AS n1,
         SUM(c2) OVER () AS n2
  FROM pts
)
SELECT CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS DOUBLE)
         / (MAX(n1) * MAX(n2)) AS d_stat,
       CAST(MAX(n1) AS BIGINT) AS n1,
       CAST(MAX(n2) AS BIGINT) AS n2
FROM cum
"""


@register(
    "stats_ks_test",
    oracle=_KS_SQL,
    doc="Two-sample Kolmogorov-Smirnov statistic between the total-"
    "price distributions of finished ('F') and open ('O') orders: "
    "D = sup over observed values of |ECDF_F - ECDF_O|, evaluated at "
    "every distinct value from either sample (ties folded by the "
    "per-value pre-aggregate, so the supremum is exact). The global "
    "cumulative is a distributed prefix sum — per-value counts are "
    "range-repartitioned, each partition computes local prefix sums, "
    "and a broadcast 32-row per-partition offset table lifts them to "
    "global — the same shape as reshape_shuffle_global, with no "
    "single-task global sort. The oracle's single-threaded window is "
    "semantically identical. All cumulative values are exact "
    "integers and the supremum is taken over the exact integer "
    "numerator |cum1*n2 - cum2*n1|; one final double division.",
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderstatus")
    pts = (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(F.col("o_totalprice").alias("v"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("c2"),
        )
    )
    run = _global_running(pts, "v", ["c1", "c2"])
    cum = run.select(
        F.col("cum_c1").alias("cum1"),
        F.col("cum_c2").alias("cum2"),
        F.col("tot_c1").alias("n1t"),
        F.col("tot_c2").alias("n2t"),
    )
    # The supremum is taken over EXACT integers |cum1*n2 - cum2*n1|
    # (the common-denominator numerator of |F1 - F2|), then divided
    # ONCE in double — a single correctly-rounded IEEE op on both
    # engines, so no double-ROUND tie hazard can arise.
    return cum.agg(
        (
            F.max(
                F.abs(F.col("cum1") * F.col("n2t") - F.col("cum2") * F.col("n1t"))
            ).cast("double")
            / (F.max("n1t") * F.max("n2t"))
        ).alias("d_stat"),
        F.max("n1t").cast("long").alias("n1"),
        F.max("n2t").cast("long").alias("n2"),
    )


# ------------------------------------------------ degree distribution

_DEGREE_SQL = """
WITH edges AS (
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
bi AS (
    SELECT src, dst FROM edges
    UNION
    SELECT dst AS src, src AS dst FROM edges
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM bi GROUP BY src)
SELECT outdeg, COUNT(*) AS n_nodes FROM deg GROUP BY outdeg
"""


@register(
    "graph_degree_distribution",
    oracle=_DEGREE_SQL,
    doc="Degree distribution of the customer-supplier trade graph "
    "(same graph as graph_pagerank / graph_bfs_hops, built by the "
    "shared ops/graph.py builder with its broadcast orders join): "
    "number of nodes per degree. Two hash aggregates over the edge "
    "list; the second runs on the already-reduced per-node degree "
    "table. The skew diagnostic every graph pipeline runs before "
    "choosing join strategies — a heavy tail here is what motivates "
    "the degree-orientation in graph_triangle_count.",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import _trade_graph

    _, deg = _trade_graph(spark, sf_dir)
    return deg.groupBy("outdeg").agg(F.count("*").alias("n_nodes"))


# ------------------------------------------------------ EWMA smoothing

# Exact-decimal EWMA weights for alpha = 0.3 over the last m <= 8
# events (newest first, rank 1 = newest):
#   y = sum_{r=1}^{m-1} 0.3 * 0.7^(r-1) * x_r  +  0.7^(m-1) * x_m
# 0.7^k terminates in decimal, so the weights are EXACT literals and
# no cross-engine Math.pow / libm discrepancy can arise.
_W_MID = ["0.3", "0.21", "0.147", "0.1029", "0.07203", "0.050421", "0.0352947"]
_W_INIT = [
    "1",
    "0.7",
    "0.49",
    "0.343",
    "0.2401",
    "0.16807",
    "0.117649",
    "0.0823543",
]


def _sql_weight_case() -> str:
    mid = " ".join(
        f"WHEN rn = {r} THEN CAST({w} AS DECIMAL(10,7))"
        for r, w in enumerate(_W_MID, start=1)
    )
    init = " ".join(
        f"WHEN {m} THEN CAST({w} AS DECIMAL(10,7))"
        for m, w in enumerate(_W_INIT, start=1)
    )
    return f"CASE WHEN rn = m THEN (CASE m {init} END) {mid} END"


_EWMA_SQL = f"""
WITH ranked AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
recent AS (
  SELECT user_id, value, rn,
         COUNT(*) OVER (PARTITION BY user_id) AS m
  FROM ranked WHERE rn <= 8
)
SELECT user_id,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))
                      * ({_sql_weight_case()})), 8) AS DOUBLE) AS ewma,
       CAST(MAX(m) AS INT) AS n_used
FROM recent
GROUP BY user_id
"""


@register(
    "ts_ewma_recent",
    oracle=_EWMA_SQL,
    doc="Per-user exponentially-weighted moving average (alpha=0.3) "
    "over each user's 8 most recent event values — the classic "
    "recency feature for activity scoring. The recursion unrolls to "
    "a weighted sum whose weights are EXACT decimal literals (0.7^k "
    "terminates in decimal), so the fold is one hash aggregate with "
    "no cross-engine pow() hazard; value*weight multiplies exactly "
    "in decimal and sums exactly. Window rank and the aggregate both "
    "hash-partition on user_id, so the whole feature costs ONE "
    "shuffle; ordering ties break on event_id (microsecond ts + id, "
    "the ADVICE r03 rule).",
)
def ts_ewma_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    wrank = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        ev.withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= 8)
        .withColumn(
            "m", F.count("*").over(Window.partitionBy("user_id")).cast("int")
        )
    )
    mid_w = F.element_at(
        F.array(*[F.lit(w).cast("decimal(10,7)") for w in _W_MID]), F.col("rn")
    )
    init_w = F.element_at(
        F.array(*[F.lit(w).cast("decimal(10,7)") for w in _W_INIT]), F.col("m")
    )
    weight = F.when(F.col("rn") == F.col("m"), init_w).otherwise(mid_w)
    return recent.groupBy("user_id").agg(
        # Round IN DECIMAL (both engines: HALF_UP / half-away-from-zero
        # on the exact sum — a decimal->decimal downscale CAST would
        # TRUNCATE in DuckDB, and a double-domain ROUND has shortest-
        # repr tie hazards), then one exact decimal->double conversion
        # (units < 2^53 at scale 8).
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)") * weight), 8
        )
        .cast("double")
        .alias("ewma"),
        F.max("m").cast("int").alias("n_used"),
    )


# ------------------------------------------------ CUSUM changepoint

_CUSUM_SQL = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS h, COUNT(*) AS c
  FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)
),
series AS (
  SELECT event_type, h, c,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(c) OVER (PARTITION BY event_type) AS s,
         SUM(c) OVER (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS k
  FROM hourly
),
stat AS (
  SELECT event_type, h, n, s,
         n * run - k * s AS cusum,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(n * run - k * s) DESC, h ASC) AS r
  FROM series
)
SELECT event_type,
       STRFTIME(h, '%Y-%m-%d %H:00') AS change_hour,
       CAST(ABS(cusum) AS DOUBLE) / n AS magnitude,
       CAST(n AS BIGINT) AS n_hours
FROM stat WHERE r = 1
"""


@register(
    "ts_changepoint_cusum",
    oracle=_CUSUM_SQL,
    doc="CUSUM changepoint detection per event type over hourly volume "
    "series: the hour where the cumulative deviation from the series "
    "mean peaks. The statistic is kept EXACTLY INTEGER by scaling — "
    "cusum_k = n*run_k - k*S instead of run_k - k*(S/n) — so the "
    "argmax (tie-broken on earliest hour) is bit-deterministic with "
    "no float comparison anywhere; magnitude divides once in double "
    "at the end. One hash aggregate collapses raw events to "
    "O(types x hours); every window partitions on event_type, so the "
    "whole detector rides ONE shuffle of the tiny hourly table. The "
    "date column goes out as a formatted string (verify-recipe rule: "
    "no raw DATE/TIMESTAMP in compared output).",
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "ts")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("c"))
    wp = Window.partitionBy("event_type")
    wrun = wp.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    series = hourly.select(
        "event_type",
        "h",
        F.count("*").over(wp).alias("n"),
        F.sum("c").over(wp).alias("s"),
        F.sum("c").over(wrun).alias("run"),
        F.row_number().over(wp.orderBy("h")).alias("k"),
    )
    stat = series.withColumn(
        "cusum", F.col("n") * F.col("run") - F.col("k") * F.col("s")
    ).withColumn(
        "r",
        F.row_number().over(
            wp.orderBy(F.abs(F.col("cusum")).desc(), F.col("h").asc())
        ),
    )
    return stat.where(F.col("r") == 1).select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("change_hour"),
        (F.abs(F.col("cusum")).cast("double") / F.col("n")).alias("magnitude"),
        F.col("n").cast("long").alias("n_hours"),
    )


# ------------------------------------------------ Benford digit audit

# log10(1 + 1/d) for d = 1..9, rounded to 9 decimals and fixed as
# LITERALS: computing them at runtime would put libm log10 in the
# compared output (1-ulp cross-engine hazard, verify-recipe rule).
_BENFORD_P = [
    "0.301029996",
    "0.176091259",
    "0.124938737",
    "0.096910013",
    "0.079181246",
    "0.066946790",
    "0.057991947",
    "0.051152522",
    "0.045757491",
]

_BENFORD_SQL = f"""
WITH digits AS (
  SELECT CAST(SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders WHERE o_totalprice > 0
),
obs AS (
  SELECT digit, COUNT(*) AS observed FROM digits GROUP BY digit
),
tot AS (SELECT digit, observed, SUM(observed) OVER () AS n FROM obs)
SELECT digit,
       CAST(observed AS BIGINT) AS observed,
       CAST(CASE digit {" ".join(f"WHEN {d} THEN CAST({p} AS DECIMAL(12,9))"
                                 for d, p in enumerate(_BENFORD_P, start=1))}
            END AS DOUBLE) AS expected_p,
       CAST(observed AS DOUBLE) / n
         - CAST(CASE digit {" ".join(f"WHEN {d} THEN CAST({p} AS DECIMAL(12,9))"
                                     for d, p in enumerate(_BENFORD_P, start=1))}
                END AS DOUBLE) AS deviation
FROM tot
"""


@register(
    "stats_benford_digits",
    oracle=_BENFORD_SQL,
    doc="Benford's-law first-digit audit over order totals — the "
    "classic financial-data-quality screen. The leading digit is "
    "extracted ARITHMETICALLY: price -> DECIMAL(18,2) (correctly-"
    "rounded conversion in both engines) -> exact integer cents -> "
    "first character of the integer's decimal string, so no float "
    "formatting or log10 enters the digit key. Expected Benford "
    "probabilities are 9-decimal literals (runtime log10 would be a "
    "1-ulp libm hazard); the observed share divides once in double. "
    "One hash aggregate over the fact table; everything after runs on "
    "9 rows.",
)
def stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_totalprice")
    digit = (
        F.substring(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    obs = (
        orders.where(F.col("o_totalprice") > 0)
        .select(digit)
        .groupBy("digit")
        .agg(F.count("*").alias("observed"))
    )
    tot = obs.withColumn("n", F.sum("observed").over(Window.partitionBy()))
    p = F.element_at(
        F.array(*[F.lit(x).cast("decimal(12,9)") for x in _BENFORD_P]),
        F.col("digit"),
    ).cast("double")
    return tot.select(
        "digit",
        F.col("observed").cast("long").alias("observed"),
        p.alias("expected_p"),
        (F.col("observed").cast("double") / F.col("n") - p).alias("deviation"),
    )


# ------------------------------------------- LTTB series downsampling

LTTB_BUCKETS = 60


_LTTB_SQL = f"""
WITH pts AS (
  SELECT event_id, value AS v, epoch_us(ts) AS t
  FROM events WHERE event_type = 'click'
),
bounds AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM pts),
bk AS (
  SELECT event_id, v, t,
         ((t - tmin) * {LTTB_BUCKETS}) // (tmax - tmin + 1) AS b,
         (t - tmin) // 1000000 AS ts_rel
  FROM pts, bounds
),
m AS (
  SELECT b,
         CAST(SUM(CAST(ts_rel AS DECIMAL(25,0))) AS DOUBLE) / COUNT(*) AS mt,
         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mv,
         LAG(CAST(SUM(CAST(ts_rel AS DECIMAL(25,0))) AS DOUBLE) / COUNT(*))
           OVER (ORDER BY b) AS pt,
         LAG(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
           OVER (ORDER BY b) AS pv,
         LEAD(CAST(SUM(CAST(ts_rel AS DECIMAL(25,0))) AS DOUBLE) / COUNT(*))
           OVER (ORDER BY b) AS nt,
         LEAD(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
           OVER (ORDER BY b) AS nv
  FROM bk GROUP BY b
),
scored AS (
  SELECT bk.b, bk.event_id, bk.t, bk.v,
         ABS((m.pt - m.nt) * (bk.v - m.pv)
             - (m.pt - CAST(bk.ts_rel AS DOUBLE)) * (m.nv - m.pv)) AS area,
         ROW_NUMBER() OVER (
           PARTITION BY bk.b
           ORDER BY ABS((m.pt - m.nt) * (bk.v - m.pv)
                        - (m.pt - CAST(bk.ts_rel AS DOUBLE)) * (m.nv - m.pv))
                      DESC,
                    bk.event_id ASC) AS r
  FROM bk JOIN m ON m.b = bk.b
  WHERE m.pt IS NOT NULL AND m.nt IS NOT NULL
),
ends AS (
  SELECT b, event_id, t, v,
         ROW_NUMBER() OVER (PARTITION BY b ORDER BY t, event_id) AS r
  FROM bk WHERE b = 0 OR b = (SELECT MAX(b) FROM bk)
)
SELECT CAST(b AS BIGINT) AS bucket, CAST(event_id AS BIGINT) AS event_id,
       CAST(t AS BIGINT) AS t_us, v
FROM scored WHERE r = 1
UNION ALL
SELECT CAST(b AS BIGINT), CAST(event_id AS BIGINT), CAST(t AS BIGINT), v
FROM ends
WHERE (b = 0 AND r = 1)
   OR (b <> 0 AND r = (SELECT COUNT(*) FROM bk k WHERE k.b = ends.b))
"""


@register(
    "ts_downsample_lttb",
    oracle=_LTTB_SQL,
    doc="Largest-Triangle-Three-Buckets series downsampling (Steinarsson "
    "2013) in the PARALLEL variant: triangle anchors are the adjacent "
    "buckets' mean points (classic LTTB anchors on the previously "
    "selected point, a sequential dependency that cannot distribute); "
    "per bucket, keep the point with the largest triangle area; the "
    "first/last buckets keep the series endpoints, as LTTB specifies. "
    "Determinism: bucket ids and the geometry's time coordinate are "
    "exact integers (relative SECONDS, so decimal sums stay far under "
    "2^53 before the mean's single double division); every area is "
    "one structurally-identical chain of row-local IEEE ops, and the "
    "argmax tie-breaks on event_id. One groupBy for bucket means "
    "(tiny), one window partitioned by bucket — the point stream "
    "shuffles once on the bucket key.",
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "click")
    pts = ev.select(
        "event_id", F.col("value").alias("v"), F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
    )
    bounds = pts.agg(F.min("t").alias("tmin"), F.max("t").alias("tmax"))
    bk = pts.join(F.broadcast(bounds)).select(
        "event_id",
        "v",
        "t",
        # exact integer bucket id: long multiply then integer DIV —
        # a double divide + cast would round in DuckDB but truncate in
        # Spark at exact boundaries
        F.expr(
            f"((t - tmin) * {LTTB_BUCKETS}) div (tmax - tmin + 1)"
        ).alias("b"),
        F.floor((F.col("t") - F.col("tmin")) / 1_000_000).alias("ts_rel"),
    )
    bk = bk.localCheckpoint(eager=False)  # referenced by means + scored + ends
    mean_t = F.sum(F.col("ts_rel").cast("decimal(25,0)")).cast("double") / F.count(
        "*"
    )
    mean_v = F.sum(F.col("v").cast("decimal(18,6)")).cast("double") / F.count("*")
    wb = Window.orderBy("b")
    m = (
        bk.groupBy("b")
        .agg(mean_t.alias("mt"), mean_v.alias("mv"))
        .select(
            "b",
            F.lag("mt").over(wb).alias("pt"),
            F.lag("mv").over(wb).alias("pv"),
            F.lead("mt").over(wb).alias("nt"),
            F.lead("mv").over(wb).alias("nv"),
        )
    )
    area = F.abs(
        (F.col("pt") - F.col("nt")) * (F.col("v") - F.col("pv"))
        - (F.col("pt") - F.col("ts_rel").cast("double"))
        * (F.col("nv") - F.col("pv"))
    )
    wsel = Window.partitionBy("b").orderBy(
        area.desc(), F.col("event_id").asc()
    )
    scored = (
        bk.join(F.broadcast(m), "b")
        .where(F.col("pt").isNotNull() & F.col("nt").isNotNull())
        .withColumn("r", F.row_number().over(wsel))
        .where(F.col("r") == 1)
        .select(
            F.col("b").cast("long").alias("bucket"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("t").cast("long").alias("t_us"),
            "v",
        )
    )
    bmax = bk.agg(F.max("b").alias("bmax"))
    endpts = (
        bk.join(F.broadcast(bmax))
        .where((F.col("b") == 0) | (F.col("b") == F.col("bmax")))
        .withColumn(
            "rf",
            F.row_number().over(
                Window.partitionBy("b").orderBy(F.col("t").asc(), F.col("event_id").asc())
            ),
        )
        .withColumn(
            "rl",
            F.row_number().over(
                Window.partitionBy("b").orderBy(
                    F.col("t").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(
            ((F.col("b") == 0) & (F.col("rf") == 1))
            | ((F.col("b") != 0) & (F.col("rl") == 1))
        )
        .select(
            F.col("b").cast("long").alias("bucket"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("t").cast("long").alias("t_us"),
            "v",
        )
    )
    return scored.unionByName(endpts)


# -------------------------------------------- distribution drift (TVD)

# $25k value bins over exact integer cents; period split at a fixed
# calendar boundary (data spans 1995-2001).
TVD_BIN_CENTS = 2_500_000
TVD_SPLIT = "1998-01-01 00:00:00"


_TVD_SQL = f"""
WITH binned AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           // {TVD_BIN_CENTS} AS bin,
         CASE WHEN o_orderdate < TIMESTAMP '{TVD_SPLIT}' THEN 1 ELSE 0 END
           AS early
  FROM orders
),
cells AS (
  SELECT bin,
         SUM(early) AS c1,
         SUM(1 - early) AS c2
  FROM binned GROUP BY bin
),
tot AS (
  SELECT bin, c1, c2, SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
  FROM cells
)
SELECT CAST(SUM(ABS(c1 * n2 - c2 * n1)) AS DOUBLE) / (2.0 * MAX(n1) * MAX(n2))
         AS tv_distance,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(MAX(n1) AS BIGINT) AS n_early,
       CAST(MAX(n2) AS BIGINT) AS n_late
FROM tot
"""


@register(
    "stats_tv_drift",
    oracle=_TVD_SQL,
    doc="Distribution-drift monitor: total-variation distance between "
    "the order-value distributions of two calendar periods — the "
    "log-free alternative to PSI (whose ln(p/q) would put libm in the "
    "compared output). Values bin on exact integer cents with integer "
    "DIV; the distance's numerator SUM|c1*n2 - c2*n1| is an exact "
    "integer over the common denominator, divided ONCE in double. One "
    "hash aggregate over the fact table (both periods in one scan via "
    "a conditional aggregate); everything after runs on the tiny bin "
    "table. The drift gate every training-data refresh pipeline runs "
    "before accepting a new snapshot.",
)
def stats_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderdate")
    binned = orders.select(
        F.expr(
            f"CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            f" div {TVD_BIN_CENTS}"
        ).alias("bin"),
        F.when(F.col("o_orderdate") < F.lit(TVD_SPLIT), 1)
        .otherwise(0)
        .alias("early"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum("early").alias("c1"), F.sum(1 - F.col("early")).alias("c2")
    )
    w = Window.partitionBy()
    tot = cells.select(
        "bin",
        "c1",
        "c2",
        F.sum("c1").over(w).alias("n1"),
        F.sum("c2").over(w).alias("n2"),
    )
    return tot.agg(
        (
            F.sum(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).cast("double")
            / (F.lit(2.0) * F.max("n1") * F.max("n2"))
        ).alias("tv_distance"),
        F.count("*").cast("long").alias("n_bins"),
        F.max("n1").cast("long").alias("n_early"),
        F.max("n2").cast("long").alias("n_late"),
    )


# ------------------------------------------- Mann-Whitney rank-sum U

_MWU_SQL = """
WITH pts AS (
  SELECT o_totalprice AS v,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS c2
  FROM orders
  WHERE o_orderstatus IN ('F', 'O')
  GROUP BY o_totalprice
),
cum AS (
  SELECT c1, c2,
         SUM(c1 + c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS upto,
         SUM(c1) OVER () AS n1,
         SUM(c2) OVER () AS n2
  FROM pts
)
SELECT CAST(SUM(c1 * ((upto - (c1 + c2) + 1) + upto))
            - MAX(n1) * (MAX(n1) + 1) AS BIGINT) AS u1_x2,
       CAST(MAX(n1) AS BIGINT) AS n1,
       CAST(MAX(n2) AS BIGINT) AS n2
FROM cum
"""


@register(
    "stats_mann_whitney_u",
    oracle=_MWU_SQL,
    doc="Mann-Whitney rank-sum U between finished and open orders' "
    "value distributions, with exact midrank tie handling: per "
    "distinct value, the doubled midrank is (first + last) rank — an "
    "integer — so 2*U1 = sum(c1 * rank2) - n1(n1+1) stays EXACTLY "
    "integer end to end; no floats anywhere in the statistic. Rides "
    "the same per-value pre-aggregate + running-total shape as "
    "stats_ks_test (the oracle's single-threaded window is the "
    "semantic spec; the engine's distributed-prefix-sum equivalent is "
    "proven there). Emitted as u1_x2 to avoid the .5 representation.",
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderstatus")
    pts = (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(F.col("o_totalprice").alias("v"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("c2"),
        )
    )
    pts = pts.withColumn("ct", F.col("c1") + F.col("c2"))
    run = _global_running(pts, "v", ["c1", "c2", "ct"])
    cum = run.select(
        "c1",
        "c2",
        F.col("cum_ct").alias("upto"),
        F.col("tot_c1").alias("n1"),
        F.col("tot_c2").alias("n2"),
    )
    rank2 = (F.col("upto") - (F.col("c1") + F.col("c2")) + 1) + F.col("upto")
    return cum.agg(
        (F.sum(F.col("c1") * rank2) - F.max("n1") * (F.max("n1") + 1))
        .cast("long")
        .alias("u1_x2"),
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
    )


# --------------------------------------------- degree assortativity

_ASSORT_SQL = """
WITH edges AS (
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
bi AS (
    SELECT src, dst FROM edges
    UNION
    SELECT dst AS src, src AS dst FROM edges
),
deg AS (SELECT src, COUNT(*) AS d FROM bi GROUP BY src),
ed AS (
  SELECT da.d AS x, db.d AS y
  FROM bi JOIN deg da ON da.src = bi.src JOIN deg db ON db.src = bi.dst
),
s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM ed
)
SELECT ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
         / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
            * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), 12) AS assortativity,
       CAST(n AS BIGINT) AS n_directed_edges
FROM s
"""


@register(
    "graph_assortativity",
    oracle=_ASSORT_SQL,
    doc="Degree assortativity of the trade graph: Pearson correlation "
    "of endpoint degrees over directed edges — negative means hubs "
    "attach to leaves (the usual bipartite trade shape). Sufficient "
    "statistics are EXACT integer sums (degrees and edge counts fit "
    "long far below 2^53, so the double casts are exact); the "
    "correlation repeats stats_regression_by_group's structurally-"
    "identical IEEE chain, ROUND 12 both sides. Two joins of the edge "
    "list to the broadcastable degree table, one aggregate — no "
    "iteration.",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import _trade_graph

    bi, deg = _trade_graph(spark, sf_dir)
    da = deg.select(F.col("src").alias("a_src"), F.col("outdeg").alias("x"))
    db = deg.select(F.col("src").alias("b_src"), F.col("outdeg").alias("y"))
    ed = (
        bi.join(F.broadcast(da), F.col("src") == F.col("a_src"))
        .join(F.broadcast(db), F.col("dst") == F.col("b_src"))
        .select("x", "y")
    )
    s = ed.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    r = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.round(r, 12).alias("assortativity"),
        F.col("n").cast("long").alias("n_directed_edges"),
    )


# ---------------------------------------------- Poisson bootstrap CI

BOOT_B = 64  # resamples
# Poisson(1) CDF cut points as 9-decimal LITERALS (runtime exp() would
# be a libm hazard); k = number of cut points below the uniform draw.
_POIS_CDF = [
    "0.367879441",
    "0.735758882",
    "0.919698603",
    "0.981011843",
    "0.996340153",
    "0.999405815",
    "0.999916758",
    "0.999990881",
]


def _sql_pois_k(u: str) -> str:
    return "(" + " + ".join(
        f"CASE WHEN {u} >= {p} THEN 1 ELSE 0 END" for p in _POIS_CDF
    ) + ")"


# Per-(order, resample) uniform via an affine mix + Lehmer step — pure
# 64-bit-safe integer arithmetic, identical in both engines (positive
# operands, so %% agrees), and ~35x faster than an md5-of-string draw
# (0.5 s vs 17.7 s at sf0.1: 9.6M md5+concat evaluations dominated the
# whole query). Bootstrap weights need decorrelation, not crypto.
_BOOT_U_SQL = (
    "(((o_orderkey * 2654435761 + bs.b * 40503 + 12821) % 2147483648)"
    " * 48271 % 2147483647) / 2147483647.0"
)

_BOOT_SQL = f"""
WITH bs AS (SELECT UNNEST(range(0, {BOOT_B})) AS b),
draws AS (
  SELECT bs.b,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x,
         {_sql_pois_k(_BOOT_U_SQL)} AS w
  FROM orders, bs
),
means AS (
  SELECT b,
         CAST(SUM(w * x) AS DOUBLE) / SUM(w) AS m
  FROM draws GROUP BY b
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS r FROM means
)
SELECT MAX(CASE WHEN r = 4 THEN m END) AS ci_lo,
       MAX(CASE WHEN r = {BOOT_B - 3} THEN m END) AS ci_hi,
       CAST({BOOT_B} AS BIGINT) AS n_resamples
FROM ranked
"""


@register(
    "stats_bootstrap_ci",
    oracle=_BOOT_SQL,
    doc="Poisson bootstrap (Chamandy et al., the standard bootstrap for "
    "data that cannot be resampled centrally): each of 64 resamples "
    "weights every order by a Poisson(1) draw derived from a portable "
    "integer Lehmer mix of (order, resample) — fully deterministic "
    "and recomputable by the oracle; the resample means' 4th and 62nd "
    "order statistics bound a ~90% CI. Weights come from 9-decimal "
    "CDF literal cut points (no runtime exp); weighted sums are exact "
    "decimal with ONE double division per resample; order statistics "
    "are exact ranks, no interpolation (engines differ on "
    "percentile interpolation). Scale: the fact table fans out x64 "
    "map-side and collapses to 64 groups by partial aggregation — "
    "the shuffle carries 64 rows per partition regardless of input "
    "size.",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    drawn = orders.select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        F.col("o_orderkey"),
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    h1 = (
        F.col("o_orderkey") * F.lit(2654435761)
        + F.col("b").cast("bigint") * 40503
        + 12821
    ) % F.lit(2147483648)
    u = (h1 * 48271) % F.lit(2147483647) / F.lit(2147483647.0)
    w = sum(
        (F.when(u >= F.lit(float(p)), 1).otherwise(0) for p in _POIS_CDF[1:]),
        F.when(u >= F.lit(float(_POIS_CDF[0])), 1).otherwise(0),
    )
    means = (
        drawn.withColumn("w", w)
        .groupBy("b")
        .agg(
            (F.sum(F.col("w") * F.col("x")).cast("double") / F.sum("w")).alias(
                "m"
            )
        )
    )
    ranked = means.withColumn(
        "r", F.row_number().over(Window.orderBy("m", "b"))
    )
    return ranked.agg(
        F.max(F.when(F.col("r") == 4, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("r") == BOOT_B - 3, F.col("m"))).alias("ci_hi"),
        F.lit(BOOT_B).cast("long").alias("n_resamples"),
    )


# -------------------------------------- two-proportion z-test (A/B)

_ZTEST_SQL = """
WITH g AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         COUNT(*) AS base
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
),
w AS (
  SELECT MAX(CASE WHEN arm = 'A' THEN conv END) AS c1,
         MAX(CASE WHEN arm = 'A' THEN base END) AS n1,
         MAX(CASE WHEN arm = 'B' THEN conv END) AS c2,
         MAX(CASE WHEN arm = 'B' THEN base END) AS n2
  FROM g
)
SELECT ROUND((CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
         / SQRT((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                * (1.0 / n1 + 1.0 / n2)), 9) AS z,
       CAST(c1 AS BIGINT) AS conv_a, CAST(n1 AS BIGINT) AS base_a,
       CAST(c2 AS BIGINT) AS conv_b, CAST(n2 AS BIGINT) AS base_b
FROM w
"""


@register(
    "stats_ab_ztest",
    oracle=_ZTEST_SQL,
    doc="Two-proportion z-test between deterministic experiment arms "
    "(user_id parity): each arm's conversion is its purchase SHARE of "
    "engagement (click+purchase) events, differenced over the pooled-"
    "variance standard error. A share-of-superset proportion is "
    "guaranteed in [0, 1] at every data volume — the original "
    "purchase-PER-CLICK ratio exceeded 1 at sf0.1 (purchases outnumber "
    "clicks there), driving the pooled variance negative: Spark's sqrt "
    "silently returned NaN while DuckDB's raised, caught by the r11 "
    "full-surface sf0.1 sweep. One conditional hash aggregate builds "
    "all four integer counts; the z statistic is a single structurally-"
    "identical chain of row-local IEEE ops on exact integers, ROUND 9 "
    "both sides. The experiment-analysis primitive next to the "
    "bootstrap CI.",
)
def stats_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    g = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "conv"
            ),
            F.count(F.lit(1)).alias("base"),
        )
    )
    w = g.agg(
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("c1"),
        F.max(F.when(F.col("arm") == "A", F.col("base"))).alias("n1"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("c2"),
        F.max(F.when(F.col("arm") == "B", F.col("base"))).alias("n2"),
    )
    p1 = F.col("c1").cast("double") / F.col("n1")
    p2 = F.col("c2").cast("double") / F.col("n2")
    pp = (F.col("c1") + F.col("c2")).cast("double") / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    return w.select(
        F.round(z, 9).alias("z"),
        F.col("c1").cast("long").alias("conv_a"),
        F.col("n1").cast("long").alias("base_a"),
        F.col("c2").cast("long").alias("conv_b"),
        F.col("n2").cast("long").alias("base_b"),
    )


# ------------------------------------------------ autocorrelation

ACF_MAX_LAG = 6


_ACF_SQL = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS h, COUNT(*) AS c
  FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)
),
series AS (
  SELECT event_type, h, c,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(c) OVER (PARTITION BY event_type) AS s
  FROM hourly
),
lagged AS (
  SELECT event_type,
         n * c - s AS dev,
         LAG(n * c - s, 1) OVER (PARTITION BY event_type ORDER BY h) AS d1,
         LAG(n * c - s, 2) OVER (PARTITION BY event_type ORDER BY h) AS d2,
         LAG(n * c - s, 3) OVER (PARTITION BY event_type ORDER BY h) AS d3,
         LAG(n * c - s, 4) OVER (PARTITION BY event_type ORDER BY h) AS d4,
         LAG(n * c - s, 5) OVER (PARTITION BY event_type ORDER BY h) AS d5,
         LAG(n * c - s, 6) OVER (PARTITION BY event_type ORDER BY h) AS d6
  FROM series
),
agg AS (
  -- dev*dev products widen to HUGEINT before multiplying (Spark side:
  -- decimal(19,0) operands -> decimal(38,0) product): dev ~ n*c_max,
  -- so the int64 product wraps once hours^3 * c_max^2 > 2^63 —
  -- ~SF150 on the 30-day test span, and lower on longer spans
  -- (round-7 scale-width audit).
  SELECT event_type,
         SUM(CASE WHEN d1 IS NULL THEN 0
             ELSE CAST(dev AS HUGEINT) * d1 END) AS num1,
         SUM(CASE WHEN d2 IS NULL THEN 0
             ELSE CAST(dev AS HUGEINT) * d2 END) AS num2,
         SUM(CASE WHEN d3 IS NULL THEN 0
             ELSE CAST(dev AS HUGEINT) * d3 END) AS num3,
         SUM(CASE WHEN d4 IS NULL THEN 0
             ELSE CAST(dev AS HUGEINT) * d4 END) AS num4,
         SUM(CASE WHEN d5 IS NULL THEN 0
             ELSE CAST(dev AS HUGEINT) * d5 END) AS num5,
         SUM(CASE WHEN d6 IS NULL THEN 0
             ELSE CAST(dev AS HUGEINT) * d6 END) AS num6,
         SUM(CAST(dev AS HUGEINT) * dev) AS den
  FROM lagged GROUP BY event_type
)
SELECT event_type, CAST(1 AS INTEGER) AS lag,
       CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM agg
UNION ALL
SELECT event_type, CAST(2 AS INTEGER) AS lag,
       CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM agg
UNION ALL
SELECT event_type, CAST(3 AS INTEGER) AS lag,
       CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM agg
UNION ALL
SELECT event_type, CAST(4 AS INTEGER) AS lag,
       CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM agg
UNION ALL
SELECT event_type, CAST(5 AS INTEGER) AS lag,
       CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM agg
UNION ALL
SELECT event_type, CAST(6 AS INTEGER) AS lag,
       CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM agg
"""


@register(
    "ts_autocorrelation",
    oracle=_ACF_SQL,
    doc=f"Autocorrelation of per-type hourly volume at lags 1..{ACF_MAX_LAG} "
    "— the periodicity fingerprint every forecasting pipeline "
    "computes first. Deviations are kept EXACTLY INTEGER by the "
    "ts_changepoint_cusum scaling (n*c - S instead of c - S/n; the "
    "n^2 factor cancels in the ratio), so numerator and denominator "
    "are exact integer sums and ONE double division yields the "
    "coefficient — no float summation anywhere. One hash aggregate "
    "collapses events to O(types x hours); ALL six lag shifts ride a "
    "single event_type-partitioned window (one scan, one window sort — "
    "the round-4 per-lag loop built six unioned branches that each "
    "re-scanned events, 6x the scan cost at 100 TB), the per-type "
    "numerators unpivot via explode over the already-tiny aggregate.",
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "ts")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("c"))
    wp = Window.partitionBy("event_type")
    series = hourly.select(
        "event_type",
        "h",
        (
            F.count("*").over(wp) * F.col("c") - F.sum("c").over(wp)
        ).alias("dev"),
    )
    wo = wp.orderBy("h")
    lags = list(range(1, ACF_MAX_LAG + 1))
    lagged = series.select(
        "event_type",
        "dev",
        *[F.lag("dev", k).over(wo).alias(f"d{k}") for k in lags],
    )
    # Scale-width (round-7 audit): dev ~ n*c_max, so an int64 dev*dev
    # wraps once hours^3 * c_max^2 > 2^63 — ~SF150 at the fixed 30-day
    # span and lower on longer spans. Widen the OPERANDS to
    # decimal(19,0) so the product is an exact decimal(38,0), matching
    # the oracle's HUGEINT products; dev itself stays comfortably in
    # int64 (bound: hours * c_max < 2^63).
    d19 = "decimal(19,0)"
    zero38 = F.lit(0).cast("decimal(38,0)")
    agg = lagged.groupBy("event_type").agg(
        *[
            F.sum(
                F.when(F.col(f"d{k}").isNull(), zero38).otherwise(
                    F.col("dev").cast(d19) * F.col(f"d{k}").cast(d19)
                )
            ).alias(f"num{k}")
            for k in lags
        ],
        F.sum(F.col("dev").cast(d19) * F.col("dev").cast(d19)).alias("den"),
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("lag"),
                F.col(f"num{k}").alias("num"),
            )
            for k in lags
        ]
    )
    # generators can't nest inside expressions: project the explode,
    # then derive the ratio in the next select
    exploded = agg.select("event_type", "den", F.explode(pairs).alias("p"))
    return exploded.select(
        "event_type",
        F.col("p.lag").alias("lag"),
        (F.col("p.num").cast("double") / F.col("den").cast("double")).alias(
            "acf"
        ),
    )


# --------------------------------------------- Pareto concentration

_PARETO_SQL = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT r,
         ROW_NUMBER() OVER (ORDER BY r DESC, o_custkey) AS rk,
         COUNT(*) OVER () AS n,
         SUM(r) OVER () AS tot
  FROM rev
)
SELECT CAST(SUM(CASE WHEN rk <= (n + 99) // 100 THEN r ELSE CAST(0 AS DECIMAL(18,2)) END)
            AS DOUBLE)
         / CAST(MAX(tot) AS DOUBLE) AS top1pct_share,
       CAST(SUM(CASE WHEN rk <= (n + 9) // 10 THEN r ELSE CAST(0 AS DECIMAL(18,2)) END)
            AS DOUBLE)
         / CAST(MAX(tot) AS DOUBLE) AS top10pct_share,
       CAST(MAX(n) AS BIGINT) AS n_customers
FROM ranked
"""


@register(
    "stats_pareto_share",
    oracle=_PARETO_SQL,
    doc="Revenue concentration: the share of total revenue captured by "
    "the top 1% and top 10% of customers — the Pareto report behind "
    "every whale-risk analysis. Per-customer revenue is an exact "
    "decimal aggregate; ranks tie-break on customer id; cutoffs use "
    "ceil-integer arithmetic ((n+99)//100, no float percent); shares "
    "sum in exact decimal with one double division each. The global "
    "rank runs over the ALREADY-AGGREGATED per-customer table — "
    "|customers| rows, not |orders| — and is DISTRIBUTED (since r6): "
    "the chunker's range-partitioned row_number + broadcast offsets "
    "replaces the single-partition window, so the rank parallelizes "
    "even at SF100k customer counts. The rank VALUES are identical "
    "to the oracle's window by construction (same total order).",
)
def stats_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..chunker import global_row_number

    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    # Multiple consumers below (1-row totals, counts pass, rank pass):
    # materialize the per-customer aggregate once instead of
    # recomputing the orders scan per consumer.
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
        .localCheckpoint(eager=False)
    )
    # DISTRIBUTED descending rank (range-partitioned local row_number +
    # broadcast offsets — the chunker's global ordering machinery): no
    # single-partition sort of the customer table, so the rank scales
    # past dimension-bounded (15B customers at SF100k would serialize
    # through one task under a global window). Descending = ascending
    # on the negated revenue; o_custkey breaks ties totally.
    ranked = global_row_number(
        rev.withColumn("negr", -F.col("r")), ["negr", "o_custkey"], "rk"
    )
    stats = rev.agg(
        F.count("*").alias("n"), F.sum("r").alias("tot")
    )
    ranked = ranked.join(F.broadcast(stats))
    zero = F.lit(0).cast("decimal(18,2)")
    top1 = F.sum(
        F.when(F.col("rk") <= F.expr("(n + 99) div 100"), F.col("r")).otherwise(
            zero
        )
    )
    top10 = F.sum(
        F.when(F.col("rk") <= F.expr("(n + 9) div 10"), F.col("r")).otherwise(
            zero
        )
    )
    return ranked.agg(
        (top1.cast("double") / F.max("tot").cast("double")).alias(
            "top1pct_share"
        ),
        (top10.cast("double") / F.max("tot").cast("double")).alias(
            "top10pct_share"
        ),
        F.max("n").cast("long").alias("n_customers"),
    )


# ------------------------------------------------- Gini coefficient

_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
         COUNT(*) OVER () AS n
  FROM rev
)
SELECT CAST(2 * SUM(i * cents) - (MAX(n) + 1) * SUM(cents) AS DOUBLE)
         / CAST(MAX(n) * SUM(cents) AS DOUBLE) AS gini,
       CAST(MAX(n) AS BIGINT) AS n_customers
FROM ranked
"""


@register(
    "stats_gini_coefficient",
    oracle=_GINI_SQL,
    doc="Gini coefficient of per-customer revenue — the canonical "
    "inequality statistic (companion to stats_pareto_share's top-k "
    "concentration). Revenue is aggregated to exact integer CENTS "
    "(double*100 rounds identically in both engines — same product, "
    "same half-up), ranks tie-break on customer id, and the closed "
    "form G = (2*SUM(i*x_i) - (n+1)*SUM(x_i)) / (n*SUM(x_i)) keeps "
    "numerator and denominator exact 64-bit integers until ONE double "
    "division (int64 to double conversion is correctly rounded in "
    "both engines). Like stats_pareto_share, the rank runs over the "
    "per-customer aggregate and is DISTRIBUTED (since r6): the "
    "chunker's range-partitioned row_number + broadcast offsets "
    "yields the identical 1..n ranks without a single-partition "
    "sort, so the closed form parallelizes at any customer "
    "cardinality. Integer headroom: "
    "SUM(i*cents) ~ n^2 * avg_cents / 2 crosses 2^63 near SF 10 "
    "(~1.5M customers x ~1.5e7 avg cents), so BOTH sums run in "
    "DECIMAL(38,0) on the Spark side — matching DuckDB's silent "
    "HUGEINT widening — and only the final division is double.",
)
def stats_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..chunker import global_row_number

    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    # Two consumers (the rank machinery's counts pass + the rank pass):
    # materialize the per-customer aggregate once.
    rev = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
        .localCheckpoint(eager=False)
    )
    # DISTRIBUTED rank i (range-partitioned local row_number +
    # broadcast offsets, the chunker's global ordering machinery): the
    # closed form needs every customer's exact rank, but NOT a
    # single-partition sort to get it — and since i covers 1..n,
    # n = MAX(i) falls out of the same final aggregate for free.
    ranked = global_row_number(rev, ["cents", "o_custkey"], "i")
    dec = "decimal(38,0)"
    # Widen BOTH operands before multiplying: i * cents evaluated in
    # int64 first would silently wrap (ANSI off) at the very rank ×
    # cents magnitudes the headroom note above cites (i ~ 1e10 ×
    # cents ~ 1e9 ≈ 2^63); decimal × decimal keeps the product exact.
    sum_ix = F.sum(F.col("i").cast(dec) * F.col("cents").cast(dec))
    sum_x = F.sum(F.col("cents").cast(dec))
    n_dec = F.max("i").cast(dec)
    return ranked.agg(
        (
            (2 * sum_ix - (n_dec + 1) * sum_x).cast("double")
            / (n_dec * sum_x).cast("double")
        ).alias("gini"),
        F.max("i").cast("long").alias("n_customers"),
    )


# --------------------------------------------------- M4 downsampling

M4_BUCKET_MIN = 60  # one pixel bucket per hour


@register(
    "ts_downsample_m4",
    oracle=f"""
WITH pts AS (
  SELECT date_trunc('hour', ts) AS b, ts, event_id, value
  FROM events WHERE event_type = 'view'
),
r AS (
  SELECT b, value,
         ROW_NUMBER() OVER (PARTITION BY b ORDER BY ts, event_id) AS rf,
         ROW_NUMBER() OVER (PARTITION BY b ORDER BY ts DESC, event_id DESC)
             AS rl,
         ROW_NUMBER() OVER (PARTITION BY b ORDER BY value, event_id) AS rmin,
         ROW_NUMBER() OVER (PARTITION BY b ORDER BY value DESC, event_id DESC)
             AS rmax
  FROM pts
)
SELECT substr(CAST(b AS STRING), 1, 13) AS bucket,
       CAST(MAX(CASE WHEN rf = 1 THEN value END) AS DOUBLE) AS v_first,
       CAST(MAX(CASE WHEN rl = 1 THEN value END) AS DOUBLE) AS v_last,
       CAST(MAX(CASE WHEN rmin = 1 THEN value END) AS DOUBLE) AS v_min,
       CAST(MAX(CASE WHEN rmax = 1 THEN value END) AS DOUBLE) AS v_max,
       CAST(COUNT(*) AS BIGINT) AS n
FROM r GROUP BY b
""",
    doc="M4 time-series downsampling — the error-free visualization "
    "reducer (Jugel et al., VLDB 2014): per pixel bucket keep exactly "
    "first/last/min/max, which provably reproduces the line "
    "rendering; LTTB (ts_downsample_lttb) is the perceptual cousin, "
    "M4 the exact one. Selection ties break on event_id, so every "
    "kept point is a deterministic function of the data — full hash "
    "oracle. Engine shape: one shuffle on the bucket key feeds four "
    "rank windows SHARING that single exchange plus the final "
    "aggregate — at any SF the state per bucket is four ranks, and "
    "buckets parallelize perfectly. (A min_by/max_by aggregate form "
    "would drop the windows entirely but loses the first/last "
    "ORDER BY ts semantics under ties; ranked selection keeps all "
    "four picks uniform.)",
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select(
            F.date_trunc("hour", F.col("ts")).alias("b"),
            "ts",
            "event_id",
            "value",
        )
    )
    wb = Window.partitionBy("b")
    r = ev.select(
        "b",
        "value",
        F.row_number().over(wb.orderBy("ts", "event_id")).alias("rf"),
        F.row_number()
        .over(wb.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rl"),
        F.row_number().over(wb.orderBy("value", "event_id")).alias("rmin"),
        F.row_number()
        .over(wb.orderBy(F.col("value").desc(), F.col("event_id").desc()))
        .alias("rmax"),
    )
    return r.groupBy("b").agg(
        F.max(F.when(F.col("rf") == 1, F.col("value"))).alias("v_first"),
        F.max(F.when(F.col("rl") == 1, F.col("value"))).alias("v_last"),
        F.max(F.when(F.col("rmin") == 1, F.col("value"))).alias("v_min"),
        F.max(F.when(F.col("rmax") == 1, F.col("value"))).alias("v_max"),
        F.count("*").cast("long").alias("n"),
    ).select(
        F.substring(F.col("b").cast("string"), 1, 13).alias("bucket"),
        "v_first",
        "v_last",
        "v_min",
        "v_max",
        "n",
    )


# ------------------------------------------------ Welch's t-test

_WELCH_SQL = """
WITH g AS (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
s AS (
  SELECT arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS HUGEINT) AS s1,
         CAST(SUM(cents * cents) AS HUGEINT) AS s2
  FROM g GROUP BY arm
),
w AS (
  SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS n1,
         MAX(CASE WHEN arm = 'A' THEN s1 END) AS sa,
         MAX(CASE WHEN arm = 'A' THEN s2 END) AS qa,
         MAX(CASE WHEN arm = 'B' THEN n END) AS n2,
         MAX(CASE WHEN arm = 'B' THEN s1 END) AS sb,
         MAX(CASE WHEN arm = 'B' THEN s2 END) AS qb
  FROM s
),
f AS (
  SELECT n1, n2,
         CAST(sa AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         CAST(sb AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
         (CAST(qa AS DOUBLE) - (CAST(sa AS DOUBLE) / CAST(n1 AS DOUBLE))
            * CAST(sa AS DOUBLE))
           / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE) AS a1,
         (CAST(qb AS DOUBLE) - (CAST(sb AS DOUBLE) / CAST(n2 AS DOUBLE))
            * CAST(sb AS DOUBLE))
           / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE) AS a2
  FROM w
)
SELECT CAST(n1 AS BIGINT) AS n_a,
       CAST(n2 AS BIGINT) AS n_b,
       m1 AS mean_cents_a,
       m2 AS mean_cents_b,
       (m1 - m2) / sqrt(a1 + a2) AS t_stat,
       (a1 + a2) * (a1 + a2)
         / (a1 * a1 / (CAST(n1 AS DOUBLE) - 1.0)
            + a2 * a2 / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_df
FROM f
"""


@register(
    "stats_welch_ttest",
    oracle=_WELCH_SQL,
    doc="Welch's unequal-variance t-test between deterministic "
    "experiment arms (o_orderkey parity) on order value in exact "
    "integer CENTS — the standard two-sample mean test completing "
    "the family (stats_ab_ztest: proportions; stats_mann_whitney_u: "
    "nonparametric; stats_bootstrap_ci: resampling). One conditional "
    "hash aggregate computes n, SUM(cents), SUM(cents^2) per arm "
    "EXACTLY (per-row cents^2 fits int64; the sums run in "
    "DECIMAL(38,0) Spark-side, matching DuckDB's HUGEINT widening); "
    "the t statistic, per-arm variance-over-n terms a_i = s_i^2/n_i, "
    "and the Welch-Satterthwaite df are then ONE structurally "
    "identical chain of IEEE double ops over those exact integers in "
    "both engines (sqrt is correctly rounded everywhere; libm never "
    "enters), so values match bit-for-bit unrounded. Scale shape: "
    "the fact table collapses in one partial+final aggregate — "
    "nothing else touches data.",
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    dec = "decimal(38,0)"
    g = orders.groupBy(
        F.when(F.col("o_orderkey") % 2 == 0, "A").otherwise("B").alias("arm")
    ).agg(
        F.count("*").alias("n"),
        F.sum(cents.cast(dec)).alias("s1"),
        # Widen operands BEFORE multiplying (round-7 audit, same fix as
        # gini): the int64 per-row square is price-domain-bounded here
        # (wraps only past |cents| ~ 3e9, a $30M order), but the
        # decimal product removes the bound outright.
        F.sum(cents.cast(dec) * cents.cast(dec)).alias("s2"),
    )
    w = g.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == "A", F.col("s1"))).alias("sa"),
        F.max(F.when(F.col("arm") == "A", F.col("s2"))).alias("qa"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("arm") == "B", F.col("s1"))).alias("sb"),
        F.max(F.when(F.col("arm") == "B", F.col("s2"))).alias("qb"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    m1 = dbl("sa") / dbl("n1")
    m2 = dbl("sb") / dbl("n2")
    a1 = (dbl("qa") - (dbl("sa") / dbl("n1")) * dbl("sa")) / (
        dbl("n1") - F.lit(1.0)
    ) / dbl("n1")
    a2 = (dbl("qb") - (dbl("sb") / dbl("n2")) * dbl("sb")) / (
        dbl("n2") - F.lit(1.0)
    ) / dbl("n2")
    return w.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        m1.alias("mean_cents_a"),
        m2.alias("mean_cents_b"),
        ((m1 - m2) / F.sqrt(a1 + a2)).alias("t_stat"),
        (
            (a1 + a2)
            * (a1 + a2)
            / (a1 * a1 / (dbl("n1") - F.lit(1.0)) + a2 * a2 / (dbl("n2") - F.lit(1.0)))
        ).alias("welch_df"),
    )
