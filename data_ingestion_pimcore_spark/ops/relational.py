"""Relational operator surface: scans, projections, filters, joins
(broadcast/shuffle/semi/anti), aggregations (hash, distinct, rollup/
cube/grouping sets), window functions, sorts/top-k, set operations, and
scalar functions — the SURVEY.md §2.2 categories the reference lacks,
expressed as native DataFrame plans so Catalyst handles pushdown,
pruning, join selection and AQE.

Scale notes (100 TB design intent), per query:

* Fact-side scans always project + filter before joins/aggs so parquet
  pushdown prunes columns and row groups.
* Dimension joins use ``F.broadcast`` explicitly — at 100 TB the fact
  table never shuffles for a dim join.
* Top-k is ``orderBy().limit(k)`` → Spark plans TakeOrderedAndProject:
  per-partition heaps + single driver merge, no global sort.
* Per-group top-k is a window over a single hash-partitioned shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load
from ._det import DEC, davg, dsum, sql_davg, sql_dsum

# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 (pricing summary) adapted to the driver schema. "
    "Partial (map-side) aggregation + tiny 6-group final merge; the only "
    "shuffle carries 6 rows per partition. Mirrors the agg surface the "
    "reference lacks entirely (SURVEY §2.2; reference has count-only, "
    "app/services/json_reader.py:52).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderstatus) AS n_statuses
FROM orders
GROUP BY o_orderpriority
""",
    doc="Distinct aggregation: Spark expands to a two-phase plan "
    "(partial distinct by (group, key) then final) — scales to high-"
    "cardinality keys without driver involvement.",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc="ROLLUP hierarchy totals — Spark expands grouping sets into one "
    "Expand + single hash aggregate (one shuffle for all levels).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (same Expand-based plan as rollup)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape: filtered customer dim broadcast into orders; the "
    "orders⋈lineitem fact-fact join is left UNHINTED — at bench SF the "
    "planner broadcasts it (under the threshold), at 100 TB AQE picks a "
    "shuffle join from runtime stats. Hard-broadcasting a fact side "
    "would OOM at scale, so only the true dim carries a hint. "
    "Final top-10 is TakeOrderedAndProject (no global sort).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_regional_revenue",
    oracle=f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM region JOIN nation   ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    doc="TPC-H Q5 shape (minus supplier co-location, absent from the "
    "synthetic schema): a 5-way star join. Only the TRUE dims "
    "(region, nation — broadcastable at any SF) carry hints; the "
    "customer→orders→lineitem fact chain is unhinted so the planner "
    "broadcasts at bench SF and AQE shuffle-joins at 100 TB, where "
    "hard-broadcasting a fact side would OOM.",
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    ord_dim = orders.join(dim, orders.o_custkey == dim.c_custkey).select(
        "o_orderkey", "n_name"
    )
    return (
        li.join(ord_dim, li.l_orderkey == ord_dim.o_orderkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "join_broadcast_dim",
    oracle=f"""
SELECT c_mktsegment, COUNT(*) AS n_orders, {sql_dsum('o_totalprice', 'segment_value')}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    doc="Canonical fact⋈dim broadcast hash join: customer broadcasts, "
    "orders (the 100 TB side) streams through map-side with zero shuffle "
    "before the 5-row aggregate.",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "segment_value"))
    )


@register(
    "join_shuffle_hash",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n_lines, {sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
    doc="Fact⋈fact equi-join (lineitem⋈orders) with a SHUFFLE_HASH hint: "
    "both sides hash-partition on the key once; no sort. At 100 TB with "
    "both tables bucketed on orderkey this becomes a zero-shuffle join.",
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return (
        li.join(orders.hint("SHUFFLE_HASH"), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
    doc="Left-semi join (EXISTS): emits each customer at most once; "
    "Spark builds only the distinct key set on the build side. Unhinted "
    "— the selective filter makes the build side broadcastable at bench "
    "SF (planner picks BHJ), while at 100 TB AQE decides from runtime "
    "stats.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    doc="Left-anti join (NOT EXISTS): customers with no orders. Unhinted "
    "— broadcasting every orders key would OOM at scale; the planner "
    "broadcasts at bench SF, AQE shuffle-joins at 100 TB.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_outer_coalesce",
    oracle="""
SELECT c_custkey,
       COALESCE(o.n, 0) AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey) o
       ON c_custkey = o_custkey
""",
    doc="Left outer join against a pre-aggregated side: aggregate-below-"
    "join keeps the shuffled payload at one row per key.",
)
def join_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select("c_custkey", F.coalesce("n", F.lit(0)).alias("n_orders"))


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders)
WHERE rk <= 3
""",
    doc="Per-group top-k via row_number window — single hash shuffle on "
    "the partition key; Spark inserts a WindowGroupLimit (partial top-k "
    "before the shuffle) so skewed groups don't blow memory.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spend,
       LAG(o_orderkey) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
FROM orders
""",
    doc="Running (cumulative) aggregate + lag over an event-ordered "
    "per-customer window.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@register(
    "window_rank_dense",
    oracle="""
SELECT l_orderkey, l_linenumber,
       RANK()       OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS qty_rank,
       DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_returnflag) AS flag_dense_rank,
       NTILE(4)     OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS quartile
FROM lineitem
WHERE l_orderkey <= 100
""",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile in one windowed pass."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 100)
    w_qty = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_quantity"), F.asc("l_linenumber")
    )
    w_flag = Window.partitionBy("l_orderkey").orderBy("l_returnflag")
    # ntile needs a TOTAL order: (l_orderkey, l_linenumber) repeats in the
    # synthetic data and tied rows tile differently per engine.
    w_line = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w_qty).alias("qty_rank"),
        F.dense_rank().over(w_flag).alias("flag_dense_rank"),
        F.ntile(4).over(w_line).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / limits
# ---------------------------------------------------------------------------


@register(
    "top10_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    doc="Global top-k: orderBy().limit(k) plans TakeOrderedAndProject — "
    "per-partition bounded heaps, no full sort, no shuffle of the data.",
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "sort_multi_key",
    oracle="""
SELECT n_name, c_custkey, c_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 9000
ORDER BY n_name ASC, c_acctbal DESC, c_custkey
""",
    doc="Multi-key global sort over a filtered join (range-partitioned "
    "sort; filter keeps the sorted set small).",
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .orderBy(F.asc("n_name"), F.desc("c_acctbal"), F.asc("c_custkey"))
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "set_union",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 8000
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    cust = load(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.where(F.col("c_acctbal") > 8000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers having both fulfilled and open orders."""
    orders = load(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer keys never appearing in orders."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    ordered = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.subtract(ordered)


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       SUBSTR(p_type, 1, 5) AS type_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT_WS('#', p_brand, p_type) AS brand_type,
       REPLACE(p_name, ' ', '_') AS name_snake,
       CASE WHEN CONTAINS(p_type, 'BRASS') THEN 1 ELSE 0 END AS is_brass
FROM part
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: upper/lower/substr/length/concat/replace/contains."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.when(F.col("p_type").contains("BRASS"), 1).otherwise(0).alias("is_brass"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
SELECT p_partkey,
       ABS(p_size - 25) AS size_dev,
       p_partkey % 7 AS key_mod,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(SQRT(CAST(p_size AS DOUBLE)) AS DOUBLE) AS size_sqrt,
       GREATEST(p_size, 10) AS size_floor10,
       LEAST(p_size, 40) AS size_cap40
FROM part
""",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface (floor/ceil instead of round: round-half "
    "behavior on binary doubles is engine-defined)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.greatest("p_size", F.lit(10)).alias("size_floor10"),
        F.least("p_size", F.lit(40)).alias("size_cap40"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
SELECT o_orderkey,
       YEAR(o_orderdate) AS order_year,
       MONTH(o_orderdate) AS order_month,
       DAY(o_orderdate) AS order_day,
       QUARTER(o_orderdate) AS order_quarter,
       DATE_TRUNC('month', o_orderdate) AS order_month_start,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date_str
FROM orders
WHERE o_orderkey <= 1000
""",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction surface."""
    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.date_trunc("month", "o_orderdate").alias("order_month_start"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        )
    )


@register(
    "scalar_json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS prop_k_bucket
FROM events
WHERE event_id <= 2000
""",
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (events.props)."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") <= 2000)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id", k.alias("prop_k"), (k % 10).alias("prop_k_bucket")
    )


@register(
    "scalar_conditional",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS tier,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS segment_or_default,
       CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE -c_acctbal END AS signed_bal
FROM customer
""",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF conditional surface."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "segment_or_default"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_acctbal"))
        .otherwise(-F.col("c_acctbal"))
        .alias("signed_bal"),
    )


# ---------------------------------------------------------------------------
# Subquery / HAVING / conditional-aggregation patterns (TPC-H adapted to
# the driver schema — reduced column set, same operator shapes)
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join — the "
    "probe side never duplicates rows, so the aggregate input stays "
    "|orders|-bounded no matter how many lineitems match.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q12_priority_class",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
""",
    doc="TPC-H Q12 shape: conditional aggregation (CASE inside SUM) "
    "after a fact-fact equi-join; the year filter pushes to the "
    "lineitem scan so the join probes a fraction of the table.",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_effect",
    oracle=f"""
SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
             ELSE 0 END)
       / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
       AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
""",
    doc="TPC-H Q14 shape: global conditional ratio over a part join. "
    "The month filter prunes lineitem row groups before the join; the "
    "part side carries only (partkey, type).",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(18,6)"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(disc))
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < pa.half_avg
""",
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average) "
    "decorrelated into ONE pass — a per-part window average instead of "
    "an aggregate + self-join, so lineitem is scanned and shuffled "
    "once (r12's shape scanned it twice and sort-merge-joined the "
    "aggregate back).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (guide §2.4 remove shuffles outright): the per-part average
    # rides a window over the SAME l_partkey partitioning the old
    # aggregate+join paid two lineitem-scale exchanges and two scans
    # for. Equivalence is exact, not approximate: l_quantity is
    # integral (checked 0 non-integer values; TPC-H quantities are
    # 1..50), so the double sum inside AVG is exact under ANY
    # association and the window's avg equals the groupBy's avg
    # bit-for-bit; the final revenue sum is DECIMAL (order-free).
    # Interleaved A/B: sf1 2.89 s → 0.71 s min (4.1×), sf0.1 flat,
    # identical single-row output every iteration; oracle green at
    # sf0.01/sf0.1.
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("half_avg", F.lit(0.5) * F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c_name, c_custkey, o.o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250
)
GROUP BY c_name, c_custkey, o.o_orderkey, o_orderdate, o_totalprice
""",
    doc="TPC-H Q18 shape: HAVING-filtered semi join — the groupBy-HAVING "
    "produces the tiny qualifying-order set first, which then drives "
    "semi/inner joins, so the wide join only touches qualifying rows. "
    "Dates emitted as strings (cross-engine DATE round-trip differs).",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 250)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big["l_orderkey"], "left_semi"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.select("l_orderkey", "l_quantity")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("total_qty"))
    )


@register(
    "q22_inactive_high_balance",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
    doc="TPC-H Q22 shape: scalar subquery (global average, computed once "
    "and broadcast as a literal-like single-row join) + NOT EXISTS as a "
    "LEFT ANTI join.",
)
def q22_inactive_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = c.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("__avg"))
    inactive = rich.join(urgent, rich["c_custkey"] == urgent["o_custkey"], "left_anti")
    return inactive.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double").alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# Scale techniques with verified semantics
# ---------------------------------------------------------------------------

_N_SALTS = 8


@register(
    "join_salted_skew",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o_orderstatus
""",
    doc=f"Salted skew join, oracle-verified identical to the plain join: "
    f"the probe side gets a random-free deterministic salt "
    f"(orderkey % {_N_SALTS}), the build side explodes {_N_SALTS}× so "
    "every (key, salt) bucket exists — a hot key's rows spread over "
    f"{_N_SALTS} reducers instead of one. This is the manual fallback "
    "when AQE skew-join splitting can't apply (e.g. aggregation keyed "
    "on the skewed column).",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").withColumn(
        "__salt", (F.col("l_orderkey") % _N_SALTS).cast("int")
    )
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(_N_SALTS)])))
        # shuffle_hash: the salted join's point is reducer balance, and a
        # hash join gets it without SMJ's sort of BOTH exploded sides
        # (~2x here). Build side = this exploded dim; at scale keep the
        # build side the smaller input so per-reducer hash maps fit.
        .hint("shuffle_hash")
    )
    joined = li.join(
        o,
        (li["l_orderkey"] == o["o_orderkey"]) & (li["__salt"] == o["__salt"]),
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("o_orderstatus").agg(
        F.sum(rev.cast("decimal(18,6)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "agg_approx",
    oracle=None,  # approximate by design; tolerance asserted in pytest
    gated_by="agg_sketch_bounds",  # oracle-bearing in-plan bound audit
    doc="Sketch aggregations for 100-TB cardinality/quantile work: "
    "approx_count_distinct (HyperLogLog++) and approx_percentile "
    "(KLL-ish) — fixed-size sketches merge map-side, so the shuffle "
    "carries O(sketch) bytes per group no matter the cardinality. The "
    "quantile sketch is projected into scalar p50/p95/p99 columns (no "
    "complex-typed output columns registry-wide; see "
    "tests/test_oracle_parity.py::_assert_scalar_schema).",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.get(q, 0).alias("p50_price"),
        F.get(q, 1).alias("p95_price"),
        F.get(q, 2).alias("p99_price"),
        F.count(F.lit(1)).alias("n"),
    )


# Hash-range sampling rate for the deterministic distinct sketch:
# keep values whose 60-bit md5 hash falls in the lowest 1/2^_HS_SHIFT
# of the hash space, then count the survivors exactly.
_HS_SHIFT = 6  # 1/64 sample
_HS_THRESHOLD = 1 << (60 - _HS_SHIFT)


@register(
    "agg_distinct_hashsampled",
    oracle=f"""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT CASE
         WHEN CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)
                   AS BIGINT) < {_HS_THRESHOLD}
         THEN l_orderkey END) AS BIGINT) AS n_sampled,
       CAST(COUNT(DISTINCT CASE
         WHEN CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)
                   AS BIGINT) < {_HS_THRESHOLD}
         THEN l_orderkey END) * {1 << _HS_SHIFT} AS BIGINT) AS est_distinct
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Deterministic approximate distinct via hash-range sampling "
    "(Gibbons' distinct sampling): a value survives iff its md5-derived "
    f"60-bit hash lands in the lowest 1/{1 << _HS_SHIFT} of the hash "
    "space — a property of the VALUE, so duplicates agree and the "
    "surviving distinct set is an unbiased 1/64 sample of the distinct "
    "domain; estimate = exact count of survivors × 64. Unlike HLL "
    "(agg_approx) the result is bit-reproducible across engines, runs, "
    "and partitionings — hence a full hash-match oracle — while the "
    "shuffle carries only the 64×-reduced survivor set. Accuracy vs "
    "the exact count is asserted in pytest.",
)
def agg_distinct_hashsampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textops import md5_hash60

    li = load(spark, sf_dir, "lineitem")
    h = md5_hash60(F.col("l_orderkey").cast("string"))
    sampled = F.when(h < _HS_THRESHOLD, F.col("l_orderkey"))
    # single count_distinct (a second identical one doubles the Expand
    # rows); the scaled estimate is a post-aggregation projection.
    return (
        li.groupBy("l_returnflag")
        .agg(F.count_distinct(sampled).alias("n_sampled"))
        .select(
            "l_returnflag",
            "n_sampled",
            (F.col("n_sampled") * (1 << _HS_SHIFT))
            .cast("long")
            .alias("est_distinct"),
        )
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
       STRFTIME(LAG(o_orderdate) OVER w, '%Y-%m-%d') AS prev_orderdate,
       STRFTIME(LEAD(o_orderdate) OVER w, '%Y-%m-%d') AS next_orderdate,
       CAST(NTILE(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice, o_orderkey) AS INT)
         AS price_quartile
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="Offset window functions (lag/lead) + ntile bucketing over one "
    "hash-partitioned shuffle per window spec; per-customer order "
    "timelines are the canonical sessionization precursor.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd")
    return o.select(
        "o_custkey",
        "o_orderkey",
        fmt("o_orderdate").alias("orderdate"),
        fmt(F.lag("o_orderdate").over(w)).alias("prev_orderdate"),
        fmt(F.lead("o_orderdate").over(w)).alias("next_orderdate"),
        F.ntile(4).over(wp).alias("price_quartile"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
WITH g AS (
  SELECT l_orderkey, LIST(l_quantity ORDER BY l_linenumber, l_quantity) AS qs
  FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(LEN(qs) AS INT) AS n_lines,
       array_to_string(list_transform(list_sort(qs), q -> CAST(q AS INT)), ',')
         AS sorted_qs,
       CAST(qs[1] AS DOUBLE) AS first_qty,
       list_contains(qs, 1.0) AS has_unit_qty,
       CAST(list_sum(list_transform(qs, q -> q * 2)) AS DOUBLE) AS double_total
FROM g
""",
    doc="Array scalar functions over grouped data: collect in declared "
    "order, sort, index, membership, transform+aggregate — all JVM "
    "higher-order functions, no UDFs. The sorted array is emitted as a "
    "comma-joined string (quantities are integral, so int-cast first): "
    "complex-typed output columns are banned registry-wide because the "
    "driver's canonicalizer cannot sort list cells.",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("pairs")
    )
    qs = F.transform(F.col("pairs"), lambda p: p["l_quantity"])
    return g.select(
        "l_orderkey",
        F.size(qs).alias("n_lines"),
        F.array_join(
            F.transform(F.array_sort(qs), lambda q: q.cast("int")), ","
        ).alias("sorted_qs"),
        F.get(qs, 0).alias("first_qty"),
        F.array_contains(qs, 1.0).alias("has_unit_qty"),
        F.aggregate(
            F.transform(qs, lambda q: q * 2), F.lit(0.0), lambda a, v: a + v
        ).alias("double_total"),
    )


@register(
    "scalar_variant_funcs",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
""",
    doc="Semi-structured VARIANT path (Spark 4): parse_json ingests the "
    "props JSON string into the binary VARIANT encoding once, then "
    "try_variant_get extracts typed fields without re-parsing — the "
    "scale-correct pattern for schema-flexible columns (parse once per "
    "row at scan, navigate cheaply thereafter), vs get_json_object "
    "which re-parses the string per extraction.",
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "agg_percentile_exact",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.50) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Exact continuous percentiles per group (complements the sketch "
    "path in agg_approx): Spark's percentile is a full-sort exact "
    "aggregate — the right tool when groups are few and bounded; at "
    "100 TB with high-cardinality groups, switch to percentile_approx "
    "(t-digest sketch, mergeable map-side). l_quantity is integer-"
    "valued, so the linear interpolation is exact in binary and "
    "bit-matches DuckDB's quantile_cont.",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "window_range_frame",
    oracle="""
WITH base AS (
  SELECT o_custkey, o_orderkey,
         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day,
         o_totalprice
  FROM orders
)
SELECT o_custkey, o_orderkey, day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
         PARTITION BY o_custkey ORDER BY day
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS spend_30d
FROM base
""",
    doc="RANGE-framed window (vs the ROWS frames elsewhere): rolling "
    "30-day spend per customer, frame bounds by ORDER-BY *value* so "
    "same-day peers always aggregate together. One hash-exchange on "
    "the partition key + one sort — same shuffle shape as any window; "
    "the decimal-sum trick keeps the rolling total order-insensitive.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
        ).cast("bigint").alias("day"),
        "o_totalprice",
    )
    w = (
        Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        "day",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


# One SQL text, two engines: executed verbatim by spark.sql() AND used
# verbatim as the DuckDB oracle — zero translation.
_PORTABLE_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_quantity < 25
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "sql_api_passthrough",
    oracle=_PORTABLE_SQL,
    doc="The engine's SQL entry path: tables registered as temp views, "
    "the query text submitted through spark.sql() — and the SAME text "
    "is the DuckDB oracle, proving the surface is ANSI-portable, not a "
    "DataFrame-only dialect. Catalyst compiles it to the identical "
    "pruned-scan partial+final aggregate plan the DataFrame twin gets.",
)
def sql_api_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PORTABLE_SQL)


# ---------------------------------------------------------------------------
# Join/window/generator/subquery surface extensions
# ---------------------------------------------------------------------------


@register(
    "join_theta_nl",
    oracle="""
SELECT a.n_name AS name_a, b.n_name AS name_b,
       a.n_regionkey AS region_a, b.n_regionkey AS region_b
FROM nation a JOIN nation b ON a.n_name < b.n_name
""",
    doc="Pure theta (inequality-only) self-join over nation: no equi "
    "component exists, so Catalyst plans BroadcastNestedLoopJoin — the "
    "correct physical choice because one side is tiny and broadcast. "
    "NLJ is the last-resort join the reference never needed (no joins "
    "at all, SURVEY §2.2); here it demonstrates the engine degrades "
    "gracefully for non-equi predicates instead of failing. At 100 TB "
    "a theta join is only sane when one side broadcasts; this plan "
    "shows exactly that shape (25-row build side).",
)
def join_theta_nl(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    a = n.select(
        F.col("n_name").alias("name_a"), F.col("n_regionkey").alias("region_a")
    )
    b = n.select(
        F.col("n_name").alias("name_b"), F.col("n_regionkey").alias("region_b")
    )
    return a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))


@register(
    "window_ntile_dist",
    oracle="""
SELECT c_custkey, n_name,
       NTILE(4) OVER w AS balance_quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer JOIN nation ON c_nationkey = n_nationkey
WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey)
""",
    doc="Distribution window functions (ntile / percent_rank / "
    "cume_dist) per nation, completing the window surface next to "
    "rank/dense_rank, lag/lead, running frames and range frames. The "
    "ORDER BY is made total with a c_custkey tie-break so ntile bucket "
    "boundaries are engine-deterministic. percent_rank and cume_dist "
    "divide integer rank/count pairs in double — bitwise reproducible. "
    "One hash shuffle on the partition key; per-partition sort only.",
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.join(
            F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
        )
        .select(
            "c_custkey",
            "n_name",
            F.ntile(4).over(w).alias("balance_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


_CORRELATED_SQL = """
SELECT c.c_custkey, c.c_acctbal
FROM customer c
WHERE CAST(c.c_acctbal AS DECIMAL(18,6))
      * (SELECT COUNT(*) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
      > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,6))) FROM customer c3
         WHERE c3.c_nationkey = c.c_nationkey)
"""


@register(
    "subquery_correlated",
    oracle=_CORRELATED_SQL,
    doc="Correlated scalar subqueries (customers above their nation's "
    "average balance), submitted as SQL text so Catalyst's subquery "
    "decorrelation rewrites both correlated aggregates into one "
    "grouped aggregate + join — the textbook optimizer transform, no "
    "per-row re-execution. The avg comparison is expressed as "
    "balance*count > sum in exact DECIMAL so the threshold has no "
    "float-division rounding and both engines agree on boundary rows. "
    "The identical SQL text runs verbatim on DuckDB as the oracle.",
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_CORRELATED_SQL)


@register(
    "scalar_map_funcs",
    oracle="""
WITH c AS (
  SELECT p_type, p_brand, COUNT(*) AS cnt FROM part GROUP BY p_type, p_brand
)
SELECT p_type,
       CAST(COUNT(*) OVER (PARTITION BY p_type) AS INT) AS n_brands,
       p_brand, cnt
FROM c
""",
    doc="MapType surface: per-type brand counts are folded into a "
    "map<string,bigint> with map_from_entries over a sorted entry "
    "array, inspected with size(), then exploded back to rows. The "
    "oracle reproduces the observable rows relationally — what is "
    "checked is that Spark's map construction/explosion is lossless. "
    "Map columns are the natural shape for sparse per-record metadata "
    "(e.g. multimodal props) at 100 TB: one column, no schema "
    "explosion, still prunable by key expression.",
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnts = (
        load(spark, sf_dir, "part")
        .groupBy("p_type", "p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mapped = cnts.groupBy("p_type").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("p_brand", "cnt")))
        ).alias("m")
    )
    return mapped.select(
        "p_type",
        F.size("m").alias("n_brands"),
        F.explode("m").alias("p_brand", "cnt"),
    )


@register(
    "explode_words",
    oracle="""
SELECT doc_id,
       CAST(unnest(range(0, len(string_split(text, ' ')))) AS BIGINT) AS pos,
       unnest(string_split(text, ' ')) AS word
FROM documents
WHERE doc_id % 25 = 0
""",
    doc="Generator (posexplode) surface: one row per word with its "
    "0-based position, the built-in row-generator the UDTF covers in "
    "Python. Generators run inside whole-stage codegen — no shuffle, "
    "no Python — so tokenize-to-rows at 100 TB is a pure map stage "
    "whose output feeds dedup shingling and token stats. Oracle zips "
    "two parallel UNNESTs (DuckDB aligns equal-length lists).",
)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    ).withColumn("pos", F.col("pos").cast("bigint"))


@register(
    "scalar_struct_funcs",
    oracle="""
SELECT o_orderkey,
       o_orderpriority AS pri,
       CAST(CAST(o_totalprice AS DECIMAL(18,6)) + 1.5 AS DOUBLE)
         AS bumped,
       CONCAT(o_orderstatus, ':', o_orderpriority) AS tag
FROM orders
WHERE o_orderkey % 40 = 0
""",
    doc="StructType surface: pack columns with F.struct, navigate with "
    "dot-paths, re-expand with struct.* — the nested-record shape every "
    "semi-structured 100 TB corpus carries. Struct create/access is a "
    "zero-cost projection in Tungsten (no serialization); the oracle "
    "sees only the flattened observable columns.",
)
def scalar_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 40 == 0)
    packed = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("price"),
        ).alias("rec"),
    )
    return packed.select(
        "o_orderkey",
        F.col("rec.priority").alias("pri"),
        (F.col("rec.price").cast(DEC) + F.lit(1.5))
        .cast("double")
        .alias("bumped"),
        F.concat_ws(":", "rec.status", "rec.priority").alias("tag"),
    )


@register(
    "window_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WHERE o_custkey % 20 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="Navigation window functions first_value / last_value / "
    "nth_value per customer order history. last_value uses an explicit "
    "UNBOUNDED FOLLOWING frame (the default frame stops at CURRENT ROW "
    "— the classic silent-wrong-answer both engines agree on only when "
    "spelled out). Total order via (o_orderdate, o_orderkey) tie-break. "
    "One hash Exchange + per-partition sort, same as every window op.",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") % 20 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "agg_max_by",
    oracle="""
SELECT o_orderpriority,
       arg_max(o_totalprice, o_orderkey) AS latest_price,
       arg_min(o_totalprice, o_orderkey) AS first_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
    doc="Selector aggregates max_by/min_by (DuckDB arg_max/arg_min): "
    "carry a payload column to the row holding the group's extreme "
    "key — the one-pass replacement for the join-back-to-self pattern. "
    "Keyed on the unique o_orderkey so the selection is total-order "
    "deterministic in both engines. Partial+final aggregation works "
    "because (value, key) pairs merge associatively; one tiny shuffle.",
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_totalprice", "o_orderkey").alias("latest_price"),
            F.min_by("o_totalprice", "o_orderkey").alias("first_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "set_union_by_name",
    oracle="""
SELECT part_key, source, size_val FROM (
  SELECT p_partkey AS part_key, 'catalog' AS source, p_size AS size_val
  FROM part WHERE p_size >= 48
  UNION ALL
  SELECT l_partkey AS part_key, 'observed' AS source, NULL AS size_val
  FROM lineitem WHERE l_orderkey % 500 = 0
) u
""",
    doc="Schema-aligning union (unionByName with allowMissingColumns): "
    "the branches declare columns in different orders and one side "
    "lacks size_val entirely — name-based alignment null-fills the "
    "gap, where positional UNION would silently mis-bind columns. The "
    "everyday shape for unioning heterogeneous corpus shards at 100 TB "
    "(schema drift across vintages); a pure narrow op, zero shuffle.",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = (
        load(spark, sf_dir, "part")
        .where(F.col("p_size") >= 48)
        .select(
            F.col("p_partkey").alias("part_key"),
            F.lit("catalog").alias("source"),
            F.col("p_size").alias("size_val"),
        )
    )
    # Different column order AND missing size_val: name alignment only.
    obs = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 500 == 0)
        .select(
            F.lit("observed").alias("source"),
            F.col("l_partkey").alias("part_key"),
        )
    )
    return cat.unionByName(obs, allowMissingColumns=True)


@register(
    "agg_bool",
    oracle="""
SELECT o_orderpriority,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderstatus = 'F') AS any_finished,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
         AS n_open
FROM orders
GROUP BY o_orderpriority
""",
    doc="Boolean aggregates (every/bool_and, any/bool_or) plus a "
    "FILTER-clause conditional count — the predicate-summary trio for "
    "data-quality assertions over a corpus ('all rows in range', 'any "
    "failure present', 'how many matched'). All three fold "
    "associatively → full map-side partial aggregation; the shuffle "
    "carries one boolean/long triple per (group × partition).",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
    )


@register(
    "scalar_bitwise",
    oracle="""
SELECT l_orderkey, l_linenumber,
       xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS key_xor,
       l_orderkey & 255 AS low_byte,
       l_orderkey >> 8 AS high_bits,
       ((l_orderkey << 3) | l_linenumber) & 1023 AS packed
FROM lineitem
WHERE l_orderkey % 250 = 0
""",
    doc="Bitwise scalar surface (xor/and/or/shifts): the building "
    "blocks of engine-side fingerprinting — simhash band packing, "
    "bloom probes, bucket ids all reduce to these. Pure codegen "
    "projections; the oracle reproduces each expression literally.",
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 250 == 0)
    key = F.col("l_orderkey")
    ln = F.col("l_linenumber").cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        key.bitwiseXOR(ln).alias("key_xor"),
        key.bitwiseAND(F.lit(255)).alias("low_byte"),
        F.shiftright(key, 8).alias("high_bits"),
        F.shiftleft(key, 3).bitwiseOR(ln).bitwiseAND(F.lit(1023)).alias("packed"),
    )


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  -- o_custkey < 200 restates the outer filter through the correlation
  -- (o_custkey = c_custkey AND c_custkey < 200): Catalyst does not
  -- infer it across the decorrelation, and without it the window
  -- top-k runs over EVERY customer's orders
  WHERE o.o_custkey = c.c_custkey AND o.o_custkey < 200
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_custkey < 200
"""


@register(
    "join_lateral_topk",
    oracle=_LATERAL_SQL,
    doc="LATERAL correlated subquery (top-2 orders per customer) — the "
    "same ANSI text runs on both engines. Catalyst DECORRELATES it: no "
    "per-customer re-execution survives; the physical plan is a "
    "WindowGroupLimit top-k (partial below the exchange, final above) "
    "joined back to customer — i.e. the optimizer rewrites the naive "
    "O(customers × orders) nested loop into the same single-pass "
    "windowed plan a hand-tuned query would use, which is what makes "
    "LATERAL usable on a 100 TB fact table. Asserted in "
    "tests/test_plans.py.",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


@register(
    "scalar_try_funcs",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE o_totalprice / (o_orderkey % 3) END AS safe_div,
       CAST(TRY_CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE)
            AS VARCHAR) AS date_roundtrip,
       CAST(TRY_CAST(o_orderpriority AS DATE) AS VARCHAR) AS bad_date
FROM orders
WHERE o_orderkey <= 2000
""",
    doc="Error-tolerant scalar surface: try_cast / try_divide return "
    "NULL instead of failing the job — the ingestion posture for dirty "
    "data (a malformed value quarantines as NULL; one bad row cannot "
    "kill a 100 TB scan the way ANSI-strict casts can). Exercises a "
    "failing string->int cast, a succeeding prefix cast, divide-by-zero "
    "suppression, and date casts both valid (round-tripped through a "
    "string, emitted as string per the cross-engine DATE gotcha) and "
    "malformed.",
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("bad_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_num"),
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 3).cast("double")
        ).alias("safe_div"),
        F.date_format("o_orderdate", "yyyy-MM-dd")
        .try_cast("date")
        .cast("string")
        .alias("date_roundtrip"),
        F.col("o_orderpriority").try_cast("date").cast("string").alias("bad_date"),
    )


@register(
    "window_rolling_median",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(quantile_cont(o_totalprice, 0.5) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ), 6) AS median_5,
       COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ) AS n_in_frame
FROM orders
WHERE o_custkey % 10 = 0
""",
    doc="Rolling median over a 5-row frame per customer: an exact "
    "order-statistic as a WINDOW aggregate (Spark `percentile` / DuckDB "
    "`quantile_cont`), the robust-trend primitive dashboards want where "
    "a rolling mean is outlier-sensitive. Same single exchange + sort "
    "as any window; the frame re-rank is O(frame) per row, so cost is "
    "rows x frame — at 100 TB keep frames bounded (ROWS k PRECEDING, "
    "never an unbounded percentile frame). Both engines interpolate the "
    "even-count midpoint; ROUND(.,6) absorbs the one-ulp "
    "interpolation-order difference.",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") % 10 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.expr("percentile(o_totalprice, 0.5)").over(w), 6).alias(
            "median_5"
        ),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


@register(
    "agg_mode",
    oracle="""
WITH counts AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT o_orderpriority, o_orderstatus, cnt,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY cnt DESC, o_orderstatus) AS rn
  FROM counts
)
SELECT o_orderpriority,
       o_orderstatus AS modal_status,
       cnt AS modal_count
FROM ranked WHERE rn = 1
""",
    doc="Deterministic mode (most frequent value) per group: count pairs, "
    "then rank (count DESC, value ASC) and keep the top row — explicit "
    "tie-breaking where the built-in `mode` aggregate leaves ties "
    "engine-defined (Spark and DuckDB would disagree silently). Two "
    "hash aggregates + a window over the tiny counts table; the heavy "
    "input reduces map-side in the first aggregate, so the window sees "
    "|groups x values| rows, not |input|.",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cnt").desc(), F.col("o_orderstatus")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("modal_status"),
            F.col("cnt").alias("modal_count"),
        )
    )


@register(
    "join_null_safe",
    oracle="""
WITH l AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 50 END AS k,
         o_totalprice
  FROM orders WHERE o_orderkey <= 4000
), r AS (
  SELECT CASE WHEN ck % 5 = 0 THEN NULL ELSE ck END AS k,
         ck AS bucket_id
  FROM (SELECT UNNEST(range(0, 50)) AS ck)
)
SELECT l.o_orderkey, r.bucket_id,
       CAST(SUM(CAST(l.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
GROUP BY l.o_orderkey, r.bucket_id
""",
    doc="Null-safe equality join (Spark `<=>` / SQL IS NOT DISTINCT "
    "FROM): NULL keys MATCH each other instead of silently dropping — "
    "the semantics dimension-join pipelines need when 'unknown' is a "
    "real bucket. Null-safe equality is still hashable, so this stays "
    "an equi-join (broadcast here; hash-partitionable at scale) rather "
    "than degrading to a nested-loop theta join — but every NULL "
    "hashes to ONE key, so a null-heavy fact side is exactly the "
    "skew-join case (salt the null bucket or split it out).",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 4000)
    l = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_orderkey") % 50
        ).alias("k"),
        "o_totalprice",
    )
    r = spark.range(50).select(
        F.when(F.col("id") % 5 == 0, F.lit(None)).otherwise(F.col("id")).alias("rk"),
        F.col("id").alias("bucket_id"),
    )
    return (
        l.join(F.broadcast(r), F.col("k").eqNullSafe(F.col("rk")))
        .groupBy("o_orderkey", "bucket_id")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "scalar_regex_funcs",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       LEN(regexp_extract_all(p_type, '[A-Z]+')) AS n_upper_runs,
       CASE WHEN regexp_matches(p_brand, '^Brand#[0-9]+$')
            THEN 1 ELSE 0 END AS brand_wellformed
FROM part
WHERE p_partkey <= 2000
""",
    doc="Regular-expression scalar surface: extract (group capture), "
    "global replace, extract-all counting, and full-match predicates — "
    "the text-wrangling quartet every ingest cleanup uses. Patterns "
    "stay in the POSIX-class subset identical between Java regex "
    "(Spark) and RE2 (DuckDB); all JVM codegen, no UDF. At scale the "
    "only caveat is catastrophic backtracking in Java regex — RE2-safe "
    "patterns (no nested quantifiers) keep per-row cost linear.",
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") <= 2000)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.size(F.expr(r"regexp_extract_all(p_type, '[A-Z]+', 0)")).alias(
            "n_upper_runs"
        ),
        F.when(
            F.col("p_brand").rlike(r"^Brand#[0-9]+$"), F.lit(1)
        ).otherwise(F.lit(0)).alias("brand_wellformed"),
    )


@register(
    "agg_weighted_avg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))
                * CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
         AS wavg_price,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_weight
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Weighted mean (quantity-weighted unit price): Σwx/Σw from two "
    "exact-decimal sums in one map-side-combined aggregate — the "
    "correct way to average ratios at any scale (a plain AVG of "
    "per-row prices answers a different question). One shuffle; the "
    "single final division is the only double operation.",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = F.col("l_quantity").cast("decimal(15,2)")
    x = F.col("l_extendedprice").cast("decimal(15,2)")
    return li.groupBy("l_returnflag").agg(
        (
            F.sum(w * x).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
        ).alias("wavg_price"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_weight"),
    )


@register(
    "window_pct_of_total",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       ROUND(CAST(o_totalprice AS DOUBLE)
             / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                    OVER (PARTITION BY o_orderpriority) AS DOUBLE) * 100.0,
             9) AS pct_of_priority
FROM orders
WHERE o_orderkey <= 4000
""",
    doc="Percent-of-total (share within group): each row against its "
    "partition's unbounded sum — the BI contribution metric. The "
    "whole-partition frame needs no ORDER BY, so the window is one "
    "exchange + no sort (Spark plans an unordered WindowExec); the "
    "denominator is the exact-decimal sum cast once, and the share "
    "rounds at a cross-engine-exact scale.",
)
def window_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 4000)
    w = Window.partitionBy("o_orderpriority")
    denom = F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast(
        "double"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(
            F.col("o_totalprice").cast("double") / denom * 100.0, 9
        ).alias("pct_of_priority"),
    )


@register(
    "agg_topk_array",
    oracle="""
WITH s AS (
  SELECT o_orderpriority,
         list_sort(list(o_totalprice), 'DESC') AS prices
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(prices[1] AS DOUBLE) AS top1_price,
       CAST(prices[2] AS DOUBLE) AS top2_price,
       CAST(prices[3] AS DOUBLE) AS top3_price
FROM s
""",
    doc="Top-k VALUES as an array aggregate: collect, sort descending, "
    "slice, project the leaderboard into scalar top1/top2/top3 columns "
    "(contrast with window_topk_per_group, which keeps whole rows via "
    "WindowGroupLimit and is the right choice when k rows must "
    "survive). Scale caveat is explicit: collect_list materializes "
    "each group in one executor, so this form is for "
    "bounded-cardinality groups; unbounded groups should pre-prune "
    "with the windowed top-k first and only then collect k values.",
)
def agg_topk_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    top = F.slice(F.reverse(F.array_sort(F.collect_list("o_totalprice"))), 1, 3)
    return o.groupBy("o_orderpriority").agg(
        F.get(top, 0).alias("top1_price"),
        F.get(top, 1).alias("top2_price"),
        F.get(top, 2).alias("top3_price"),
    )


@register(
    "agg_hll_union",
    oracle=None,  # sketch estimates are impl-specific; tolerance pytest
    gated_by="agg_sketch_bounds",  # oracle-bearing in-plan bound audit
    doc="Mergeable HLL sketches (Apache DataSketches): per-priority "
    "customer sketches built with hll_sketch_agg, then UNIONED with "
    "hll_union_agg into a global estimate — the property that makes "
    "sketches the 100 TB answer for distinct counts: partial sketches "
    "from every partition/day/segment merge losslessly without "
    "re-touching data, unlike exact COUNT(DISTINCT) whose partials "
    "are full key sets. Output carries per-group estimates, the "
    "union-of-groups estimate, and the exact global count to expose "
    "the error (tolerance-tested; no SQL oracle because sketch "
    "internals are implementation-specific).",
)
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    sketches = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.approx_count_distinct("o_custkey").alias("approx_custs"),
    )
    unioned = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
    )
    per_group = sketches.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("est_custs"),
    )
    exact = o.agg(F.count_distinct("o_custkey").alias("exact_union"))
    # Both right sides are 1-row aggregates: pin the broadcast so the
    # AQE-off plan is the same BroadcastNestedLoopJoin AQE would pick.
    return per_group.crossJoin(F.broadcast(unioned)).crossJoin(F.broadcast(exact))


# Sketch-audit bounds for agg_sketch_bounds. Published error rates:
# approx_count_distinct runs HLL++ at the requested rsd=0.02 (3 sigma
# = 6% relative), hll_sketch_agg's default lgConfigK=12 gives rsd ~
# 1.04/sqrt(2^12) = 1.6% (3 sigma ~ 5%). Measured worst relative error
# across the shipped SFs is far inside both (see
# tests/test_llm_ops.py::test_agg_sketch_bounds_all_true); the pinned
# bounds keep >=2x margin over measured while still catching a broken
# sketch — an order-of-magnitude drift trips every clause.
_HLL_REL_BOUND = 0.06
_ACD_REL_BOUND = 0.08
# percentile_approx(accuracy=10000) guarantees rank error <= n/1e4;
# allow 20x the published bound (still only 0.2% of group rows).
_PCTL_RANK_TOL = 20.0 / 10000.0


@register(
    "agg_sketch_bounds",
    oracle="""
SELECT CAST(5 AS BIGINT) AS hll_groups, TRUE AS hll_groups_ok,
       TRUE AS hll_union_ok, CAST(3 AS BIGINT) AS pctl_groups,
       TRUE AS approx_cd_ok, TRUE AS pctl_rank_ok
""",
    doc="Driver-gated audit of the two sketch queries whose raw "
    "estimates are approximate by construction (agg_approx, "
    "agg_hll_union — the registry's only oracle-less aggregates, "
    "no_oracle since r05): recomputes each estimate IN-PLAN next to "
    "its exact counterpart and emits constant booleans — HLL per-group "
    "and union estimates within their published relative-error bounds "
    "of exact COUNT(DISTINCT), approx_count_distinct likewise, and "
    "each percentile_approx value within rank tolerance of its "
    "requested quantile — against a literal all-TRUE DuckDB oracle "
    "(the sim_recall_* companion pattern, ops/similarity.py). Group "
    "counts are emitted too so a silently-empty audit can't pass. "
    "Scale shape: one broadcast of the tiny estimate rows into each "
    "fact scan, partial+final single-row aggregates, no corpus-scale "
    "shuffle beyond what the audited queries already do.",
)
def agg_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    # --- HLL side: agg_hll_union's estimates vs exact distincts ---
    o = load(spark, sf_dir, "orders")
    exact_pg = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("__exact_custs")
    )
    hll = agg_hll_union(spark, sf_dir).join(
        F.broadcast(exact_pg), "o_orderpriority"
    )
    hll_row = hll.agg(
        F.count(F.lit(1)).alias("hll_groups"),
        F.bool_and(
            F.abs(F.col("est_custs") - F.col("__exact_custs"))
            <= F.lit(_HLL_REL_BOUND) * F.col("__exact_custs")
        ).alias("hll_groups_ok"),
        F.bool_and(
            F.abs(F.col("est_union") - F.col("exact_union"))
            <= F.lit(_HLL_REL_BOUND) * F.col("exact_union")
        ).alias("hll_union_ok"),
    )

    # --- KLL/HLL++ side: agg_approx's per-group estimates. The 3-row
    # estimate table broadcasts into the lineitem scan; per group we
    # count rows strictly below / at-or-below each reported percentile
    # value (its rank interval) and the exact distinct order count.
    ap = agg_approx(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_extendedprice"
    )
    j = li.join(F.broadcast(ap), "l_returnflag")
    rank_aggs = []
    for col in ("p50_price", "p95_price", "p99_price"):
        rank_aggs.append(
            F.sum(
                F.when(F.col("l_extendedprice") < F.col(col), 1).otherwise(0)
            ).alias(f"__lt_{col}")
        )
        rank_aggs.append(
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col(col), 1).otherwise(0)
            ).alias(f"__le_{col}")
        )
    g = j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct("l_orderkey").alias("__exact_orders"),
        F.first("approx_orders").alias("__approx_orders"),
        *rank_aggs,
    )
    rank_ok = F.lit(True)
    for q, col in ((0.5, "p50_price"), (0.95, "p95_price"), (0.99, "p99_price")):
        rank_ok = (
            rank_ok
            & (F.col(f"__lt_{col}") <= F.lit(q + _PCTL_RANK_TOL) * F.col("__n"))
            & (F.col(f"__le_{col}") >= F.lit(q - _PCTL_RANK_TOL) * F.col("__n"))
        )
    pctl_row = g.agg(
        F.count(F.lit(1)).alias("pctl_groups"),
        F.bool_and(
            F.abs(F.col("__approx_orders") - F.col("__exact_orders"))
            <= F.lit(_ACD_REL_BOUND) * F.col("__exact_orders")
        ).alias("approx_cd_ok"),
        F.bool_and(rank_ok).alias("pctl_rank_ok"),
    )
    # 1-row x 1-row: pin the broadcast so AQE-off plans the same BNLJ
    # AQE would pick (tests/test_plans.py one-row crossJoin pin).
    return hll_row.crossJoin(F.broadcast(pctl_row))


@register(
    "sql_api_parameterized",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_totalprice < 150000.0 AND o_orderpriority <> '5-LOW'
GROUP BY o_orderpriority
""",
    doc="Parameterized SQL (spark.sql named args): the injection-safe "
    "templating surface — parameters bind as typed literals in the "
    "parsed plan, so constant folding and predicate pushdown see real "
    "constants (identical plan to inlined literals, unlike string "
    "concatenation which risks both injection and cache misses). The "
    "oracle runs the equivalent inlined text.",
)
def sql_api_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_price
        FROM orders_v
        WHERE o_totalprice < :cap AND o_orderpriority <> :excl
        GROUP BY o_orderpriority
        """,
        args={"cap": 150000.0, "excl": "5-LOW"},
    )


@register(
    "agg_salted_twophase",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Skew-safe two-phase aggregation: phase 1 groups by (key, "
    "salt) — a hot key's rows spread over 16 salt buckets instead of "
    "one reducer — phase 2 re-aggregates the 16 partials per key. "
    "Oracle-identical to the direct aggregate because count/sum are "
    "algebraic (partials compose); this is the manual fallback when a "
    "LOW-CARDINALITY group-by key concentrates on few reducers and "
    "map-side partial aggregation alone can't help (e.g. high-entropy "
    "rows per group defeat the in-memory partial map). Exact-decimal "
    "sums keep the two-phase result bit-identical to one-phase.",
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", F.spark_partition_id() % 16)
    phase1 = salted.groupBy("l_returnflag", "__salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_quantity").cast("long")).alias("pq"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("pp"),
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("pq").alias("sum_qty"),
        F.sum("pp").cast("double").alias("sum_price"),
    )


@register(
    "agg_grouping_id_flags",
    oracle="""
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc="GROUPING()/grouping-id flags over a rollup: the only reliable "
    "way to tell a real NULL group value from a rollup subtotal row — "
    "COALESCE placeholders alone are ambiguous the moment the data "
    "contains the placeholder. Same single Expand-based aggregate as "
    "any rollup; the flags are free metadata columns, not extra "
    "compute.",
)
def agg_grouping_id_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "g_status",
            "g_priority",
            "n",
        )
    )


@register(
    "window_longest_streak",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, time_bucket(INTERVAL '1 day', ts) AS d
  FROM events
), grouped AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) * INTERVAL '1 day' AS anchor
  FROM days
), streaks AS (
  SELECT user_id, anchor, COUNT(*) AS len
  FROM grouped GROUP BY user_id, anchor
)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak
FROM streaks GROUP BY user_id
""",
    doc="Longest consecutive-day activity streak per user — the classic "
    "gaps-and-islands reduction: distinct active days, row_number along "
    "the per-user day sequence, and (day − rn) is CONSTANT exactly "
    "within a consecutive run, so one groupBy on that anchor measures "
    "every streak and a max finishes it. One window over one "
    "partition-local sort plus two hash aggregates on the tiny "
    "distinct-days table; raw event volume only touches the initial "
    "DISTINCT.",
)
def window_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.withColumn(
        "anchor",
        F.col("d") - F.make_dt_interval(days=F.row_number().over(w)),
    )
    streaks = grouped.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak")
    )


@register(
    "scalar_date_arith",
    oracle="""
SELECT o_orderkey,
       STRFTIME(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS due_45d,
       STRFTIME(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
       STRFTIME(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch95,
       (YEAR(o_orderdate) - 1995) * 12 + MONTH(o_orderdate) - 1
         AS months_since_epoch95
FROM orders
WHERE o_orderkey <= 1000
""",
    doc="Date ARITHMETIC surface (the extraction twin covers parts): "
    "day/month interval addition, end-of-month, and integer day/month "
    "differences — the due-date/aging/cohort-bucketing primitives. "
    "Month arithmetic follows the clamped-end-of-month convention both "
    "engines share (Jan 31 + 1 month = Feb 28); month DIFFERENCE is "
    "computed as the mirrored integer formula because Spark's "
    "months_between returns engine-specific fractions. Dates emit as "
    "formatted strings per the cross-engine DATE round-trip gotcha. "
    "All codegen projections — zero shuffles.",
)
def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 45), "yyyy-MM-dd").alias("due_45d"),
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("next_month"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch95"),
        ((F.year(d) - 1995) * 12 + F.month(d) - 1)
        .cast("long")
        .alias("months_since_epoch95"),
    )


@register(
    "agg_multi_distinct",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderdate) AS n_days,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
    doc="Multiple DISTINCT aggregates in one GROUP BY: Spark plans this "
    "via Expand (each row replicated once per distinct column with the "
    "others nulled) so ONE aggregate pipeline computes all distincts — "
    "no self-join of the table per distinct column, which is what "
    "naive rewrites do. The cost model to know at 100 TB: Expand "
    "multiplies shuffled rows by the number of distinct columns, so "
    "many distinct aggregates on a wide fact table may be cheaper as "
    "separate sketches (agg_hll_union) merged afterwards.",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count_distinct("o_orderdate").alias("n_days"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "window_repurchase_gaps",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT CAST(LEAST(FLOOR(gap_days / 30.0), 12) AS INTEGER) AS gap_bucket_30d,
       COUNT(*) AS n_gaps,
       CAST(MIN(gap_days) AS BIGINT) AS min_gap,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap
FROM gaps
WHERE gap_days IS NOT NULL
GROUP BY 1
""",
    doc="Repurchase-gap distribution: per-customer consecutive-order "
    "day gaps (window lag over one partition-local sort, deterministic "
    "(date, orderkey) tie-break) binned into 30-day buckets with a "
    "closed-form clamped bin key — the repurchase-cycle histogram "
    "behind retention and replenishment models. One exchange for the "
    "window + one for the tiny bucket aggregate; output cardinality is "
    "the bucket count at any scale.",
)
def window_repurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    bucket = F.least(
        F.floor(F.col("gap_days") / 30.0), F.lit(12)
    ).cast("int")
    return gaps.groupBy(bucket.alias("gap_bucket_30d")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap"),
        F.max("gap_days").cast("long").alias("max_gap"),
    )


@register(
    "scalar_url_funcs",
    oracle="""
SELECT c_custkey,
       LOWER(c_mktsegment) || '.example.com' AS host,
       '/cust/' || CAST(c_custkey AS VARCHAR) AS path,
       CAST(c_nationkey AS VARCHAR) AS nat_param,
       REPLACE(c_name, '#', '%23') AS name_encoded,
       c_name AS name_roundtrip
FROM customer
""",
    doc="URL scalar family (web-crawl curation surface): build a URL "
    "JVM-side, then recover host/path/query-param with parse_url and "
    "round-trip the percent-encoded name with url_encode/url_decode. "
    "The oracle predicts every output analytically from the "
    "construction rule, so a parse_url or codec deviation breaks the "
    "hash match. Pure codegen expressions — no UDF, no shuffle.",
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://"),
        F.lower("c_mktsegment"),
        F.lit(".example.com/cust/"),
        F.col("c_custkey").cast("string"),
        F.lit("?nat="),
        F.col("c_nationkey").cast("string"),
        F.lit("&name="),
        F.url_encode("c_name"),
    )
    return c.select(
        "c_custkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("nat")).alias("nat_param"),
        F.url_encode("c_name").alias("name_encoded"),
        F.url_decode(F.url_encode("c_name")).alias("name_roundtrip"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END)
           AS n_customers_even
FROM orders
GROUP BY o_orderpriority
""",
    doc="EXACT distinct counting via mergeable bitmap partials (the "
    "Kylin/Doris/ClickHouse pattern): keys hash to (bucket, bit) via "
    "bitmap_bucket_number/bitmap_bit_position, one hash aggregate "
    "builds a bitmap per (group, bucket) — a compact mergeable partial "
    "— and a second sums bitmap_count per group. Unlike COUNT(DISTINCT) "
    "this partial is re-aggregatable (bitmap_or_agg merges the "
    "even-orderkey sub-cube without touching raw rows — demonstrated by "
    "the second measure), which is what lets a 100 TB rollup keep exact "
    "distincts in a cube: partials are unioned across days/partitions "
    "in O(bitmap) instead of re-scanning keys. Both measures are "
    "oracle-checked against plain COUNT(DISTINCT).",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    buckets = (
        o.groupBy(
            "o_orderpriority",
            F.bitmap_bucket_number("o_custkey").alias("bucket"),
        ).agg(
            F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm"),
            F.bitmap_construct_agg(
                F.when(
                    F.col("o_orderkey") % 2 == 0,
                    F.bitmap_bit_position("o_custkey"),
                )
            ).alias("bm_even"),
        )
        # re-aggregation layer: merge the per-(group,bucket) partials
        # with bitmap_or_agg exactly as a cube rollup would merge
        # per-day partials — a no-op here (keys already unique) but it
        # pins the mergeable path in the plan.
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.bitmap_or_agg("bm").alias("bm"),
            F.bitmap_or_agg("bm_even").alias("bm_even"),
        )
    )
    return buckets.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count("bm")).alias("n_customers"),
        # a group with zero matching keys sums all-null partials → null,
        # but COUNT(DISTINCT CASE ...) yields 0 — coalesce to match
        F.coalesce(F.sum(F.bitmap_count("bm_even")), F.lit(0).cast("bigint")).alias(
            "n_customers_even"
        ),
    )


@register(
    "join_dpp_pruned",
    oracle=f"""
WITH dim AS (
    SELECT DISTINCT o_orderpriority AS pr FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
)
SELECT o_orderpriority, COUNT(*) AS n, {sql_dsum('o_totalprice', 'sum_price')}
FROM orders JOIN dim ON o_orderpriority = pr
GROUP BY o_orderpriority
""",
    doc="Dynamic partition pruning: the fact table is laid out "
    "partitioned by o_orderpriority; the join's dim side (a filtered "
    "derived table, unknowable at plan time) broadcasts, and Spark "
    "injects its key set into the fact scan's PartitionFilters at "
    "RUNTIME — pruned partitions are never read. At 100 TB this is "
    "the date-dim ⋈ fact pattern: a predicate on the dim alone skips "
    "whole fact partitions without the user restating it on the fact. "
    "The plan test asserts `dynamicpruning` reaches the scan; the "
    "oracle computes the same join declaratively.",
)
def join_dpp_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    out = os.path.join(tempfile.mkdtemp(prefix="dpp_"), "orders_part")
    o = load(spark, sf_dir, "orders")
    try:
        o.write.partitionBy("o_orderpriority").parquet(out)
        fact = spark.read.parquet(out)
        dim = (
            o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .select(F.col("o_orderpriority").alias("pr"))
            .distinct()
        )
        return (
            fact.join(F.broadcast(dim), F.col("o_orderpriority") == F.col("pr"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price"))
            .localCheckpoint()  # materialize before the temp dir is removed
        )
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)


_SUBQ_MIXED_SQL = """
SELECT n_name,
       (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
           AS n_customers,
       (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey)
           AS n_suppliers
FROM nation
WHERE n_nationkey IN (SELECT c_nationkey FROM customer
                      WHERE c_acctbal > 9000)
  AND EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
  AND NOT EXISTS (SELECT 1 FROM supplier
                  WHERE s_nationkey = n_nationkey AND s_acctbal < -900)
"""


@register(
    "subquery_mixed_forms",
    oracle=_SUBQ_MIXED_SQL,
    doc="The full subquery surface in one statement: two correlated "
    "scalar subqueries, an IN predicate, EXISTS, and NOT EXISTS. "
    "Catalyst decorrelates every form into joins — scalar counts "
    "become grouped aggregates joined back, IN/EXISTS become "
    "left-semi, NOT EXISTS becomes left-anti — so nothing re-executes "
    "per outer row (the naive evaluation would be five passes over "
    "the inner tables PER nation). The identical ANSI text runs "
    "verbatim as the DuckDB oracle.",
)
def subquery_mixed_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("nation", "customer", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SUBQ_MIXED_SQL)


@register(
    "sql_api_registered_udf",
    oracle="""
SELECT c_custkey,
       ((CAST(floor(c_acctbal) AS BIGINT) % 97) + 97) % 97 AS bal_bucket,
       UPPER(c_mktsegment) || ':' || CAST(c_nationkey AS VARCHAR) AS seg_tag
FROM customer
""",
    doc="User extension through the SQL entry path: an Arrow-batched "
    "pandas UDF registered with spark.udf.register and called from "
    "SQL text beside built-ins — the surface that lets SQL-only "
    "users consume Python extensions. The UDF computes the same "
    "integer bucket the oracle derives arithmetically, so "
    "registration, Arrow transfer, and null handling are all "
    "hash-checked. Arrow batching keeps the Python boundary "
    "vectorized (~10-100x over row-at-a-time UDFs in the hot path).",
)
def sql_api_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _bal_bucket(bal):
        return bal.apply(lambda v: int(math.floor(v)) % 97)

    # explicit annotations (local import means string hints would not
    # resolve from module globals during pandas_udf inference)
    _bal_bucket.__annotations__ = {"bal": pd.Series, "return": pd.Series}
    bal_bucket = pandas_udf(_bal_bucket, "long")

    spark.udf.register("bal_bucket", bal_bucket)
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey,
               bal_bucket(c_acctbal) AS bal_bucket,
               UPPER(c_mktsegment) || ':' || CAST(c_nationkey AS STRING)
                   AS seg_tag
        FROM customer
        """
    )


@register(
    "agg_listagg_ordered",
    oracle="""
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       string_agg(DISTINCT CAST(n_nationkey % 5 AS VARCHAR), '|'
                  ORDER BY CAST(n_nationkey % 5 AS VARCHAR)) AS key_mods
FROM nation
GROUP BY n_regionkey
""",
    doc="Ordered string aggregation (LISTAGG ... WITHIN GROUP): "
    "per-region nation roster plus a DISTINCT ordered variant — the "
    "reporting concatenation every warehouse dialect grew. The "
    "WITHIN-GROUP sort is per group inside the aggregate (no global "
    "sort), and because the output is order-DEFINED it is "
    "hash-stable across partitionings — unlike a bare collect_list, "
    "whose order is execution-dependent and would flake the oracle.",
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
            "nations"
        ),
        F.expr(
            "listagg(DISTINCT CAST(n_nationkey % 5 AS STRING), '|') "
            "WITHIN GROUP (ORDER BY CAST(n_nationkey % 5 AS STRING))"
        ).alias("key_mods"),
    )


# ------------------------------------------------ bloom-filter join

# Two affine-mod hash positions per key into a 4096-bit filter
# (64 x 64-bit words). Same cross-engine-exact hashing family as the
# Count-Min sketch (ops/analytics.py) — the filter itself never needs
# an oracle because blooms have NO false negatives: the final equi-join
# removes false positives, so the result equals the plain join and the
# plain join IS the oracle.
_BLOOM_BITS = 4096
_BLOOM_P = 2_147_483_647
_BLOOM_HASHES = [(1_299_721, 104_729), (49_979_687, 67_867_967)]
_BLOOM_PRICE_MIN = 400_000.0


@register(
    "join_bloom_prefilter",
    oracle=f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM lineitem l
JOIN (SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_totalprice > {_BLOOM_PRICE_MIN}) o
  ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    doc="Bloom-filter pre-filtered join — the runtime-filter technique "
    "spelled out as DataFrame ops: the selective build side (orders "
    f"with o_totalprice > {_BLOOM_PRICE_MIN:,.0f}, ~1-2% of keys) is "
    f"folded into a {_BLOOM_BITS}-bit bloom (64 longs via bit_or "
    "aggregation, 2 affine-mod hashes), the bloom is BROADCAST, and "
    "probe rows that miss either bit are discarded MAP-SIDE before "
    "the shuffle join — at 100 TB this is what turns a full fact-"
    "table shuffle into a shuffle of only plausible matches (Spark's "
    "own runtime bloom does this invisibly when stats allow; here it "
    "is explicit and always on). No false negatives, so the final "
    "equi-join makes the result exactly the plain join — which is "
    "the oracle. Everything is JVM bit arithmetic; the filter tables "
    "are 64 rows each.",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    build = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > _BLOOM_PRICE_MIN)
        .select("o_orderkey", "o_orderpriority")
    )

    def positions(k):
        return [
            ((F.lit(a) * k.cast("bigint") + F.lit(b)) % F.lit(_BLOOM_P))
            % F.lit(_BLOOM_BITS)
            for a, b in _BLOOM_HASHES
        ]

    # 64-long bitmap: explode each key's two positions, OR the bits.
    # localCheckpoint so BOTH probe joins read the one materialized
    # 64-row bitmap instead of rebuilding it per reference (alias
    # renames defeat Spark's broadcast-exchange reuse here).
    bloom = (
        build.select(
            F.explode(F.array(*positions(F.col("o_orderkey")))).alias("pos")
        )
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
        .localCheckpoint(eager=False)
    )

    probe = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    for i, pos in enumerate(positions(F.col("l_orderkey"))):
        b = bloom.select(
            F.col("word").alias(f"w{i}"), F.col("mask").alias(f"m{i}")
        )
        probe = (
            probe.withColumn(f"p{i}", pos)
            .join(
                F.broadcast(b),
                (F.col(f"p{i}") / 64).cast("int") == F.col(f"w{i}"),
            )
            .where(
                F.expr(
                    f"(shiftright(m{i}, cast(p{i} % 64 as int)) & 1) = 1"
                )
            )
            .drop(f"p{i}", f"w{i}", f"m{i}")
        )
    return (
        probe.join(build, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


_FILTER_CLAUSE_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_price,
       MAX(l_quantity) FILTER (WHERE l_linestatus = 'F') AS max_qty_f
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "agg_filter_clause",
    oracle=_FILTER_CLAUSE_SQL,
    doc="ANSI FILTER-clause aggregates — per-aggregate predicates in "
    "ONE pass (the idiom that replaces N self-joins or N CASE "
    "pyramids): identical SQL text runs through spark.sql() and the "
    "DuckDB oracle. Catalyst compiles each FILTER into the aggregate "
    "expression, so the plan stays one pruned scan + partial/final "
    "hash aggregate — adding a filtered aggregate costs zero extra "
    "scans or shuffles at any scale. Decimal-exact money sum per the "
    "engine-wide determinism rule.",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_FILTER_CLAUSE_SQL)


SKYLINE_BUCKETS = 1024  # range-prune granularity; output-invariant


@register(
    "skyline_pareto_front",
    oracle="""
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
""",
    doc="Skyline / Pareto-front query: the parts no other part "
    "dominates on (minimize retail price, maximize size) — the "
    "classic multi-criteria shortlist operator. The oracle is the "
    "quadratic NOT-EXISTS dominance spec; the engine computes the "
    "same set in ONE linear pass over sorted distinct prices: "
    "pre-aggregate max size per distinct price (hash aggregate, "
    "bounded by price cardinality), PRUNE dominated prices with a "
    "range-bucket filter before any global ordering: prices map to "
    f"{SKYLINE_BUCKETS} range buckets (floor is monotone, so a lower "
    "bucket implies a STRICTLY lower price under any FP rounding), a "
    "per-bucket max-size aggregate plus a lag-of-cummax window over "
    "the bucket rows yields each bucket's best strictly-lower-bucket "
    "size, and a price survives only if it beats that — sound "
    "because the pruning witness dominates, and the strictly-cheaper "
    "running max over survivors still equals the true running max "
    "(any pruned argmax's dominator is itself cheaper and at least "
    "as large, by induction down to a survivor). The global "
    "lag-of-cummax then runs over the pruned survivors only: a part "
    "is on the skyline iff it is the max-size at its price AND beats "
    "every strictly-cheaper price's best size. The bucket table is "
    f"O({SKYLINE_BUCKETS}) rows, its window trivial, and the "
    "survivor set ~O(buckets + skyline), so the sole data-sized "
    "ordered window disappears even on unbounded price domains — the "
    "scale fix for the r5-verdict global-window nit. Pruned prices "
    "vanish from the broadcast join, which is also correct: every "
    "part at a pruned price is dominated. Pruning is deterministic "
    "(no partition-layout dependence) and the oracle is unchanged.",
)
def skyline_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    bounds = part.agg(
        F.min("p_retailprice").alias("lo"), F.max("p_retailprice").alias("hi")
    )
    nb = F.lit(SKYLINE_BUCKETS)
    bkt = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                nb - 1,
                F.floor(
                    (F.col("p_retailprice") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / nb)
                ),
            )
        )
        .cast("int")
    )
    # bucket maxima straight off the raw scan (map-side combine to
    # <= SKYLINE_BUCKETS rows per task) — per_price keeps ONE consumer
    # so its shuffle never duplicates
    bmax = (
        part.join(F.broadcast(bounds))
        .groupBy(bkt.alias("bkt"))
        .agg(F.max("p_size").alias("bmax"))
    )
    wb = Window.partitionBy().orderBy("bkt")
    bprev = (
        bmax.withColumn(
            "bcmax",
            F.max("bmax").over(wb.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("prevmax", F.lag("bcmax").over(wb))
        .select("bkt", "prevmax")
    )
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("pmax")
    )
    local = (
        per_price.join(F.broadcast(bounds))
        .withColumn("bkt", bkt)
        .join(F.broadcast(bprev), "bkt")
        .where(F.col("prevmax").isNull() | (F.col("prevmax") < F.col("pmax")))
        .select("p_retailprice", "pmax")
    )
    wo = Window.partitionBy().orderBy("p_retailprice")
    # two steps: a window function can't be an argument of another
    run = local.withColumn(
        "cmax",
        F.max("pmax").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("strictmax", F.lag("cmax").over(wo))
    joined = part.join(F.broadcast(run), "p_retailprice")
    return joined.where(
        (F.col("p_size") == F.col("pmax"))
        & (F.col("strictmax").isNull() | (F.col("strictmax") < F.col("p_size")))
    ).select("p_partkey", "p_retailprice", "p_size")


@register(
    "join_interval_overlap",
    oracle="""
WITH o AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 14 AS INTEGER) AS e
  FROM orders WHERE o_orderkey < 3000
),
a AS (SELECT * FROM o WHERE st = 'F'),
b AS (SELECT * FROM o WHERE st = 'O')
SELECT strftime(GREATEST(a.s, b.s), '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(DATEDIFF('day', GREATEST(a.s, b.s), LEAST(a.e, b.e)) + 1)
            AS BIGINT) AS overlap_days
FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
GROUP BY 1
""",
    doc="Interval-overlap join WITHOUT an equi key — the "
    "genomics/uptime-window/session-intersection shape a naive plan "
    "turns into a cartesian product. Engine strategy is bin-and-"
    "prune: each interval explodes to the calendar months it covers "
    "(bounded fan-out: span/bin + 1), the join becomes an EQUI join "
    "on the month bin, and the true overlap predicate filters bin "
    "collisions. Double counting of pairs spanning several shared "
    "months is eliminated WITHOUT a distinct: a pair is credited "
    "only in the month of GREATEST(start) — a point both intervals "
    "contain whenever they overlap, so each overlapping pair "
    "survives in exactly one bin. The oracle is the direct "
    "inequality join (DuckDB's IEJoin); the engine never builds it. "
    "At scale, pick the bin width ~ median interval span so per-bin "
    "occupancy (the quadratic term) stays bounded.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 3000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("st"),
            F.to_date("o_orderdate").alias("s"),
            F.date_add(
                F.to_date("o_orderdate"),
                (F.col("o_orderkey") % 14).cast("int"),
            ).alias("e"),
        )
    )

    def binned(side: DataFrame, tag: str) -> DataFrame:
        months = F.sequence(
            F.trunc(F.col("s"), "month"),
            F.trunc(F.col("e"), "month"),
            F.expr("interval 1 month"),
        )
        return side.select(
            F.col("k").alias(f"k_{tag}"),
            F.col("s").alias(f"s_{tag}"),
            F.col("e").alias(f"e_{tag}"),
            F.explode(months).alias("bin"),
        )

    a = binned(o.where(F.col("st") == "F"), "a")
    b = binned(o.where(F.col("st") == "O"), "b")
    start_max = F.greatest("s_a", "s_b")
    pairs = a.join(b, "bin").where(
        (F.col("s_a") <= F.col("e_b"))
        & (F.col("s_b") <= F.col("e_a"))
        & (F.trunc(start_max, "month") == F.col("bin"))
    )
    return pairs.groupBy(
        F.date_format(start_max, "yyyy-MM").alias("month")
    ).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(
            F.datediff(F.least("e_a", "e_b"), start_max) + 1
        ).cast("long").alias("overlap_days"),
    )


_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1995-01-01' AS m
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < DATE '2001-08-01'
),
monthly AS (
  SELECT substr(CAST(o_orderdate AS STRING), 1, 7) AS month,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT substr(CAST(m AS STRING), 1, 7) AS month,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       COALESCE(revenue, CAST(0 AS DOUBLE)) AS revenue
FROM months LEFT JOIN monthly ON monthly.month = substr(CAST(m AS STRING), 1, 7)
"""


@register(
    "sql_recursive_cte_spine",
    oracle=_RECURSIVE_SPINE_SQL,
    doc="ANSI WITH RECURSIVE executed NATIVELY by the engine (Spark "
    "4's recursive CTE support — UnionLoop in the plan), same text as "
    "the DuckDB oracle like sql_api_passthrough: a month spine "
    "generated by recursion (the calendar-dimension idiom every "
    "warehouse needs) left-joined to monthly order revenue so empty "
    "months survive with zero rows. Recursion depth is the month "
    "count (80 here, under spark.sql.cteRecursionLevelLimit's 100 "
    "default); each iteration carries ONE row, so the loop is "
    "driver-cheap while the monthly aggregate stays a normal "
    "partial+final pass over the fact table. Exact-decimal revenue; "
    "date arithmetic in the date domain; month keys as ISO string "
    "prefixes (identical CAST in both engines).",
)
def sql_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SPINE_SQL)


PATTERN_MIN_RUN = 3  # detect runs of >= 3 strictly-declining orders


@register(
    "window_pattern_declining_runs",
    oracle=f"""
WITH seq AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         LAG(o_totalprice) OVER w AS prev_price
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
flags AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CASE WHEN prev_price IS NOT NULL AND o_totalprice < prev_price
              THEN 1 ELSE 0 END AS declining
  FROM seq
),
isl AS (
  SELECT o_custkey, declining,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn_all,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, declining
                            ORDER BY o_orderdate, o_orderkey) AS rn_grp
  FROM flags
),
runs AS (
  SELECT o_custkey, COUNT(*) AS decline_steps
  FROM isl WHERE declining = 1
  GROUP BY o_custkey, rn_all - rn_grp
)
SELECT CAST(decline_steps + 1 AS INTEGER) AS run_len,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM runs
WHERE decline_steps + 1 >= {PATTERN_MIN_RUN}
GROUP BY decline_steps
""",
    doc="Sequence-pattern detection (the MATCH_RECOGNIZE "
    "strictly-decreasing idiom, expressed portably): per customer, "
    "orders in date order are flagged declining vs the previous "
    "order, and gaps-and-islands (rn_all - rn_grp) groups consecutive "
    f"declines into runs; runs of >= {PATTERN_MIN_RUN} orders are the "
    "churn-risk signature. Ordering ties break on o_orderkey, so run "
    "boundaries are deterministic. All three windows partition on "
    "o_custkey — one customer-keyed exchange feeds the whole "
    "detection, and the quadratic-looking pattern costs O(orders per "
    "customer) window state at any SF.",
)
def window_pattern_declining_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flags = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(
            F.lag("o_totalprice").over(wseq).isNotNull()
            & (F.col("o_totalprice") < F.lag("o_totalprice").over(wseq)),
            1,
        )
        .otherwise(0)
        .alias("declining"),
    )
    isl = flags.select(
        "o_custkey",
        "declining",
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        )
        .alias("rn_all"),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey", "declining").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("rn_grp"),
    )
    runs = (
        isl.where(F.col("declining") == 1)
        .groupBy("o_custkey", (F.col("rn_all") - F.col("rn_grp")).alias("grp"))
        .agg(F.count("*").alias("decline_steps"))
    )
    return (
        runs.where(F.col("decline_steps") + 1 >= PATTERN_MIN_RUN)
        .groupBy((F.col("decline_steps") + 1).cast("int").alias("run_len"))
        .agg(
            F.count("*").cast("long").alias("n_runs"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        )
    )


@register(
    "window_month_over_month",
    oracle="""
WITH monthly AS (
  SELECT substr(CAST(o_orderdate AS STRING), 1, 7) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT month,
       CAST(rev_cents AS BIGINT) AS rev_cents,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(rev_cents - LAG(rev_cents) OVER (ORDER BY month) AS BIGINT)
           AS delta_cents,
       ROUND(CAST(rev_cents - LAG(rev_cents) OVER (ORDER BY month)
                  AS DOUBLE)
             / CAST(LAG(rev_cents) OVER (ORDER BY month) AS DOUBLE), 9)
           AS mom_change
FROM monthly
""",
    doc="Month-over-month revenue change — the standard BI trend "
    "report: monthly revenue in exact integer CENTS, the delta as an "
    "exact integer, and the relative change as ONE double division of "
    "two exact integers, rounded at a scale where both engines' "
    "ROUNDs are exact. The lag window runs over the monthly aggregate "
    "(O(months) rows) — dimension-bounded; the fact table collapses "
    "in one partial+final aggregate pass.",
)
def window_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias("month"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    monthly = o.groupBy("month").agg(
        F.sum("cents").alias("rev_cents"),
        F.count("*").alias("n_orders"),
    )
    w = Window.partitionBy().orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "month",
        F.col("rev_cents").cast("long").alias("rev_cents"),
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.col("rev_cents") - prev).cast("long").alias("delta_cents"),
        F.round(
            (F.col("rev_cents") - prev).cast("double") / prev.cast("double"), 9
        ).alias("mom_change"),
    )


@register(
    "agg_weighted_median",
    oracle="""
WITH pts AS (
  SELECT l_returnflag AS flag, l_extendedprice AS v,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, v, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tot
  FROM pts
)
SELECT flag AS l_returnflag,
       CAST(MIN(CASE WHEN 2 * cw >= tot THEN v END) AS DOUBLE)
           AS weighted_median_price,
       CAST(MAX(tot) AS BIGINT) AS total_weight
FROM cum
GROUP BY flag
""",
    doc="Exact WEIGHTED median (quantity-weighted lower median of "
    "extended price per return flag — the 'median dollar' rather than "
    "the median line): per-(group, value) pre-aggregation collapses "
    "the fact table first, then a cumulative-weight window over "
    "DISTINCT VALUES finds the first value whose doubled running "
    "weight reaches the total — integer weights and the 2*cw >= tot "
    "cross-multiplication keep the definition exact with no halving "
    "division. The group-partitioned window is bounded by per-group "
    "distinct-price cardinality, not row count — the same "
    "pre-aggregate discipline as stats_ks_test/stats_mann_whitney_u.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    pts = li.groupBy("flag", "v").agg(F.sum("q").alias("w"))
    wcum = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pts.select(
        "flag",
        "v",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(Window.partitionBy("flag")).alias("tot"),
    )
    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tot"), F.col("v")))
        .cast("double")
        .alias("weighted_median_price"),
        F.max("tot").cast("long").alias("total_weight"),
    )


# --------------------------------------------- audience overlap

_OVERLAP_SQL = """
WITH f AS (
  SELECT o_custkey,
         MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS a_f,
         MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS a_o,
         MAX(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS a_p
  FROM orders GROUP BY o_custkey
),
s AS (
  SELECT CAST(SUM(a_f) AS BIGINT) AS nf, CAST(SUM(a_o) AS BIGINT) AS no_,
         CAST(SUM(a_p) AS BIGINT) AS np,
         CAST(SUM(a_f * a_o) AS BIGINT) AS nfo,
         CAST(SUM(a_f * a_p) AS BIGINT) AS nfp,
         CAST(SUM(a_o * a_p) AS BIGINT) AS nop
  FROM f
)
SELECT 'F' AS seg_a, 'O' AS seg_b, nf AS n_a, no_ AS n_b, nfo AS n_both,
       CASE WHEN nf + no_ - nfo > 0
            THEN CAST(nfo AS DOUBLE) / CAST(nf + no_ - nfo AS DOUBLE)
       END AS jaccard
FROM s
UNION ALL
SELECT 'F', 'P', nf, np, nfp,
       CASE WHEN nf + np - nfp > 0
            THEN CAST(nfp AS DOUBLE) / CAST(nf + np - nfp AS DOUBLE) END FROM s
UNION ALL
SELECT 'O', 'P', no_, np, nop,
       CASE WHEN no_ + np - nop > 0
            THEN CAST(nop AS DOUBLE) / CAST(no_ + np - nop AS DOUBLE) END FROM s
"""


@register(
    "agg_audience_overlap",
    oracle=_OVERLAP_SQL,
    doc="Audience-overlap matrix: for every pair of order-status "
    "segments, the EXACT distinct-customer intersection and Jaccard "
    "overlap — the segment-intersection report behind audience "
    "analysis and dataset-mixture overlap audits (companion to "
    "agg_bitmap_distinct's union-style exact counting). Engine shape "
    "is one membership-flag aggregate per customer (MAX(CASE) per "
    "segment — ONE shuffle on the entity key regardless of segment "
    "count, never a per-pair self-join of the fact table), one 1-row "
    "aggregate of flag products (an AND of memberships is a product "
    "of 0/1 flags), and a pair unpivot of that single row. "
    "Intersections are exact integers; the only float op is one "
    "division per pair, identical in both engines. At 100 TB the "
    "fact table is touched once; adding segments adds columns, not "
    "passes.",
)
def agg_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    segs = ("F", "O", "P")
    flags = orders.groupBy("o_custkey").agg(
        *[
            F.max(
                F.when(F.col("o_orderstatus") == s_, 1).otherwise(0)
            ).alias(f"a_{s_}")
            for s_ in segs
        ]
    )
    tot = flags.agg(
        *[F.sum(f"a_{s_}").cast("long").alias(f"n_{s_}") for s_ in segs],
        *[
            F.sum(F.col(f"a_{a}") * F.col(f"a_{b}"))
            .cast("long")
            .alias(f"n_{a}{b}")
            for i, a in enumerate(segs)
            for b in segs[i + 1 :]
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("seg_a"),
                F.lit(b).alias("seg_b"),
                F.col(f"n_{a}").alias("n_a"),
                F.col(f"n_{b}").alias("n_b"),
                F.col(f"n_{a}{b}").alias("n_both"),
            )
            for i, a in enumerate(segs)
            for b in segs[i + 1 :]
        ]
    )
    exploded = tot.select(F.explode(pairs).alias("p")).select("p.*")
    # Degenerate-segment guard (round-7 advice): an empty union would
    # make 0/0 — NaN in Spark, engine-dependent in DuckDB. Both sides
    # emit NULL instead (oracle carries the matching CASE).
    union = F.col("n_a") + F.col("n_b") - F.col("n_both")
    return exploded.select(
        "seg_a",
        "seg_b",
        "n_a",
        "n_b",
        "n_both",
        F.when(
            union > 0, F.col("n_both").cast("double") / union.cast("double")
        ).alias("jaccard"),
    )


# --------------------------------------- mergeable quantile sketch

QSKETCH_BINS = 256


@register(
    "agg_quantile_sketch_merge",
    oracle=f"""
WITH c AS (
  SELECT l_returnflag AS g,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
), b AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM c
), t AS (
  SELECT g, cents, ((cents - lo) * {QSKETCH_BINS}) // (hi - lo + 1) AS bin,
         lo, hi
  FROM c, b
), sk AS (
  SELECT g, bin, COUNT(*) AS cnt, MIN(cents) AS bin_min,
         ANY_VALUE(lo) AS lo, ANY_VALUE(hi) AS hi
  FROM t GROUP BY g, bin
), s2 AS (
  SELECT g, bin, bin_min, lo, hi,
         CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n,
         CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY bin) AS BIGINT) AS cum
  FROM sk
), ap AS (
  SELECT g, MIN(bin) AS b0 FROM s2 WHERE cum >= (n + 1) // 2 GROUP BY g
), apx AS (
  SELECT s2.g, s2.bin_min AS approx_p50_cents, s2.n, s2.lo, s2.hi
  FROM s2 JOIN ap ON s2.g = ap.g AND s2.bin = ap.b0
), d AS (
  SELECT g, cents, COUNT(*) AS cnt FROM c GROUP BY g, cents
), d2 AS (
  SELECT g, cents,
         CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n,
         CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY cents) AS BIGINT) AS cum
  FROM d
), ex AS (
  SELECT g, MIN(cents) AS exact_p50_cents
  FROM d2 WHERE cum >= (n + 1) // 2 GROUP BY g
)
SELECT apx.g AS l_returnflag, apx.n AS n_rows,
       apx.approx_p50_cents, ex.exact_p50_cents,
       ABS(apx.approx_p50_cents - ex.exact_p50_cents)
         < (apx.hi - apx.lo + {QSKETCH_BINS}) // {QSKETCH_BINS} AS within_bound
FROM apx JOIN ex ON apx.g = ex.g
""",
    doc=f"Mergeable quantile sketch with an oracle-checked error bound "
    f"— the 100 TB quantile shape: each task folds its rows into a "
    f"{QSKETCH_BINS}-bin integer-cents histogram (groupBy(g, bin) — "
    "Spark's partial aggregation IS the per-partition sketch, the "
    "shuffle IS the sketch merge; O(groups × bins) crosses the wire, "
    "never data), then the median bin falls out of an O(bins) "
    "cumulative window and the estimate is that bin's true minimum. "
    "The rank-error guarantee — estimate and exact lower median land "
    "in the SAME bin, so they differ by less than one bin width — is "
    "not asserted in prose but EMITTED as the within_bound column and "
    "verified against the exact anchor (an O(distinct-values) "
    "collapsed histogram, affordable at bench scale; at 100 TB the "
    "anchor is dropped and the sketch stands alone, or iterates to "
    "tighter bins like agg_median_twopass's driver-guided second "
    "pass). All arithmetic is integer (cents, integer div), so every "
    "column hash-matches DuckDB bit-for-bit — unlike t-digest/KLL "
    "sketches whose estimates are implementation-defined "
    "(percentile_approx is covered by agg_approx's tolerance tests).",
)
def agg_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = QSKETCH_BINS
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    bounds = li.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    t = li.crossJoin(F.broadcast(bounds)).withColumn(
        "bin", F.expr(f"(cents - lo) * {B} div (hi - lo + 1)")
    )
    sketch = t.groupBy("g", "bin").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("cents").alias("bin_min"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )
    wg = Window.partitionBy("g")
    wcum = wg.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s2 = sketch.withColumn("n", F.sum("cnt").over(wg)).withColumn(
        "cum", F.sum("cnt").over(wcum)
    )
    apx = (
        s2.where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("g")
        .agg(
            F.min_by("bin_min", "bin").alias("approx_p50_cents"),
            F.first("n").alias("n_rows"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
        )
    )
    d = li.groupBy("g", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    wdc = wg.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d2 = d.withColumn("n", F.sum("cnt").over(wg)).withColumn(
        "cum", F.sum("cnt").over(wdc)
    )
    ex = (
        d2.where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("g")
        .agg(F.min("cents").alias("exact_p50_cents"))
    )
    width = F.expr(f"(hi - lo + {B}) div {B}")
    return apx.join(ex, "g").select(
        F.col("g").alias("l_returnflag"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "approx_p50_cents",
        "exact_p50_cents",
        (
            F.abs(F.col("approx_p50_cents") - F.col("exact_p50_cents"))
            < width
        ).alias("within_bound"),
    )
