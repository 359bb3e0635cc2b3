"""Second tranche of TPC-H query patterns adapted to the driver schema.

The reference has no relational surface at all (SURVEY.md §2.2 — no
joins, no aggregations beyond record counting, `app/services/
json_reader.py:52`), so these queries exist to populate the engine's
§2.2 inventory with the canonical multi-join / subquery / outer-join
shapes TPC-H defines. The driver schema is a reduced TPC-H (no
partsupp, no receipt/commit dates, no comment columns); q9/q16/q19/q21
are adapted accordingly and the adaptation is noted per query.

Scale notes (100 TB design intent) shared by all queries here:

* Only ``region``/``nation`` are broadcast — they are fixed-size at any
  SF. ``part``/``supplier``/``customer``/``orders`` all scale with SF,
  so fact-dim joins on them are shuffle joins and AQE picks broadcast
  at runtime when a filtered side turns out small.
* Filters are applied on each table BEFORE its join so parquet pushdown
  prunes row groups and the shuffle carries only surviving rows.
* Double aggregation goes through the DECIMAL(18,6) exact-sum trick
  (``ops/_det.py``) for cross-engine determinism.
* Top-k results order by a unique tiebreak column so LIMIT selects the
  same set in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from ._det import DEC, dsum, sql_dsum


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
       AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 (forecast revenue change): pure scan→filter→scalar "
    "aggregate. All three predicates reach the parquet scan "
    "(PushedFilters); the aggregate is a map-side partial + 1-row final "
    "— the cheapest possible plan shape, no join, one 1-row shuffle.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@register(
    "q7_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7 (volume shipping): 5-way join lineitem⋈supplier⋈"
    "orders⋈customer⋈nation×2. The two nation joins broadcast (fixed-"
    "size dim); the nation-name disjunction is applied right after them "
    "so the big shuffle joins only carry qualifying rows. lineitem⋈"
    "orders and orders⋈customer shuffle on their keys — both sides "
    "scale with SF, so no broadcast hint (AQE may still convert).",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .select("c_custkey", "cust_nation")
    )
    ords = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
SELECT o_year,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END
                AS DECIMAL(18,6))) AS DOUBLE)
       / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
    doc="TPC-H Q8 (national market share), adapted: no p_mfgr column, "
    "so the part filter is p_type = 'PROMO'. 7-way join; region/nation "
    "broadcast, part is filtered to 1/6th before its shuffle join "
    "(at 100 TB `part` scales with SF — no broadcast hint; AQE decides). "
    "The share division happens after two exact decimal sums, so it is "
    "one deterministic double op per group.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("s_nkey"),
                                      F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("s_nkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust_eu = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
                .select(F.col("n_nationkey").alias("c_nkey"))
            ),
            F.col("c_nationkey") == F.col("c_nkey"),
        )
        .select("c_custkey")
    )
    ords = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = "decimal(18,6)"
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_eu, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(F.lit(0.0))
                    .cast(dec)
                ).cast("double")
                / F.sum(F.col("volume").cast(dec)).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT nation, o_year, {sql_dsum('amount', 'sum_profit')}
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
""",
    doc="TPC-H Q9 (product-type profit), adapted: the driver schema has "
    "no partsupp, so supply cost is proxied by p_retailprice * "
    "l_quantity (same plan shape: 5-way join + substring filter on "
    "p_name). The LIKE filter prunes part before its join; nation "
    "broadcasts; the rest shuffle on their keys.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    ords = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
         c_acctbal, n_name
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    AND l_returnflag = 'R'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
) t
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 (returned-item reporting): top-20 customers by "
    "returned revenue in a quarter. Plans as TakeOrderedAndProject "
    "(per-partition heaps + driver merge of 20 rows — no global sort). "
    "The quarter filter prunes orders to ~4% before the fact-fact "
    "shuffle join; c_custkey tiebreak makes the LIMIT deterministic.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    ords = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00"))
    ).select("o_orderkey", "o_custkey")
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
    doc="TPC-H Q13 (customer order-count distribution), adapted: the "
    "order exclusion predicate is o_orderpriority <> '1-URGENT' (no "
    "o_comment column). Left outer join keeps zero-order customers; "
    "COUNT(o_orderkey) skips the nulls the outer join introduces. Two "
    "aggregations: per-customer (shuffle on custkey, co-located with "
    "the join's partitioning so AQE can elide the second exchange), "
    "then the tiny distribution agg.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    ords = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    return (
        cust.join(ords, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 (top supplier): quarterly revenue per supplier, keep "
    "the max. The scalar max is computed once and broadcast back "
    "against the revenue set (1-row broadcast join — no global sort, "
    "no single-partition window). Exact decimal sums make the max and "
    "the equality filter engine-deterministic.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx")).drop("__mx")
    return (
        load(spark, sf_dir, "supplier")
        .join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16 (parts/supplier relationship), adapted: no partsupp "
    "table, so the part↔supplier pairs come from observed lineitem "
    "rows. Distinct-count expands to a two-phase partial-distinct plan; "
    "the three part filters prune before the join.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_discounted_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
       AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19 (discounted revenue), adapted to the driver part "
    "columns (no container/shipmode): a disjunction of conjunctive "
    "ranges spanning both join sides. Catalyst extracts the common "
    "single-side predicates from the OR (p_brand IN (...), p_size <= "
    "15, l_quantity <= 30) and pushes them below the join, so the scan "
    "prunes even though the full predicate needs both tables.",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_4'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
    doc="TPC-H Q21 (suppliers who kept orders waiting), adapted: the "
    "driver schema has no receipt/commit dates, so 'late' is proxied "
    "by l_returnflag = 'R' on finalized ('F') orders — the plan shape "
    "is the point: a correlated EXISTS (left-semi join with a non-equi "
    "conjunct) and a correlated NOT EXISTS (left-anti join) against "
    "the same fact table, both shuffling on l_orderkey so all three "
    "lineitem instances co-partition. s_name tiebreak makes LIMIT "
    "deterministic.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (guide §1.2: fix the algorithm before the per-task work): the
    # EXISTS/NOT-EXISTS pair is a per-order predicate, so both
    # correlated subqueries collapse into ONE per-order supplier
    # aggregate instead of two lineitem self-joins —
    #   EXISTS(other supplier)        ⇔ #distinct suppliers in order ≥ 2
    #   NOT EXISTS(other 'R' supplier)⇔ #distinct suppliers with an 'R'
    #                                    row in the order = 1
    # (an l1 row is itself an 'R' row, so the singleton 'R' supplier IS
    # l1's supplier, and the count of surviving l1 rows per order is
    # that supplier's 'R' row count). Two-level aggregation — per
    # (order, supplier) then per order — keeps partial map-side
    # aggregation and avoids the Expand a multi-count-distinct would
    # plan. Plan effect: three lineitem-scale exchanges (semi + anti +
    # the l1 probe side) become one, and lineitem is scanned once, not
    # three times. Interleaved A/B: sf1 3.60 s → 1.74 s (2.1×) with the
    # sf0.1 reading inside noise (1.04 → 1.17 s; the aggregate's fixed
    # cost only amortizes once exchanges dominate), identical top-10
    # rows every iteration; oracle green at sf0.01/sf0.1.
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("r_rows")
    )
    stats = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum((F.col("r_rows") > 0).cast("int")).alias("n_rsupp"),
            F.max(F.when(F.col("r_rows") > 0, F.col("l_suppkey"))).alias(
                "r_supp"
            ),
            F.max(F.when(F.col("r_rows") > 0, F.col("r_rows"))).alias(
                "wait_rows"
            ),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1))
        .select("l_orderkey", "r_supp", "wait_rows")
    )
    ords = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        stats.join(ords, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(supp, F.col("r_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("wait_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the driver schema has no partsupp table, so Q2/Q11/
# Q20 run against a deterministic derivation — the distinct (partkey,
# suppkey) pairs observed in lineitem, with supply cost and available
# quantity derived from a portable 60-bit md5 hash of the pair key.
# Both engines compute identical values, so the oracle stays exact.
# ---------------------------------------------------------------------------

_SQL_PARTSUPP = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(CAST('0x' || substr(md5('c:' || CAST(l_partkey AS VARCHAR) || ':'
              || CAST(l_suppkey AS VARCHAR)), 1, 15) AS BIGINT) % 100000
              AS DOUBLE) / 100.0 AS ps_supplycost,
         CAST(CAST('0x' || substr(md5('q:' || CAST(l_partkey AS VARCHAR) || ':'
              || CAST(l_suppkey AS VARCHAR)), 1, 15) AS BIGINT) % 9999 + 1
              AS BIGINT) AS ps_availqty
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) t
"""


def _partsupp(
    spark: SparkSession, sf_dir: str, lineitem: DataFrame | None = None
) -> DataFrame:
    from ..ops.textops import md5_hash60

    pairs = (
        (lineitem if lineitem is not None else load(spark, sf_dir, "lineitem"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    pk = F.col("ps_partkey").cast("string")
    sk = F.col("ps_suppkey").cast("string")
    cost_key = F.concat_ws(":", F.lit("c"), pk, sk)
    qty_key = F.concat_ws(":", F.lit("q"), pk, sk)
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        ((md5_hash60(cost_key) % 100000).cast("double") / 100.0).alias(
            "ps_supplycost"
        ),
        (md5_hash60(qty_key) % 9999 + 1).cast("long").alias("ps_availqty"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
WITH partsupp AS ({_SQL_PARTSUPP})
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15 AND p_type = 'STANDARD'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps_supplycost)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    doc="TPC-H Q2 (minimum-cost supplier), adapted: partsupp is the "
    "deterministic derived relation; the mfgr filter becomes p_type = "
    "'STANDARD'. The correlated scalar MIN subquery is decorrelated "
    "into a per-part min over the region-filtered partsupp and joined "
    "back on (part, cost) — one aggregate + one equi-join instead of a "
    "per-row subquery execution; region/nation broadcast.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_nations = F.broadcast(
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp_eu = (
        load(spark, sf_dir, "supplier")
        .join(eu_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    # The correlated per-part min is independent of the part predicate,
    # so restricting partsupp to the filtered parts FIRST (broadcast —
    # the predicate keeps it dimension-sized) is lossless and shrinks
    # both the min aggregate and the join-back; ps_eu is then
    # checkpointed because the min + join-back reference it twice (the
    # md5-derived partsupp would otherwise recompute). A/B at sf0.1:
    # 1.24 s vs 2.32 s min, identical rows.
    ps_f = ps.join(
        F.broadcast(part.select("p_partkey")),
        F.col("ps_partkey") == F.col("p_partkey"),
    ).drop("p_partkey")
    ps_eu = (
        ps_f.join(supp_eu, F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey", "ps_suppkey", "ps_supplycost",
            "s_name", "s_acctbal", "n_name",
        )
        .localCheckpoint(eager=False)
    )
    min_cost = ps_eu.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        ps_eu.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle=f"""
WITH partsupp AS ({_SQL_PARTSUPP}),
scoped AS (
  SELECT ps_partkey,
         CAST(ps_supplycost * ps_availqty AS DECIMAL(18,6)) AS v
  FROM partsupp, supplier, nation
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_7'
)
SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS stock_value
FROM scoped
GROUP BY ps_partkey
HAVING SUM(v) > (SELECT SUM(v) * 0.002 FROM scoped)
""",
    doc="TPC-H Q11 (important stock): per-part inventory value for one "
    "nation's suppliers, kept when above 0.2% of the nation "
    "total. The global-total scalar subquery is one extra 1-row "
    "aggregate broadcast into the HAVING filter — the scoped relation "
    "is computed once and reused for both aggregates (exact decimal "
    "sums keep the threshold comparison engine-deterministic).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    nat = F.broadcast(
        load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    dec = "decimal(18,6)"
    scoped = (
        ps.join(supp, F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).cast(dec).alias("v"),
        )
        # referenced by BOTH aggregates (per-part and the global
        # threshold) — checkpoint so the md5-derived partsupp is
        # computed once, same fix as q2_min_cost_supplier
        .localCheckpoint(eager=False)
    )
    per_part = scoped.groupBy("ps_partkey").agg(F.sum("v").alias("v_sum"))
    total = scoped.agg((F.sum("v") * F.lit(0.002)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total), F.col("v_sum") > F.col("threshold"))
        .select(
            "ps_partkey", F.col("v_sum").cast("double").alias("stock_value")
        )
    )


@register(
    "q20_promotion_suppliers",
    oracle=f"""
WITH partsupp AS ({_SQL_PARTSUPP}),
shipped AS (
  SELECT l_partkey, l_suppkey,
         {sql_dsum('l_quantity', 'qty')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_5', 'NATION_6')
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND ps_availqty > (
        SELECT 0.5 * COALESCE(SUM(CAST(qty AS DECIMAL(18,6))), 0)
        FROM shipped
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey))
ORDER BY s_name
""",
    doc="TPC-H Q20 (potential part promotion), adapted to the derived "
    "partsupp: suppliers in two nations whose available quantity of "
    "'small%' parts exceeds half of what they shipped in 1996. The "
    "nested IN subqueries decorrelate into semi joins; the correlated "
    "half-of-shipped threshold becomes a pre-aggregated (part, supp) "
    "relation left-joined to partsupp — every correlation is one "
    "equi-join on already-partitioned keys, no per-row subqueries.",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_parts = load(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    # §3.2 semi-join pre-filter: only small-part keys can survive the
    # downstream semi join, so drop non-small rows from BOTH lineitem
    # consumers (the partsupp distinct and the shipped aggregate)
    # BEFORE their exchanges — the broadcast semi replaces two
    # full-lineitem shuffles with small-part-only ones. Rows proven
    # identical at sf0.1; oracle parity re-verified.
    li_small = load(spark, sf_dir, "lineitem").join(
        F.broadcast(small_parts),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    ps = _partsupp(spark, sf_dir, lineitem=li_small)
    shipped = (
        li_small
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "qty"))
    )
    qualifying = (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
            "left_outer",
        )
        .where(
            F.col("ps_availqty")
            > 0.5 * F.coalesce(F.col("qty").cast("decimal(18,6)"), F.lit(0).cast("decimal(18,6)"))
        )
        .select("ps_suppkey")
        .distinct()
    )
    nat = F.broadcast(
        load(spark, sf_dir, "nation").where(
            F.col("n_name").isin("NATION_5", "NATION_6")
        )
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ----------------------------------------------- TPC-DS-shaped extras


@register(
    "dsq_cumulative_share",
    oracle="""
WITH monthly AS (
    SELECT o_orderpriority,
           strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_d
    FROM orders
    GROUP BY 1, 2
)
SELECT o_orderpriority, month,
       CAST(rev_d AS DOUBLE) AS rev,
       CAST(SUM(rev_d) OVER (PARTITION BY o_orderpriority
                             ORDER BY month) AS DOUBLE) AS cum_rev,
       ROUND(CAST(rev_d AS DOUBLE)
               / CAST(SUM(rev_d) OVER (PARTITION BY o_orderpriority)
                      AS DOUBLE), 9) AS share_of_priority
FROM monthly
""",
    doc="TPC-DS Q51-style cumulative analysis: monthly revenue per "
    "priority with a running cumulative window AND a whole-partition "
    "share — two frames over ONE exchange on the priority key (Spark "
    "plans both windows in a single Window operator chain after one "
    "sort). The aggregate collapses orders to O(priorities x months) "
    "rows before any window touches them, so window state is tiny at "
    "any fact volume. The windowed sums stay in the exact DECIMAL "
    "domain end-to-end and cast to double at output WITHOUT a double-"
    "domain ROUND: at sf0.1 both the double running sums (window fold "
    "association differs across engines) and ROUND(double, 6) itself "
    "(Spark rounds the shortest decimal repr, DuckDB the binary "
    "expansion — a one-ulp tie once value*1e6 nears 2^53) diverged; "
    "the decimal→double CAST is correctly rounded and bit-identical "
    "in both engines, measured (caught by the r11 full-surface sf0.1 "
    "sweep).",
)
def dsq_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    monthly = (
        o.select(
            "o_orderpriority",
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
            "o_totalprice",
        )
        .groupBy("o_orderpriority", "month")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_d"))
    )
    w_cum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("o_orderpriority")
    return monthly.select(
        "o_orderpriority",
        "month",
        F.col("rev_d").cast("double").alias("rev"),
        F.sum("rev_d").over(w_cum).cast("double").alias("cum_rev"),
        F.round(
            F.col("rev_d").cast("double")
            / F.sum("rev_d").over(w_all).cast("double"),
            9,
        ).alias("share_of_priority"),
    )


@register(
    "dsq_rollup_topk",
    oracle="""
WITH rolled AS (
    SELECT o_orderpriority, o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev,
           GROUPING(o_orderstatus) AS g_status
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    HAVING GROUPING(o_orderpriority) = 0 AND GROUPING(o_orderstatus) = 0
),
ranked AS (
    SELECT o_orderpriority, o_orderstatus, ROUND(rev, 6) AS rev,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY rev DESC, o_orderstatus) AS rk
    FROM rolled
)
SELECT o_orderpriority, o_orderstatus, rev, rk
FROM ranked WHERE rk <= 2
""",
    doc="TPC-DS Q67-style rollup + per-group top-k: aggregate the "
    "hierarchy, then keep each priority's top-2 statuses by revenue "
    "with a deterministic tiebreak. Spark plans the per-group limit "
    "as WindowGroupLimit — partial top-k runs BEFORE the final "
    "window exchange, so rows beyond k never shuffle; the rollup's "
    "Expand feeds straight into one hash aggregate.",
)
def dsq_rollup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    rolled = (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"),
            F.grouping("o_orderpriority").alias("g_p"),
            F.grouping("o_orderstatus").alias("g_s"),
        )
        .where((F.col("g_p") == 0) & (F.col("g_s") == 0))
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("rev").desc(), "o_orderstatus"
    )
    return (
        rolled.select(
            "o_orderpriority",
            "o_orderstatus",
            F.round("rev", 6).alias("rev"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 2)
    )


@register(
    "dsq_hour_bands",
    oracle="""
SELECT COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 0 AND 5)
           AS night,
       COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 6 AND 11)
           AS morning,
       COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 12 AND 17)
           AS afternoon,
       COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 18 AND 23)
           AS evening,
       COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 8 AND 18
                          AND event_type = 'purchase') AS business_purchases
FROM events
""",
    doc="TPC-DS Q88-style multi-band report: five time-band counts in "
    "ONE scan as conditional aggregates — where the textbook "
    "formulation cross-joins five scalar subqueries (five scans), "
    "this plan is a single pass with map-side partials, the rewrite "
    "that matters when the fact is 100 TB. Hour extraction is "
    "timezone-pinned (session UTC) so both engines band identically.",
)
def dsq_hour_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import load as _load

    ev = _load(spark, sf_dir, "events")
    h = F.hour(F.col("ts").cast("timestamp"))

    def band(lo, hi, extra=None):
        cond = (h >= lo) & (h <= hi)
        if extra is not None:
            cond = cond & extra
        return F.count(F.when(cond, 1))

    return ev.agg(
        band(0, 5).alias("night"),
        band(6, 11).alias("morning"),
        band(12, 17).alias("afternoon"),
        band(18, 23).alias("evening"),
        band(8, 18, F.col("event_type") == "purchase").alias("business_purchases"),
    )
