"""Round-13 interleaved A/Bs (guide §1: measure first, alternate
variants inside ONE session so a co-tenant burst cannot skew one side).

Usage: python tools/ab_r13.py <experiment> [reps]
Env:   TQ_SF  data dir (default /root/testdata/sf0.1)

Experiments:
  q21      EXISTS/NOT-EXISTS self-joins vs per-order supplier-stats
           aggregate rewrite (identical rows asserted per iteration)
  minhash  HOF md5 signature stage vs mapInArrow + hashlib batch
  kcore    distributed peel loop vs driver fast-path tail
  bandjoin 16-sig-wide band self-join exchange vs narrow join-back
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_pimcore_spark.session import get_spark  # noqa: E402
from data_ingestion_pimcore_spark.tables import load  # noqa: E402

SF = os.environ.get("TQ_SF", "/root/testdata/sf0.1")


# ------------------------------------------------------------------ q21

def q21_old(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    l1 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l1_orderkey"),
        F.col("l_suppkey").alias("l1_suppkey"),
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    exists = l1.join(
        l2,
        (F.col("l1_orderkey") == F.col("l2_orderkey"))
        & (F.col("l1_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    )
    not_exists = exists.join(
        l3,
        (F.col("l1_orderkey") == F.col("l3_orderkey"))
        & (F.col("l1_suppkey") != F.col("l3_suppkey")),
        "left_anti",
    )
    ords = load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
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
        not_exists.join(
            ords, F.col("l1_orderkey") == F.col("o_orderkey"), "left_semi"
        )
        .join(supp, F.col("l1_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


def q21_new(spark, sf_dir):
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
            F.max(
                F.when(F.col("r_rows") > 0, F.col("l_suppkey"))
            ).alias("r_supp"),
            F.max(F.when(F.col("r_rows") > 0, F.col("r_rows"))).alias(
                "wait_rows"
            ),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1))
        .select("l_orderkey", "r_supp", "wait_rows")
    )
    ords = load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
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


def run_ab(spark, variants: dict, reps: int, check_rows: bool = True) -> None:
    times: dict[str, list[float]] = {k: [] for k in variants}
    for it in range(reps):
        rows = {}
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab:{name}:{it}")
            t0 = time.time()
            df = fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
            if check_rows:
                rows[name] = sorted(map(tuple, df.collect()))
            spark.sparkContext.setJobDescription(None)
        if check_rows:
            vals = list(rows.values())
            assert all(v == vals[0] for v in vals[1:]), (
                f"ROW MISMATCH iter {it}: "
                + "; ".join(f"{k}={len(v)} rows" for k, v in rows.items())
            )
            print(f"iter {it}: rows identical ({len(vals[0])})", flush=True)
    for name, r in times.items():
        s = sorted(r)
        print(
            f"{name}: min={s[0]:.3f} med={statistics.median(s):.3f} runs={r}",
            flush=True,
        )


def main() -> int:
    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up
    li = spark.read.parquet(f"{SF.rstrip('/')}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()
    if exp == "q21":
        run_ab(spark, {"old": q21_old, "new": q21_new}, reps)
    else:
        raise SystemExit(f"unknown experiment {exp}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
