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


# ------------------------------------------------------------------ q17

def q17_old(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    joined = li.select("l_partkey", "l_quantity", "l_extendedprice").join(
        pa, "l_partkey"
    )
    return joined.where(F.col("l_quantity") < F.col("half_avg")).agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0)
        .alias("avg_yearly")
    )


def q17_new(spark, sf_dir):
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    half = (F.lit(0.5) * F.avg("l_quantity").over(w)).alias("half_avg")
    return (
        li.withColumn("half_avg", half)
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly")
        )
    )


# ------------------------------------------------------------------ q18

def q18_old(spark, sf_dir):
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
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_qty")
        )
    )


def q18_new(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sqd"))
        .where(F.col("sqd") > 250)
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.col("sqd").cast("double").alias("total_qty"),
        )
    )


# -------------------------------------------------------------- minhash

def minhash_old(spark, sf_dir):
    from data_ingestion_pimcore_spark.ops import dedup as D

    return D.minhash_signatures(load(spark, sf_dir, "documents"))


def minhash_new(spark, sf_dir):
    """mapInPandas variant: ship doc_id+text once, compute shingles,
    16 md5-permutation mins and 4 band hashes with hashlib batches.
    Must be bit-identical to the HOF form."""
    from hashlib import md5

    import pandas as pd

    from data_ingestion_pimcore_spark.ops.dedup import (
        N_BANDS,
        N_HASHES,
        ROWS_PER_BAND,
    )
    from data_ingestion_pimcore_spark.tables import spread

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    prefixes = [f"{i}:".encode() for i in range(N_HASHES)]
    INF = 1 << 62

    def sigfn(batches):
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"]}
            sig_rows = []
            for text in pdf["text"]:
                words = text.split(" ")
                if len(words) >= 3:
                    grams = {
                        " ".join(words[i : i + 3])
                        for i in range(len(words) - 2)
                    }
                else:
                    grams = {text}
                mins = [INF] * N_HASHES
                for g in grams:
                    gb = g.encode()
                    for i, p in enumerate(prefixes):
                        h = int.from_bytes(md5(p + gb).digest()[:8], "big") >> 4
                        if h < mins[i]:
                            mins[i] = h
                sig_rows.append(mins)
            for i in range(N_HASHES):
                out[f"sig_{i}"] = [r[i] for r in sig_rows]
            for b in range(N_BANDS):
                out[f"band_{b}"] = [
                    md5(
                        ",".join(
                            str(r[b * ROWS_PER_BAND + k])
                            for k in range(ROWS_PER_BAND)
                        ).encode()
                    ).hexdigest()[:16]
                    for r in sig_rows
                ]
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, "
        + ", ".join(f"sig_{i} long" for i in range(N_HASHES))
        + ", "
        + ", ".join(f"band_{b} string" for b in range(N_BANDS))
    )
    return docs.mapInPandas(sigfn, schema=schema)


# --------------------------------------------------------- lsh_eval sig path

def _minhash_hof(d):
    """The pre-r13 JVM higher-order-function signature stage (old)."""
    from data_ingestion_pimcore_spark.ops.dedup import (
        N_BANDS,
        N_HASHES,
        ROWS_PER_BAND,
    )
    from data_ingestion_pimcore_spark.ops.textops import (
        md5_hash60,
        with_shingles,
    )

    def sig_expr(i):
        return F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: md5_hash60(F.concat_ws(":", F.lit(str(i)), s)),
            )
        )

    sh = (d if "shingles" in d.columns else with_shingles(d)).select(
        "doc_id", "shingles"
    )
    sigs = sh.select(
        "doc_id", *[sig_expr(i).alias(f"sig_{i}") for i in range(N_HASHES)]
    )
    band_cols = []
    for b in range(N_BANDS):
        parts = [
            F.col(f"sig_{b * ROWS_PER_BAND + k}") for k in range(ROWS_PER_BAND)
        ]
        band_cols.append(
            F.substring(
                F.md5(F.concat_ws(",", *[p.cast("string") for p in parts])),
                1,
                16,
            ).alias(f"band_{b}")
        )
    return sigs.select(
        "doc_id", *[F.col(f"sig_{i}") for i in range(N_HASHES)], *band_cols
    )


def _lsh_eval_with(spark, sf_dir, sig_fn, sig_input):
    from data_ingestion_pimcore_spark.ops import dedup as D
    from data_ingestion_pimcore_spark.ops.textops import with_shingles

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    shingled = (
        with_shingles(docs)
        .select("doc_id", "shingles")
        .localCheckpoint(eager=False)
    )
    truth = D.jaccard_pairs(shingled).select("doc_a", "doc_b").localCheckpoint(
        eager=False
    )
    sigs = sig_fn(shingled if sig_input == "shingled" else docs).localCheckpoint(
        eager=False
    )
    bands = D._capped_bands(D._exploded_bands(sigs))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hits = truth.join(cand, ["doc_a", "doc_b"])
    n_truth = truth.agg(F.count("*").alias("c"))
    n_cand = cand.agg(F.count("*").alias("c"))
    n_hit = hits.agg(F.count("*").alias("c"))
    return (
        n_truth.select(F.col("c").alias("n_truth"))
        .join(n_cand.select(F.col("c").alias("n_candidates")))
        .join(n_hit.select(F.col("c").alias("n_hits")))
        .select(
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits").cast("double") / F.col("n_truth")).alias("recall"),
            (F.col("n_hits").cast("double") / F.col("n_candidates")).alias(
                "precision_vs_truth"
            ),
        )
    )


def lsh_hof(spark, sf_dir):
    return _lsh_eval_with(spark, sf_dir, _minhash_hof, "shingled")


def lsh_py_shingled(spark, sf_dir):
    from data_ingestion_pimcore_spark.ops.dedup import minhash_signatures

    return _lsh_eval_with(spark, sf_dir, minhash_signatures, "shingled")


def lsh_py_text(spark, sf_dir):
    from data_ingestion_pimcore_spark.ops.dedup import minhash_signatures

    return _lsh_eval_with(spark, sf_dir, minhash_signatures, "docs")


# ---------------------------------------------- shingle-hash python stage

def _pair_counts_py(docs, df_cap):
    """_shingle_pair_counts with the shingle+md5 stage in whole-batch
    Python (one 60-bit md5 per distinct gram, dn encoding in-batch)."""
    from hashlib import md5

    import pandas as pd

    from data_ingestion_pimcore_spark.ops import dedup as D
    from data_ingestion_pimcore_spark.tables import spread

    src = spread(docs.select("doc_id", "text"))

    def fn(batches):
        for pdf in batches:
            dns, ss = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    grams = [None]
                else:
                    words = text.split(" ")
                    if len(words) >= 3:
                        grams = {
                            " ".join(words[i : i + 3])
                            for i in range(len(words) - 2)
                        }
                    else:
                        grams = {text}
                dn = (int(doc_id) << 32) + len(grams)
                for g in grams:
                    dns.append(dn)
                    ss.append(
                        None
                        if g is None
                        else int.from_bytes(
                            md5(g.encode()).digest()[:8], "big"
                        )
                        >> 4
                    )
            yield pd.DataFrame(
                {
                    "dn": pd.array(dns, dtype="Int64"),
                    "s": pd.array(ss, dtype="Int64"),
                }
            )

    sh = src.mapInPandas(fn, schema="dn long, s long")
    lists = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_list("dn")).alias("ds"))
        .where((F.size("ds") > 1) & (F.size("ds") <= F.lit(df_cap)))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    mask = F.lit(0xFFFFFFFF)
    return (
        lists.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("inter"))
        .select(
            F.shiftright("a", 32).alias("doc_a"),
            F.shiftright("b", 32).alias("doc_b"),
            F.col("a").bitwiseAND(mask).cast("int").alias("na"),
            F.col("b").bitwiseAND(mask).cast("int").alias("nb"),
            "inter",
        )
    )


def jaccard_old(spark, sf_dir):
    from data_ingestion_pimcore_spark.ops import dedup as D

    return D.dedup_ngram_jaccard(spark, sf_dir)


def jaccard_new(spark, sf_dir):
    from data_ingestion_pimcore_spark.ops import dedup as D

    pairs = _pair_counts_py(load(spark, sf_dir, "documents"), D.DF_CAP)
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return pairs.where(jac >= 0.2).select("doc_a", "doc_b", jac.alias("jaccard"))


# -------------------------------------------- substring winnowed k-grams

def substring_old(spark, sf_dir):
    """Pre-r13 JVM form: sequence+substring explode, per-gram md5."""
    from data_ingestion_pimcore_spark.ops import dedup as D
    from data_ingestion_pimcore_spark.ops.textops import md5_hash60
    from data_ingestion_pimcore_spark.tables import spread

    k, winnow_mod, df_cap, min_shared = (
        D.K_GRAM,
        D.WINNOW_MOD,
        D.DF_CAP,
        D.MIN_SHARED_GRAMS,
    )
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.length("text") >= k,
                F.expr(
                    f"transform(sequence(1, length(text) - {k} + 1), "
                    f"p -> substring(text, p, {k}))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    hashed = grams.select(
        "doc_id", md5_hash60(F.col("g")).alias("h")
    ).where(F.col("h") % winnow_mod == 0)
    lists = (
        hashed.groupBy("h")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") > 1) & (F.size("ds") <= F.lit(df_cap)))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        lists.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def substring_new(spark, sf_dir):
    """Winnowed k-gram hashes computed whole-batch in Python (hashlib)
    with per-doc dedup BEFORE the exchange (collect_set semantics)."""
    from hashlib import md5

    import pandas as pd

    from data_ingestion_pimcore_spark.ops import dedup as D
    from data_ingestion_pimcore_spark.tables import spread

    k, mod, df_cap, min_shared = (
        D.K_GRAM,
        D.WINNOW_MOD,
        D.DF_CAP,
        D.MIN_SHARED_GRAMS,
    )
    src = spread(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )

    def fn(batches):
        for pdf in batches:
            ids, hs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None or len(text) < k:
                    continue
                seen = set()
                tb = text
                for p in range(len(tb) - k + 1):
                    h = (
                        int.from_bytes(
                            md5(tb[p : p + k].encode()).digest()[:8], "big"
                        )
                        >> 4
                    )
                    if h % mod == 0:
                        seen.add(h)
                did = int(doc_id)
                for h in seen:
                    ids.append(did)
                    hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="Int64"),
                    "h": pd.array(hs, dtype="Int64"),
                }
            )

    hashed = src.mapInPandas(fn, schema="doc_id long, h long")
    lists = (
        hashed.groupBy("h")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") > 1) & (F.size("ds") <= F.lit(df_cap)))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        lists.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# --------------------------------------------------- band-join narrowing

def bandjoin_old(spark, sf_dir):
    from data_ingestion_pimcore_spark.ops import dedup as D

    return D.dedup_minhash_pairs.__wrapped__(spark, sf_dir) if hasattr(
        D.dedup_minhash_pairs, "__wrapped__"
    ) else D.dedup_minhash_pairs(spark, sf_dir)


def bandjoin_new(spark, sf_dir):
    """Narrow exchange: bands carry only (doc_id, band_idx, band_hash);
    the 16 sig columns join back per side after the candidate dedup."""
    from data_ingestion_pimcore_spark.ops import dedup as D

    sigs = D.minhash_signatures(
        load(spark, sf_dir, "documents")
    ).localCheckpoint(eager=False)
    narrow = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.col(f"band_{b}").alias("band_hash"),
                    )
                    for b in range(D.N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")
    keep = (
        narrow.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("__bs"))
        .where(F.col("__bs") <= D.BAND_CAP)
        .drop("__bs")
    )
    bands = narrow.join(keep, ["band_idx", "band_hash"])
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a_sig_{i}") for i in range(D.N_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b_sig_{i}") for i in range(D.N_HASHES)],
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                sum(
                    (F.col(f"a_sig_{i}") == F.col(f"b_sig_{i}")).cast("int")
                    for i in range(D.N_HASHES)
                )
                / F.lit(float(D.N_HASHES))
            ).alias("est_jaccard"),
        )
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
    elif exp == "minhash":
        run_ab(spark, {"old": minhash_old, "new": minhash_new}, reps)
    elif exp == "substring":
        run_ab(spark, {"old": substring_old, "new": substring_new}, reps)
    elif exp == "jaccard":
        run_ab(spark, {"old": jaccard_old, "new": jaccard_new}, reps)
    elif exp == "q18":
        run_ab(spark, {"old": q18_old, "new": q18_new}, reps)
    elif exp == "q17":
        run_ab(spark, {"old": q17_old, "new": q17_new}, reps)
    elif exp == "bandjoin":
        run_ab(spark, {"old": bandjoin_old, "new": bandjoin_new}, reps)
    elif exp == "lsh_eval":
        run_ab(
            spark,
            {
                "hof": lsh_hof,
                "py_shingled": lsh_py_shingled,
                "py_text": lsh_py_text,
            },
            reps,
        )
    else:
        raise SystemExit(f"unknown experiment {exp}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
