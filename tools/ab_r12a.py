"""Interleaved A/B for the r12 session-2 first batch (throwaway).

A/B 1: dedup_lsh_eval_report — separate shingling per pipeline (old)
vs one shared checkpointed shingling pass (new, the committed shape).
Both variants are built inline from the same helpers so they run
interleaved in ONE session.

A/B 2: ts_stream_foreachbatch_upsert — TQ_AB_OLD env toggle inside the
op flips tmpfs root + pinned drain shuffle width (new) vs /tmp + session
width (old).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_pimcore_spark.ops import dedup as D  # noqa: E402
from data_ingestion_pimcore_spark.ops import timeseries as T  # noqa: E402
from data_ingestion_pimcore_spark.ops.textops import with_shingles  # noqa: E402
from data_ingestion_pimcore_spark.session import get_spark  # noqa: E402
from data_ingestion_pimcore_spark.tables import load  # noqa: E402

SF = os.environ.get("TQ_SF", "/root/testdata/sf0.1")


def lsh_eval(spark, shared: bool):
    docs = load(spark, SF, "documents").select("doc_id", "text")
    if shared:
        base = (
            with_shingles(docs)
            .select("doc_id", "shingles")
            .localCheckpoint(eager=False)
        )
    else:
        base = docs
    truth = (
        D.jaccard_pairs(base).select("doc_a", "doc_b").localCheckpoint(eager=False)
    )
    sigs = D.minhash_signatures(base).localCheckpoint(eager=False)
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
    )


def main() -> int:
    spark = get_spark("ab-r12a")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF.rstrip('/')}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()
    import pandas as _pd

    (li.limit(256).groupBy("l_returnflag")
       .applyInPandas(lambda p: _pd.DataFrame({"n": [len(p)]}), schema="n long")
       .count())

    res: dict[str, list[float]] = {}
    rows: dict[str, list] = {}
    for it in range(4):
        for label, shared in (("lsh_old", False), ("lsh_new", True)):
            t0 = time.time()
            df = lsh_eval(spark, shared)
            rows[label] = [tuple(r) for r in df.collect()]
            res.setdefault(label, []).append(round(time.time() - t0, 3))
        for label, env in (("fb_old", "1"), ("fb_new", "")):
            if env:
                os.environ["TQ_AB_OLD"] = env
            else:
                os.environ.pop("TQ_AB_OLD", None)
            t0 = time.time()
            df = T.ts_stream_foreachbatch_upsert(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            res.setdefault(label, []).append(round(time.time() - t0, 3))
        print(f"iter {it}: " + " ".join(f"{k}={v[-1]}" for k, v in res.items()),
              flush=True)
    assert rows["lsh_old"] == rows["lsh_new"], (rows["lsh_old"], rows["lsh_new"])
    print("lsh rows identical:", rows["lsh_new"])
    for k, v in res.items():
        print(f"{k}: min={min(v):.3f} med={statistics.median(v):.3f} runs={v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
