"""Interleaved A/B: _shingle_pair_counts struct pairs (old, inlined
here) vs encoded-long pairs + size join-back (new, the committed
shape). Compares dedup_ngram_jaccard + dedup_containment end shapes;
asserts identical rows every iteration."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_pimcore_spark.ops import dedup as D  # noqa: E402
from data_ingestion_pimcore_spark.ops.textops import (  # noqa: E402
    md5_hash60,
    with_shingles,
)
from data_ingestion_pimcore_spark.session import get_spark  # noqa: E402
from data_ingestion_pimcore_spark.tables import load  # noqa: E402

SF = os.environ.get("TQ_SF", "/root/testdata/sf0.1")


def old_pair_counts(docs, df_cap=D.DF_CAP):
    d = with_shingles(docs)
    sh = d.select(
        F.col("doc_id"),
        F.size("shingles").alias("n"),
        F.explode(F.transform("shingles", lambda s: md5_hash60(s))).alias("s"),
    )
    lists = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        .where((F.size("ds") > 1) & (F.size("ds") <= F.lit(df_cap)))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    x["n"].alias("na"),
                    y["n"].alias("nb"),
                ),
            ),
        )
    )
    return (
        lists.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.doc_a", "p.doc_b", "p.na", "p.nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def jac(pairs):
    j = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return pairs.where(j >= 0.2).select("doc_a", "doc_b", j.alias("jaccard"))


def cont(pairs):
    c = F.col("inter").cast("double") / F.least("na", "nb")
    return pairs.where(c >= D.CONTAIN_TAU).select(
        "doc_a", "doc_b", c.alias("containment")
    )


def main() -> int:
    spark = get_spark("ab-pairs")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF.rstrip('/')}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()
    docs = load(spark, SF, "documents")
    res: dict[str, list[float]] = {}
    rows: dict[str, list] = {}
    for it in range(4):
        for label, fn in (
            ("old", lambda: old_pair_counts(docs)),
            ("new", lambda: D._shingle_pair_counts(docs)),
        ):
            t0 = time.time()
            j = jac(fn()).collect()
            c = cont(fn()).collect()
            res.setdefault(label, []).append(round(time.time() - t0, 3))
            rows[label] = (
                sorted(map(tuple, j)),
                sorted(map(tuple, c)),
            )
        assert rows["old"] == rows["new"], "ROWS DIFFER"
        print(
            f"iter {it}: old={res['old'][-1]} new={res['new'][-1]} "
            f"(rows identical: {len(rows['new'][0])} jac, "
            f"{len(rows['new'][1])} cont)",
            flush=True,
        )
    for k, v in res.items():
        print(f"{k}: min={min(v):.3f} med={statistics.median(v):.3f} runs={v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
