"""Interleaved A/B for the scratch_dir medium change (throwaway).

old = SPARK_GRAFT_SCRATCH_DIR=/tmp (disk, the previous behavior)
new = env unset (local master -> /dev/shm tmpfs)
Variants alternate per iteration in ONE session; noop sink.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_pimcore_spark import registry  # noqa: E402
from data_ingestion_pimcore_spark.session import get_spark  # noqa: E402

NAMES = [
    "source_json_array", "source_schema_evolution",
    "source_corrupt_quarantine", "ingest_incremental_files",
    "source_xml_roundtrip", "source_gzip_jsonl",
    "ingest_backfill_partition", "source_excel_roundtrip",
    "source_excel_multisheet", "layout_compact_small_files",
    "sink_partitioned_parquet", "sink_jsonl_roundtrip",
    "join_bucketed_colocated", "sink_csv_roundtrip",
    "sink_orc_roundtrip", "sink_wap_publish",
    "profile_partition_manifest", "join_dpp_pruned",
    "ts_stream_exactly_once_sink",
]


def main() -> int:
    sf = os.environ.get("TQ_SF", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf.rstrip('/')}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()
    import pandas as _pd

    (li.limit(256).groupBy("l_returnflag")
       .applyInPandas(lambda p: _pd.DataFrame({"n": [len(p)]}), schema="n long")
       .count())
    all_q = registry.all_queries()
    res: dict[tuple[str, str], list[float]] = {}
    for it in range(reps):
        for variant in ("old", "new"):
            if variant == "old":
                os.environ["SPARK_GRAFT_SCRATCH_DIR"] = "/tmp"
            else:
                os.environ.pop("SPARK_GRAFT_SCRATCH_DIR", None)
            for name in NAMES:
                t0 = time.time()
                all_q[name].fn(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                res.setdefault((name, variant), []).append(
                    round(time.time() - t0, 3)
                )
        print(f"iter {it} done", flush=True)
    tot = {"old": 0.0, "new": 0.0}
    for name in NAMES:
        o = sorted(res[(name, "old")])
        n = sorted(res[(name, "new")])
        tot["old"] += o[0]
        tot["new"] += n[0]
        print(
            f"{name}: old min={o[0]:.3f} med={statistics.median(o):.3f} | "
            f"new min={n[0]:.3f} med={statistics.median(n):.3f}",
            flush=True,
        )
    print(f"TOTAL min: old={tot['old']:.2f} new={tot['new']:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
