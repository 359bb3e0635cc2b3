"""Noop-sink query timer (guide §1.4): time registered queries'
computation without sink/driver-collect cost, interleaved across
passes so a co-tenant burst cannot skew one query's min.

Usage: python tools/time_queries.py q1,q2,... [reps]
Env:
  TQ_SF    data dir (default /root/testdata/sf0.1)
  TQ_MODE  'noop' (default) or 'count' (bench.py-compatible action)
Prints per-query sorted readings + min/median.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_pimcore_spark import registry  # noqa: E402
from data_ingestion_pimcore_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf = os.environ.get("TQ_SF", "/root/testdata/sf0.1")
    mode = os.environ.get("TQ_MODE", "noop")
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    all_q = registry.all_queries()
    # warm-up: JIT + vectorized reader + Python worker pool
    li = spark.read.parquet(f"{sf.rstrip('/')}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()
    import pandas as _pd

    (li.limit(256).groupBy("l_returnflag")
       .applyInPandas(lambda p: _pd.DataFrame({"n": [len(p)]}), schema="n long")
       .count())
    readings: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"tq:{name}")
            t0 = time.time()
            df = all_q[name].fn(spark, sf)
            if mode == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            readings[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    for name in names:
        r = sorted(readings[name])
        print(
            f"{name}: min={r[0]:.3f} med={statistics.median(r):.3f} "
            f"runs={readings[name]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
