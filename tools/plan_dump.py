"""Dump .explain('formatted') for registered queries to plans/<dir>/.

Usage: python tools/plan_dump.py q1,q2,... [suffix] [outdir]
  suffix: appended to the file name (default 'after')
  outdir: default plans/r12
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_pimcore_spark import registry  # noqa: E402
from data_ingestion_pimcore_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1].split(",")
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    outdir = sys.argv[3] if len(sys.argv) > 3 else "plans/r12"
    sf = os.environ.get("TQ_SF", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    all_q = registry.all_queries()
    for name in names:
        df = all_q[name].fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
