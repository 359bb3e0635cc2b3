"""Excel scan timing probe (mirrors bench.bench_excel_multifile's
fixture and protocol, min of N): reports fixture-build seconds,
1-file scan and 32-file scan seconds, plus a row-content checksum so
the optimized reader can be asserted identical.

Usage: python tools/ab_excel_r13.py [reps]
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_pimcore_spark.session import get_spark  # noqa: E402
from data_ingestion_pimcore_spark.sources.excel_source import read_excel  # noqa: E402
from data_ingestion_pimcore_spark.sources.xlsx_writer import write_xlsx  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_files, rows = 32, 20000
    spark = get_spark("ab-excel")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="ab_xlsx_")
    d1 = os.path.join(base, "one")
    dn = os.path.join(base, "many")
    os.makedirs(d1)
    os.makedirs(dn)
    header = ["id", "name", "qty", "price"]

    def wb_rows(f: int) -> list[list]:
        return [header] + [
            [f * rows + i, "row-%07d" % i, i % 97, i * 0.25] for i in range(rows)
        ]

    try:
        t0 = time.time()
        write_xlsx(os.path.join(d1, "wb00.xlsx"), wb_rows(0))
        for f in range(n_files):
            write_xlsx(os.path.join(dn, "wb%02d.xlsx" % f), wb_rows(f))
        t_build = time.time() - t0
        n1 = read_excel(spark, d1).count()  # warm
        assert n1 == rows, n1
        # content checksum of the full multi-file read (sorted rows)
        rws = sorted(map(tuple, read_excel(spark, dn).collect()))
        h = hashlib.sha256(repr(rws).encode()).hexdigest()[:16]
        t1 = tn = float("inf")
        for _ in range(reps):
            t0 = time.time()
            assert read_excel(spark, d1).count() == rows
            t1 = min(t1, time.time() - t0)
            t0 = time.time()
            assert read_excel(spark, dn).count() == rows * n_files
            tn = min(tn, time.time() - t0)
        print(
            f"build={t_build:.2f}s t_1file={t1:.3f}s t_{n_files}files={tn:.3f}s "
            f"speedup={n_files * t1 / tn:.2f} rows_sha={h}",
            flush=True,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
