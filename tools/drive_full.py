"""Full-surface oracle sweep: every registered query vs DuckDB.

Usage: python tools/drive_full.py [> logs/drive_full_rNN.out]
Env:
  DRIVE_SF       data dir (default /root/testdata/sf0.01)
  DRIVE_ONLY     comma-separated query names (default: all)
  DRIVE_SHUFFLE_PARTITIONS  override spark.sql.shuffle.partitions
  DRIVE_NO_AQE=1 disable adaptive execution (flake-hunt axis)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from data_ingestion_pimcore_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "partsupp",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = os.environ.get("DRIVE_SF", "/root/testdata/sf0.01")
    spark = get_spark("drive-full")
    if os.environ.get("DRIVE_SHUFFLE_PARTITIONS"):
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            os.environ["DRIVE_SHUFFLE_PARTITIONS"],
        )
    if os.environ.get("DRIVE_NO_AQE"):
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs, os_ = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    only = os.environ.get("DRIVE_ONLY")
    names = only.split(",") if only else sorted(qs)
    n_pass = n_fail = n_nooracle = 0
    fails = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            fails.append(name)
            print(f"FAIL {name} spark-error {type(ex).__name__}: {ex}", flush=True)
            continue
        sql = os_.get(name)
        if sql is None:
            n_nooracle += 1
            print(f"PASS {name} no-oracle rows={len(sdf)} "
                  f"({time.time() - t0:.1f}s)", flush=True)
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            fails.append(name)
            print(f"FAIL {name} duckdb-error {type(ex).__name__}: {ex}", flush=True)
            continue
        cols = sorted(sdf.columns)
        if sorted(ddf.columns) != cols:
            n_fail += 1
            fails.append(name)
            print(f"FAIL {name} schema {cols} vs {sorted(ddf.columns)}", flush=True)
            continue
        s = sorted(tuple(map(str, r)) for r in sdf[cols].itertuples(index=False))
        d = sorted(tuple(map(str, r)) for r in ddf[cols].itertuples(index=False))
        if len(s) == len(d) and s == d:
            n_pass += 1
            print(f"PASS {name} rows={len(s)} ({time.time() - t0:.1f}s)", flush=True)
        else:
            n_fail += 1
            fails.append(name)
            diff = next(
                (i for i, (a, b) in enumerate(zip(s, d)) if a != b), None
            )
            print(
                f"FAIL {name} rows {len(s)} vs {len(d)} first-diff-idx={diff}",
                flush=True,
            )
            if diff is not None:
                print(f"  spark : {s[diff]}", flush=True)
                print(f"  duckdb: {d[diff]}", flush=True)
    print(
        f"SWEEP DONE sf={sf} pass={n_pass} no_oracle={n_nooracle} "
        f"fail={n_fail} {('FAILS: ' + ','.join(fails)) if fails else ''}",
        flush=True,
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
