#!/usr/bin/env python3
"""Regenerate the DuckDB baseline for BASELINE.md.

Runs every oracle SQL from a Verify output dir against a scale-factor
dir in DuckDB (warm, one repeat), printing per-query seconds and the
total. Dev tool; pair with `sbt "runMain graft.Bench"` for the Spark
side.

Usage: bench_baseline.py <sfDir> <verifyOutDir> [threads]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, threads=16):
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        try:
            con.execute(oracle[name]).fetchall()  # warm
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            print(f"{name}: ERROR {e}", file=sys.stderr)
    for name, sec in sorted(times.items()):
        print(f"{sec:8.3f}  {name}")
    print(f"{sum(times.values()):8.3f}  TOTAL ({len(times)} queries, "
          f"{threads} threads, {sf_dir})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 16)
