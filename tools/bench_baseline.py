#!/usr/bin/env python3
"""Regenerate the DuckDB baseline for BASELINE.md.

Runs every oracle SQL from a Verify output dir against a scale-factor
dir in DuckDB — warm run first, then the MEDIAN of N timed runs
(default 5), symmetric with graft.Bench's methodology — printing
per-query seconds and the total, and writing a JSON artifact next to
stdout for the BASELINE.md tables. Dev tool; pair with
`sbt "runMain graft.Bench"` for the Spark side.

Usage: bench_baseline.py <sfDir> <verifyOutDir> [threads] [runs] [jsonOut]
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, threads=16, runs=5, json_out=None):
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    import os
    for t in TABLES:
        # single file or a directory of part files (multi-file layout)
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        try:
            con.execute(oracle[name]).fetchall()  # warm
            timed = []
            for _ in range(runs):
                t0 = time.time()
                con.execute(oracle[name]).fetchall()
                timed.append(time.time() - t0)
            timed.sort()
            times[name] = {"min": timed[0],
                           "med": statistics.median(timed),
                           "max": timed[-1]}
        except Exception as e:
            print(f"{name}: ERROR {e}", file=sys.stderr)
    for name, t in sorted(times.items()):
        print(f"{t['med']:8.3f}  {name}")
    total = sum(t["med"] for t in times.values())
    print(f"{total:8.3f}  TOTAL ({len(times)} queries, {threads} threads, "
          f"{runs} runs/query, median, {sf_dir})")
    if json_out:
        body = {"sf": sf_dir, "threads": threads, "runs": runs,
                "total_med": round(total, 3),
                "queries": {k: {s: round(v, 3) for s, v in t.items()}
                            for k, t in times.items()}}
        with open(json_out, "w") as f:
            json.dump(body, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 16,
         int(sys.argv[4]) if len(sys.argv) > 4 else 5,
         sys.argv[5] if len(sys.argv) > 5 else None)
