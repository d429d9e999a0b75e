#!/usr/bin/env python3
"""Regenerate the DuckDB baseline for BASELINE.md.

Runs every oracle SQL from a Verify output dir against a scale-factor
dir in DuckDB — warm run first, then the MEDIAN of N timed runs
(default 5), symmetric with graft.Bench's methodology — printing
per-query seconds and the total, and writing a JSON artifact next to
stdout for the BASELINE.md tables. Dev tool; pair with
`sbt "runMain graft.Bench"` for the Spark side.

Usage: bench_baseline.py <sfDir> <verifyOutDir> [threads] [runs] [jsonOut]

Env:
  BASELINE_TIMEOUT_S  per-execution budget (duckdb interrupt; a query
                      whose WARM run blows it is reported as a timeout
                      and excluded from the total — the declared
                      "unbenched anchor" treatment, made automatic).
                      Default 600.
  BASELINE_SKIP       comma-separated query names to skip outright
                      (known-infeasible at this sf — saves burning the
                      timeout on each).
"""
import json
import os
import statistics
import sys
import threading
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
    budget = float(os.environ.get("BASELINE_TIMEOUT_S", "600"))
    skip = set(filter(None,
                      os.environ.get("BASELINE_SKIP", "").split(",")))
    times = {}
    skipped = sorted(skip & set(oracle))
    timed_out = []

    def run_budgeted(sql):
        # done-flag guard: without it, a timer firing in the window
        # between query completion and timer.cancel() would interrupt
        # the NEXT query on this connection, misclassifying a fast
        # query as a timeout
        done = threading.Event()

        def maybe_interrupt():
            if not done.is_set():
                con.interrupt()

        timer = threading.Timer(budget, maybe_interrupt)
        timer.start()
        try:
            con.execute(sql).fetchall()
        finally:
            done.set()
            timer.cancel()

    for name in sorted(oracle):
        if name in skip:
            print(f"{name}: SKIPPED (BASELINE_SKIP)", file=sys.stderr)
            continue
        try:
            run_budgeted(oracle[name])  # warm
            timed = []
            for _ in range(runs):
                t0 = time.time()
                run_budgeted(oracle[name])
                timed.append(time.time() - t0)
            timed.sort()
            times[name] = {"min": timed[0],
                           "med": statistics.median(timed),
                           "max": timed[-1]}
        except duckdb.InterruptException:
            timed_out.append(name)
            print(f"{name}: TIMEOUT (> {budget:g}s)", file=sys.stderr)
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                timed_out.append(name)
                print(f"{name}: TIMEOUT (> {budget:g}s)", file=sys.stderr)
            else:
                print(f"{name}: ERROR {e}", file=sys.stderr)
    for name, t in sorted(times.items()):
        print(f"{t['med']:8.3f}  {name}")
    total = sum(t["med"] for t in times.values())
    print(f"{total:8.3f}  TOTAL ({len(times)} queries, {threads} threads, "
          f"{runs} runs/query, median, {sf_dir})")
    if json_out:
        body = {"sf": sf_dir, "threads": threads, "runs": runs,
                "total_med": round(total, 3),
                "timeout_s": budget,
                "timed_out": timed_out,
                "skipped": skipped,
                "queries": {k: {s: round(v, 3) for s, v in t.items()}
                            for k, t in times.items()}}
        with open(json_out, "w") as f:
            json.dump(body, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 16,
         int(sys.argv[4]) if len(sys.argv) > 4 else 5,
         sys.argv[5] if len(sys.argv) > 5 else None)
