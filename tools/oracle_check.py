#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs
each oracle SQL in DuckDB over the same sf tables, and compares
row-count, schema (column names), and a canonical value hash — the same
spirit as the driver's CORRECTNESS_r{N}.json. Dev tool only; the Scala
engine has no dependency on this.

Usage: oracle_check.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a CORRECTNESS_r{N}.json-shaped artifact
(per-query rows/schema/hash match + row counts) so scale-point gates
(tools/sf1_gate.sh) commit the same artifact shape the driver does.

ORACLE_TIMEOUT_S (env, default none): per-query DuckDB wall-clock cap.
A query whose ORACLE exceeds it is recorded as a Spark-only row check
("oracle_timeout": true, "spark_only": true, pass = spark_rows > 0)
instead of hanging the gate — at sf1 DuckDB cannot finish q45/q94
(quadratic record-domain plans the engine's blocked operators avoid),
and the honest artifact says exactly that rather than omitting them.
When the cap is set, a typed duckdb.OutOfMemoryException downgrades
the same way but is flagged "oracle_oom": true (with
"oracle_timeout": false) — the two infeasibility classes are kept
distinct in the artifact. Without the cap (the sf0.01 gate) an OOM is
a hard FAIL. ORACLE_MEM_LIMIT (env, default 50% of physical RAM)
bounds DuckDB's allocator so an over-budget oracle fails cleanly
per-query instead of killing the whole gate process.
"""
import json
import sys
import threading
import time

import duckdb
import pyarrow.parquet as pq
import pandas as pd
import glob
import hashlib
import math

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    h = hashlib.sha256()

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    for row in df.itertuples(index=False, name=None):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    results = {}
    con = duckdb.connect()
    import os
    # Contain DuckDB: without a memory_limit an oracle that outgrows RAM
    # (q125's recursive-CTE walk at sf10) aborts with an allocator error
    # AFTER exhausting process memory, which then kills the pyarrow read
    # of the NEXT query's spark output — the whole gate dies without
    # writing the artifact (r19). With the limit, the failure is a clean
    # per-query OutOfMemoryException handled below. The limit must not
    # be a host-specific constant (a fixed 64GB RAISES the cap above
    # DuckDB's default on hosts with <80GB RAM, reinstating the exact
    # failure this guards against — r19 advice): default to 50% of
    # detected physical RAM, overridable via ORACLE_MEM_LIMIT.
    mem_limit = os.environ.get("ORACLE_MEM_LIMIT")
    if not mem_limit:
        ram_b = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        mem_limit = f"{max(1, ram_b // 2 // (1 << 30))}GB"
    con.execute(f"SET memory_limit='{mem_limit}'")
    for t in TABLES:
        # `t.parquet` may be a single file or a directory of part files
        # (make_scale_data.py's multi-file layout) — glob the latter.
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": "no spark output"}
            continue
        got = pq.ParquetDataset(files).read().to_pandas()
        try:
            timeout_s = float(
                os.environ.get("ORACLE_TIMEOUT_S", "0")) or None
        except ValueError:
            sys.exit("ORACLE_TIMEOUT_S must be a number (seconds), got "
                     f"{os.environ['ORACLE_TIMEOUT_S']!r}")
        # Each oracle runs on its own cursor: a Timer that fires in the
        # window between execute-completion and cancel() interrupts only
        # this (idle, about-to-be-dropped) cursor, never the next query.
        cur = con.cursor()
        timed_out = []
        if timeout_s:
            timer = threading.Timer(timeout_s,
                                    lambda: (timed_out.append(True),
                                             cur.interrupt()))
            timer.start()
        started = time.monotonic()
        try:
            want = cur.execute(oracle[name]).df()
        except Exception as e:
            # Classify by elapsed time too: interrupt() may land without
            # the Timer body having appended yet.
            # OOM downgrade: ONLY the typed exception counts (a broad
            # "Out of Memory" substring match would catch wrapped errors
            # and silently loosen the gate — r19 advice), and ONLY when a
            # timeout cap is set, i.e. in the declared scale gates. In
            # the capless sf0.01 gate an OOM is a hard FAIL: no oracle
            # should outgrow RAM there, and passing it as a row check
            # would hide a real defect.
            oom = bool(timeout_s) and \
                isinstance(e, duckdb.OutOfMemoryException)
            timed = bool(timed_out) or (
                timeout_s and time.monotonic() - started >= timeout_s)
            if timed or oom:
                # DuckDB could not finish inside the cap — wall-clock OR
                # memory (same class of infeasibility): keep the query in
                # the artifact as a Spark-only row check, not a FAIL and
                # not an omission. oracle_timeout means timeout ONLY;
                # memory infeasibility is oracle_oom (consumers keying on
                # oracle_timeout must not misread OOM as wall-clock).
                ok = len(got) > 0
                if not ok:
                    failures += 1
                why = ("OUT OF MEMORY (typed OutOfMemoryException, "
                       f"limit {mem_limit})" if oom and not timed
                       else f"timeout after {timeout_s:.0f}s")
                print(f"{'spark-only' if ok else 'FAIL'} {name}: oracle "
                      f"{why} (spark {len(got)} rows)")
                results[name] = {
                    "rows_match": ok, "schema_match": ok, "hash_match": ok,
                    "spark_rows": len(got), "oracle_rows": None,
                    "oracle_timeout": bool(timed), "spark_only": True,
                    "oracle_oom": bool(oom and not timed),
                    "err": None if ok else f"oracle {why} and 0 spark rows"}
                continue
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"oracle error {e}"}
            continue
        finally:
            if timeout_s:
                timer.cancel()
            cur.close()
        problems = []
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"schema {sorted(got.columns)} vs {sorted(want.columns)}")
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        if not problems and canon(got) != canon(want):
            problems.append("value hash mismatch")
            merged = got.reindex(sorted(got.columns), axis=1)
            wantd = want.reindex(sorted(want.columns), axis=1)
            for i in range(min(len(got), len(want))):
                if canon(merged.iloc[[i]]) != canon(wantd.iloc[[i]]):
                    problems.append(
                        f"first diff row {i}:\n  spark={merged.iloc[i].to_dict()}\n  duck ={wantd.iloc[i].to_dict()}")
                    break
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name} ({len(got)} rows)")
        results[name] = {
            "rows_match": len(got) == len(want),
            "schema_match": sorted(got.columns) == sorted(want.columns),
            "hash_match": not problems,
            "spark_rows": len(got), "oracle_rows": len(want),
            "err": "; ".join(problems) if problems else None}
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
