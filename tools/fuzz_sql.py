#!/usr/bin/env python3
"""Differential SQL fuzz gate: generate N seeded random queries in the
ANSI subset Spark and DuckDB share, run them through BOTH engines on
the same parquet tables, and hash-compare results.

The generator stays inside the dialect-common, determinism-safe space
the hand-written oracle catalog already established:
  - aggregates are exact (COUNT, SUM of ints CAST AS BIGINT, MIN/MAX,
    SUM of money columns via DECIMAL(18,2) cast back to DOUBLE) — no
    order-dependent float accumulation;
  - every query ends in ORDER BY over ALL projected columns (total
    order, so the row hash is deterministic in both engines);
  - predicates use literals drawn from each column's actual value
    range so selectivity varies instead of collapsing to 0 or 100%.

Shapes: single-table filter+aggregate, FK join + aggregate (orders
joins customer / lineitem joins orders), and filter+project+LIMIT over
a total order. Timestamps stay out of projections (engines format them
identically through parquet but NTZ vs TZ display is a known trap; the
shipping catalog pins them separately, e.g. q04/q101).

Usage: fuzz_sql.py [N] [seed] [sfDir] [jsonOut]
Writes the query map, then the caller runs:
  sbt "runMain graft.SqlVerify <sfDir> /tmp/fuzz_out <jsonOut>"
  python3 tools/oracle_check.py <sfDir> /tmp/fuzz_out FUZZ_r{N}.json
"""
import json
import random
import sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 13
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
OUT = sys.argv[4] if len(sys.argv) > 4 else "/tmp/fuzz_sql.json"

rng = random.Random(SEED)

# column model: (name, kind) — kind drives literal generation and
# whether the column may appear in GROUP BY / aggregates
TABLES = {
    "lineitem": {
        "group": ["l_returnflag", "l_linestatus"],
        "int": ["l_quantity", "l_linenumber", "l_orderkey", "l_partkey",
                "l_suppkey"],
        "money": ["l_extendedprice", "l_discount", "l_tax"],
    },
    "orders": {
        "group": ["o_orderstatus", "o_orderpriority"],
        "int": ["o_orderkey", "o_custkey"],
        "money": ["o_totalprice"],
    },
    "customer": {
        "group": ["c_mktsegment"],
        "int": ["c_custkey", "c_nationkey"],
        "money": ["c_acctbal"],
    },
    "documents": {
        "group": ["lang", "source"],
        "int": ["doc_id", "n_chars"],
        "money": [],
    },
}
# value ranges measured from the generator's distributions. Key
# domains scale linearly with sf (orders = 1.5M*sf rows, etc.), so
# literals are drawn from the RESOLVED sf's range — sf1-sized literals
# at sf0.01 would make most range predicates empty or all-pass and the
# fuzz would stop exercising partial selectivity (first cut measured
# 21/60 zero-row results).
SF = float(__import__("re").search(r"sf([\d.]+)", SF_DIR).group(1)) \
    if __import__("re").search(r"sf([\d.]+)", SF_DIR) else 0.01


def _k(n):
    return max(2, int(n * SF))


RANGES = {
    "l_quantity": (1, 50), "l_linenumber": (1, 7),
    "l_orderkey": (1, _k(1_500_000)), "l_partkey": (1, _k(200_000)),
    "l_suppkey": (1, _k(10_000)),
    "o_orderkey": (1, _k(1_500_000)), "o_custkey": (1, _k(150_000)),
    "c_custkey": (1, _k(150_000)), "c_nationkey": (0, 24),
    "doc_id": (1, _k(50_000)), "n_chars": (30, 700),
}
MONEY_RANGES = {
    "l_extendedprice": (900, 105000), "l_discount": (0, 0.1),
    "l_tax": (0, 0.08), "o_totalprice": (1000, 500000),
    "c_acctbal": (-1000, 10000),
}
FK = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
]


def lit_for(col):
    if col in RANGES:
        lo, hi = RANGES[col]
        return str(rng.randint(lo, hi))
    lo, hi = MONEY_RANGES[col]
    return f"{rng.uniform(lo, hi):.2f}"


def pred(table):
    cols = TABLES[table]
    c = rng.choice(cols["int"] + cols["money"])
    op = rng.choice(["<", ">", "<=", ">="])
    return f"{c} {op} {lit_for(c)}"


def aggs(table, alias=""):
    """exact aggregate list + matching aliases (both dialects)."""
    cols = TABLES[table]
    out = [("n_rows", "CAST(COUNT(*) AS BIGINT)")]
    for c in rng.sample(cols["int"], min(2, len(cols["int"]))):
        out.append((f"sum_{c}", f"CAST(SUM({alias}{c}) AS BIGINT)"))
        out.append((f"max_{c}", f"MAX({alias}{c})"))
    for c in cols["money"][:1]:
        out.append((f"dsum_{c}",
                    f"CAST(SUM(CAST({alias}{c} AS DECIMAL(18,2))) "
                    f"AS DOUBLE)"))
    return out


def q_single_agg(i):
    t = rng.choice(list(TABLES))
    g = rng.sample(TABLES[t]["group"], rng.randint(1, len(TABLES[t]["group"])))
    where = " AND ".join(pred(t) for _ in range(rng.randint(0, 2)))
    a = aggs(t)
    sel = ", ".join(g + [f"{expr} AS {name}" for name, expr in a])
    sql = f"SELECT {sel} FROM {t}"
    if where:
        sql += f" WHERE {where}"
    sql += f" GROUP BY {', '.join(g)} ORDER BY {', '.join(g)}"
    return sql


def q_join_agg(i):
    lt, rt, lk, rk = rng.choice(FK)
    g = rng.sample(TABLES[rt]["group"] + TABLES[lt]["group"], 2)
    where = pred(lt)
    a = aggs(lt)
    sel = ", ".join(g + [f"{expr} AS {name}" for name, expr in a])
    return (f"SELECT {sel} FROM {lt} JOIN {rt} ON {lk} = {rk} "
            f"WHERE {where} GROUP BY {', '.join(g)} "
            f"ORDER BY {', '.join(g)}")


def q_topk(i):
    t = rng.choice(["orders", "customer", "documents"])
    cols = TABLES[t]
    proj = cols["int"][:2] + cols["group"][:1]
    where = pred(t)
    k = rng.choice([5, 20, 100])
    order = ", ".join(proj)
    return (f"SELECT {', '.join(proj)} FROM {t} WHERE {where} "
            f"ORDER BY {order} LIMIT {k}")


def q_left_join(i):
    """LEFT JOIN with null-producing misses, COALESCEd before
    projection so ordering and hashing stay engine-stable."""
    lt, rt, lk, rk = rng.choice(FK)
    g = rng.choice(TABLES[rt]["group"])
    where = pred(lt)
    return (f"SELECT COALESCE({g}, '<none>') AS {g}, "
            f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT({rk}) AS BIGINT) AS n_matched "
            f"FROM {lt} LEFT JOIN {rt} ON {lk} = {rk} "
            f"WHERE {where} "
            f"GROUP BY COALESCE({g}, '<none>') ORDER BY {g}")


def q_having(i):
    t = rng.choice(list(TABLES))
    g = rng.choice(TABLES[t]["group"])
    c = rng.choice(TABLES[t]["int"])
    thr = rng.randint(2, 50)
    return (f"SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"MIN({c}) AS min_{c}, MAX({c}) AS max_{c} "
            f"FROM {t} GROUP BY {g} "
            f"HAVING COUNT(*) >= {thr} ORDER BY {g}")


def q_distinct(i):
    t = rng.choice(list(TABLES))
    g = rng.choice(TABLES[t]["group"])
    c = rng.choice(TABLES[t]["int"])
    where = pred(t)
    return (f"SELECT {g}, CAST(COUNT(DISTINCT {c}) AS BIGINT) "
            f"AS nd_{c}, CAST(COUNT(*) AS BIGINT) AS n_rows "
            f"FROM {t} WHERE {where} GROUP BY {g} ORDER BY {g}")


def q_case_agg(i):
    """conditional aggregation — SUM(CASE WHEN) over an int measure."""
    t = rng.choice(list(TABLES))
    g = rng.choice(TABLES[t]["group"])
    c = rng.choice(TABLES[t]["int"])
    cond = pred(t)
    return (f"SELECT {g}, "
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS n_cond, "
            f"CAST(SUM(CASE WHEN {cond} THEN {c} ELSE 0 END) AS BIGINT) "
            f"AS sum_cond "
            f"FROM {t} GROUP BY {g} ORDER BY {g}")


def q_time_window(i):
    """timestamp predicates over events (ts stays OUT of the
    projection: NTZ display is engine-specific, wall-clock comparison
    is not — the session pins UTC so both engines compare the same
    instants)."""
    d1 = rng.randint(1, 25)
    d2 = rng.randint(d1, 28)
    return (f"SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
            f"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            f"FROM events "
            f"WHERE ts >= TIMESTAMP '2024-01-{d1:02d} 00:00:00' "
            f"AND ts < TIMESTAMP '2024-01-{d2:02d} 23:59:59' "
            f"GROUP BY event_type ORDER BY event_type")


# tables with a unique key column, for deterministic window ordering
KEYED = [("orders", "o_orderkey"), ("customer", "c_custkey"),
         ("documents", "doc_id")]


def q_window_topk(i):
    """ROW_NUMBER per group — rank computed over a measure with the
    unique key as tiebreak, so the numbering is engine-deterministic."""
    t, key = rng.choice(KEYED)
    g = rng.choice(TABLES[t]["group"])
    m = rng.choice(TABLES[t]["int"] + TABLES[t]["money"])
    k = rng.choice([3, 10, 25])
    return (f"SELECT {g}, {key}, CAST(rn AS BIGINT) AS rn FROM ("
            f"SELECT {g}, {key}, ROW_NUMBER() OVER "
            f"(PARTITION BY {g} ORDER BY {m} DESC, {key}) AS rn "
            f"FROM {t}) s WHERE rn <= {k} ORDER BY {g}, {key}, rn")


def q_running_sum(i):
    """cumulative frame (ROWS UNBOUNDED PRECEDING..CURRENT ROW) over a
    unique-keyed order — exact int arithmetic, engine-stable."""
    t, key = rng.choice(KEYED)
    g = rng.choice(TABLES[t]["group"])
    c = rng.choice(TABLES[t]["int"])
    where = pred(t)
    return (f"SELECT {g}, {key}, CAST(SUM({c}) OVER "
            f"(PARTITION BY {g} ORDER BY {key} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
            f"AS run_{c} FROM {t} WHERE {where} "
            f"ORDER BY {g}, {key}, run_{c}")


def q_lag(i):
    """LAG with the null first-row COALESCEd to a sentinel."""
    t, key = rng.choice(KEYED)
    g = rng.choice(TABLES[t]["group"])
    c = rng.choice(TABLES[t]["int"])
    off = rng.choice([1, 2])
    return (f"SELECT {g}, {key}, CAST(COALESCE(LAG({c}, {off}) OVER "
            f"(PARTITION BY {g} ORDER BY {key}), -1) AS BIGINT) "
            f"AS prev_{c} FROM {t} WHERE {pred(t)} "
            f"ORDER BY {g}, {key}, prev_{c}")


def q_setop(i):
    """INTERSECT / EXCEPT / UNION (set semantics in both dialects)
    between two differently-filtered projections of one table."""
    t = rng.choice(list(TABLES))
    g = rng.choice(TABLES[t]["group"])
    c = rng.choice(TABLES[t]["int"])
    op = rng.choice(["INTERSECT", "EXCEPT", "UNION"])
    return (f"SELECT {g}, {c} FROM {t} WHERE {pred(t)} "
            f"{op} "
            f"SELECT {g}, {c} FROM {t} WHERE {pred(t)} "
            f"ORDER BY {g}, {c}")


def q_null_distinct(i):
    """IS [NOT] DISTINCT FROM over NULLIF-manufactured nulls — the
    null-equality surface where engines classically diverge."""
    t = rng.choice(list(TABLES))
    g = rng.choice(TABLES[t]["group"])
    c = rng.choice(TABLES[t]["int"])
    x, y = rng.randint(0, 9), rng.randint(0, 9)
    neg = rng.choice(["", "NOT "])
    return (f"SELECT {g}, "
            f"CAST(SUM(CASE WHEN NULLIF({c} % 10, {x}) "
            f"IS {neg}DISTINCT FROM NULLIF({c} % 10, {y}) "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS n_dist, "
            f"CAST(COUNT(*) AS BIGINT) AS n_rows "
            f"FROM {t} GROUP BY {g} ORDER BY {g}")


def q_rollup(i):
    """GROUP BY ROLLUP — super-aggregate rows surface null-handling in
    grouping columns; sentinel-COALESCEd (group cols are non-null in
    the corpus) for a stable total order."""
    t = rng.choice([t for t in TABLES if len(TABLES[t]["group"]) >= 2])
    g1, g2 = rng.sample(TABLES[t]["group"], 2)
    c = rng.choice(TABLES[t]["int"])
    return (f"SELECT COALESCE({g1}, '<all>') AS {g1}, "
            f"COALESCE({g2}, '<all>') AS {g2}, "
            f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(SUM({c}) AS BIGINT) AS sum_{c} "
            f"FROM {t} GROUP BY ROLLUP({g1}, {g2}) "
            f"ORDER BY {g1}, {g2}")


def q_exists(i):
    """correlated [NOT] EXISTS — the decorrelation surface (Spark
    rewrites to semi/anti join; DuckDB to its own mark join). Parent
    and child filtered independently so match rates vary."""
    par, chi, pk, ck = rng.choice(
        [("customer", "orders", "c_custkey", "o_custkey"),
         ("orders", "lineitem", "o_orderkey", "l_orderkey")])
    g = rng.choice(TABLES[par]["group"])
    neg = rng.choice(["", "NOT "])
    return (f"SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_rows "
            f"FROM {par} p WHERE {neg}EXISTS ("
            f"SELECT 1 FROM {chi} c WHERE c.{ck} = p.{pk} "
            f"AND {pred(chi)}) "
            f"GROUP BY {g} ORDER BY {g}")


def q_in_sub(i):
    """[NOT] IN over a filtered key subquery. Keys are non-null in the
    corpus, so NOT IN's tri-valued null trap stays out of scope (the
    hand catalog pins null-key semantics separately)."""
    par, chi, pk, ck = rng.choice(
        [("customer", "orders", "c_custkey", "o_custkey"),
         ("orders", "lineitem", "o_orderkey", "l_orderkey")])
    g = rng.choice(TABLES[par]["group"])
    c = rng.choice(TABLES[par]["int"])
    neg = rng.choice(["", "NOT "])
    return (f"SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(SUM({c}) AS BIGINT) AS sum_{c} "
            f"FROM {par} WHERE {pk} {neg}IN ("
            f"SELECT {ck} FROM {chi} WHERE {pred(chi)}) "
            f"GROUP BY {g} ORDER BY {g}")


def q_scalar_sub(i):
    """correlated scalar COUNT subquery in the projection — exercises
    aggregate decorrelation with the zero-match → 0 edge (COUNT over
    an empty correlated group must yield 0, not NULL)."""
    par, chi, pk, ck = rng.choice(
        [("customer", "orders", "c_custkey", "o_custkey"),
         ("orders", "lineitem", "o_orderkey", "l_orderkey")])
    k = rng.choice([50, 200])
    return (f"SELECT {pk}, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {chi} c "
            f"WHERE c.{ck} = p.{pk} AND {pred(chi)}) AS n_child "
            f"FROM {par} p WHERE {pred(par)} "
            f"ORDER BY {pk} LIMIT {k}")


def q_filter_agg(i):
    """aggregate FILTER (WHERE ...) clauses — the filtered-SUM-over-
    empty-group → NULL edge is a classic dialect divergence (vs 0)."""
    t = rng.choice(list(TABLES))
    g = rng.choice(TABLES[t]["group"])
    c = rng.choice(TABLES[t]["int"])
    p1, p2 = pred(t), pred(t)
    return (f"SELECT {g}, "
            f"CAST(COUNT(*) FILTER (WHERE {p1}) AS BIGINT) AS n_f, "
            f"CAST(SUM({c}) FILTER (WHERE {p2}) AS BIGINT) AS sum_f, "
            f"MAX({c}) FILTER (WHERE {p1}) AS max_f "
            f"FROM {t} GROUP BY {g} ORDER BY {g}")


def q_lateral(i):
    """correlated LATERAL derived table (aggregate body, so exactly one
    row per parent) — the other decorrelation front-end besides
    EXISTS/IN/scalar subqueries."""
    par, chi, pk, ck = rng.choice(
        [("customer", "orders", "c_custkey", "o_custkey"),
         ("orders", "lineitem", "o_orderkey", "l_orderkey")])
    c = rng.choice(TABLES[chi]["int"])
    k = rng.choice([50, 200])
    return (f"SELECT p.{pk}, l.n_child, l.mx "
            f"FROM {par} p, LATERAL ("
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n_child, "
            f"MAX(c.{c}) AS mx "
            f"FROM {chi} c WHERE c.{ck} = p.{pk} AND {pred(chi)}) l "
            f"WHERE {pred(par)} ORDER BY p.{pk} LIMIT {k}")


def q_full_outer(i):
    """FULL OUTER JOIN of two grouped aggregates on partially
    overlapping key subsets — exercises null-padding on both sides;
    null ordering pinned explicitly (Spark ASC defaults nulls first,
    DuckDB nulls last)."""
    t = rng.choice(["orders", "lineitem", "customer"])
    key = rng.choice(TABLES[t]["int"])
    pa, pb = pred(t), pred(t)
    return (f"SELECT COALESCE(a.k, b.k) AS k, a.na, b.nb "
            f"FROM (SELECT {key} % 97 AS k, "
            f"CAST(COUNT(*) AS BIGINT) AS na FROM {t} WHERE {pa} "
            f"GROUP BY 1) a "
            f"FULL OUTER JOIN (SELECT {key} % 101 AS k, "
            f"CAST(COUNT(*) AS BIGINT) AS nb FROM {t} WHERE {pb} "
            f"GROUP BY 1) b ON a.k = b.k "
            f"ORDER BY k NULLS FIRST, na NULLS FIRST, nb NULLS FIRST")


SHAPES = [q_single_agg, q_join_agg, q_topk,
          q_left_join, q_having, q_distinct, q_case_agg,
          q_time_window,
          q_window_topk, q_running_sum, q_lag,
          q_setop, q_null_distinct, q_rollup,
          q_exists, q_in_sub, q_scalar_sub,
          q_filter_agg, q_lateral, q_full_outer]


def main():
    queries = {}
    for i in range(N):
        shape = SHAPES[i % len(SHAPES)]
        queries[f"fz{i:03d}_{shape.__name__[2:]}"] = shape(i)
    with open(OUT, "w") as f:
        json.dump(queries, f, indent=1, sort_keys=True)
    print(f"wrote {N} queries (seed {SEED}) to {OUT}")
    print("next: sbt \"runMain graft.SqlVerify %s /tmp/fuzz_out %s\" && "
          "python3 tools/oracle_check.py %s /tmp/fuzz_out"
          % (SF_DIR, OUT, SF_DIR))


if __name__ == "__main__":
    main()
