#!/usr/bin/env python3
"""Generate larger scale factors of the driver's synthetic testdata.

The driver ships /root/testdata/sf{0.001,0.01,0.1} (read-only) and the
judge has asked for an sf1 scaling point four rounds running. This tool
extends the SAME distributions to any sf, writing under
/root/repo/testdata/sf{N} (we may not write to /root/testdata).

Distributions were measured from the driver's sf0.001/0.01/0.1 outputs
(see PLANS.md "sf1 scaling" section):
  region/nation        fixed 5/25 rows (copied verbatim from sf0.1)
  customer             150_000*sf   acctbal ~ U(-1000,10000), 5 segments
  supplier              10_000*sf   same acctbal
  part                 200_000*sf   name = adj x noun (8x8), 25 brands,
                                    6 types, size U{1..50},
                                    retailprice = 900 + (key%1000)*0.1
  orders             1_500_000*sf   status U{F,O,P}, 5 priorities,
                                    totalprice ~ U(1000,500000),
                                    orderdate ~ U[1995-01-01,2001-08-01]
  lineitem    Poisson(4)/order      qty U{1..50}, extprice U(900,105000),
                                    disc U{0..0.10 step .01},
                                    tax U{0..0.08 step .01},
                                    shipdate = orderdate-like + U{1..95}d
  events             1_000_000*sf   users 15_000*sf, 5 types,
                                    value ~ Exp(50), ts sorted over
                                    Jan 2024, props = {"k": U{0..99}}
  documents             50_000*sf   8..100 words from the 31-word vocab,
                                    lang {en:.4,de/es/fr/zh:.15},
                                    source = src{doc_id%20},
                                    ~1/625 docs duplicate an earlier text
  embeddings            20_000*sf   64-dim unit-norm, 10 gaussian
                                    clusters (center + N(0,0.3) noise)

Deterministic: numpy PCG64 seeded 42+crc32(table) per table. Dev tool,
driver-side python (numpy/pyarrow) — the engine itself never depends on
this. Large tables are written as a DIRECTORY `t.parquet/part-*.parquet`
(up to 32 files) — the layout a 100 TB input actually has; Spark and
DuckDB (via glob, see oracle_check.py) both read it transparently.

Usage: python3 tools/make_scale_data.py 1 [outdir]
"""
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
SFDIR = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/testdata/sf{SF:g}"
SRC = "/root/testdata/sf0.1"

import pathlib
out = pathlib.Path(SFDIR)
out.mkdir(parents=True, exist_ok=True)

DAY_US = 86_400_000_000


def rng(name):
    # zlib.crc32, not hash(): str hash is salted per-process
    # (PYTHONHASHSEED), which would silently make "deterministic"
    # regeneration produce different data each run.
    import zlib
    return np.random.Generator(np.random.PCG64(42_000_000 + zlib.crc32(name.encode())))


def write(name, table):
    # Multi-file layout: `name.parquet` is a DIRECTORY of up to 32 part
    # files (≥10k rows each) — the honest large-scale layout (100 TB
    # inputs arrive as many files), and what gives a scan file-level
    # parallelism instead of leaning on byte-range splitting of one big
    # file. Small tables stay a single file. Within a file, 200k-row
    # row groups keep byte splits effective: Spark splits a parquet
    # file by byte ranges but reads at row-group granularity.
    n = table.num_rows
    nfiles = min(32, max(1, n // 10_000))
    dest = out / f"{name}.parquet"
    if nfiles == 1:
        pq.write_table(table, dest, row_group_size=200_000)
    else:
        if dest.exists() and dest.is_file():
            dest.unlink()
        dest.mkdir(parents=True, exist_ok=True)
        for f in dest.glob("*.parquet"):
            f.unlink()
        per = -(-n // nfiles)  # ceil
        for i in range(nfiles):
            part = table.slice(i * per, per)
            if part.num_rows:
                pq.write_table(part, dest / f"part-{i:05d}.parquet",
                               row_group_size=200_000)
    print(f"{name}: {table.num_rows} rows, {nfiles} file(s)")


def ts_us(datestr):
    return np.datetime64(datestr, "us").astype(np.int64)


# region / nation: fixed tiny dims, copy the driver's files verbatim.
for t in ("region", "nation"):
    shutil.copyfile(f"{SRC}/{t}.parquet", out / f"{t}.parquet")
    print(f"{t}: copied from sf0.1")

# ---- customer ----
n = int(150_000 * SF)
r = rng("customer")
write("customer", pa.table({
    "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
    "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
    "c_nationkey": pa.array(r.integers(0, 25, n).astype(np.int32)),
    "c_acctbal": pa.array(np.round(r.uniform(-1000, 10000, n), 2)),
    "c_mktsegment": pa.array(np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )[r.integers(0, 5, n)]),
}))

# ---- supplier ----
n = int(10_000 * SF)
r = rng("supplier")
write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
    "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
    "s_nationkey": pa.array(r.integers(0, 25, n).astype(np.int32)),
    "s_acctbal": pa.array(np.round(r.uniform(-1000, 10000, n), 2)),
}))

# ---- part ----
n = int(200_000 * SF)
r = rng("part")
adjs = np.array(["large", "hot", "blue", "old", "cold", "red", "new", "small"])
nouns = np.array(["ring", "bolt", "plate", "gear", "widget", "gizmo", "anvil", "rod"])
keys = np.arange(n, dtype=np.int64)
write("part", pa.table({
    "p_partkey": pa.array(keys),
    "p_name": pa.array(np.char.add(np.char.add(adjs[r.integers(0, 8, n)], " "),
                                   nouns[r.integers(0, 8, n)])),
    "p_brand": pa.array([f"Brand#{b}" for b in r.integers(0, 25, n)]),
    "p_type": pa.array(np.array(
        ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    )[r.integers(0, 6, n)]),
    "p_size": pa.array(r.integers(1, 51, n).astype(np.int32)),
    "p_retailprice": pa.array(np.round(900.0 + (keys % 1000) * 0.1, 2)),
}))

# ---- orders + lineitem ----
n_ord = int(1_500_000 * SF)
n_cust = int(150_000 * SF)
r = rng("orders")
d0, d1 = ts_us("1995-01-01"), ts_us("2001-08-01")
orderdates = (d0 + (r.integers(0, (d1 - d0) // DAY_US + 1, n_ord) * DAY_US))
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
    "o_custkey": pa.array(r.integers(0, n_cust, n_ord)),
    "o_orderstatus": pa.array(np.array(["F", "O", "P"])[r.integers(0, 3, n_ord)]),
    "o_totalprice": pa.array(np.round(r.uniform(1000, 500_000, n_ord), 2)),
    # driver's current layout stores order/ship dates and events.ts
    # as timestamp[us] (earlier rounds shipped ms / ns; the engine
    # loader and both query engines are unit-agnostic, but match the
    # driver's layout so the scan path exercised is identical)
    "o_orderdate": pa.array(orderdates, pa.timestamp("us")),
    "o_orderpriority": pa.array(np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[r.integers(0, 5, n_ord)]),
}))

r = rng("lineitem")
per_order = r.poisson(4.0, n_ord)
n_li = int(per_order.sum())
n_part, n_supp = int(200_000 * SF), int(10_000 * SF)
shipbase = d0 + r.integers(0, (d1 - d0) // DAY_US + 1, n_li) * DAY_US
write("lineitem", pa.table({
    "l_orderkey": pa.array(np.repeat(np.arange(n_ord, dtype=np.int64), per_order)),
    "l_partkey": pa.array(r.integers(0, n_part, n_li)),
    "l_suppkey": pa.array(r.integers(0, n_supp, n_li)),
    "l_linenumber": pa.array(r.integers(1, 8, n_li).astype(np.int32)),
    "l_quantity": pa.array(r.integers(1, 51, n_li).astype(np.float64)),
    "l_extendedprice": pa.array(np.round(r.uniform(900, 105_000, n_li), 2)),
    "l_discount": pa.array(np.round(r.integers(0, 11, n_li) * 0.01, 2)),
    "l_tax": pa.array(np.round(r.integers(0, 9, n_li) * 0.01, 2)),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[r.integers(0, 3, n_li)]),
    "l_linestatus": pa.array(np.array(["F", "O"])[r.integers(0, 2, n_li)]),
    "l_shipdate": pa.array(shipbase + r.integers(1, 96, n_li) * DAY_US,
                           pa.timestamp("us")),
}))

# ---- events ----
n = int(1_000_000 * SF)
n_users = int(15_000 * SF)
r = rng("events")
t0, t1 = ts_us("2024-01-01"), ts_us("2024-01-31")
ts = np.sort(r.integers(t0, t1, n))
write("events", pa.table({
    "event_id": pa.array(np.arange(n, dtype=np.int64)),
    # driver's current layout is timestamp[us] (it shipped ns in
    # earlier rounds; Tables.load handles both)
    "ts": pa.array(ts, pa.timestamp("us")),
    "user_id": pa.array(r.integers(0, n_users, n)),
    "event_type": pa.array(np.array(
        ["click", "error", "purchase", "signup", "view"])[r.integers(0, 5, n)]),
    "value": pa.array(np.round(r.exponential(50.0, n), 2)),
    "props": pa.array([f'{{"k": {k}}}' for k in r.integers(0, 100, n)]),
}))

# ---- documents ----
n = int(50_000 * SF)
r = rng("documents")
vocab = np.array(
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window".split())
langs = np.array(["en", "de", "es", "fr", "zh"])
lang_col = langs[r.choice(5, n, p=[0.4, 0.15, 0.15, 0.15, 0.15])]
nwords = r.integers(8, 101, n)
texts = [" ".join(vocab[r.integers(0, len(vocab), k)]) for k in nwords]
# exact duplicates at the driver's observed ~1/625 rate (dedup fixtures)
for i in r.choice(np.arange(n // 2, n), max(1, n // 625), replace=False):
    texts[i] = texts[int(r.integers(0, n // 2))]
write("documents", pa.table({
    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
    "text": pa.array(texts),
    "lang": pa.array(lang_col),
    "source": pa.array([f"src{i % 20}" for i in range(n)]),
    "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
}))

# ---- embeddings ----
n = int(20_000 * SF)
r = rng("embeddings")
centers = r.normal(0, 1, (10, 64))
labels = r.integers(0, 10, n)
vecs = centers[labels] + r.normal(0, 0.3, (n, 64))
vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(n, dtype=np.int64)),
    "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    "label": pa.array(labels.astype(np.int32)),
}))

print(f"done: {SFDIR}")
