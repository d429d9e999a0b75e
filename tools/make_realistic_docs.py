#!/usr/bin/env python3
"""Generate a REALISTIC-vocabulary documents fixture for dial validation.

The driver's synthetic documents use a 31-word vocabulary, which makes
token-SET similarity degenerate: any two long-enough docs share most of
the vocab, so jaccard >= 0.8 pairs span wildly different lengths and
the length-band dial's recall there (4.7 % of lang-blocked pairs at
sf1, PLANS.md round 15) is a property of the vocab, not the dial. This
tool generates the corpus shape a real curation pipeline sees —
  - 30,000-token vocabulary, Zipf(1.07) frequencies (web-text-like),
  - lognormal doc lengths (median ~120 words, clipped [8, 1500]),
  - ~3 % planted near-duplicates: a second-half doc copies a first-half
    doc with ~3 % of token positions resampled (the templated-page /
    boilerplate-edit shape), so qualifying jaccard>=0.8 pairs EXIST and
    have realistically-similar lengths,
  - exact duplicates at the driver's ~1/625 rate,
  - same schema as the driver's documents table (doc_id, text, lang,
    source, n_chars), so Tables.load and ScaleKnobs read it unchanged.

Deterministic (PCG64 seeded per table like make_scale_data.py).
Usage: python3 tools/make_realistic_docs.py <sf> [outdir]
Writes /root/repo/testdata/realdocs_sf{N}/documents.parquet by default.
"""
import pathlib
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
OUT = pathlib.Path(sys.argv[2] if len(sys.argv) > 2
                   else f"/root/repo/testdata/realdocs_sf{SF:g}")
OUT.mkdir(parents=True, exist_ok=True)

VOCAB_N = 30_000


def rng(name):
    return np.random.Generator(
        np.random.PCG64(7_000_000 + zlib.crc32(name.encode())))


# ---- vocabulary: unique pronounceable words, Zipf frequencies ----
SYL = np.array(["ka", "ro", "mi", "ta", "len", "sor", "vi", "dun", "pe",
                "gal", "nis", "tor", "ba", "chu", "rel", "om", "fy", "sa",
                "quo", "zen"])


def word(i):
    # base-20 syllable expansion + rank-dependent extra syllable keeps
    # every word unique and word length loosely rank-correlated (common
    # words shorter), like real text
    parts = []
    j = i
    while True:
        parts.append(SYL[j % 20])
        j //= 20
        if j == 0:
            break
    return "".join(parts)


vocab = np.array([word(i) for i in range(VOCAB_N)])
assert len(set(vocab)) == VOCAB_N, "vocab collision"

ranks = np.arange(1, VOCAB_N + 1, dtype=np.float64)
zipf_p = 1.0 / (ranks + 2.7) ** 1.07
zipf_p /= zipf_p.sum()

n = int(50_000 * SF)
r = rng("realdocs")

lens = np.clip(np.round(np.exp(r.normal(np.log(120), 1.0, n))),
               8, 1500).astype(np.int64)
total = int(lens.sum())
# one big Zipf draw, sliced per doc (fast path for ~10M tokens)
draws = r.choice(VOCAB_N, total, p=zipf_p)
offsets = np.concatenate(([0], np.cumsum(lens)))
toks = [draws[offsets[i]:offsets[i + 1]] for i in range(n)]

# planted near-duplicates: ~3 % of second-half docs copy a first-half
# doc with ~3 % of positions resampled (fresh Zipf draws)
n_near = max(1, int(0.03 * n))
near_targets = r.choice(np.arange(n // 2, n), n_near, replace=False)
for t in near_targets:
    src = int(r.integers(0, n // 2))
    base = toks[src].copy()
    k = max(1, int(0.03 * len(base)))
    pos = r.choice(len(base), min(k, len(base)), replace=False)
    base[pos] = r.choice(VOCAB_N, len(pos), p=zipf_p)
    toks[t] = base
    lens[t] = len(base)

texts = [" ".join(vocab[t]) for t in toks]

# exact duplicates at the driver's observed rate
for i in r.choice(np.arange(n // 2, n), max(1, n // 625), replace=False):
    texts[i] = texts[int(r.integers(0, n // 2))]

langs = np.array(["en", "de", "es", "fr", "zh"])
lang_col = langs[r.choice(5, n, p=[0.4, 0.15, 0.15, 0.15, 0.15])]

table = pa.table({
    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
    "text": pa.array(texts),
    "lang": pa.array(lang_col),
    "source": pa.array([f"src{i % 20}" for i in range(n)]),
    "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
})

dest = OUT / "documents.parquet"
nfiles = min(32, max(1, n // 10_000))
if nfiles == 1:
    pq.write_table(table, dest, row_group_size=200_000)
else:
    if dest.exists() and dest.is_file():
        dest.unlink()
    dest.mkdir(parents=True, exist_ok=True)
    for f in dest.glob("*.parquet"):
        f.unlink()
    per = -(-n // nfiles)
    for i in range(nfiles):
        part = table.slice(i * per, per)
        if part.num_rows:
            pq.write_table(part, dest / f"part-{i:05d}.parquet",
                           row_group_size=200_000)
print(f"documents: {n} rows, {nfiles} file(s), "
      f"{n_near} planted near-dups -> {OUT}")
