#!/usr/bin/env python3
"""Scale-test fixture generator (driver-side tooling, not engine code).

Generates documents.parquet / embeddings.parquet mimicking the
distributions of /root/testdata/sf0.1 at an arbitrary multiplier, so
the dedup / vector families can be run at ~10x (sf1-equivalent) to
verify runtime grows ~linearly. The remaining tables are copied from
the base dir so Tables.load() finds everything.

Usage: python3 scripts/gen_scale.py <outDir> <multiplier> [heaps]

Mimicked structure (measured from sf0.1, seed fixed for determinism):
- documents: 31-word vocab, 10-100 tokens/doc (avg ~54), lang mix
  en-heavy + {de,es,fr,zh}, 20 sources, ~0.3% exact-copy rate and
  ~1.5% mutated-copy rate (2-4 token swaps -> 3-gram Jaccard >= 0.5
  near-dup pairs for d02/d03/d04/s06 to find).
- embeddings: 64-dim unit-norm vectors around 10 label centroids,
  ~2% slightly-perturbed copies (cosine > 0.99 near-dups for d06).

With the `heaps` mode (VERDICT r5 ask #2) the document vocabulary
grows with the corpus instead of staying fixed at 31 words:
V = 22 * sqrt(total_tokens) (Heaps' law V = K*N^beta with beta = 0.5,
K = 22 -- inside the empirical K = 10..100 English band), words drawn
Zipf(s = 1.07). A fixed vocabulary makes average shingle df grow
LINEARLY with the corpus and inverted-index pair volume quadratically
(the 10x run's documented superlinearity); real corpora grow
vocabulary, keeping df near-flat -- this mode exists to prove the
dedup family scales near-linearly on realistic text. Copy/near-dup
rates stay identical to the fixed-vocab mode. Events are copied from
the base dir in heaps mode (the dedup/text families under test do not
read them).
"""
import math
import os
import random
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data",
         "dup", "fast", "filter", "group", "hash", "join", "key",
         "line", "merge", "order", "part", "query", "row", "scan",
         "slow", "small", "sort", "spark", "stream", "table", "the",
         "value", "vector", "window"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.42, 0.145, 0.145, 0.145, 0.145]
BASE = "/root/testdata/sf0.1"


def gen_documents(rng, n):
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.003:           # exact copy
            j = rng.randrange(max(0, i - 200), i)
            text = texts[j]
        elif i > 10 and r < 0.018:          # mutated copy (near-dup)
            j = rng.randrange(max(0, i - 200), i)
            toks = texts[j].split(" ")
            for _ in range(rng.randrange(2, 5)):
                toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
            text = " ".join(toks)
        else:
            k = rng.randrange(10, 101)
            text = " ".join(rng.choice(VOCAB) for _ in range(k))
        doc_ids.append(i)
        texts.append(text)
        langs.append(rng.choices(LANGS, weights=LANG_W)[0])
        sources.append(f"src{rng.randrange(20)}")
        n_chars.append(len(text))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64())})


def gen_documents_heaps(seed, n):
    np_rng = np.random.default_rng(seed)
    lens = np_rng.integers(10, 101, size=n)
    total = int(lens.sum())
    vocab_n = max(31, int(round(22 * math.sqrt(total))))
    ranks = np.arange(1, vocab_n + 1, dtype=np.float64)
    p = ranks ** -1.07
    p /= p.sum()
    idx = np_rng.choice(vocab_n, size=total, p=p)
    words = np.array([f"w{i}" for i in range(vocab_n)])
    toks = words[idx]
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(n)]
    # same duplicate structure as the fixed-vocab mode
    rng = random.Random(seed)
    langs, sources = [], []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.003:            # exact copy
            texts[i] = texts[rng.randrange(max(0, i - 200), i)]
        elif i > 10 and r < 0.018:          # mutated copy (near-dup)
            t = texts[rng.randrange(max(0, i - 200), i)].split(" ")
            for _ in range(rng.randrange(2, 5)):
                t[rng.randrange(len(t))] = f"w{rng.randrange(vocab_n)}"
            texts[i] = " ".join(t)
        langs.append(rng.choices(LANGS, weights=LANG_W)[0])
        sources.append(f"src{rng.randrange(20)}")
    print(f"  heaps vocab: {vocab_n} words for {total} tokens")
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})


def gen_embeddings(seed, n):
    np_rng = np.random.default_rng(seed)
    centers = np_rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np_rng.integers(0, 10, size=n)
    vecs = centers[labels] + np_rng.normal(scale=0.35, size=(n, 64))
    # ~2% perturbed copies of a recent vector (same label -> same
    # orthant block with high probability, like the base data)
    dup_mask = np_rng.random(n) < 0.02
    for i in np.nonzero(dup_mask)[0]:
        if i < 10:
            continue
        j = np_rng.integers(max(0, i - 100), i)
        vecs[i] = vecs[j] + np_rng.normal(scale=0.005, size=64)
        labels[i] = labels[j]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})


def gen_events(seed, n, n_users):
    """Mimics sf0.1 events: 30-day window, ts increasing with
    event_id, 5 uniform types, exponential-ish value (mean ~50),
    {"k": int} props, TIMESTAMP(NANOS) like the driver's parquet."""
    np_rng = np.random.default_rng(seed)
    window_ns = 30 * 24 * 3600 * 10**9
    t0 = np.datetime64("2024-01-01", "ns").astype(np.int64)
    ts = t0 + np.sort(np_rng.integers(0, window_ns, size=n))
    types = np.array(["signup", "click", "purchase", "error", "view"])
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(np_rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(types[np_rng.integers(0, 5, size=n)]),
        "value": pa.array(
            np.round(np.minimum(np_rng.exponential(50.0, size=n), 560.0), 2)),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in np_rng.integers(0, 100, size=n)])})


def main():
    out_dir, mult = sys.argv[1], float(sys.argv[2])
    heaps = len(sys.argv) > 3 and sys.argv[3] == "heaps"
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(42)
    n_docs, n_vecs = int(5000 * mult), int(2000 * mult)
    docs = (gen_documents_heaps(42, n_docs) if heaps
            else gen_documents(rng, n_docs))
    # row_group_size cap (VERDICT r10 ask #2): pyarrow's default row
    # group is 1Mi rows, so a 100x corpus (500k docs) lands in ONE
    # row group and no split boundary can parallelize the scan — the
    # round-10 campaign's d02 tokenize ran on one task because of it.
    # 65536-row groups (~10 MB at the measured ~170 B/row) make every
    # tier splittable by Sessions.local's 16m maxPartitionBytes floor
    # while keeping groups large enough for real column compression.
    # Layout-only: same rows, same seed, same bytes per value.
    RG = 65536
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=RG)
    pq.write_table(gen_embeddings(42, n_vecs),
                   os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=RG)
    if heaps:
        shutil.copyfile(os.path.join(BASE, "events.parquet"),
                        os.path.join(out_dir, "events.parquet"))
    else:
        pq.write_table(
            gen_events(42, int(100000 * mult), int(1500 * mult)),
            os.path.join(out_dir, "events.parquet"), row_group_size=RG)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)
    print(f"wrote {out_dir}: {n_docs} docs, {n_vecs} embeddings")


if __name__ == "__main__":
    main()
