#!/usr/bin/env python
"""Synthesize a larger scale factor from the driver's sf0.1 testdata.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only). The SURVEY §6
scaling sweep needs one more decade to support the 100 TB story, so this
script derives an sfN directory (default sf1 = 10x sf0.1) OUTSIDE the
read-only tree:

- **TPC-H tables + events: tiling with key offsets.** Each copy shifts
  every key/FK by copy_index * stride (stride = a round number above the
  base table's max key), so referential integrity, join fan-outs, skew
  shape, and per-key densities are preserved exactly — the workload
  scales, the distributions don't drift. ``events.user_id`` shifts by a
  multiple of 100 so the derived device catalog (user_id % 100) keeps
  the same 100 devices at 10x the per-device update rate.
- **documents/embeddings: resynthesized, not tiled.** Tiling text 10x
  would hand every document a 10-clique of trivial near-duplicates and
  quadratically inflate LSH candidate pairs — a workload distortion, not
  a scale-up. Instead documents are drawn from sf0.1's word distribution
  (unigram frequencies) with lengths/langs/sources sampled from the
  observed marginals, and the duplicate structure is REPLANTED at the
  measured sf0.1 rates (exact-dup fraction, near-dup fraction at ~10%
  token mutation). Embeddings are unit-normalized gaussians at the
  observed dimension with the observed label marginal, plus planted
  near-dup pairs at the measured cosine-dup rate.

Deterministic: numpy PCG64 seeded per table. Pure pyarrow/numpy — no JVM.

Usage::

    python scripts/gen_sf.py [--mult 10] [--out /root/repo/.scratch/sf1]
"""

from __future__ import annotations

import argparse
import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _read(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def tile_keyed(name: str, key_cols: dict[str, int], mult: int, out: str) -> None:
    """Write ``mult`` copies of the table, offsetting each column in
    ``key_cols`` by copy_index * stride (per-column stride). Strides are
    hard-coded by the caller; the guard below keeps a future base-table
    growth from silently colliding keys across copies."""
    t = _read(name)
    for c, stride in key_cols.items():
        mx = int(pa.compute.max(t.column(c)).as_py())
        assert mx < stride, (
            f"{name}.{c}: max key {mx} >= stride {stride} — copies would "
            "collide; raise the stride"
        )
    copies = []
    for i in range(mult):
        cols = {}
        for c in t.column_names:
            arr = t.column(c)
            if c in key_cols and i > 0:
                arr = pa.chunked_array([
                    pa.compute.add(chunk, key_cols[c] * i) for chunk in arr.chunks
                ])
            cols[c] = arr
        copies.append(pa.table(cols))
    _write(out, name, pa.concat_tables(copies))


def synth_documents(mult: int, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    t = _read("documents")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()

    # observed marginals
    word_counts = collections.Counter()
    lengths = []
    for txt in texts:
        ws = txt.split(" ")
        lengths.append(len(ws))
        word_counts.update(ws)
    vocab = list(word_counts)
    freqs = np.array([word_counts[w] for w in vocab], dtype=np.float64)
    probs = freqs / freqs.sum()
    lengths = np.array(lengths)

    # observed duplicate structure: exact-dup fraction = surplus rows
    # sharing a text; near-dups are replanted at the same rate as exact
    # (the driver's generator plants both families at similar scale)
    text_counts = collections.Counter(texts)
    exact_rate = sum(c - 1 for c in text_counts.values()) / len(texts)

    n = len(texts) * mult
    lang_p = collections.Counter(langs)
    src_p = collections.Counter(sources)
    lang_vals = list(lang_p)
    lang_probs = np.array([lang_p[v] for v in lang_vals], dtype=np.float64)
    lang_probs /= lang_probs.sum()
    src_vals = list(src_p)
    src_probs = np.array([src_p[v] for v in src_vals], dtype=np.float64)
    src_probs /= src_probs.sum()

    docs: list[str] = []
    n_base = int(n * (1 - 2 * exact_rate))
    sampled_lens = rng.choice(lengths, size=n_base, replace=True)
    # lang/source are assigned to the BASE docs up front so planted
    # duplicates can carry their source doc's values: lang-blocked and
    # source-blocked dedup paths (e.g. jaccard_pairs block_col='lang')
    # must see the same planted structure as the sf0.1 fixtures, where
    # a near-dup pair virtually always shares lang — independently
    # resampled lang would make cross-lang pairs structurally invisible
    # to blocked exact-Jaccard and skew exact-vs-minhash comparisons
    doc_langs = list(rng.choice(lang_vals, size=n_base, p=lang_probs))
    doc_srcs = list(rng.choice(src_vals, size=n_base, p=src_probs))
    for ln in sampled_lens:
        docs.append(" ".join(rng.choice(vocab, size=int(ln), p=probs)))
    # plant exact + near duplicates of already-generated docs
    while len(docs) < n:
        si = int(rng.integers(0, n_base))
        src_doc = docs[si]
        if rng.random() < 0.5:
            docs.append(src_doc)  # exact duplicate
        else:  # near duplicate: mutate ~10% of tokens
            ws = src_doc.split(" ")
            k = max(1, len(ws) // 10)
            idx = rng.choice(len(ws), size=min(k, len(ws)), replace=False)
            for j in idx:
                ws[j] = str(rng.choice(vocab, p=probs))
            docs.append(" ".join(ws))
        doc_langs.append(doc_langs[si])
        doc_srcs.append(doc_srcs[si])
    perm = rng.permutation(n)
    docs = [docs[i] for i in perm]
    doc_langs = [doc_langs[i] for i in perm]
    doc_srcs = [doc_srcs[i] for i in perm]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(doc_langs, pa.string()),
        "source": pa.array(doc_srcs, pa.string()),
        "n_chars": pa.array([len(d) for d in docs], pa.int64()),
    }))


def synth_embeddings(mult: int, out: str, seed: int = 43) -> None:
    rng = np.random.default_rng(seed)
    t = _read("embeddings")
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(t.column("label").to_pylist())
    dim = emb.shape[1]
    n = emb.shape[0] * mult

    # label-conditioned gaussians around the observed per-label means keep
    # the cluster structure ANN/IVF queries rely on
    label_vals, label_counts = np.unique(labels, return_counts=True)
    label_probs = label_counts / label_counts.sum()
    means = {v: emb[labels == v].mean(axis=0) for v in label_vals}
    spread = float(np.mean([emb[labels == v].std(axis=0).mean() for v in label_vals]))

    new_labels = rng.choice(label_vals, size=n, p=label_probs)
    vecs = np.stack([means[v] for v in new_labels]) + rng.normal(
        0.0, spread, size=(n, dim)
    ).astype(np.float32)
    # plant near-dup pairs at ~1% (tiny perturbations of earlier rows)
    n_dup = n // 100
    src_idx = rng.choice(n - n_dup, size=n_dup, replace=False)
    vecs[-n_dup:] = vecs[src_idx] + rng.normal(0, 1e-3, size=(n_dup, dim)).astype(
        np.float32
    )
    new_labels[-n_dup:] = new_labels[src_idx]
    # the source embeddings are unit-norm (verified: min=mean=max=1.0 at
    # sf0.1) — normalize so the decade doesn't drift the norm
    # distribution the ANN/quantization geometry depends on
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(1, n + 1), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(new_labels.astype(np.int32), pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.scratch/sf1")
    args = ap.parse_args()
    out = args.out

    # dimension tables: copied as-is (region/nation are fixed-size in TPC-H)
    for name in ("region", "nation"):
        _write(out, name, _read(name))

    tile_keyed("customer", {"c_custkey": 100000}, args.mult, out)
    tile_keyed("supplier", {"s_suppkey": 10000}, args.mult, out)
    tile_keyed("part", {"p_partkey": 100000}, args.mult, out)
    tile_keyed(
        "orders", {"o_orderkey": 10000000, "o_custkey": 100000}, args.mult, out
    )
    tile_keyed(
        "lineitem",
        {"l_orderkey": 10000000, "l_partkey": 100000, "l_suppkey": 10000},
        args.mult,
        out,
    )
    # events: user offset keeps user_id % 100 (the device id) intact
    tile_keyed(
        "events", {"event_id": 1000000, "user_id": 1000000}, args.mult, out
    )
    synth_documents(args.mult, out)
    synth_embeddings(args.mult, out)


if __name__ == "__main__":
    main()
