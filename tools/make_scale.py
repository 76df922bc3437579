#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir with
DISTINCT perturbed content, not verbatim replication (the round-7 verdict's
ask: replicated copies make every doc have factor-1 exact twins, which is
degenerate input for the dedup/near-dup family — their cost driver IS the
duplicate structure).

Copy 0 is byte-identical to the source, so fixed-id SF gates (doc_id <
6000, vec_id caps) cover exactly the original rows and stay constant-cost
at any factor. Copies 1..k-1 get:

- shifted keys (foreign keys shift consistently -> join cardinalities
  scale linearly), exactly as before;
- documents: token-level noise per copy (seeded RNG, deterministic):
  ~12% of tokens substituted with a frequency-weighted draw from the
  source vocabulary, ~5% deleted, ~5% positions gain an inserted draw.
  Marginal token distribution is approximately preserved; texts are
  unique content (no verbatim twins), so shingle/minhash/simhash df and
  candidate distributions scale the way a real 10x corpus does;
- embeddings: i.i.d. N(0, 0.03) jitter per dimension (float32) — near
  the source manifold but distinct vectors, so ANN/near-dup candidate
  sets are not saturated with exact-duplicate vectors.

Timestamps are written with pyarrow version 2.6 and no coercion so the
events table keeps the source's physical encoding exactly.

Usage: make_scale.py <src_dir> <dst_dir> <factor>
"""
import sys
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table key columns to shift by copy_index * stride (stride chosen far
# above any real key so copies never collide)
SHIFTS = {
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**7},
    "part": {"p_partkey": 10**7},
    "orders": {"o_orderkey": 10**8, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**8, "l_partkey": 10**7, "l_suppkey": 10**7},
    "events": {"event_id": 10**9, "user_id": 10**9},
    "documents": {"doc_id": 10**5},
    "embeddings": {"vec_id": 10**5},
}
# tiny dimension tables keep their single copy (as in TPC-H, region/nation
# do not scale with SF)
FIXED = {"region", "nation"}

SUB_P, DEL_P, INS_P = 0.12, 0.05, 0.05


def perturb_texts(texts, vocab, probs, rng):
    """Token-noise each text: substitute/delete/insert with seeded draws.
    Guaranteed non-empty output (a fully-deleted text keeps one draw)."""
    out = []
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        n = len(toks)
        ops = rng.random(n)
        subs = rng.choice(len(vocab), size=n, p=probs)
        ins = rng.choice(len(vocab), size=n, p=probs)
        new = []
        for i, w in enumerate(toks):
            r = ops[i]
            if r < SUB_P:
                new.append(vocab[subs[i]])
            elif r < SUB_P + DEL_P:
                pass
            else:
                new.append(w)
            if r > 1.0 - INS_P:
                new.append(vocab[ins[i]])
        if not new:
            new = [vocab[subs[0] if n else 0]]
        out.append(" ".join(new))
    return out


def scale_table(name, src, dst, factor):
    table = pq.read_table(f"{src}/{name}.parquet")
    if name in FIXED or factor <= 1:
        copies = [table]
    else:
        vocab = probs = None
        if name == "documents":
            cnt = Counter(w for t in table["text"].to_pylist()
                          for w in t.split(" ") if w)
            vocab = sorted(cnt)
            tot = sum(cnt.values())
            probs = np.array([cnt[w] / tot for w in vocab])
        emb = None
        if name == "embeddings":
            emb = np.array(table["embedding"].to_pylist(),
                           dtype=np.float32)
        copies = [table]
        for k in range(1, factor):
            rng = np.random.default_rng(1000 + k)
            cols = {}
            for field in table.schema:
                col = table[field.name]
                shift = SHIFTS.get(name, {}).get(field.name)
                if shift is not None:
                    col = pc.add(col, pa.scalar(k * shift, type=field.type))
                elif name == "documents" and field.name == "text":
                    col = pa.array(perturb_texts(
                        col.to_pylist(), vocab, probs, rng),
                        type=field.type)
                    cols["text"] = col
                    continue
                elif name == "embeddings" and field.name == "embedding":
                    jit = (emb + rng.normal(0.0, 0.03, size=emb.shape)
                           .astype(np.float32))
                    col = pa.array(list(jit), type=field.type)
                cols[field.name] = col
            if name == "documents":
                cols["n_chars"] = pa.array(
                    [len(t) for t in cols["text"].to_pylist()],
                    type=table.schema.field("n_chars").type)
            copies.append(pa.table(
                {f.name: cols[f.name] for f in table.schema},
                schema=table.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{name}.parquet", version="2.6",
                   coerce_timestamps=None,
                   use_deprecated_int96_timestamps=False)
    print(f"{name}: {table.num_rows} -> {out.num_rows}")


def main(src, dst, factor):
    import os
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        scale_table(t, src, dst, factor)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
