"""Scaled-dataset generator: amplify /root/testdata/sf0.1 by AMP replicas
into a sharded dataset whose per-replica structure is EXACTLY the
original — so every workload's expected behavior at AMP× is known by
construction (≈ AMP independent copies of the sf0.1 problem), and any
superlinear runtime is the engine's fault, not the data's.

Replica construction (rep = 0..AMP-1; rep 0 is byte-identical-ish to
the source):

- region/nation: fixed dims, copied unchanged (TPC-H keeps dims fixed
  across SF).
- customer/supplier/part/orders/lineitem: keys re-based per replica
  (key' = key + rep * (max_key + 1)) consistently on both PK and FK
  sides, so each replica is a self-contained shard with the original
  join selectivity; dates/prices unchanged (time range fixed, density
  ×AMP — how TPC-H itself scales).
- events: event_id/user_id re-based; ts unchanged (density ×AMP, same
  windows — sessionize/gapfill cardinality grows linearly by user).
- documents: doc_id re-based; every WORD gets a per-replica suffix
  ('w' → 'w_r3'), which maps each replica's shingle space 1:1 — ALL
  within-replica similarities (minhash/jaccard/simhash) are exactly
  preserved while cross-replica similarity drops to ~0 (no shared
  shingles). Dedup output should therefore be ≈ AMP × the sf0.1 pair
  count; rep 0 keeps the original text so the original corpus is a
  subset. n_chars recomputed.
- embeddings: vec_id re-based; each replica's vectors circularly
  SHIFTED by rep positions — an orthogonal permutation, so every
  within-replica cosine is bit-preserved while cross-replica vectors
  decorrelate. rep 0 is the original geometry.

Types are preserved exactly by writing with each source file's own
arrow schema (timestamps stay timestamp[us] etc. — Spark must read the
scaled data through the identical decode path as sf0.1).

Usage: python scale_gen.py [AMP] [SRC_DIR] [OUT_ROOT]
Writes OUT_ROOT/sf{0.1*AMP:g}/<table>.parquet, prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXED = ("region", "nation")
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
}


def _rebase(col: pa.ChunkedArray, rep: int, base: int) -> pa.Array:
    vals = col.combine_chunks().to_numpy(zero_copy_only=False)
    return pa.array(vals + rep * base, type=col.type)


def _suffix_words(texts: list, rep: int) -> list:
    tag = f"_r{rep}"
    return [
        None if t is None else " ".join(w + tag for w in t.split(" "))
        for t in texts
    ]


def amplify(src: str, out_dir: str, amp: int) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    stats = {}
    for t in FIXED:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out_dir}/{t}.parquet")
        stats[t] = pq.read_metadata(f"{out_dir}/{t}.parquet").num_rows

    # one key base per key FAMILY so FK references stay consistent
    bases: dict[str, int] = {}
    tbls: dict[str, pa.Table] = {}
    for t in list(KEYED) + ["documents", "embeddings"]:
        tbls[t] = pq.read_table(f"{src}/{t}.parquet")
    for t, keymap in KEYED.items():
        for col, family in keymap.items():
            if family.startswith(t) or family == t:
                mx = pa.compute.max(tbls[t][col]).as_py()
                bases[family] = max(bases.get(family, 0), int(mx) + 1)
    bases["documents"] = int(pa.compute.max(tbls["documents"]["doc_id"]).as_py()) + 1
    bases["embeddings"] = int(pa.compute.max(tbls["embeddings"]["vec_id"]).as_py()) + 1

    for t, keymap in KEYED.items():
        srctbl = tbls[t]
        with pq.ParquetWriter(f"{out_dir}/{t}.parquet", srctbl.schema) as w:
            for rep in range(amp):
                cols = []
                for name in srctbl.schema.names:
                    if name in keymap:
                        cols.append(_rebase(srctbl[name], rep, bases[keymap[name]]))
                    else:
                        cols.append(srctbl[name])
                w.write_table(pa.table(cols, schema=srctbl.schema))
        stats[t] = srctbl.num_rows * amp

    # documents: per-replica word suffix (rep 0 untouched)
    doc = tbls["documents"]
    texts0 = doc["text"].to_pylist()
    with pq.ParquetWriter(f"{out_dir}/documents.parquet", doc.schema) as w:
        for rep in range(amp):
            texts = texts0 if rep == 0 else _suffix_words(texts0, rep)
            cols = {
                "doc_id": _rebase(doc["doc_id"], rep, bases["documents"]),
                "text": pa.array(texts, type=pa.string()),
                "lang": doc["lang"].combine_chunks(),
                "source": doc["source"].combine_chunks(),
                "n_chars": pa.array(
                    [None if x is None else len(x) for x in texts], type=pa.int64()
                ),
            }
            w.write_table(pa.table([cols[n] for n in doc.schema.names], schema=doc.schema))
    stats["documents"] = doc.num_rows * amp

    # embeddings: per-replica circular shift composed with a per-BLOCK
    # deterministic ±1 sign pattern. The shift alone wraps at `dim`
    # replicas (np.roll by rep % dim), so amp > dim made replicas r and
    # r+dim BIT-IDENTICAL vectors under different ids — cross-replica
    # exact-duplicate pairs grew QUADRATICALLY in amp/dim (at amp=200:
    # 128k duplicate groups of 3-4, 432k fabricated pairs — measured,
    # r14) and near-dup growth probes read superlinear for a DATA
    # artifact, not an operator property. A diagonal ±1 matrix is
    # orthogonal: norms and within-replica cosines are preserved
    # BIT-EXACTLY (each product x_i*y_i flips twice), block 0 keeps the
    # all-+1 pattern so amp <= dim output is byte-identical to the old
    # scheme, and replicas now repeat only after dim * 2^dim.
    emb = tbls["embeddings"]
    arr = emb["embedding"].combine_chunks()
    lens = np.asarray(arr.value_lengths(), dtype=np.int64)
    assert arr.null_count == 0 and lens.min() == lens.max(), "ragged embeddings"
    dim = int(lens[0])
    M = np.asarray(arr.flatten(), dtype=np.float32).reshape(len(arr), dim)

    def _block_signs(block: int) -> np.ndarray:
        if block == 0:
            return np.ones(dim, dtype=np.float32)
        import hashlib

        bits = b""
        k = 0
        while len(bits) * 8 < dim:
            bits += hashlib.md5(f"emb-signs-{block}-{k}".encode()).digest()
            k += 1
        return np.array(
            [1.0 if (bits[i >> 3] >> (i & 7)) & 1 else -1.0 for i in range(dim)],
            dtype=np.float32,
        )

    with pq.ParquetWriter(f"{out_dir}/embeddings.parquet", emb.schema) as w:
        for rep in range(amp):
            Mr = np.roll(M, -(rep % dim), axis=1) * _block_signs(rep // dim)[None, :]
            vecs = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (len(arr) + 1) * dim, dim), type=pa.int32()),
                pa.array(Mr.reshape(-1), type=pa.float32()),
            ).cast(emb.schema.field("embedding").type)
            cols = {
                "vec_id": _rebase(emb["vec_id"], rep, bases["embeddings"]),
                "embedding": vecs,
                "label": emb["label"].combine_chunks(),
            }
            w.write_table(pa.table([cols[n] for n in emb.schema.names], schema=emb.schema))
    stats["embeddings"] = emb.num_rows * amp
    return stats


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_root = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scaledata"
    )
    sf = 0.1 * amp
    out_dir = os.path.join(out_root, f"sf{sf:g}")
    t0 = time.time()
    stats = amplify(src, out_dir, amp)
    size = sum(
        os.path.getsize(os.path.join(out_dir, f)) for f in os.listdir(out_dir)
    )
    print(
        json.dumps(
            {
                "out": out_dir,
                "amp": amp,
                "rows": stats,
                "bytes": size,
                "gen_sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
