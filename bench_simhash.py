"""Simhash width growth probe (VERDICT r12 #2): measure the band-collision
term directly, 32-bit vs 64-bit signatures, across a corpus doubling that
brackets the 16-bit-band collision knee.

At the minimal hamming-1 split (bands=2) the candidate join emits
~bands * n²/2 / 2^(bits/bands) cross-collision pairs plus the true
near-dups. The scaled corpora (scale_gen replicas of sf0.1 documents:
500k docs at sf10, 1M at sf20) have per-replica-suffixed vocabularies, so
true near-dups grow LINEARLY with replicas while the collision term grows
quadratically — the candidate count isolates exactly the term that bites
past ~10M docs (PLAN_AUDIT_r12:60-65).

Expected: 32-bit candidates grow ~4x per corpus doubling (n²/2¹⁶
dominates at these sizes), 64-bit candidates grow ~2x (true-dup-dominated;
the n²/2³² term is negligible) — the auto-width default
(operators/dedup.py simhash_dedup) flips to 64-bit before the knee.

Prints ONE JSON line; the driver records it as BENCH_SIMHASH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import time

from quackpipe_spark.operators import dedup as D
from quackpipe_spark.session import get_spark


def _replica_stride(path: str, amp: int) -> int:
    """scale_gen re-bases doc_ids with stride max(source doc_id)+1, so in
    the SCALED file max(doc_id)+1 == stride × amp. Deriving the stride
    from the scaled file itself (with its known amplification) is
    self-consistent with whatever source corpus actually generated it —
    reading the CURRENT sf0.1 instead would corrupt the metric exactly
    when sf0.1 is regenerated without rebuilding scaledata (review r13,
    second pass)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["doc_id"])
    return (int(t["doc_id"].to_numpy().max()) + 1) // amp


def main() -> None:
    spark = get_spark(app_name="bench_simhash")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.abspath(__file__))
    scales = [
        ("500k", os.path.join(here, "scaledata", "sf10", "documents.parquet"), 100),
        ("1M", os.path.join(here, "scaledata", "sf20", "documents.parquet"), 200),
    ]
    out: dict = {"metric": "simhash_width_growth", "unit": "rows|sec", "runs": {}}
    for label, path, amp in scales:
        stride = _replica_stride(path, amp)
        docs = spark.read.parquet(path).select("doc_id", "text")
        for bits in (32, 64):
            t0 = time.time()
            sigs = D.simhash(docs, bits=bits).persist()
            n_docs = sigs.count()
            sig_s = round(time.time() - t0, 3)
            # candidate volume: same banded join, hamming filter disabled
            # (max_hamming = bits-1 keeps every candidate) — this is the
            # quadratic driver, deterministic and noise-free
            t0 = time.time()
            cand_df = D.simhash_near_pairs(
                sigs, bits=bits, max_hamming=bits - 1, bands=2
            )
            # scale_gen re-bases doc_ids per replica (stride derived from
            # the scaled file above) and suffixes every word per replica,
            # so CROSS-replica docs share no tokens: cross-replica
            # candidates are (up to md5 luck) PURE band collisions — the
            # n²/2^width term isolated from the linear true-dup structure
            from pyspark.sql import functions as F

            agg = cand_df.agg(
                F.count("*").alias("all"),
                F.sum(
                    (
                        F.expr(f"a div {stride}")
                        != F.expr(f"b div {stride}")
                    ).cast("long")
                ).alias("cross"),
            ).collect()[0]
            candidates, cross = agg["all"], agg["cross"] or 0
            cand_s = round(time.time() - t0, 3)
            # the real operator config (gate parity: max_hamming=1, bands=2)
            t0 = time.time()
            pairs = D.simhash_near_pairs(
                sigs, bits=bits, max_hamming=1, bands=2
            ).count()
            pair_s = round(time.time() - t0, 3)
            sigs.unpersist()
            out["runs"][f"{label}_bits{bits}"] = {
                "n_docs": n_docs,
                "candidates": candidates,
                "cross_replica_candidates": cross,
                "near_pairs": pairs,
                "signature_sec": sig_s,
                "candidates_sec": cand_s,
                "near_pairs_sec": pair_s,
            }
    r = out["runs"]
    for bits in (32, 64):
        a, b = r[f"500k_bits{bits}"], r[f"1M_bits{bits}"]
        out[f"candidate_growth_bits{bits}"] = (
            round(b["candidates"] / a["candidates"], 3) if a["candidates"] else None
        )
        out[f"collision_term_growth_bits{bits}"] = (
            round(b["cross_replica_candidates"] / a["cross_replica_candidates"], 3)
            if a["cross_replica_candidates"]
            else None
        )
        out[f"near_pair_wall_growth_bits{bits}"] = round(
            b["near_pairs_sec"] / a["near_pairs_sec"], 3
        )
    out["note"] = (
        "cross_replica_candidates isolates the n^2/2^width collision term "
        "(cross-replica docs share no tokens by scale_gen construction): "
        "expect ~4x growth per doubling at 32-bit, negligible absolute "
        "volume at 64-bit. Total candidates are diluted by the corpus's "
        "LINEAR true-dup structure. simhash_dedup's bits='auto' flips to "
        "64 past SIMHASH_AUTO_32_MAX docs."
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
