"""Persisted-index serving at 400x (VERDICT r13 #3).

The ANN/FTS gate queries run at sf0.1 (tiny); this harness measures the
MATERIALIZED-index serving paths against the 400x corpus
(scaledata/sf40: 800k embedding vectors, 2M documents):

- IVF  : write_ivf_index -> load(pin=False) -> ivf_search_rows, 8-query
         batch, nprobe=8 of 128 cells (static cell IN partition pruning);
- PQ   : IVF-composed codes (write_pq_index partitioned by cell) ->
         probed-cell ADC shortlist + exact rerank (pq_topk);
- BM25 : write_postings (64 md5 term buckets) -> search_postings_index
         (term_bucket partition pruning).

For each path: reps >= SPARK_GRAFT_ANN_REPS (default 5) of the PRUNED
serving query INTERLEAVED rep-by-rep with the full-scan counterpart
through the same code path (pruned, full, pruned, full, …) — a genuine
same-window pair, so a steal burst hits both sides or neither and the
work-ratio stays the cross-window-safe number (box-noise discipline). Pruning is pinned two ways, not just
timed: the executed plan's FileScan must carry a PartitionFilters entry
on the partition column, and the probed partition dirs' file count is
reported against the index total.

Indexes persist under scaledata/idx_r14 (env BENCH_ANN_INDEX_DIR) and
are reused across runs; build seconds are reported when a build ran.

Prints ONE JSON line; the driver records it as BENCH_ANN_FTS_r{N}.json.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np
from pyspark.sql import functions as F

from quackpipe_spark.operators import fts as FTS
from quackpipe_spark.operators import similarity as SIM
from quackpipe_spark.session import get_spark

HERE = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get(
    "BENCH_ANN_SF_DIR", os.path.join(HERE, "scaledata", "sf40")
)
INDEX_DIR = os.environ.get(
    "BENCH_ANN_INDEX_DIR", os.path.join(HERE, "scaledata", "idx_r14")
)
REPS = int(os.environ.get("SPARK_GRAFT_ANN_REPS", "5"))
N_CELLS = 128
NPROBE = 8
N_BUCKETS = 64


def _count_files(root: str, subdirs: list[str] | None = None) -> int:
    """Parquet data files under root (or only under the named partition
    subdirs)."""
    total = 0
    bases = [os.path.join(root, d) for d in subdirs] if subdirs is not None else [root]
    for base in bases:
        for dirpath, _dirs, files in os.walk(base):
            total += sum(
                1
                for f in files
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
    return total


def _probed_cells(centers, qvecs, nprobe: int, round_to: int = 6) -> list[int]:
    """Mirror ivf_search_rows' driver-side probe selection (np.round +
    ascending-cell tie-break) so the reported pruned-file count is the
    count the search actually reads."""
    cells_np = np.array([c for c, _ in centers], dtype=np.int64)
    Cm = np.array([v for _, v in centers], dtype=np.float64)
    Cn = np.maximum(np.linalg.norm(Cm, axis=1), 1e-300)
    out: set[int] = set()
    for v in qvecs:
        v = np.asarray(v, dtype=np.float64)
        nrm = max(float(np.linalg.norm(v)), 1e-300)
        scores = np.round((Cm @ v) / (nrm * Cn), round_to)
        order = np.lexsort((cells_np, -scores))[: min(nprobe, len(cells_np))]
        out.update(int(c) for c in cells_np[order])
    return sorted(out)


def _plan_partition_pruned(df, data_col: str, part_col: str) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "FileScan" in ln and data_col in ln and "PartitionFilters: [" in ln:
            tail = ln.split("PartitionFilters:", 1)[1][:300]
            if part_col in tail:
                return True
    return False


def _timed_pair(fn_a, fn_b, reps: int) -> tuple[list[float], list[float]]:
    """Time two callables with INTERLEAVED reps (a, b, a, b, …) so the
    pair shares one measurement window — a hypervisor-steal burst lands
    on both sides or neither, and the a/b ratio stays honest (the
    box-noise discipline; two disjoint sequential windows would let one
    burst skew a single side's median and the pinned speedup with it)."""
    fn_a()  # warmups: JIT/code-cache, not the scan cache (files re-read)
    fn_b()
    ta, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn_a()
        ta.append(round(time.perf_counter() - t0, 4))
        t0 = time.perf_counter()
        fn_b()
        tb.append(round(time.perf_counter() - t0, 4))
    return ta, tb


def main() -> None:
    spark = get_spark(app_name="bench_ann_fts")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    out: dict = {
        "metric": "ann_fts_serving_400x",
        "unit": "sec",
        "reps": REPS,
        "sf": SF_DIR,
        "n_vectors": emb.count(),
        "n_docs": docs.count(),
        "build_s": {},
        "searches": {},
    }

    # ---------------- IVF ----------------
    ivf_path = os.path.join(INDEX_DIR, "ivf")
    if not os.path.isdir(os.path.join(ivf_path, "centers")):
        t0 = time.time()
        idx = SIM.build_seeded_ivf_index(emb, n_cells=N_CELLS)
        SIM.write_ivf_index(idx, ivf_path)
        idx.unpersist()
        out["build_s"]["ivf"] = round(time.time() - t0, 2)
    lazy = SIM.load_ivf_index(spark, ivf_path, pin=False)
    qrows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(8).collect()
    )
    qvecs = [v for _, v in qrows]

    pruned_call = lambda: SIM.ivf_search_rows(lazy, qrows, k=10, nprobe=NPROBE).collect()
    full_call = lambda: SIM.ivf_search_rows(lazy, qrows, k=10, nprobe=N_CELLS).collect()
    ivf_t, ivf_full_t = _timed_pair(pruned_call, full_call, REPS)
    cells = _probed_cells(lazy.centers, qvecs, NPROBE)
    files_total = _count_files(os.path.join(ivf_path, "postings"))
    files_read = _count_files(
        os.path.join(ivf_path, "postings"), [f"cell={c}" for c in cells]
    )
    out["searches"]["ivf_probe8_k10_8q"] = {
        "median_s": statistics.median(ivf_t),
        "all_s": ivf_t,
        "full_scan_median_s": statistics.median(ivf_full_t),
        "speedup_vs_full": round(
            statistics.median(ivf_full_t) / max(statistics.median(ivf_t), 1e-9), 2
        ),
        "probed_cells": len(cells),
        "files_read": files_read,
        "files_total": files_total,
        "file_work_ratio": round(files_read / max(files_total, 1), 4),
        "plan_partition_pruned": _plan_partition_pruned(
            SIM.ivf_search_rows(lazy, qrows, k=10, nprobe=NPROBE), "cvec", "cell"
        ),
    }

    # ---------------- PQ (IVF-composed) ----------------
    pq_path = os.path.join(INDEX_DIR, "pq")
    if not os.path.isdir(os.path.join(pq_path, "codebooks")):
        t0 = time.time()
        pinned = SIM.load_ivf_index(spark, ivf_path, pin=True)
        corpus_cell = pinned.assigned.select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("cvec").alias("embedding"),
            "cell",
        )
        books = SIM.train_pq(corpus_cell, m=4, k=32, iters=4)
        codes = SIM.pq_encode(corpus_cell, books, extra_cols=["cell"])
        SIM.write_pq_index(codes, books, pq_path)
        pinned.unpersist()
        out["build_s"]["pq"] = round(time.time() - t0, 2)
    codes, books = SIM.load_pq_index(spark, pq_path)
    qid, qvec = qrows[0]
    pq_cells = _probed_cells(lazy.centers, [qvec], NPROBE)

    def pq_pruned():
        return SIM.pq_topk(
            codes.filter(F.col("cell").isin(pq_cells)),
            books,
            qvec,
            topk=10,
            rerank=emb,
        ).collect()

    def pq_full():
        return SIM.pq_topk(codes, books, qvec, topk=10, rerank=emb).collect()

    pq_t, pq_full_t = _timed_pair(pq_pruned, pq_full, REPS)
    pq_files_total = _count_files(os.path.join(pq_path, "codes"))
    pq_files_read = _count_files(
        os.path.join(pq_path, "codes"), [f"cell={c}" for c in pq_cells]
    )
    out["searches"]["pq_probe8_k10"] = {
        "median_s": statistics.median(pq_t),
        "all_s": pq_t,
        "full_scan_median_s": statistics.median(pq_full_t),
        "speedup_vs_full": round(
            statistics.median(pq_full_t) / max(statistics.median(pq_t), 1e-9), 2
        ),
        "probed_cells": len(pq_cells),
        "files_read": pq_files_read,
        "files_total": pq_files_total,
        "file_work_ratio": round(pq_files_read / max(pq_files_total, 1), 4),
        "plan_partition_pruned": _plan_partition_pruned(
            SIM.pq_topk(
                codes.filter(F.col("cell").isin(pq_cells)),
                books,
                qvec,
                topk=10,
                rerank=emb,
            ),
            "codes",
            "cell",
        ),
    }

    # ---------------- FTS / BM25 ----------------
    fts_path = os.path.join(INDEX_DIR, "fts")
    if not os.path.isdir(os.path.join(fts_path, "postings")):
        t0 = time.time()
        post = FTS.build_postings(docs)
        FTS.write_postings(post, fts_path, n_buckets=N_BUCKETS)
        out["build_s"]["fts"] = round(time.time() - t0, 2)
    # deterministic 3-term query from the corpus's own vocabulary
    first_text = docs.orderBy("doc_id").first()["text"]
    terms = []
    for w in first_text.lower().split():
        w = "".join(ch for ch in w if ch.isalnum())
        if len(w) >= 3 and w not in terms:
            terms.append(w)
        if len(terms) == 3:
            break
    query = " ".join(terms)
    qterms = FTS._terms(query)
    buckets = sorted({FTS.hash_mod_py(t, N_BUCKETS) for t in qterms})

    def fts_pruned():
        return FTS.search_postings_index(spark, fts_path, query, topk=10).collect()

    st = FTS._read_stats(spark, fts_path)

    def fts_full():
        matched = (
            spark.read.parquet(os.path.join(fts_path, "postings"))
            .filter(F.col("term").isin(qterms))
            .drop("term_bucket")
        )
        return FTS._bm25_rank(
            matched, "doc_id", int(st["N"]), float(st["avgdl"]), 10, 1.2, 0.75
        ).collect()

    fts_t, fts_full_t = _timed_pair(fts_pruned, fts_full, REPS)
    fts_files_total = _count_files(os.path.join(fts_path, "postings"))
    fts_files_read = _count_files(
        os.path.join(fts_path, "postings"), [f"term_bucket={b}" for b in buckets]
    )
    out["searches"]["bm25_top10_3terms"] = {
        "median_s": statistics.median(fts_t),
        "all_s": fts_t,
        "full_scan_median_s": statistics.median(fts_full_t),
        "speedup_vs_full": round(
            statistics.median(fts_full_t) / max(statistics.median(fts_t), 1e-9), 2
        ),
        "query": query,
        "probed_buckets": len(buckets),
        "files_read": fts_files_read,
        "files_total": fts_files_total,
        "file_work_ratio": round(fts_files_read / max(fts_files_total, 1), 4),
        "plan_partition_pruned": _plan_partition_pruned(
            FTS.search_postings_index(spark, fts_path, query, topk=10),
            "term",
            "term_bucket",
        ),
    }

    pruned_ok = all(
        s["plan_partition_pruned"] for s in out["searches"].values()
    )
    out["all_plans_partition_pruned"] = pruned_ok
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
