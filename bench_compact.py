"""Compaction throughput harness — the other half of the reference's
write-path contract (merge_service_fs.go:202-278: read inputs → sort →
ONE output at level+1 → tombstone inputs; cadence rows in BASELINE.md).

Two timed phases over a fixed, reproducible shape:

1. **Hive-table L1→L2** — the ingest bench's e2e row shape
   ({timestamp int64, value float64, str string} + __timestamp) written
   as N flush-sized L1 file-groups across 4 hourly partitions, then one
   `Compactor.run_once()` (greedy size-desc bin-pack, sorted rewrite,
   index swap + delayed delete). This is the path every ingested table
   exercises on the merge ticker.
2. **Flat-dir merge cascade** — the index-append layout
   (dedup bands / FTS postings: plain part-files, no PartitionIndex),
   compacted by `compact_parquet_dir` with a sort key so row-group
   min/max stats prune later probes. Journaled, crash-recoverable.

Usage: python bench_compact.py [total_rows] [chunks] [flat_rows] [flat_chunks]
Prints one JSON line: per-phase seconds, MB/s (input bytes / wall),
files in/out, rows — and asserts zero row loss through both rewrites.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


from bench_kernel import tree_parquet_bytes as _tree_parquet_bytes


def _tree_parquet_files(root: str) -> int:
    n = 0
    for r, dirs, fs in os.walk(root):
        dirs[:] = [d for d in dirs if d != "tmp"]  # same population as bytes
        for f in fs:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                n += 1
    return n


def main() -> None:
    total_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    flat_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000
    flat_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 24

    from pyspark.sql import functions as F

    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.ingest import IngestService
    from quackpipe_spark.plans.compactor import Compactor, compact_parquet_dir
    from quackpipe_spark.query import QueryEngine
    from quackpipe_spark.session import get_spark

    spark = get_spark(app_name="quackpipe_compact_bench")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="qps_compact_bench_")

    # ---- phase 1: hive table L1→L2 ------------------------------------
    # e2e row shape, 4 hourly partitions, `chunks` L1 file-groups: each
    # chunk spans one contiguous time slice so a flush lands (mostly) in
    # one hour dir — the shape the merge ticker actually sees after N
    # micro-batch flushes. Setup is untimed; only the compaction is.
    catalog = Catalog(os.path.join(root, "cat"))
    svc = IngestService(spark, catalog, save_timeout_s=3600)
    t0_ns = 1_700_000_000_000_000_000
    span_ns = 4 * 3600 * 1_000_000_000  # 4 hours
    chunk_rows = total_rows // chunks
    total_rows = chunk_rows * chunks  # rows actually written (floor per chunk)
    step = span_ns // total_rows
    value_col = [float(i % 1000) / 7.0 for i in range(chunk_rows)]
    str_col = [f"str{i % 97}" for i in range(chunk_rows)]
    for b in range(chunks):
        ts = [t0_ns + (b * chunk_rows + i) * step for i in range(chunk_rows)]
        p = svc.store(
            "bench",
            "e2e",
            {"timestamp": ts, "value": value_col, "str": str_col, "__timestamp": ts},
        )
        svc.flush()  # one L1 file-group per chunk
        # flush() swallows write exceptions by setting them on the
        # promise — an unread promise turns an ingest failure (disk
        # full, schema error) into a 'row loss through compaction'
        # red herring 32 chunks later (review r13)
        p.result(600)
    table = catalog.get("bench", "e2e")
    files_in = _tree_parquet_files(table.path)
    bytes_in = _tree_parquet_bytes(table.path)

    # same-window denominator (VERDICT r12 #4): see bench_kernel.py —
    # one kernel pair brackets BOTH timed phases
    from bench_kernel import kernel_fields, pinned_kernel_s

    k_before = pinned_kernel_s()
    comp = Compactor(spark, table, drop_delay_s=0.0)
    t0 = time.perf_counter()
    out = comp.run_once()
    hive_dt = time.perf_counter() - t0
    comp.run_once()  # reap now-due tombstones so the file count is final
    files_out = _tree_parquet_files(table.path)

    qe = QueryEngine(spark, catalog)
    n = qe.sql("SELECT count(*) AS n FROM e2e", db="bench").collect()[0]["n"]
    assert n == total_rows, f"row loss through compaction: {n} != {total_rows}"
    assert len(out) >= 1 and files_out < files_in

    # ---- phase 2: flat index-append dir cascade ------------------------
    flat = os.path.join(root, "bands")
    per = flat_rows // flat_chunks
    base = (
        spark.range(per)
        .select(
            (F.col("id") % 16).cast("int").alias("band"),
            F.xxhash64(F.col("id")).alias("bh"),
            F.col("id").alias("doc_id"),
        )
    )
    for _ in range(flat_chunks):
        base.write.mode("append").parquet(flat)
    flat_files_in = _tree_parquet_files(flat)
    flat_bytes_in = _tree_parquet_bytes(flat)
    flat_n_in = spark.read.parquet(flat).count()

    t0 = time.perf_counter()
    compact_parquet_dir(spark, flat, order_by=["band", "bh"])
    flat_dt = time.perf_counter() - t0
    k_after = pinned_kernel_s()
    flat_files_out = _tree_parquet_files(flat)
    assert spark.read.parquet(flat).count() == flat_n_in, "flat-dir row loss"
    assert flat_files_out < flat_files_in

    print(
        json.dumps(
            {
                "metric": "compaction_throughput",
                "unit": "sec",
                "value": round(hive_dt + flat_dt, 3),
                "hive_l1_to_l2": {
                    "rows": total_rows,
                    "bytes_in": bytes_in,
                    "files_in": files_in,
                    "files_out": files_out,
                    "seconds": round(hive_dt, 3),
                    "input_mb_per_s": round(bytes_in / hive_dt / 1e6, 2),
                    "rows_per_s": round(total_rows / hive_dt),
                },
                "flat_dir_merge": {
                    "rows": flat_n_in,
                    "bytes_in": flat_bytes_in,
                    "files_in": flat_files_in,
                    "files_out": flat_files_out,
                    "seconds": round(flat_dt, 3),
                    "input_mb_per_s": round(flat_bytes_in / flat_dt / 1e6, 2),
                },
                **kernel_fields(k_before, k_after, hive_dt + flat_dt),
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
