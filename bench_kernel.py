"""Pinned same-window denominator kernel for the write-path benches.

Commit cdbb87a recorded IDENTICAL parse code swinging 19-88 s at 20M
lines across windows on this box — absolute seconds from different
windows are not comparable, which is why the query bench got the
bench.py/oracle_bench.py same-window pair (BASELINE.md procedure).
This module gives BENCH_PARSE/INGEST/COMPACT the same discipline
(VERDICT r12 #4): each harness times this FROZEN single-core scalar
kernel immediately before and after its workload in the same process,
and records the workload/kernel ratio next to the absolute. A future
round comparing ratios sees engine regressions; a slow box moves both
numbers together.

CONTRACT: the kernel body below is FROZEN at KERNEL_VERSION 1. Any
change — even a constant — must bump KERNEL_VERSION, which breaks ratio
comparability across the bump (record both versions for one round).
The mix is half scalar-Python string work (the parse hot loop's cost
class: interned-format, split, len) and half numpy (the Arrow/pandas
cost class: alloc, sort, strided reduce), so it co-moves with the CPU
classes the workloads actually spend.
"""

from __future__ import annotations

import time

KERNEL_VERSION = 1


def pinned_kernel_s(reps: int = 6) -> float:
    """Total seconds for ``reps`` kernel iterations (totals, not medians:
    the kernel is the denominator of a total-seconds workload, so it must
    integrate the same window noise).

    Three cost classes, because the box's noise is not uniform: observed
    load-average ~20 with zero visible processes (hypervisor steal) slows
    32-way Spark stages while barely touching a single thread — a purely
    scalar kernel would exonerate the window exactly when it is guilty.
    The parallel half uses GIL-releasing numpy sorts on 16 threads so it
    co-moves with multi-core availability."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    def _parallel_slice(seed: int) -> int:
        rng = np.random.default_rng(seed)
        a = rng.random(2_000_000)
        return int(np.sort(a)[::1000].sum())

    # one untimed warm-up slice: the first ThreadPoolExecutor/numpy use
    # in a process pays thread spawn + allocator warm-up (~0.9 s observed)
    # that is process state, not window speed
    with ThreadPoolExecutor(max_workers=16) as pool:
        sum(pool.map(_parallel_slice, range(16)))

    t0 = time.perf_counter()
    for _ in range(reps):
        # scalar-Python half: format + split + scan, ~120k lines
        acc = 0
        for i in range(120_000):
            s = "m%d,host=h%d f0=%d.5 17000%d" % (i % 8, i % 50, i, i)
            parts = s.split(" ")
            acc += len(parts[1]) + (i & 7)
        # single-thread numpy: alloc + sort + strided reduce, 2M doubles
        rng = np.random.default_rng(42)
        a = rng.random(2_000_000)
        acc += int(np.sort(a)[::1000].sum())
        # multi-core half: 16 GIL-releasing sorts in parallel
        with ThreadPoolExecutor(max_workers=16) as pool:
            acc += sum(pool.map(_parallel_slice, range(16)))
        assert acc > 0
    return time.perf_counter() - t0


def kernel_fields(before_s: float, after_s: float, workload_s: float) -> dict:
    """The JSON fields every write-path bench records (same keys in all
    three so compare tooling stays trivial)."""
    mean = (before_s + after_s) / 2.0
    return {
        "kernel_version": KERNEL_VERSION,
        "kernel_before_s": round(before_s, 3),
        "kernel_after_s": round(after_s, 3),
        "kernel_s": round(mean, 3),
        "ratio_vs_kernel": round(workload_s / mean, 3) if mean > 0 else None,
    }


def tree_parquet_bytes(root: str) -> int:
    """Shared on-disk parquet byte count for the write-path benches (one
    definition so bench_ingest and bench_compact compute MB/s over the
    SAME file population). Two exclusions: dot-/underscore-prefixed
    names (Spark sidecars), and anything under a `tmp/` directory — this
    engine's staging protocol writes UNPREFIXED <uuid>.1.parquet files
    into <table>/tmp/ (writer.py stage→publish), so a name filter alone
    would count crash-orphaned staged files into bytes (review r13,
    second pass)."""
    import os

    total = 0
    for r, dirs, fs in os.walk(root):
        dirs[:] = [d for d in dirs if d != "tmp"]  # prune staging dirs
        for f in fs:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(r, f))
    return total
