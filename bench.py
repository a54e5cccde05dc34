"""Benchmark harness: run every declared workload query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query wall seconds.

Timing excludes SparkSession startup (BASELINE.md: warm-JVM comparison) and
uses a count action so results are computed but not shipped to the driver.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 5) and reports the
MEDIAN: single-pass timings on this box carry ±7 s of transient system
noise (measured r02→r03 with zero code change; still the dominant
variance in r05 — the same query swings 2-4x between interleaved sweeps),
so one-shot numbers can't attribute regressions, and a median of 5
rejects up to two burst-hit reps per query where 3 rejects one. Repetitions are interleaved as full SWEEPS over
the query list (rep 1 of every query, then rep 2, …) rather than
back-to-back per query: the noise is bursty (multi-second system stalls
covering several consecutive timings — measured reps of [1.8, 5.0, 7.7] s
for one unchanged query), so back-to-back reps of a query all land inside
one burst and the median is poisoned; sweep-separated reps are ~20 s
apart and at most one rep per query falls in any burst. The cache is
cleared between repetitions so no rep is warmed by the previous one's
persisted intermediates; queries that search a prebuilt artifact
(ann_topk_ivf's index) re-run their prebuild hook untimed after each
clear, mirroring a long-lived engine where the index is built once, not
per query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))

    from quackpipe_spark.session import get_spark
    from quackpipe_spark.workloads import all_prebuilds
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="quackpipe_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    prebuilds = all_prebuilds()

    per_query: dict[str, float] = {}
    failures: dict[str, str] = {}

    # Warm the JVM/codegen paths AND the Python worker pool once so
    # per-query numbers reflect steady state (the reference's baseline is
    # a warm single-node process too; first mapInPandas otherwise pays
    # ~32 interpreter spawns inside one query's timing).
    try:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        spark.range(1000).repartition(32).mapInPandas(
            lambda it: it, "id long"
        ).count()
    except Exception as e:
        failures["_warmup"] = f"{type(e).__name__}: {e}"[:200]

    times: dict[str, list[float]] = {name: [] for name in sorted(qs)}
    for _ in range(reps):
        for name in sorted(qs):
            if name in failures:
                continue
            # drop intermediates persisted inside operator pipelines so one
            # rep's cache (and its GC) can't bleed into the next timing
            spark.catalog.clearCache()
            pb = prebuilds.get(name)
            try:
                if pb is not None:
                    pb(spark, sf_dir)  # index build/load is NOT the query
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                n = df.count()
                assert n >= 0
                times[name].append(time.perf_counter() - t0)
            except Exception as e:  # keep benching; report in the line
                failures[name] = f"{type(e).__name__}: {e}"[:200]
    # a query that failed in ANY sweep is excluded from per_query/total —
    # a partial median (fewer reps, possibly pre-failure warm reps only)
    # must not blend into the headline number; its rep count is recorded
    # alongside the failure so the partial data is visible, not implied
    partial_reps: dict[str, int] = {}
    for name, ts in times.items():
        if name in failures:
            if ts:
                partial_reps[name] = len(ts)
            continue
        if ts:
            per_query[name] = round(statistics.median(ts), 4)
    spark.catalog.clearCache()

    # Fixed per-action floor microbenchmarks (BASELINE.md "Serving-tail
    # floor", VERDICT r11 #6): the sub-second gate tail is dominated by
    # Spark's fixed job-launch cost, not plan structure — emitting the
    # measured floor alongside the queries lets a reader separate plan
    # cost from fixed cost without re-reading the prose. Medians over the
    # same rep count as the queries.
    def _floor_shapes():
        from pyspark.sql import functions as F

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return {
            "empty_job": lambda: spark.range(10).count(),
            "parquet_count": lambda: li.count(),
            "one_exchange_agg": lambda: li.groupBy("l_orderkey").count().count(),
            # split the Python floor: the no-shuffle variant isolates the
            # Arrow boundary itself; the difference to the +shuffle form
            # is the exchange cost, not Python
            "one_python_stage": lambda: spark.range(100_000)
            .mapInPandas(lambda it: it, "id long")
            .count(),
            "one_python_stage_shuffled": lambda: spark.range(100_000)
            .repartition(32)
            .mapInPandas(lambda it: it, "id long")
            .count(),
        }

    floor: dict[str, float] = {}
    try:
        shapes = _floor_shapes()
        floor_times: dict[str, list[float]] = {k: [] for k in shapes}
        for _ in range(reps):
            for fname, fn in shapes.items():
                t0 = time.perf_counter()
                fn()
                floor_times[fname].append(time.perf_counter() - t0)
        floor = {
            k: round(statistics.median(v), 4) for k, v in floor_times.items()
        }
    except Exception as e:
        failures["_floor"] = f"{type(e).__name__}: {e}"[:200]

    total = round(sum(per_query.values()), 4)
    out = {
        "metric": "workload_total_wall",
        "value": total,
        "unit": "sec",
        "reps": reps,
        "queries": per_query,
        "floor": floor,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if failures:
        out["failures"] = failures
        if partial_reps:
            out["partial_reps"] = partial_reps
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
