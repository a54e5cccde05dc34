"""Benchmark harness: run every declared workload query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query wall seconds.

Timing excludes SparkSession startup (BASELINE.md: warm-JVM comparison) and
uses a foreach-noop action so results are computed but not shipped to the
driver beyond the count.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from quackpipe_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="quackpipe_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

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
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            n = df.count()
            assert n >= 0
            per_query[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # keep benching; report failures in the line
            failures[name] = f"{type(e).__name__}: {e}"[:200]
        finally:
            # drop intermediates persisted inside operator pipelines so a
            # query's cache (and its GC) can't bleed into the next timing
            spark.catalog.clearCache()

    total = round(sum(per_query.values()), 4)
    out = {
        "metric": "workload_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
