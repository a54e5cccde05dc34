"""Querier-process half of the two-process writer/querier soak.

Launched by tests/test_soak_two_process.py as a SEPARATE python process
with its own SparkSession, Catalog, and QueryEngine — the reference's
headline deployment shape (writer and querier are independent containers
sharing only the filesystem, README.md:41-52 / docker-compose.yml). This
process never writes: everything it learns about the store arrives
through .table.json / metadata.json on disk.

Protocol (all paths given on argv):
  argv[1] root       — the gigadata root the parent is ingesting into
  argv[2] snap_path  — parent-appended "<count> <sum>" lines, one per
                       flush, written+fsynced BEFORE the flush publishes
  argv[3] out_path   — where this process dumps its stats JSON at exit
  argv[4] stop_path  — parent touches it to end the soak
  argv[5] ready_path — touched HERE once this process is up and has
                       verified the table does not exist yet (so the
                       parent can prove table discovery happened mid-run)
  argv[6] max_s      — hard deadline (backstop if stop never appears)

Exit code 0 = every read satisfied the invariants; 1 = violation (the
message is in the stats JSON under "error").
"""

from __future__ import annotations

import json
import os
import sys
import time


def _snapshots(path: str) -> dict[int, float]:
    snaps = {0: 0.0}
    try:
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    snaps[int(parts[0])] = float(parts[1])
    except FileNotFoundError:
        pass
    return snaps


def main() -> int:
    root, snap_path, out_path, stop_path, ready_path = sys.argv[1:6]
    max_s = float(sys.argv[6])

    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.query import QueryEngine
    from quackpipe_spark.session import get_spark

    spark = get_spark(
        app_name="soak-querier", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog = Catalog(root)
    qe = QueryEngine(spark, catalog)

    stats = {
        "reads": 0,
        "grouped_reads": 0,
        "discover_polls": 0,
        "table_missing_at_start": catalog.get("d", "soak") is None,
        "first_n": None,
        "last_n": 0,
        "distinct_counts": 0,
        "error": None,
    }
    # ready AFTER the pre-table state is recorded: the parent holds its
    # first write until this file exists, so a discovered table is
    # provably a MID-RUN discovery through .table.json alone
    with open(ready_path, "w"):
        pass

    seen: set[int] = set()
    deadline = time.time() + max_s
    try:
        while time.time() < deadline and not os.path.exists(stop_path):
            if catalog.get("d", "soak") is None:
                stats["discover_polls"] += 1
                catalog.rediscover()
                time.sleep(0.05)
                continue
            # query FIRST, then load snapshots: the parent registers a
            # state before publishing it, so a result's snapshot is
            # always on disk by the time the result exists — reading the
            # file afterwards can only ever ADD newer states
            row = qe.sql(
                "SELECT count(*) AS n, sum(v) AS s FROM soak", db="d"
            ).collect()[0]
            n, s = row["n"], row["s"] or 0.0
            snaps = _snapshots(snap_path)
            if n not in snaps:
                raise AssertionError(f"count {n} is no flush prefix")
            if s != snaps[n]:
                raise AssertionError(f"sum {s} != {snaps[n]} at n={n}")
            if n < stats["last_n"]:
                raise AssertionError(
                    f"count went backwards {stats['last_n']} -> {n}"
                )
            if stats["first_n"] is None:
                stats["first_n"] = n
            stats["last_n"] = n
            seen.add(n)
            stats["reads"] += 1
            # second query shape through the same engine: exercises the
            # file-list-keyed plan cache under cross-process file churn
            rows = qe.sql(
                "SELECT src, count(*) AS n FROM soak GROUP BY src", db="d"
            ).collect()
            gn = sum(r["n"] for r in rows)
            if gn not in _snapshots(snap_path):
                raise AssertionError(f"grouped total {gn} is no flush prefix")
            if len(rows) > 3:
                raise AssertionError(f"grouped rows {len(rows)} > 3 src values")
            stats["grouped_reads"] += 1
    except Exception as e:  # violation or engine error: both fail the soak
        stats["error"] = f"{type(e).__name__}: {e}"
    stats["distinct_counts"] = len(seen)
    with open(out_path, "w") as f:
        json.dump(stats, f)
    spark.stop()
    return 1 if stats["error"] else 0


if __name__ == "__main__":
    sys.exit(main())
