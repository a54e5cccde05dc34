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

Reads go through tests/soak_utils.collect_with_reap_retry: the parent
reaps compaction inputs on a 2 s delay (production default 30 s), so a
scan that outlives the window fails loudly and is retried against the
re-listed store — the delayed-drop contract. Every result, retried or
not, faces the exact-prefix/monotonicity invariants; only the narrow
reaped-input error class is ever retried.
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

    from tests.soak_utils import collect_with_reap_retry

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
        "reap_retries": 0,
        "error": None,
    }
    # ready AFTER the pre-table state is recorded: the parent holds its
    # first write until this file exists, so a discovered table is
    # provably a MID-RUN discovery through .table.json alone
    with open(ready_path, "w"):
        pass

    seen: set[int] = set()
    # progress beacon for the parent: on a slow box 60 s of wall clock
    # may not contain enough successful reads to satisfy the soak's
    # throughput asserts — the parent extends the soak (hard-capped)
    # until this file shows the thresholds met, instead of the test
    # encoding a box-speed assumption
    progress_path = out_path + ".progress"

    def _beacon() -> None:
        with open(progress_path, "w") as pf:
            json.dump(
                {
                    "reads": stats["reads"],
                    "grouped_reads": stats["grouped_reads"],
                    "distinct_counts": len(seen),
                },
                pf,
            )

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
            # file afterwards can only ever ADD newer states.
            # collect_with_reap_retry: the parent compacts with
            # drop_delay_s=2.0, so on a slow box a scan can outlive the
            # drop window and lose an input file mid-flight — a LOUD
            # failure by design; the bounded retry is the client half of
            # the delayed-drop contract (see tests/soak_utils.py) and
            # every retried result still faces every invariant below
            rows, r = collect_with_reap_retry(
                qe, "SELECT count(*) AS n, sum(v) AS s FROM soak", "d",
                stats=stats,
            )
            row = rows[0]
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
            rows, r = collect_with_reap_retry(
                qe, "SELECT src, count(*) AS n FROM soak GROUP BY src", "d",
                stats=stats,
            )
            gn = sum(r["n"] for r in rows)
            if gn not in _snapshots(snap_path):
                raise AssertionError(f"grouped total {gn} is no flush prefix")
            if len(rows) > 3:
                raise AssertionError(f"grouped rows {len(rows)} > 3 src values")
            stats["grouped_reads"] += 1
            _beacon()
    except Exception as e:  # violation or engine error: both fail the soak
        stats["error"] = f"{type(e).__name__}: {e}"
    stats["distinct_counts"] = len(seen)
    with open(out_path, "w") as f:
        json.dump(stats, f)
    spark.stop()
    return 1 if stats["error"] else 0


if __name__ == "__main__":
    sys.exit(main())
