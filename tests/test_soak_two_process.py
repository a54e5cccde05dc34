"""Two-process writer/querier soak (VERDICT r12 #1).

The reference's defining deployment runs the writer and the querier as
SEPARATE processes sharing only the filesystem (README.md:41-52;
docker-compose.yml runs gigapi + gigapi-querier as distinct containers).
tests/test_soak_concurrent.py proves the concurrent story in one
process; this test proves it across the process boundary:

- a querier subprocess (tests/soak_reader.py) with its OWN SparkSession
  starts BEFORE the table exists and must discover it mid-run through
  .table.json alone (Catalog.rediscover — the discoverPartitions-ticker
  parity seam);
- the parent process concurrently ingests (line protocol -> flush) and
  compacts (drop_delay 2 s, so tombstoned inputs are reaped while the
  other process reads);
- every (count, sum) the querier observes must be an exact flushed-batch
  prefix, monotonically non-decreasing — same invariants as the
  in-process soak — which also proves the file-list-keyed plan cache
  (query.py) never serves a stale plan across the boundary: a cached
  plan pinned to an old file list would return a stale count after new
  flushes, breaking the final-convergence assertion below.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

from quackpipe_spark.catalog import Catalog
from quackpipe_spark.ingest import IngestService, ingest_lines
from quackpipe_spark.plans.compactor import Compactor
from quackpipe_spark.query import QueryEngine

NS = 10**9
T0 = 1_700_000_000 * NS  # all rows land in ONE hour partition
SOAK_S = float(os.environ.get("SPARK_GRAFT_SOAK_S", "60"))
BATCH = 50


def test_two_process_writer_querier_soak(spark, tmp_path):
    root = str(tmp_path / "gigadata")
    snap_path = str(tmp_path / "snapshots.txt")
    out_path = str(tmp_path / "reader_stats.json")
    stop_path = str(tmp_path / "stop")
    ready_path = str(tmp_path / "ready")

    # the querier subprocess gets a smaller session so two local JVMs
    # don't fight over the box; cwd is isolated so any session artifacts
    # (spark-warehouse etc.) can't collide with the parent's
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": "8",
        "SPARK_GRAFT_DRIVER_MEM": "4g",
        # cwd is the isolated tmp dir, so the package must come via path
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    # logs to FILES, not pipes: an unread PIPE wedges the child once the
    # 64 KB buffer fills (Spark's stderr chatter can exceed it on a slow
    # startup), deadlocking the soak instead of failing it
    log_path = str(tmp_path / "reader_log.txt")
    log_f = open(log_path, "wb")
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "soak_reader.py"),
            root,
            snap_path,
            out_path,
            stop_path,
            ready_path,
            str(SOAK_S + 240),
        ],
        cwd=str(tmp_path),
        env=env,
        stdout=log_f,
        stderr=subprocess.STDOUT,
    )
    try:
        # hold the FIRST write until the querier is up and has recorded
        # that the table does not exist — discovery is then provably
        # mid-run, via the shared filesystem alone
        t_wait = time.time() + 240
        while not os.path.exists(ready_path):
            assert proc.poll() is None, (
                f"querier died during startup: "
                f"{open(log_path, 'rb').read().decode(errors='replace')[-2000:]}"
            )
            assert time.time() < t_wait, "querier never became ready"
            time.sleep(0.2)

        catalog = Catalog(root)
        svc = IngestService(spark, catalog, save_timeout_s=3600)  # manual flush
        errors: list[str] = []
        # running cumulative sum: re-summing range(cum_n) per batch is
        # O(total-written) per 50-row batch — quadratic over a long soak,
        # stealing writer wall-clock from the flush pressure (review r13)
        stats = {"flushes": 0, "compactions": 0, "written": 0, "cum_s": 0.0}
        stop = threading.Event()
        snapf = open(snap_path, "a")

        def _write_batch(start: int) -> None:
            lines = "\n".join(
                f"soak,src=s{i % 3} v={float(i)} "
                f"{T0 + i % 3_000 * NS // 1000}"
                for i in range(start, start + BATCH)
            )
            promises = ingest_lines(svc, lines, db="d")
            cum_n = start + BATCH
            stats["cum_s"] += float(sum(range(start, cum_n)))
            cum_s = stats["cum_s"]
            # register BEFORE the flush publishes, and make it durable to
            # the OTHER process before any state it could observe exists
            snapf.write(f"{cum_n} {cum_s}\n")
            snapf.flush()
            os.fsync(snapf.fileno())
            svc.flush()
            for p in promises:
                assert p.result(30)
            stats["flushes"] += 1
            stats["written"] = cum_n

        def writer() -> None:
            try:
                while not stop.is_set():
                    _write_batch(stats["written"])
                    time.sleep(0.05)
            except Exception as e:  # pragma: no cover - failure reporting
                errors.append(f"writer: {type(e).__name__}: {e}")

        def compactor() -> None:
            try:
                # wait for the table to exist (first flush creates it)
                while not stop.is_set() and catalog.get("d", "soak") is None:
                    time.sleep(0.1)
                if stop.is_set():
                    return
                comp = Compactor(spark, catalog.get("d", "soak"), drop_delay_s=2.0)
                while not stop.is_set():
                    out = comp.run_once(levels=[1, 2, 3])
                    stats["compactions"] += len(out)
                    time.sleep(0.5)
            except Exception as e:  # pragma: no cover
                errors.append(f"compactor: {type(e).__name__}: {e}")

        threads = [
            threading.Thread(target=writer, name="2p-writer"),
            threading.Thread(target=compactor, name="2p-compactor"),
        ]
        # the querier beacons its progress (reads/grouped/distinct) each
        # loop; after the nominal SOAK_S the parent keeps the soak alive
        # (hard-capped) until the beacon meets the thresholds asserted
        # below — the asserts keep full strength on a slow box, the test
        # just waits for them to become true instead of assuming 60 s of
        # wall clock contains enough successful reads
        progress_path = out_path + ".progress"

        def _progress_met() -> bool:
            try:
                with open(progress_path) as pf:
                    p = json.load(pf)
            except (OSError, ValueError):
                return False
            return (
                p.get("reads", 0) >= 10
                and p.get("grouped_reads", 0) >= 10
                and p.get("distinct_counts", 0) >= 5
            )

        t_end = time.time() + SOAK_S
        t_hard = t_end + 180
        for t in threads:
            t.start()
        try:
            while not errors and (
                time.time() < t_end
                or (time.time() < t_hard and not _progress_met())
            ):
                assert proc.poll() is None, "querier exited mid-soak"
                time.sleep(0.5)
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=120)
            # close snapf only when no thread is still wedged in a flush:
            # a timed-out join with a live writer would otherwise race
            # into 'I/O operation on closed file' (review r13). Runs in
            # the finally so the mid-soak querier-death assert path also
            # releases the handle.
            stuck = [t.name for t in threads if t.is_alive()]
            if not stuck:
                snapf.close()
        # a stuck thread usually has a ROOT CAUSE already recorded by the
        # other thread — surface both, not just 'still alive' (review
        # r13, second pass)
        assert not stuck, f"stuck threads {stuck}; recorded errors: {errors[:5]}"
        assert not errors, errors[:5]

        # stop the querier and collect its verdict
        with open(stop_path, "w"):
            pass
        rc = proc.wait(timeout=240)
        with open(out_path) as f:
            rstats = json.load(f)
        assert rc == 0 and rstats["error"] is None, rstats
        # the querier really did start blind and discover mid-run
        assert rstats["table_missing_at_start"], rstats
        assert rstats["discover_polls"] >= 1, rstats
        # it served real traffic and watched the store grow: many reads,
        # several distinct prefix states (stale cached plans would pin
        # one count forever)
        assert rstats["reads"] >= 10, rstats
        assert rstats["grouped_reads"] >= 10, rstats
        assert rstats["distinct_counts"] >= 5, rstats
        assert rstats["last_n"] > (rstats["first_n"] or 0), rstats
        # both processes exercised the dangerous window
        assert stats["flushes"] >= 10, stats
        assert stats["compactions"] >= 3, stats

        # final convergence: a FRESH query in the parent over everything
        # the writer produced
        qe = QueryEngine(spark, catalog)
        row = qe.sql(
            "SELECT count(*) AS n, sum(v) AS s FROM soak", db="d"
        ).collect()[0]
        assert row["n"] == stats["written"]
        assert row["s"] == stats["cum_s"]
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=60)
        log_f.close()
