"""Concurrent soak through the STREAMING ingest door.

The batch soak (test_soak_concurrent.py) drives the HTTP-path writer; this
one drives the same three-daemon shape through Structured Streaming —
a producer dropping line-protocol files into a watched directory, the
foreachBatch hive writer (dead-letter policy ON), the compactor reaping
tombstones mid-flight, and concurrent readers — for ≥SPARK_GRAFT_SOAK_S/2
seconds (streaming micro-batches are slower than direct flushes, so the
streaming soak runs at half the batch soak's duration by default).

Invariants:

- every observed (count, sum) is the total of a DROP-ORDER PREFIX of
  producer files (files are renamed into the watched dir atomically and
  the FileStreamSource ingests every new file in its trigger, so any
  committed state is "all files dropped before some instant");
- malformed lines NEVER reach the main table; each lands in the
  ``_dead_letter`` table, and the distinct (line, batch) dead-letter set
  at the end exactly matches what the producer injected (replays may
  duplicate rows, never lose them — dedup by line text);
- counts are monotone per reader; no reader errors while compaction
  rewrites files under the stream's output.
"""

from __future__ import annotations

import os
import threading
import time

from quackpipe_spark.catalog import Catalog
from quackpipe_spark.plans.compactor import Compactor
from quackpipe_spark.query import QueryEngine
from quackpipe_spark.streaming import stream_lines_to_table

NS = 10**9
T0 = 1_700_000_000 * NS  # single hour partition → atomic per-batch publish
SOAK_S = float(os.environ.get("SPARK_GRAFT_SOAK_S", "60")) / 2
BATCH = 40  # rows per produced file
BAD_EVERY = 5  # every Nth file carries one malformed line


def test_streaming_ingest_compact_serve_concurrently(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    catalog = Catalog(str(tmp_path / "gigadata"))
    qe = QueryEngine(spark, catalog)

    stop = threading.Event()
    errors: list[str] = []
    snap_lock = threading.Lock()
    snapshots: dict[int, float] = {0: 0.0}
    stats = {"files": 0, "reads": 0, "compactions": 0, "written": 0, "bad": 0}
    bad_lines: list[str] = []

    def _produce(idx: int, start: int) -> None:
        lines = [
            f"soakstream,src=s{i % 3} v={float(i)} {T0 + (start + i) % 3_000 * NS // 1000}"
            for i in range(start, start + BATCH)
        ]
        if idx % BAD_EVERY == 0:
            bad = f"soakstream,broken value {idx}"  # no field=value → reject
            lines.insert(len(lines) // 2, bad)
            bad_lines.append(bad)
            stats["bad"] += 1
        cum_n = start + BATCH
        cum_s = sum(float(i) for i in range(cum_n))
        # snapshot BEFORE the file becomes visible; tmp+rename is atomic on
        # the same filesystem, so the source never reads a partial file
        with snap_lock:
            snapshots[cum_n] = cum_s
        tmp = tmp_path / f".tmp_{idx}.lp"
        tmp.write_text("\n".join(lines) + "\n")
        os.rename(tmp, src / f"f{idx:05d}.lp")
        stats["files"] += 1
        stats["written"] = cum_n

    _produce(0, 0)  # one file before the stream starts

    stream = spark.readStream.format("text").load(str(src))
    query = stream_lines_to_table(
        spark, catalog, stream, db="d",
        checkpoint_dir=str(tmp_path / "ckpt"), trigger_seconds=0.3,
        malformed="dead_letter",
    )

    # wait for the table to exist before unleashing readers/compactor
    deadline = time.time() + 120
    while time.time() < deadline:
        t = catalog.get("d", "soakstream")
        if t and any(t.partition_dirs()):
            break
        time.sleep(0.3)
    assert catalog.get("d", "soakstream") is not None, "stream never produced"

    def producer() -> None:
        try:
            i = 1
            while not stop.is_set():
                _produce(i, stats["written"])
                i += 1
                time.sleep(0.15)
        except Exception as e:  # pragma: no cover
            errors.append(f"producer: {type(e).__name__}: {e}")

    def compactor() -> None:
        try:
            comp = Compactor(spark, catalog.get("d", "soakstream"), drop_delay_s=2.0)
            while not stop.is_set():
                stats["compactions"] += len(comp.run_once(levels=[1, 2, 3]))
                time.sleep(0.5)
        except Exception as e:  # pragma: no cover
            errors.append(f"compactor: {type(e).__name__}: {e}")

    def reader(tag: str) -> None:
        try:
            last_n = 0
            while not stop.is_set():
                row = qe.sql(
                    "SELECT count(*) AS n, sum(v) AS s FROM soakstream", db="d"
                ).collect()[0]
                n, s = row["n"], row["s"]
                with snap_lock:
                    expect = snapshots.get(n)
                assert expect is not None, f"{tag}: count {n} is no file prefix"
                assert s == expect, f"{tag}: sum {s} != {expect} at n={n}"
                assert n >= last_n, f"{tag}: count went backwards {last_n}->{n}"
                last_n = n
                stats["reads"] += 1
        except Exception as e:  # pragma: no cover
            errors.append(f"reader {tag}: {type(e).__name__}: {e}")

    threads = [
        threading.Thread(target=producer, name="stream-producer"),
        threading.Thread(target=compactor, name="stream-compactor"),
        threading.Thread(target=reader, args=("r1",), name="stream-reader-1"),
        threading.Thread(target=reader, args=("r2",), name="stream-reader-2"),
    ]
    t_end = time.time() + SOAK_S
    for t in threads:
        t.start()
    try:
        while time.time() < t_end and not errors:
            time.sleep(0.5)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=120)
        try:
            query.processAllAvailable()
        finally:
            query.stop()
    assert not errors, errors[:5]

    # ---- post-soak invariants ---------------------------------------------
    row = qe.sql(
        "SELECT count(*) AS n, sum(v) AS s, count(DISTINCT v) AS d FROM soakstream",
        db="d",
    ).collect()[0]
    assert row["n"] == stats["written"] == row["d"]  # nothing lost, nothing duped
    assert row["s"] == snapshots[stats["written"]]
    # dead letters: exactly the injected bad lines survive (dedup by text —
    # batch replays may duplicate rows, never lose or invent lines)
    dl = qe.sql(
        "SELECT count(DISTINCT line) AS k, count(*) AS total FROM _dead_letter",
        db="d",
    ).collect()[0]
    assert dl["k"] == len(set(bad_lines)) and dl["k"] >= 1
    got_lines = {
        r["line"] for r in qe.sql("SELECT DISTINCT line FROM _dead_letter", db="d").collect()
    }
    assert got_lines == set(bad_lines)
    # all three daemons really ran concurrently
    assert stats["files"] >= 10 and stats["reads"] >= 10, stats
    assert stats["compactions"] >= 1, stats
