"""Concurrent HTTP serving soak (VERDICT r12 #5).

The reference serves concurrent dashboards: many /query clients reading
while line-protocol writers post. tests/test_api_streaming.py drives the
routes request-at-a-time; this soak drives ONE GigapiServer with parallel
writers + readers for ≥SPARK_GRAFT_SOAK_S seconds (default 60) and
asserts, on every concurrent request:

- streamed-response integrity: every /query body parses as the
  {"results": [...]} shape, never torn or interleaved across the
  ThreadingHTTPServer's handler threads;
- promise-ack correctness: a 204 write ack means the rows are PUBLISHED —
  the writer immediately re-reads its own table over HTTP and must see
  at least everything it was acked for;
- prefix consistency: every observed (count, sum) is an exact acked-batch
  prefix per table (registered before the write posts, so no observable
  state is unregistered);
- no cross-request plan-cache pollution: a reader alternates the SAME SQL
  shape over two different tables — a polluted cache would serve w0's
  plan for w1, failing the per-table prefix check; the merge ticker runs
  throughout (merge_timeout_s=1), churning file lists under the cache.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.request

import pytest

from quackpipe_spark.api import GigapiServer

NS = 10**9
T0 = 1_700_000_000 * NS
SOAK_S = float(os.environ.get("SPARK_GRAFT_SOAK_S", "60"))
BATCH = 40


@pytest.fixture
def server(spark, tmp_path):
    srv = GigapiServer(spark, str(tmp_path / "root"), port=0, merge_timeout_s=1.0)
    srv.start()
    srv.base = f"http://127.0.0.1:{srv._httpd.server_address[1]}"
    yield srv
    srv.stop()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _query(base: str, sql: str):
    status, body = _post(base + "/query?db=d", json.dumps({"query": sql}).encode())
    assert status == 200, f"{status}: {body[:300]!r}"
    parsed = json.loads(body)  # torn/interleaved bytes would fail here
    assert set(parsed) == {"results"}, parsed
    return parsed["results"]


def test_http_concurrent_serving_soak(server):
    stop = threading.Event()
    errors: list[str] = []
    lock = threading.Lock()
    # per-table registries of acked prefix states, registered BEFORE the
    # write posts so readers can never observe an unregistered state
    snapshots = {"w0": {0: 0.0}, "w1": {0: 0.0}}
    # counters shared across threads mutate ONLY under `lock` (review
    # r13: unlocked `stats[...] += 1` from two threads loses increments
    # at a GIL switch and fails the >=N assertions spuriously); running
    # cumulative sums avoid the O(total-written) re-sum per batch
    stats = {
        "acks": 0,
        "reads": 0,
        "alt_reads": 0,
        "written": {"w0": 0, "w1": 0},
        "cum_s": {"w0": 0.0, "w1": 0.0},
    }

    def writer(table: str) -> None:
        try:
            while not stop.is_set():
                start = stats["written"][table]
                cum_n = start + BATCH
                with lock:
                    stats["cum_s"][table] += float(sum(range(start, cum_n)))
                    snapshots[table][cum_n] = stats["cum_s"][table]
                lines = "\n".join(
                    f"{table},src=s{i % 3} v={float(i)} "
                    f"{T0 + i % 3_000 * NS // 1000}"
                    for i in range(start, cum_n)
                )
                status, body = _post(
                    server.base + "/write?db=d", lines.encode()
                )
                assert status == 204, f"{table}: {status} {body[:200]!r}"
                with lock:
                    stats["written"][table] = cum_n
                    stats["acks"] += 1
                # promise-ack correctness: the 204 means published — this
                # table must already serve AT LEAST the acked rows
                [row] = _query(server.base, f"SELECT count(*) AS n FROM {table}")
                assert row["n"] >= cum_n, (
                    f"{table}: acked {cum_n} but read back {row['n']}"
                )
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(f"writer {table}: {type(e).__name__}: {e}")

    def reader(table: str) -> None:
        try:
            last_n = 0
            while not stop.is_set():
                if stats["written"][table] == 0:
                    time.sleep(0.05)
                    continue
                [row] = _query(
                    server.base,
                    f"SELECT count(*) AS n, sum(v) AS s FROM {table}",
                )
                n, s = row["n"], row["s"] or 0.0
                with lock:
                    expect = snapshots[table].get(n)
                assert expect is not None, f"{table}: count {n} no acked prefix"
                assert s == expect, f"{table}: sum {s} != {expect} at n={n}"
                assert n >= last_n, f"{table}: count went backwards"
                last_n = n
                with lock:
                    stats["reads"] += 1
        except Exception as e:  # pragma: no cover
            errors.append(f"reader {table}: {type(e).__name__}: {e}")

    def alternating_reader() -> None:
        # SAME SQL shape over two tables: a plan-cache entry polluted
        # across requests would answer for the wrong table's files
        try:
            flip = 0
            while not stop.is_set():
                table = f"w{flip % 2}"
                flip += 1
                if stats["written"][table] == 0:
                    time.sleep(0.05)
                    continue
                rows = _query(
                    server.base,
                    f"SELECT src, count(*) AS n FROM {table} GROUP BY src",
                )
                total = sum(r["n"] for r in rows)
                with lock:
                    known = total in snapshots[table]
                assert known, f"alt {table}: total {total} no acked prefix"
                assert len(rows) <= 3
                with lock:
                    stats["alt_reads"] += 1
        except Exception as e:  # pragma: no cover
            errors.append(f"alt reader: {type(e).__name__}: {e}")

    threads = [
        threading.Thread(target=writer, args=("w0",), name="http-writer-0"),
        threading.Thread(target=writer, args=("w1",), name="http-writer-1"),
        threading.Thread(target=reader, args=("w0",), name="http-reader-0"),
        threading.Thread(target=reader, args=("w1",), name="http-reader-1"),
        threading.Thread(target=alternating_reader, name="http-reader-alt"),
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
            t.join(timeout=180)
    assert not errors, errors[:5]
    assert not any(t.is_alive() for t in threads)

    # every daemon did real work
    assert stats["acks"] >= 10, stats
    assert stats["reads"] >= 20, stats
    assert stats["alt_reads"] >= 10, stats
    # final serving state over HTTP equals everything acked, per table
    for table in ("w0", "w1"):
        n_final = stats["written"][table]
        [row] = _query(
            server.base, f"SELECT count(*) AS n, sum(v) AS s FROM {table}"
        )
        assert row["n"] == n_final, (table, row, n_final)
        assert row["s"] == snapshots[table][n_final]
    # the merge ticker actually ran over both tables during the soak (the
    # plan cache had real staleness pressure, not just appends)
    assert {("d", "w0"), ("d", "w1")} <= set(server._compactors), (
        server._compactors
    )
