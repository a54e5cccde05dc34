"""Regression tests for the four ADVICE-r12 findings fixed in round 13.

1. api.py — PartialWriteError / flush timeout map to non-retryable 422,
   not 503 (machine line-protocol clients auto-retry 5xx without reading
   the body, duplicating committed partitions on every attempt).
2. functions/dialect.py — registry_fingerprint memoization is
   lock-guarded so a reader preempted across a concurrent registration
   cannot permanently memoize a pre-registration digest.
3. catalog.py — measurement punctuation is sanitized ('cpu.load' →
   'cpu_load') instead of rejected; pre-existing dotted tables from the
   looser pre-r12 contract stay writable; traversal is still rejected.
4. sources/tables.py — a failing liveness probe (Spark Connect shape)
   means UNKNOWN, not dead: caches must not purge live entries.
"""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from quackpipe_spark.catalog import Catalog, Table, sanitize_ident


def _post(url: str, body: bytes, headers: dict | None = None):
    req = urllib.request.Request(url, data=body, headers=headers or {}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


# --- 1. partial-write / timeout HTTP status ---------------------------------


@pytest.fixture
def server(spark, tmp_path):
    from quackpipe_spark.api import GigapiServer

    srv = GigapiServer(spark, str(tmp_path / "root"), port=0)
    srv.start()
    srv.base = f"http://127.0.0.1:{srv._httpd.server_address[1]}"
    yield srv
    srv.stop()


class _FailingPromise:
    def __init__(self, exc: Exception):
        self._exc = exc

    def result(self, timeout=None):
        raise self._exc


def test_partial_write_maps_to_nonretryable_422(server, monkeypatch):
    from quackpipe_spark import api as api_mod
    from quackpipe_spark.writer import PartialWriteError

    monkeypatch.setattr(
        api_mod,
        "ingest_lines",
        lambda *a, **kw: [_FailingPromise(PartialWriteError("1/3 partitions committed"))],
    )
    status, body = _post(server.base + "/write?db=d", b"m v=1i 1717405200")
    # a 5xx would be auto-retried by telegraf/influx clients, duplicating
    # the committed partitions; 422 is dropped (non-retryable 4xx)
    assert status == 422
    assert b"partial write" in body


def test_flush_timeout_maps_to_nonretryable_422(server, monkeypatch):
    from concurrent.futures import TimeoutError as FuturesTimeout

    from quackpipe_spark import api as api_mod

    monkeypatch.setattr(
        api_mod,
        "ingest_lines",
        lambda *a, **kw: [_FailingPromise(FuturesTimeout())],
    )
    status, body = _post(server.base + "/write?db=d", b"m v=1i 1717405200")
    assert status == 422
    assert b"do not blindly retry" in body


# --- 2. fingerprint memoization race -----------------------------------------


def test_fingerprint_not_permanently_stale_under_racing_reader():
    """Interleave the exact ADVICE-r12 schedule: reader hashes a
    pre-registration snapshot, registration lands, reader memoizes.
    With the lock the memo may transiently be the old digest, but the
    NEXT read must observe the new registration."""
    from quackpipe_spark.functions import dialect as d

    base = d.registry_fingerprint()
    stop = threading.Event()
    errs: list[Exception] = []

    def reader():
        try:
            while not stop.is_set():
                d.registry_fingerprint()
        except Exception as e:  # sorted() RuntimeError under concurrent insert
            errs.append(e)

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        for i in range(300):
            d.note_registration(f"_race_fn_{i % 7}", f"def_{i}")
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errs, errs
    # final state: fingerprint reflects the LAST registration, and reading
    # it twice is stable (memo not stuck on a pre-registration digest)
    d.note_registration("_race_fn_final", "final_def")
    fp1 = d.registry_fingerprint()
    fp2 = d.registry_fingerprint()
    assert fp1 == fp2 != base
    # cleanup so other fingerprint tests see a deterministic registry
    for i in range(7):
        d._REGISTERED.pop(f"_race_fn_{i}", None)
    d._REGISTERED.pop("_race_fn_final", None)
    with d._REG_LOCK:
        d._FINGERPRINT = None


# --- 3. identifier sanitation + continuity -----------------------------------


def test_dotted_measurement_sanitizes_instead_of_rejecting(tmp_path):
    cat = Catalog(str(tmp_path / "root"))
    t = cat.get_or_create("mydb", "cpu.load", fields={"v": "DOUBLE"})
    assert t.name == "cpu_load"
    # second write with the raw spelling routes to the same table
    assert cat.get_or_create("mydb", "cpu.load") is t
    assert cat.get_or_create("my-db", "disk io").name == "disk_io"


def test_preexisting_dotted_table_stays_writable(tmp_path):
    # simulate a table created under the pre-r12 contract: on disk with a
    # dotted directory name, discovered at startup
    root = tmp_path / "root"
    tdir = root / "db" / "cpu.load"
    tdir.mkdir(parents=True)
    Table(database="db", name="cpu.load", path=str(tdir), schema={"v": "DOUBLE"}).save()
    cat = Catalog(str(root))
    t = cat.get_or_create("db", "cpu.load")
    # exempt: the existing dotted table keeps accepting writes...
    assert t.name == "cpu.load" and t.path == str(tdir)
    # ...and the sanitized spelling is a SEPARATE new table
    assert cat.get_or_create("db", "cpu_load") is not t


def test_traversal_still_rejected_after_sanitation(tmp_path):
    cat = Catalog(str(tmp_path / "root"))
    for bad in ("../..", "/etc/passwd", "a/b", ""):
        with pytest.raises(ValueError):
            cat.get_or_create("db", bad)
        with pytest.raises(ValueError):
            cat.get_or_create(bad, "t")
    assert sanitize_ident("../..") == "__/__"  # '/' never laundered


# --- 4. unknown session shape keeps caches ------------------------------------


def test_probe_error_means_alive_not_dead():
    from quackpipe_spark.sources.tables import _session_alive

    class ConnectShapedSession:  # no _sc._jsc path at all
        pass

    # probe failure = unknown shape (e.g. Spark Connect) → keep cached
    assert _session_alive(ConnectShapedSession()) is True


def test_stopped_classic_session_still_detected(spark):
    """The REAL classic stop path: SparkContext.stop() nulls _jsc in its
    finally, so the post-stop shape is `_sc._jsc is None` — the probe
    must read that as STOPPED, not unknown-alive, or the stopped-session
    purge becomes dead code and dead JVM refs pin forever (review r13:
    the first unknown-means-alive fix over-corrected exactly here)."""
    from quackpipe_spark.sources.tables import _session_alive

    assert _session_alive(spark) is True

    class _SC:
        _jsc = None  # what spark.stop() actually leaves behind

    class RealStoppedShape:
        _sc = _SC()

    assert _session_alive(RealStoppedShape()) is False


def test_get_resolves_raw_spelling_to_sanitized_table(tmp_path):
    """Catalog.get with the raw punctuated spelling must find the table
    the write door sanitized it into — /gigapi/create's exists-check,
    validate_schema, and write_columnar all pair a raw-name get() with
    get_or_create (review r13: a second create of 'cpu.load' answered
    'created' instead of 'exists' and skipped the spec-mismatch warning)."""
    cat = Catalog(str(tmp_path / "root"))
    t = cat.get_or_create("mydb", "cpu.load", fields={"v": "DOUBLE"})
    assert cat.get("mydb", "cpu.load") is t
    assert cat.get("mydb", "cpu_load") is t
    assert cat.get("my-db", "x") is None  # absent stays absent


def test_new_measurement_in_legacy_db_keeps_db_spelling(tmp_path):
    """A NEW measurement written into a pre-existing dotted legacy db
    must keep that db's spelling — sanitizing the db component would
    silently split one logical db across two directories (review r13)."""
    root = tmp_path / "root"
    tdir = root / "legacy.db" / "a"
    tdir.mkdir(parents=True)
    Table(database="legacy.db", name="a", path=str(tdir), schema={"v": "DOUBLE"}).save()
    cat = Catalog(str(root))
    t = cat.get_or_create("legacy.db", "b")
    assert t.database == "legacy.db"
    assert t.path == str(root / "legacy.db" / "b")
    # punctuated measurement inside the legacy db: db kept, name sanitized
    t2 = cat.get_or_create("legacy.db", "cpu.load")
    assert (t2.database, t2.name) == ("legacy.db", "cpu_load")
    assert cat.get("legacy.db", "cpu.load") is t2  # raw-name lookup resolves
    # a FRESH db still sanitizes
    assert cat.get_or_create("fresh.db", "t").database == "fresh_db"
