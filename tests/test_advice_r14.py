"""Regression tests for the four ADVICE-r13 findings fixed in round 14.

1. catalog.py — get_or_create's membership check and legacy-db scan run
   UNDER self._lock: HTTP handler threads iterate self._tables while
   creation inserts into it, so the pre-fix unlocked ``any(...)`` could
   raise "dictionary changed size during iteration" (spurious 500 on
   concurrent first-writes of new measurements).
2. sources/tables.py — _session_alive distinguishes Py4J gateway /
   protocol failures (JVM died abnormally → provably DEAD, purge caches)
   from Java-side and attribute/shape surprises (unknown → keep cached).
3. api.py — a batch 422-acked while buffered (flush timeout / partial
   write) whose flush ultimately FAILS is observable: error log +
   ACKED_BATCH_LOSSES counter (the client was told not to retry, so the
   loss is otherwise silent).
4. catalog.py — get() resolves a LEGACY dotted table living under a
   word-char db when the caller spells the db with punctuation
   ((sanitized-db, raw-name) added to the fallback chain).
"""

from __future__ import annotations

import logging
import threading
from concurrent.futures import Future

import pytest

from quackpipe_spark.catalog import Catalog, Table


# --- 1. get_or_create lock discipline ----------------------------------------


class _LockAssertingTables(dict):
    """Dict stand-in for Catalog._tables that fails the test if ITERATED
    or membership-checked while the catalog lock is not held. dict.get /
    __setitem__ stay native (single C ops, atomic under the GIL)."""

    def __init__(self, lock, *a, **kw):
        super().__init__(*a, **kw)
        self._advice_lock = lock
        self.violations: list[str] = []

    def __iter__(self):
        if not self._advice_lock.locked():
            self.violations.append("iterated outside catalog lock")
        return super().__iter__()

    def __contains__(self, key):
        if not self._advice_lock.locked():
            self.violations.append("membership-checked outside catalog lock")
        return super().__contains__(key)


def test_get_or_create_scans_tables_only_under_lock(tmp_path):
    cat = Catalog(str(tmp_path / "root"))
    guarded = _LockAssertingTables(cat._lock, cat._tables)
    cat._tables = guarded

    # brand-new table: exercises the membership check AND the legacy-db
    # any(...) scan; a pre-existing legacy entry makes the scan non-empty
    guarded[("legacy.db", "old_t")] = Table(
        database="legacy.db",
        name="old_t",
        path=str(tmp_path / "root" / "legacy.db" / "old_t"),
    )
    t = cat.get_or_create("fresh_db", "cpu.load")
    assert t.name == "cpu_load"
    # repeat lookup path (table now exists) and the legacy-db path
    cat.get_or_create("fresh_db", "cpu.load")
    cat.get_or_create("legacy.db", "another")
    assert guarded.violations == []


def test_get_or_create_concurrent_first_writes_no_errors(tmp_path):
    """Belt-and-braces stress: many threads creating distinct new tables
    while others scan — pre-fix this could raise RuntimeError."""
    cat = Catalog(str(tmp_path / "root"))
    errors: list[Exception] = []

    def work(i: int) -> None:
        try:
            for j in range(40):
                cat.get_or_create(f"db{i}", f"t{j}")
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    assert errors == []
    assert len(cat.tables()) == 8 * 40


# --- 2. _session_alive py4j error taxonomy -----------------------------------


class _FakeJsc:
    def __init__(self, exc: Exception):
        self._exc = exc

    def sc(self):
        raise self._exc


class _FakeSession:
    def __init__(self, exc: Exception):
        class _SC:
            pass

        self._sc = _SC()
        self._sc._jsc = _FakeJsc(exc)


def test_session_alive_py4j_network_error_means_dead():
    py4j_protocol = pytest.importorskip("py4j.protocol")
    from quackpipe_spark.sources.tables import _session_alive

    assert _session_alive(_FakeSession(py4j_protocol.Py4JNetworkError("gone"))) is False
    # BASE Py4JError is raised on a LIVE gateway for protocol/shape
    # mismatches ("method ... does not exist in the JVM") — classifying it
    # dead purged every cache on each miss under cross-version drift
    # (r14 review narrowing): unknown → keep cached
    assert _session_alive(_FakeSession(py4j_protocol.Py4JError("proto"))) is True


def test_session_alive_java_or_shape_error_means_unknown_alive():
    py4j_protocol = pytest.importorskip("py4j.protocol")
    from quackpipe_spark.sources.tables import _session_alive

    class _FakeJavaErr(py4j_protocol.Py4JJavaError):
        # bypass Py4JJavaError.__init__ (wants a live java exception obj)
        def __init__(self):
            Exception.__init__(self, "java side raised")

    assert _session_alive(_FakeSession(_FakeJavaErr())) is True
    assert _session_alive(_FakeSession(RuntimeError("odd shape"))) is True
    # and the pre-existing contracts still hold:
    sess = _FakeSession(RuntimeError("unused"))
    sess._sc._jsc = None
    assert _session_alive(sess) is False  # clean stop() nulls _jsc


# --- 3. 422-acked batch whose flush later fails is observable ----------------


def test_watch_unresolved_logs_and_counts_eventual_flush_failure(caplog):
    from quackpipe_spark import api as api_mod

    before = api_mod.ACKED_BATCH_LOSSES
    ok_done: Future = Future()
    ok_done.set_result(5)  # resolved-success before the ack → watched, quiet
    pending_fail: Future = Future()
    pending_ok: Future = Future()
    with caplog.at_level(logging.ERROR, logger="quackpipe_spark.api"):
        api_mod._watch_unresolved([ok_done, pending_fail, pending_ok], "/write")
        pending_ok.set_result(3)  # late success → quiet
        assert api_mod.ACKED_BATCH_LOSSES == before
        pending_fail.set_exception(RuntimeError("disk full at flush"))
    assert api_mod.ACKED_BATCH_LOSSES == before + 1
    msgs = [r.getMessage() for r in caplog.records]
    assert any("FAILED its flush" in m and "disk full at flush" in m for m in msgs)


def test_watch_unresolved_counts_failures_already_done_at_ack_time(caplog):
    """The handler's ``p.result(30)`` loop stops at its FIRST exception or
    timeout, so a sibling promise can have failed fast BEFORE the 422 ack
    without the client hearing about it. The watcher must count those too
    (add_done_callback fires immediately on done futures) — while the one
    promise whose failure the 422 body reported stays uncounted."""
    from quackpipe_spark import api as api_mod

    before = api_mod.ACKED_BATCH_LOSSES
    reported_fail: Future = Future()
    reported_fail.set_exception(RuntimeError("partial write reported to client"))
    silent_prefail: Future = Future()
    silent_prefail.set_exception(RuntimeError("failed fast before the ack"))
    pending: Future = Future()
    with caplog.at_level(logging.ERROR, logger="quackpipe_spark.api"):
        api_mod._watch_unresolved(
            [reported_fail, silent_prefail, pending],
            "/write",
            reported=reported_fail,
        )
        # the pre-ack silent failure is counted immediately
        assert api_mod.ACKED_BATCH_LOSSES == before + 1
        pending.set_result(1)  # late success → quiet
    assert api_mod.ACKED_BATCH_LOSSES == before + 1
    msgs = [r.getMessage() for r in caplog.records]
    assert any("failed fast before the ack" in m for m in msgs)
    assert not any("partial write reported to client" in m for m in msgs)
    # swallow the un-retrieved reported exception warning
    reported_fail.exception()


# --- 4. get() fallback: (sanitized-db, raw-name) ------------------------------


def test_get_legacy_dotted_table_via_punctuated_db_spelling(tmp_path):
    cat = Catalog(str(tmp_path / "root"))
    # legacy dotted table discovered from disk under a word-char db
    legacy = Table(
        database="my_db",
        name="cpu.load",
        path=str(tmp_path / "root" / "my_db" / "cpu.load"),
    )
    cat._tables[("my_db", "cpu.load")] = legacy
    # caller addresses the db by an alternative punctuated spelling
    assert cat.get("my.db", "cpu.load") is legacy
    # existing resolutions unchanged
    assert cat.get("my_db", "cpu.load") is legacy
    assert cat.get("nope", "cpu.load") is None
