"""Regression tests for the r14 api/catalog/session/__main__ review
findings."""

from __future__ import annotations

import json
import os
import urllib.request

import pytest

from quackpipe_spark.catalog import Catalog, Table


def test_session_module_survives_nondigit_cpus_env(monkeypatch):
    """SPARK_GRAFT_CPUS='*' (idiomatic Spark for all cores) must not
    crash the package import — the default applies only to the shuffle
    count."""
    import importlib
    import sys

    try:
        monkeypatch.setenv("SPARK_GRAFT_CPUS", "*")
        mod = importlib.reload(sys.modules["quackpipe_spark.session"])
        assert mod.DEFAULT_SHUFFLE_PARTITIONS == 32
        monkeypatch.setenv("SPARK_GRAFT_CPUS", "16")
        mod = importlib.reload(sys.modules["quackpipe_spark.session"])
        assert mod.DEFAULT_SHUFFLE_PARTITIONS == 16
    finally:
        # re-load under the RESTORED env so the module's default doesn't
        # leak the test's value into the rest of the session
        monkeypatch.undo()
        importlib.reload(sys.modules["quackpipe_spark.session"])


def test_catalog_discover_isolates_corrupt_table_json(tmp_path, caplog):
    """One corrupt .table.json must not abort the whole scan (server
    startup / every rediscover tick previously died for ALL healthy
    tables)."""
    root = tmp_path / "root"
    good = root / "d" / "good"
    good.mkdir(parents=True)
    Table(database="d", name="good", path=str(good)).save()
    bad = root / "d" / "bad"
    bad.mkdir(parents=True)
    (bad / Table.META_NAME).write_text("{ truncated")
    cat = Catalog(str(root))
    assert cat.get("d", "good") is not None
    assert cat.get("d", "bad") is None  # skipped, loudly logged
    # a forward-versioned metadata file (extra field) tolerates too
    fw = root / "d" / "future"
    fw.mkdir(parents=True)
    meta = json.loads((good / Table.META_NAME).read_text())
    meta["name"] = "future"
    meta["brand_new_field_from_v99"] = {"x": 1}
    (fw / Table.META_NAME).write_text(json.dumps(meta))
    cat2 = Catalog(str(root))
    assert cat2.get("d", "future") is not None


def test_get_or_create_hot_path_skips_legacy_scan(tmp_path):
    """Steady-state ingest of a punctuated measurement resolves through
    the direct sanitized-key hit — semantics identical to the legacy
    scan (which would conclude legacy_db=True for the same reason the
    fast path fires)."""
    cat = Catalog(str(tmp_path / "root"))
    t1 = cat.get_or_create("db1", "cpu.load", fields={"v": "INT8"})
    assert t1.name == "cpu_load"
    # second resolve of the same raw spelling: the fast path must return
    # the SAME table object
    t2 = cat.get_or_create("db1", "cpu.load", fields={"v": "INT8"})
    assert t2 is t1


def test_create_order_by_scalar_spelling_no_false_warning(spark, tmp_path):
    """Re-POSTing a create with the YAML scalar 'order_by: ts' (the
    spelling get_or_create normalizes to ['ts']) must not warn that the
    spec was not applied."""
    from quackpipe_spark.api import GigapiServer

    srv = GigapiServer(spark, str(tmp_path / "root"), port=0)
    srv.start()
    try:
        url = f"http://127.0.0.1:{srv._httpd.server_address[1]}/gigapi/create"
        body = json.dumps(
            {"db": "d", "table": "t", "order_by": ["ts"],
             "fields": {"ts": "INT8", "v": "FLOAT8"}}
        ).encode()
        r1 = json.loads(urllib.request.urlopen(
            urllib.request.Request(url, data=body), timeout=10).read())
        assert r1["status"] == "created"
        body2 = json.dumps(
            {"db": "d", "table": "t", "order_by": "ts",
             "fields": {"ts": "INT8", "v": "FLOAT8"}}
        ).encode()
        r2 = json.loads(urllib.request.urlopen(
            urllib.request.Request(url, data=body2), timeout=10).read())
        assert r2["status"] == "exists"
        assert "warning" not in r2, r2
    finally:
        srv.stop()


def test_complete_flush_failure_returns_retryable_503(spark, tmp_path, monkeypatch):
    """A pre-publish flush failure (nothing committed, rollback done)
    must return 503 — the retry-SAFE class — not the generic 400 that
    machine LP clients drop without retry."""
    from quackpipe_spark import api as api_mod
    from quackpipe_spark.api import GigapiServer

    srv = GigapiServer(spark, str(tmp_path / "root"), port=0)
    srv.start()
    try:
        # make every flush die BEFORE any publish
        def boom(*a, **k):
            raise RuntimeError("transient executor loss")

        monkeypatch.setattr(
            srv.ingest.writer, "write_columnar", boom
        )
        url = f"http://127.0.0.1:{srv._httpd.server_address[1]}/write?db=d"
        req = urllib.request.Request(url, data=b"m f=1.0 1000")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=35)
        assert ei.value.code == 503
        assert "safe to retry" in ei.value.read().decode()
    finally:
        srv.stop()


def test_sigterm_handler_registered_by_serve():
    """--serve must register a SIGTERM handler (docker/systemd stop) so
    the graceful shutdown path is reachable — source-level pin."""
    import inspect

    import quackpipe_spark.__main__ as m

    src = inspect.getsource(m)
    assert "SIGTERM" in src and "srv.stop()" in src


def test_http_server_joins_handlers_on_close(spark, tmp_path):
    """The HTTP server must not use daemon handler threads: stop() would
    otherwise run the ingest's FINAL flush while a handler is still
    buffering — stranded rows, unresolved promise, uncounted loss."""
    from quackpipe_spark.api import GigapiServer

    srv = GigapiServer(spark, str(tmp_path / "root"), port=0)
    srv.start()
    try:
        assert srv._httpd.daemon_threads is False
        assert srv._httpd.block_on_close is True
    finally:
        srv.stop()


import urllib.error  # noqa: E402  (used in the 503 test)
