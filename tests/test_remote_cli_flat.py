"""Flat Merge engine, stdin CLI, and remote-parquet rewrite coverage."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import threading

import pytest

T0 = 1_700_000_000 * 10**9


def test_flat_merge_engine_roundtrip(spark, tmp_path):
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.ingest import IngestService
    from quackpipe_spark.plans.compactor import Compactor
    from quackpipe_spark.plans.index import PartitionIndex
    from quackpipe_spark.query import QueryEngine

    catalog = Catalog(str(tmp_path / "root"))
    catalog.get_or_create("d", "flat", engine="Merge")
    svc = IngestService(spark, catalog, save_timeout_s=3600)
    for i in range(3):
        svc.store("d", "flat", {"v": [i], "__timestamp": [T0 + i]})
        svc.flush()
    t = catalog.get("d", "flat")
    assert t.partition_by == [] and t.partition_dirs() == [t.path]
    # files live directly in the table root, no date= dirs
    assert glob.glob(os.path.join(t.path, "date=*")) == []
    assert len(PartitionIndex.load(t.path).files) == 3

    qe = QueryEngine(spark, catalog)
    assert qe.sql("SELECT count(*) n FROM flat", db="d").collect()[0]["n"] == 3

    comp = Compactor(spark, t, drop_delay_s=0.0)
    out = comp.run_once(levels=[1])
    assert len(out) == 1 and out[0].endswith(".2.parquet")
    assert qe.sql("SELECT count(*) n FROM flat", db="d").collect()[0]["n"] == 3


def test_http_read_parquet_rewrite(tmp_path):
    """read_parquet('https://…') resolves through the fetch cache — served
    by an in-process http server (no external network)."""
    import http.server

    from quackpipe_spark.functions.dialect import rewrite_sql
    from quackpipe_spark.sources import remote

    src = "/root/testdata/sf0.001/region.parquet"
    os.environ["QPS_HTTP_CACHE"] = str(tmp_path / "cache")
    remote.CACHE_DIR = str(tmp_path / "cache")

    class Handler(http.server.SimpleHTTPRequestHandler):
        def translate_path(self, path):
            return src

        def log_message(self, *a):
            pass

    httpd = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/region.parquet"
        sql = rewrite_sql(f"SELECT count() FROM read_parquet('{url}')")
        assert "count(*)" in sql and "http://" not in sql
        local = sql.split("parquet.`")[1].split("`")[0]
        assert os.path.getsize(local) == os.path.getsize(src)
        # second rewrite hits the cache (same path, no re-download)
        assert rewrite_sql(f"SELECT count() FROM read_parquet('{url}')") == sql
    finally:
        httpd.shutdown()


def test_s3_path_normalization():
    from quackpipe_spark.sources.remote import resolve_scan_path

    assert resolve_scan_path("s3://bucket/k.parquet") == "s3a://bucket/k.parquet"
    assert resolve_scan_path("/local/p.parquet") == "/local/p.parquet"


def test_stdin_cli(tmp_path):
    """python -m quackpipe_spark --stdin executes SQL against a root."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "quackpipe_spark", "--stdin", "--root", str(tmp_path)],
        input="SELECT 1 AS one; SELECT 'a' AS s, count() AS n FROM read_parquet('/root/testdata/sf0.001/region.parquet')",
        capture_output=True,
        text=True,
        timeout=180,
        env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l and not l.startswith(("WARN", "Using", "Setting", "2"))]
    assert "1" in lines[0]
    assert lines[1] == "a\t5"
