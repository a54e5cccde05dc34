"""Time-range extraction + partition pruning on written tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackpipe_spark.query import extract_time_bounds

NS = 10**9


def test_extract_literal_bounds():
    assert extract_time_bounds("SELECT * FROM t WHERE __timestamp >= 100 AND __timestamp < 200") == (100, 200)
    assert extract_time_bounds("WHERE __timestamp BETWEEN 5 AND 9") == (5, 9)
    assert extract_time_bounds("SELECT 1") == (None, None)


def test_extract_epoch_ns_idiom():
    # README.md:121 documented form
    lo, hi = extract_time_bounds(
        "SELECT * FROM weather WHERE __timestamp >= epoch_ns('2024-01-05 00:00:00'::TIMESTAMP) "
        "AND __timestamp < epoch_ns(TIMESTAMP '2024-01-06 12:30:00')"
    )
    assert lo == 1704412800 * NS  # 2024-01-05 00:00:00 UTC
    assert hi == 1704544200 * NS  # 2024-01-06 12:30:00 UTC


def test_partition_filter_pushdown_on_written_table(spark, tmp_path):
    """date/hour filters on the ingested store prune hive partitions."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.ingest import IngestService
    from quackpipe_spark.query import QueryEngine

    catalog = Catalog(str(tmp_path / "root"))
    svc = IngestService(spark, catalog, save_timeout_s=3600)
    t0 = 1_700_000_000 * NS
    svc.store("d", "pp", {"v": [1], "__timestamp": [t0]})
    svc.store("d", "pp", {"v": [2], "__timestamp": [t0 + 86_400 * NS]})
    svc.flush()
    qe = QueryEngine(spark, catalog)
    df = qe.table_df(catalog.get("d", "pp")).filter(F.col("date") == "2023-11-14")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2023-11-14" in plan
    assert df.count() == 1

    # index-level pruning via __timestamp bounds selects one file
    files_all = qe.table_files(catalog.get("d", "pp"))
    files_pruned = qe.table_files(catalog.get("d", "pp"), lo=t0 + 86_000 * NS)
    assert len(files_all) == 2 and len(files_pruned) == 1


def test_read_parquet_array_form(spark, tmp_path):
    """The reference's read_parquet(ARRAY[...]) multi-file scan."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.query import QueryEngine

    qe = QueryEngine(spark, Catalog(str(tmp_path / "root")))
    f1 = "/root/testdata/sf0.001/region.parquet"
    f2 = "/root/testdata/sf0.001/region.parquet"
    df = qe.sql(f"SELECT count() AS n FROM read_parquet(ARRAY['{f1}', '{f2}'])")
    assert df.collect()[0]["n"] == 10  # both files scanned


def test_query_http_dialect(spark, tmp_path):
    """ClickHouse dialect through the HTTP /query endpoint."""
    import json
    import urllib.request

    from quackpipe_spark.api import GigapiServer

    srv = GigapiServer(spark, str(tmp_path / "root"), port=0)
    srv.start()
    base = f"http://127.0.0.1:{srv._httpd.server_address[1]}"
    try:
        body = (
            b'weather,location=east temperature=70 1717405200\n'
            b'weather,location=east temperature=80 1717405260\n'
        )
        req = urllib.request.Request(
            base + "/write?db=d&precision=s", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 204
        q = {
            "query": "SELECT location, count() AS n, toInt64(round(avg(temperature))) AS t,"
            " toStartOfMinute(from_epoch_ns(min(time))) AS m FROM weather GROUP BY location"
        }
        req = urllib.request.Request(
            base + "/query?db=d", data=json.dumps(q).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            [row] = json.loads(r.read())["results"]
        assert row["location"] == "east" and row["n"] == 2 and row["t"] == 75
        assert row["m"].startswith("2024-06-03")
    finally:
        srv.stop()
