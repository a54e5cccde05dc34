"""NDJSON ingest path + background merge ticker integration."""

from __future__ import annotations

import glob
import json
import os
import time
import urllib.request

import pytest

from quackpipe_spark.sources.ndjson import parse_ndjson


def test_parse_ndjson_batching_and_types():
    text = "\n".join(
        [
            '{"a": 1, "b": "x"}',
            '{"a": 2, "b": "y"}',
            '{"a": 2.5, "b": "z"}',  # a changes int→float → new batch
            '{"a": 3, "b": "w", "c": true}',  # new column → new batch
        ]
    )
    batches = parse_ndjson(text, table="t")
    assert [b.num_rows() for b in batches] == [2, 1, 1]
    assert batches[0].data == {"a": [1, 2], "b": ["x", "y"]}
    assert batches[2].data["c"] == [True]


def test_all_null_ndjson_row_still_writes(spark, tmp_path):
    """An ndjson line whose values are ALL null must write one
    auto-timestamped row, not vanish behind a success ack."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.ingest import IngestService
    from quackpipe_spark.sources.ndjson import ingest_ndjson

    cat = Catalog(str(tmp_path / "root"))
    svc = IngestService(spark, cat, save_timeout_s=3600)
    try:
        # batch parse: the all-null line is a 1-row column-less batch
        batches = parse_ndjson('{"a": null}\n{"a": 7}', table="t")
        assert [b.num_rows() for b in batches] == [1, 1]
        assert batches[0].data == {}
        promises = ingest_ndjson(svc, '{"a": null}\n{"a": 7}', table="nulls")
        svc.flush()
        assert all(p.result(timeout=5) is not None for p in promises)
        files = glob.glob(str(tmp_path / "root" / "default" / "nulls" / "**" / "*.parquet"), recursive=True)
        assert files
        df = spark.read.parquet(*files)
        assert df.count() == 2  # both rows landed
        assert df.filter("a IS NULL").count() == 1
        assert df.filter("__timestamp IS NOT NULL").count() == 2
    finally:
        svc.stop()


def test_parse_ndjson_rejects_nested_and_non_object():
    with pytest.raises(TypeError, match="nested"):
        parse_ndjson('{"a": {"deep": 1}}')
    with pytest.raises(ValueError, match="object"):
        parse_ndjson("[1,2,3]")


def test_http_ndjson_roundtrip_and_merge_ticker(spark, tmp_path):
    from quackpipe_spark.api import GigapiServer
    from quackpipe_spark.plans.index import PartitionIndex

    srv = GigapiServer(spark, str(tmp_path / "root"), port=0, merge_timeout_s=2.0)
    srv.ingest.save_timeout_s = 0.5
    srv.start()
    base = f"http://127.0.0.1:{srv._httpd.server_address[1]}"
    try:
        ts = 1_700_000_000_000_000_000
        # several writes → several level-1 files in one partition
        for i in range(3):
            body = "\n".join(
                json.dumps({"v": i * 10 + j, "__timestamp": ts + j}) for j in range(5)
            ).encode()
            req = urllib.request.Request(
                base + "/gigapi/insert?db=nd&table=m",
                data=body,
                headers={"Content-Type": "application/x-ndjson"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                assert resp.status == 204

        t = srv.catalog.get("nd", "m")
        assert t is not None
        [pdir] = t.partition_dirs()
        assert len(PartitionIndex.load(pdir).files) == 3

        # ticker fires (2s cadence) → level-1 files merge into level-2.
        # A straggler flush can miss the first merge window and legitimately
        # leave {one .2, one lone .1} (a single L1 file waits for peers, as
        # in the reference) — assert the real invariants: a merge happened,
        # fewer files than flushes, and no rows lost.
        deadline = time.time() + 60
        while time.time() < deadline:
            idx = PartitionIndex.load(pdir)
            if any(n.endswith(".2.parquet") for n in idx.files):
                break
            time.sleep(0.5)
        idx = PartitionIndex.load(pdir)
        assert any(n.endswith(".2.parquet") for n in idx.files)
        assert len(idx.files) < 3
        assert sum(e.row_count for e in idx.files.values()) == 15

        # data intact through the query path after compaction
        status_body = json.dumps({"query": "SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS s FROM m"}).encode()
        req = urllib.request.Request(base + "/query?db=nd", data=status_body, method="POST")
        with urllib.request.urlopen(req, timeout=60) as resp:
            [row] = json.loads(resp.read())["results"]
        assert row["n"] == 15 and row["s"] == sum(i * 10 + j for i in range(3) for j in range(5))
    finally:
        srv.stop()
