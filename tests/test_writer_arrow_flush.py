"""Arrow-direct flush (r7) vs the pandas fallback route: both must write
identical rows, identical per-hour partitioning, identical sorted order
(stable ties), and identical index stats — the fallback exists only for
odd coercions, not different semantics."""

from __future__ import annotations

import os

import pyarrow.parquet as papq
import pytest

from quackpipe_spark.catalog import Catalog
from quackpipe_spark.writer import HiveWriter


H = 3_600_000_000_000
T0 = 1_700_000_000_000_000_123  # sub-µs bits: float64 would round these


def _batch():
    # two hour buckets, ties on the order-by key, nulls in value columns
    ts = [T0, T0 + H, T0, T0 + H + 5, T0 + 1, T0]
    return {
        "__timestamp": ts,
        "value": [1.5, None, 2.5, 3.5, None, 4.5],
        "str": ["a", "b", None, "d", "e", "f"],
    }


def _read_all(root):
    out = {}
    for dirpath, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                rel = os.path.relpath(dirpath, root)
                out.setdefault(rel, []).append(
                    papq.read_table(os.path.join(dirpath, f)).to_pylist()
                )
    return out


@pytest.mark.parametrize("route", ["arrow", "pandas"])
def test_both_routes_write_identical_content(spark, tmp_path, route):
    cat = Catalog(str(tmp_path / route))
    w = HiveWriter(spark, cat)
    data = _batch()
    table = cat.get_or_create("db", "t")
    from quackpipe_spark.writer import effective_schema, infer_schema

    cat.get_or_create("db", "t", fields=infer_schema(data))
    schema = effective_schema(table, data)
    if route == "arrow":
        files = w._write_columnar_arrow(table, data, schema)
    else:
        files = w._write_columnar_pandas(table, data, schema)
    assert len(files) == 2  # one file per hour partition
    content = _read_all(table.path)
    # drop the metadata.json-only dirs
    content = {k: v for k, v in content.items() if v}
    assert len(content) == 2
    assert sum(len(rows) for v in content.values() for rows in v) == 6


def test_routes_agree(spark, tmp_path):
    results = {}
    for route in ("arrow", "pandas"):
        cat = Catalog(str(tmp_path / route))
        w = HiveWriter(spark, cat)
        data = _batch()
        from quackpipe_spark.writer import effective_schema, infer_schema

        table = cat.get_or_create("db", "t", fields=infer_schema(data))
        schema = effective_schema(table, data)
        fn = w._write_columnar_arrow if route == "arrow" else w._write_columnar_pandas
        fn(table, data, schema)
        results[route] = {
            os.path.relpath(d, table.path): [
                papq.read_table(os.path.join(d, f)).to_pylist()
                for f in sorted(fs)
                if f.endswith(".parquet")
            ]
            for d, _x, fs in os.walk(table.path)
            if any(f.endswith(".parquet") for f in fs)
        }
    assert set(results["arrow"]) == set(results["pandas"])
    for rel in results["arrow"]:
        assert results["arrow"][rel] == results["pandas"][rel], rel


def test_arrow_route_index_stats_match(spark, tmp_path):
    from quackpipe_spark.plans.index import PartitionIndex
    from quackpipe_spark.writer import effective_schema, infer_schema

    cat = Catalog(str(tmp_path / "stats"))
    w = HiveWriter(spark, cat)
    data = _batch()
    table = cat.get_or_create("db", "t", fields=infer_schema(data))
    w._write_columnar_arrow(table, data, effective_schema(table, data))
    seen = 0
    for dirpath, _d, files in os.walk(table.path):
        if "metadata.json" in files:
            idx = PartitionIndex.load(dirpath)
            for e in idx.files.values():
                seen += 1
                assert e.row_count in (2, 4)
                assert e.min_time is not None and e.max_time is not None
                assert e.min_time % 10 in (1, 3)  # exact ns survive (…123/…128/…124)
    assert seen == 2
