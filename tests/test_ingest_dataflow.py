"""End-to-end dataflow tests: ingest → hive layout → query → compaction.

Covers the reference's own test scenarios (SURVEY §5): dynamic-schema
union with missing columns (TestMerge, merge_test.go:13-48), flush/write
(examples/mil_rows), compaction row preservation, plus the hive layout
and index contracts."""

from __future__ import annotations

import glob
import os

import pytest

from quackpipe_spark.catalog import Catalog
from quackpipe_spark.ingest import IngestService, ingest_lines
from quackpipe_spark.plans.compactor import Compactor, plan_merges
from quackpipe_spark.plans.index import PartitionIndex
from quackpipe_spark.query import QueryEngine

NS = 10**9
T0 = 1_700_000_000 * NS  # 2023-11-14 22:13:20 UTC


@pytest.fixture
def engine(spark, tmp_path):
    catalog = Catalog(str(tmp_path / "gigadata"))
    svc = IngestService(spark, catalog, save_timeout_s=3600)  # manual flush
    return svc, catalog, QueryEngine(spark, catalog)


def test_lineproto_to_query_roundtrip(engine):
    svc, catalog, qe = engine
    lines = "\n".join(
        f"weather,location=us-{d},season=summer temperature={60 + i} {T0 + i * NS}"
        for i, d in enumerate(["midwest", "east", "west", "midwest"])
    )
    promises = ingest_lines(svc, lines, db="mydb")
    svc.flush()
    assert all(p.result(5) for p in promises)

    df = qe.sql("SELECT count(*) AS n, round(avg(temperature), 2) AS avg_t FROM weather", db="mydb")
    row = df.collect()[0]
    assert row["n"] == 4 and row["avg_t"] == 61.5

    by_loc = qe.sql(
        "SELECT location, count() cnt FROM weather GROUP BY location ORDER BY cnt DESC",
        db="mydb",
    ).collect()
    assert by_loc[0]["location"] == "us-midwest" and by_loc[0]["cnt"] == 2


def test_hive_layout_and_index(engine):
    svc, catalog, qe = engine
    # rows spanning two hours → two partition dirs, true hourly bucketing
    h0, h1 = T0, T0 + 3600 * NS
    svc.store("d", "t", {"v": [1, 2], "__timestamp": [h0, h0 + NS]})
    svc.store("d", "t", {"v": [3], "__timestamp": [h1]})
    svc.flush()
    t = catalog.get("d", "t")
    pdirs = t.partition_dirs()
    assert len(pdirs) == 2
    assert all("date=2023-11-1" in p and "hour=" in p for p in pdirs)
    hours = sorted(p.split("hour=")[-1] for p in pdirs)
    assert hours == ["22", "23"]
    for pdir in pdirs:
        idx = PartitionIndex.load(pdir)
        assert idx.files, "index must list the flushed file"
        for entry in idx.files.values():
            assert entry.name.endswith(".1.parquet")
            assert entry.row_count >= 1
            assert entry.min_time >= T0
    # files on disk match the index
    disk = {os.path.basename(p) for p in glob.glob(os.path.join(t.path, "date=*/hour=*/*.parquet"))}
    listed = {e for pdir in pdirs for e in PartitionIndex.load(pdir).files}
    assert disk == listed


def test_dynamic_schema_union_null_fill(engine):
    # TestMerge scenario: alternating batches {a,b} and {b} — readers see
    # NULL a for the rows that lacked it (merge_test.go:29-40).
    svc, catalog, qe = engine
    svc.store("d", "m", {"a": [1, 2], "b": ["x", "y"], "__timestamp": [T0, T0]})
    svc.store("d", "m", {"b": ["z"], "__timestamp": [T0]})
    svc.flush()
    rows = qe.sql("SELECT a, b FROM m", db="d").collect()
    assert len(rows) == 3
    assert sorted([(r["a"], r["b"]) for r in rows], key=str) == sorted(
        [(1, "x"), (2, "y"), (None, "z")], key=str
    )


def test_type_conflict_rejected(engine):
    svc, catalog, qe = engine
    svc.store("d", "c", {"v": [1], "__timestamp": [T0]})
    with pytest.raises(TypeError, match="type conflict"):
        svc.store("d", "c", {"v": ["not an int"], "__timestamp": [T0]})


def test_boolean_supported(engine):
    # strict superset: reference errors on bool ingest (SURVEY §1.2)
    svc, catalog, qe = engine
    svc.store("d", "flags", {"ok": [True, False, None], "__timestamp": [T0] * 3})
    svc.flush()
    rows = qe.sql("SELECT count(*) AS n FROM flags WHERE ok", db="d").collect()
    assert rows[0]["n"] == 1


def test_compaction_preserves_and_levels(engine, spark):
    svc, catalog, qe = engine
    # 5 flushes → 5 level-1 files in one partition
    for i in range(5):
        svc.store("d", "cmp", {"v": [i * 10 + j for j in range(10)], "__timestamp": [T0 + j for j in range(10)]})
        svc.flush()
    t = catalog.get("d", "cmp")
    [pdir] = t.partition_dirs()
    before = PartitionIndex.load(pdir)
    assert len(before.files) == 5
    total_before = qe.sql("SELECT count(*) n, sum(v) s FROM cmp", db="d").collect()[0]

    comp = Compactor(spark, t, drop_delay_s=0.0)
    out = comp.run_once(levels=[1])
    assert len(out) == 1 and out[0].endswith(".2.parquet")

    after = PartitionIndex.load(pdir)
    assert len(after.files) == 1
    [entry] = after.files.values()
    assert entry.row_count == 50
    # tombstoned inputs deleted (drop_delay 0)
    assert not after.drop_queue
    disk = glob.glob(os.path.join(pdir, "*.parquet"))
    assert len(disk) == 1

    total_after = qe.sql("SELECT count(*) n, sum(v) s FROM cmp", db="d").collect()[0]
    assert total_after == total_before

    # merged file is sorted by __timestamp
    import pyarrow.parquet as pq

    ts = pq.read_table(disk[0], columns=["__timestamp"])["__timestamp"].to_pylist()
    assert ts == sorted(ts)

    # idempotence: nothing left to merge
    assert comp.run_once(levels=[1]) == []


def test_query_time_pruning_uses_index(engine):
    svc, catalog, qe = engine
    svc.store("d", "pr", {"v": [1], "__timestamp": [T0]})
    svc.store("d", "pr", {"v": [2], "__timestamp": [T0 + 7200 * NS]})
    svc.flush()
    t = catalog.get("d", "pr")
    all_files = qe.table_files(t)
    assert len(all_files) == 2
    pruned = qe.table_files(t, lo=T0 + 7000 * NS, hi=None)
    assert len(pruned) == 1
    rows = qe.sql(
        f"SELECT count(*) AS n FROM pr WHERE __timestamp >= {T0 + 7000 * NS}", db="d"
    ).collect()
    assert rows[0]["n"] == 1


def test_auto_timestamp_added(engine):
    svc, catalog, qe = engine
    svc.store("d", "auto", {"v": [5]})
    svc.flush()
    rows = qe.sql("SELECT __timestamp FROM auto", db="d").collect()
    assert rows[0]["__timestamp"] > 1_600_000_000 * NS


def test_create_table_ddl_types():
    # explicit CREATE TABLE surface (A25): alias resolution + rejection
    from quackpipe_spark.types import resolve

    assert resolve("BIGINT") == "INT8"
    assert resolve("UInt64") == "UBIGINT"
    assert resolve("text") == "VARCHAR"
    with pytest.raises(ValueError):
        resolve("GEOMETRY")


def test_compaction_cascade_many_files(engine, spark):
    """40 level-1 files cascade L1→L2→L3 with counts/sums preserved and
    the terminal file time-sorted — the multi-generation shape a steady
    ingest stream produces (reference cadences: 10s/100s/1000s tiers)."""
    svc, catalog, qe = engine
    n_flush, rows = 40, 25
    for i in range(n_flush):
        svc.store(
            "d",
            "cascade",
            {
                "v": [i * rows + j for j in range(rows)],
                "__timestamp": [T0 + (i * rows + j) * 1000 for j in range(rows)],
            },
        )
        svc.flush()
    t = catalog.get("d", "cascade")
    [pdir] = t.partition_dirs()
    assert len(PartitionIndex.load(pdir).files) == n_flush
    before = qe.sql("SELECT count(*) n, sum(v) s FROM cascade", db="d").collect()[0]

    comp = Compactor(spark, t, drop_delay_s=0.0)
    comp.run_once(levels=[1])
    comp.run_once(levels=[2])
    comp.run_once(levels=[3])
    after_idx = PartitionIndex.load(pdir)
    # everything packed into generation >= 2, far fewer files than inputs
    assert len(after_idx.files) < n_flush / 4
    levels = {int(name.rsplit(".", 2)[-2]) for name in after_idx.files}
    assert min(levels) >= 2

    after = qe.sql("SELECT count(*) n, sum(v) s FROM cascade", db="d").collect()[0]
    assert after == before
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    for f in _glob.glob(_os.path.join(pdir, "*.parquet")):
        ts = pq.read_table(f, columns=["__timestamp"])["__timestamp"].to_pylist()
        assert ts == sorted(ts)


def test_db_table_names_validated(engine):
    """db/table names become filesystem path components from the HTTP
    surface — traversal and absolute paths must be rejected before any
    directory is touched."""
    svc, catalog, qe = engine
    for bad_db, bad_t in [
        ("../../evil", "t"),
        ("d", "../x"),
        ("d", "/etc/cron.d/x"),
        ("", "t"),
        ("d", "a/b"),
    ]:
        with pytest.raises(ValueError, match="invalid"):
            catalog.get_or_create(bad_db, bad_t)
    # dots/dashes/leading-dot SANITIZE to '_' (r13, ADVICE r12): Spark
    # can't register such names as temp views, but rejecting them broke
    # ingest continuity for graphite-style measurement names — the write
    # door now routes them to the word-char spelling. '/' is never in
    # the sanitize map, so the traversal attempts above still reject.
    for raw_db, raw_t, want in [
        ("db-1", "t", "t"),
        ("d", "my.table_2", "my_table_2"),
        ("d", ".hidden", "_hidden"),
    ]:
        assert catalog.get_or_create(raw_db, raw_t).name == want
    # word-char names (digits, underscore) still fine
    t = catalog.get_or_create("db_1", "my_table_2")
    assert t.name == "my_table_2"


def test_partition_column_names_reserved(engine):
    """A user column named date/hour would be clobbered by (bulk path) or
    collide at read time with (arrow path) the derived hive partition
    columns — rejected at schema time on both create and evolve."""
    svc, catalog, qe = engine
    with pytest.raises(ValueError, match="reserved"):
        catalog.get_or_create("d", "rsv", fields={"date": "VARCHAR"})
    t = catalog.get_or_create("d", "rsv2")
    with pytest.raises(ValueError, match="reserved"):
        catalog.update_schema(t, {"hour": "VARCHAR"})
    # flat Merge tables have no derived partitions — date is a fine name
    flat = catalog.get_or_create("d", "flat_ok", fields={"date": "VARCHAR"}, engine="Merge")
    assert flat.schema["date"] == "VARCHAR"


def test_uint64_overflow_falls_back_not_crashes(engine):
    """pa.array raises OverflowError (not ArrowInvalid) for ints >= 2^63;
    the flush must take the pandas fallback, not fail the whole buffer."""
    svc, catalog, qe = engine
    svc.store("d", "big", {"v": [2**63 + 5], "__timestamp": [T0]})
    svc.flush()
    rows = qe.sql("SELECT count(*) AS n FROM big", db="d").collect()
    assert rows[0]["n"] == 1


def test_bulk_write_partition_labels_utc_and_pre_epoch(engine, spark):
    """write_df's date/hour labels must be UTC floor-of-hour regardless of
    session timezone mutations and correct pre-1970 (DIV truncation would
    mislabel -1ns as 1970-01-01/00)."""
    svc, catalog, qe = engine
    t = catalog.get_or_create("d", "tz")
    catalog.update_schema(t, {"__timestamp": "INT8", "v": "INT8"})
    df = spark.createDataFrame(
        [(-1, 1), (3_600_000_000_000, 2)], "__timestamp long, v long"
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        svc.writer.write_df(t, df, level=1)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    import glob as _g

    dirs = sorted(
        os.path.relpath(p, t.path)
        for p in _g.glob(os.path.join(t.path, "date=*", "hour=*"))
    )
    assert dirs == ["date=1969-12-31/hour=23", "date=1970-01-01/hour=01"]


def test_all_null_new_column_defers_typing(engine):
    """An all-null column with no prior type evidence is excluded from the
    write (union-by-name null-fills it identically) instead of being
    locked in as VARCHAR, so the first typed batch establishes the type."""
    svc, catalog, qe = engine
    svc.store("d", "nulls", {"x": [None], "__timestamp": [T0]})
    svc.flush()
    assert "x" not in catalog.get("d", "nulls").schema
    svc.store("d", "nulls", {"x": [5], "__timestamp": [T0 + NS]})
    svc.flush()
    assert catalog.get("d", "nulls").schema["x"] == "INT8"
    rows = {
        r["__timestamp"]: r["x"]
        for r in qe.sql("SELECT __timestamp, x FROM nulls", db="d").collect()
    }
    assert rows[T0] is None and rows[T0 + NS] == 5
