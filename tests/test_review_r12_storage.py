"""Regression tests for the round-12 storage/serving review findings:
uint64 typing must be row-order-independent; INT8↔UBIGINT is a widening,
not a conflict; unqueryable table names reject at the WRITE door; order_by
inputs validate; the flush commit is two-phase (nothing published on a
staging failure, PartialWriteError after a partial publish); the hour
split is a stable linear slice; a buffer-full store flushes only its own
table."""

from __future__ import annotations

import glob
import os

import pytest

T0 = 1_700_000_000_000_000_000  # 2023-11-14T22:13:20Z, ns
BIG = (1 << 63) + 7  # uint64 upper half (line protocol '...u')


def _mk(spark, tmp_path):
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.writer import HiveWriter

    cat = Catalog(str(tmp_path / "data"))
    return cat, HiveWriter(spark, cat)


def _read_back(spark, tmp_path, db, t):
    return (
        spark.read.option("mergeSchema", "true")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "data" / db / t))
    )


def test_uint64_mixed_batch_is_order_independent(spark, tmp_path):
    """One batch carrying [5, 2^63+7] (both legal 'u' values — the suffix
    is value-erased by parse time) must register UBIGINT and flush: typing
    from the FIRST value alone registered INT8 and the later upper-half
    value killed the whole flush, making the outcome depend on row order."""
    cat, w = _mk(spark, tmp_path)
    w.write_columnar("db", "m", {"__timestamp": [T0, T0 + 1], "x": [5, BIG]})
    assert cat.get("db", "m").schema["x"] == "UBIGINT"
    rows = {r["__timestamp"]: r["x"] for r in _read_back(spark, tmp_path, "db", "m").collect()}
    assert rows[T0] == 5
    assert rows[T0 + 1] == BIG - (1 << 64)  # documented two's-complement wrap


def test_uint64_across_batches_widens_not_conflicts(spark, tmp_path):
    """Batch 1 all-small ints registers INT8; batch 2's upper-half value
    WIDENS the column to UBIGINT (same int64 physical slot, reference
    parity) instead of 400ing — and the reverse order keeps UBIGINT."""
    cat, w = _mk(spark, tmp_path)
    w.write_columnar("db", "a", {"__timestamp": [T0], "x": [5]})
    assert cat.get("db", "a").schema["x"] == "INT8"
    w.write_columnar("db", "a", {"__timestamp": [T0 + 1], "x": [BIG]})  # was TypeError
    assert cat.get("db", "a").schema["x"] == "UBIGINT"
    assert _read_back(spark, tmp_path, "db", "a").count() == 2
    # reverse: established UBIGINT accepts small-int batches unchanged
    w.write_columnar("db", "b", {"__timestamp": [T0], "x": [BIG]})
    w.write_columnar("db", "b", {"__timestamp": [T0 + 1], "x": [5]})
    assert cat.get("db", "b").schema["x"] == "UBIGINT"
    # a REAL conflict still rejects
    with pytest.raises(TypeError, match="type conflict"):
        w.write_columnar("db", "b", {"__timestamp": [T0 + 2], "x": ["s"]})


def test_unqueryable_table_names_sanitize_at_write(spark, tmp_path):
    """Names Spark can't register as temp views (dots = multi-part name,
    dashes/spaces = invalid identifier) must not reach disk verbatim —
    previously 'cpu.load' ingested fine and then EVERY query of it failed
    forever. r13 (ADVICE r12): measurement punctuation SANITIZES to '_'
    (ingest continuity for graphite-style clients) instead of 400ing;
    names that stay invalid after sanitation still reject."""
    from quackpipe_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "data"))
    # punctuation routes to the word-char spelling
    for raw in ["cpu.load", "cpu-load", "cpu load", ".hidden"]:
        t = cat.get_or_create("db", raw)
        assert t.name in ("cpu_load", "_hidden")
    # still-invalid after sanitation (slashes, empty) rejects
    for bad in ["", "a/b", "../.."]:
        with pytest.raises(ValueError, match="invalid"):
            cat.get_or_create("db", bad)
        with pytest.raises(ValueError, match="invalid"):
            cat.get_or_create(bad, "t")
    assert cat.get_or_create("db", "cpu_load").name == "cpu_load"


def test_order_by_scalar_coerced_and_bad_shapes_rejected(spark, tmp_path):
    """The natural YAML spelling `order_by: ts` is a one-column key, not a
    character sequence — previously time_column became 't' (the first
    CHARACTER) and writes silently mis-bucketed."""
    from quackpipe_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "data"))
    t = cat.get_or_create("db", "scalar_ob", order_by="ts")
    assert t.order_by == ["ts"]
    for bad in (7, [1, 2], [], [""], {"c": 1}):
        with pytest.raises(ValueError, match="order_by"):
            cat.get_or_create("db", f"bad_ob_{type(bad).__name__}{len(str(bad))}", order_by=bad)


def test_staging_failure_publishes_nothing(spark, tmp_path, monkeypatch):
    """A failure while STAGING a multi-partition flush must leave zero
    live files (retry-safe 400) and no staged temp litter."""
    import pyarrow.parquet as pq_mod

    from quackpipe_spark import writer as writer_mod

    cat, w = _mk(spark, tmp_path)
    calls = {"n": 0}
    real = pq_mod.write_table

    def failing(table, path, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("disk full")
        return real(table, path, **kw)

    monkeypatch.setattr(writer_mod.pq, "write_table", failing)
    hours = [T0, T0 + 3_600_000_000_000, T0 + 7_200_000_000_000]
    with pytest.raises(OSError, match="disk full"):
        w.write_columnar("db", "st", {"__timestamp": hours, "x": [1, 2, 3]})
    troot = str(tmp_path / "data" / "db" / "st")
    assert glob.glob(os.path.join(troot, "date=*", "hour=*", "*.parquet")) == []
    assert glob.glob(os.path.join(troot, "tmp", "*")) == []


def test_index_failure_on_first_partition_rolls_back_rename(spark, tmp_path, monkeypatch):
    """An index-upsert failure AFTER the rename must unlink the renamed
    file: committed-ness is decided at the index upsert (readers resolve
    through the index), and a live-but-unindexed file would leak as an
    orphan that a blind retry duplicates for direct-directory consumers
    (review r12 follow-up). First-partition failure → bare retry-safe
    error, ZERO live files."""
    from quackpipe_spark import writer as writer_mod

    cat, w = _mk(spark, tmp_path)
    real = writer_mod.locked_index
    calls = {"n": 0}

    def failing(live_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("index io error")
        return real(live_dir)

    monkeypatch.setattr(writer_mod, "locked_index", failing)
    hours = [T0, T0 + 3_600_000_000_000]
    with pytest.raises(OSError, match="index io error"):
        w.write_columnar("db", "rb", {"__timestamp": hours, "x": [1, 2]})
    troot = str(tmp_path / "data" / "db" / "rb")
    assert glob.glob(os.path.join(troot, "date=*", "hour=*", "*.parquet")) == []
    assert glob.glob(os.path.join(troot, "tmp", "*")) == []
    # retry is now safe and writes everything exactly once
    w.write_columnar("db", "rb", {"__timestamp": hours, "x": [1, 2]})
    assert len(glob.glob(os.path.join(troot, "date=*", "hour=*", "*.parquet"))) == 2


def test_partial_publish_raises_partial_write_error(spark, tmp_path, monkeypatch):
    """A failure AFTER the first partition published must raise
    PartialWriteError (HTTP maps it to non-retryable 422) — a
    plain 400 invited a retry that duplicated the committed partition."""
    from quackpipe_spark.writer import HiveWriter, PartialWriteError

    cat, w = _mk(spark, tmp_path)
    real = HiveWriter._publish_part
    calls = {"n": 0}

    def failing(self, table, rel, newname, tmp, at, tcol):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("index io error")
        return real(self, table, rel, newname, tmp, at, tcol)

    monkeypatch.setattr(HiveWriter, "_publish_part", failing)
    hours = [T0, T0 + 3_600_000_000_000, T0 + 7_200_000_000_000]
    with pytest.raises(PartialWriteError, match="1/3 partitions committed"):
        w.write_columnar("db", "pp", {"__timestamp": hours, "x": [1, 2, 3]})
    troot = str(tmp_path / "data" / "db" / "pp")
    live = glob.glob(os.path.join(troot, "date=*", "hour=*", "*.parquet"))
    assert len(live) == 1  # exactly the committed partition
    assert glob.glob(os.path.join(troot, "tmp", "*")) == []  # rest cleaned


def test_multi_hour_batch_splits_correctly(spark, tmp_path):
    """The stable-argsort hour split (replacing the O(rows × hours)
    per-unique filter) routes every row to its true hour dir with
    in-partition time order preserved."""
    H = 3_600_000_000_000
    ts = [T0 + 2 * H, T0, T0 + H, T0 + 1, T0 + 2 * H + 5, T0 + H + 3]
    cat, w = _mk(spark, tmp_path)
    w.write_columnar("db", "mh", {"__timestamp": ts, "x": list(range(6))})
    troot = str(tmp_path / "data" / "db" / "mh")
    hour_dirs = sorted(glob.glob(os.path.join(troot, "date=*", "hour=*")))
    assert len(hour_dirs) == 3
    import pyarrow.parquet as pq_mod

    seen = []
    for d in hour_dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1
        col = pq_mod.read_table(files[0]).column("__timestamp").to_pylist()
        assert col == sorted(col)  # sorted run within the partition
        assert len({c // H for c in col}) == 1  # one hour per file
        seen.extend(col)
    assert sorted(seen) == sorted(ts)


def test_partition_index_tolerates_unknown_entry_fields(tmp_path):
    """A metadata.json entry carrying a field this version doesn't know
    (newer engine, richer reference layout) must not brick every read and
    write of the partition (review r12 follow-up)."""
    import json

    from quackpipe_spark.plans.index import PartitionIndex, locked_index

    d = str(tmp_path)
    with open(f"{d}/metadata.json", "w") as f:
        json.dump(
            {
                "files": {
                    "a.1.parquet": {
                        "name": "a.1.parquet",
                        "size_bytes": 10,
                        "row_count": 2,
                        "min_time": 1,
                        "max_time": 9,
                        "compression_codec": "zstd",  # unknown field
                    }
                },
                "drop_queue": {},
            },
            f,
        )
    idx = PartitionIndex.load(d)
    assert idx.files["a.1.parquet"].row_count == 2
    with locked_index(d) as li:  # the write path survives too
        assert "a.1.parquet" in li.files


def test_buffer_full_store_flushes_only_its_table(spark, tmp_path):
    """Crossing max_buffered_rows on table A must not drag table B's
    buffer onto the ingesting thread — B stays buffered for the timer."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.ingest import IngestService

    cat = Catalog(str(tmp_path / "data"))
    svc = IngestService(spark, cat, save_timeout_s=3600, max_buffered_rows=3)
    svc.store("d", "bb", {"v": [1], "__timestamp": [T0]})
    pa_ = svc.store("d", "aa", {"v": [1, 2, 3], "__timestamp": [T0, T0 + 1, T0 + 2]})
    assert pa_.result(10) == 3  # A flushed inline (buffer-full)
    aroot = str(tmp_path / "data" / "d" / "aa")
    broot = str(tmp_path / "data" / "d" / "bb")
    assert glob.glob(os.path.join(aroot, "date=*", "hour=*", "*.parquet"))
    assert not glob.glob(os.path.join(broot, "date=*", "hour=*", "*.parquet"))
    assert svc.flush() == 1  # B written by the sweep, nothing lost
    assert glob.glob(os.path.join(broot, "date=*", "hour=*", "*.parquet"))
