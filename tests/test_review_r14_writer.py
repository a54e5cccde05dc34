"""Regression tests for the r14 writer/compactor review findings
(two-phase _commit, merge-publish rollback, NULL-time backfills,
tmp-dir sweep)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from quackpipe_spark.catalog import Catalog
from quackpipe_spark.writer import HiveWriter, PartialWriteError


def _mk_table(spark, tmp_path, name="t"):
    cat = Catalog(str(tmp_path / "root"))
    w = HiveWriter(spark, cat)
    return cat, w


def _bulk_df(spark, hours):
    """One row per requested hour (distinct partition dirs)."""
    H = 3_600_000_000_000
    rows = [(i, h * H + 5) for i, h in enumerate(hours)]
    return spark.createDataFrame(rows, "v long, __timestamp long")


def test_commit_failure_before_any_save_is_retryable_and_rolls_back(
    spark, tmp_path, monkeypatch
):
    """A failure in the FIRST partition dir before its index save must
    re-raise the plain error (client 400 = safely retryable: nothing
    committed) and roll the dir's renames back — no live un-indexed
    orphans."""
    import quackpipe_spark.writer as wmod

    cat, w = _mk_table(spark, tmp_path)
    boom = RuntimeError("disk exploded")
    real = wmod.pq.read_metadata

    def bad_meta(path, *a, **k):
        raise boom

    monkeypatch.setattr(wmod.pq, "read_metadata", bad_meta)
    with pytest.raises(RuntimeError, match="disk exploded"):
        w.write_parsed_df("d", "t", _bulk_df(spark, [1, 2]))
    monkeypatch.setattr(wmod.pq, "read_metadata", real)
    t = cat.get("d", "t")
    live = [
        f
        for root, _d, files in os.walk(t.path)
        for f in files
        if f.endswith(".parquet") and "tmp" not in root
    ]
    assert live == [], f"orphaned live files: {live}"
    # and the same write retried cleanly succeeds
    out = w.write_parsed_df("d", "t", _bulk_df(spark, [1, 2]))
    assert len(out) == 2


def test_commit_failure_after_first_dir_is_partial_write(
    spark, tmp_path, monkeypatch
):
    """A failure AFTER the first partition dir committed must raise
    PartialWriteError (the HTTP door's non-retryable 422) — a blind
    retry would duplicate the committed dir."""
    import quackpipe_spark.writer as wmod

    cat, w = _mk_table(spark, tmp_path)
    real = wmod.pq.read_metadata
    calls = {"n": 0}

    def flaky_meta(path, *a, **k):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("failed in second dir")
        return real(path, *a, **k)

    monkeypatch.setattr(wmod.pq, "read_metadata", flaky_meta)
    with pytest.raises(PartialWriteError, match="committed"):
        w.write_parsed_df("d", "t", _bulk_df(spark, [1, 2, 3]))


def test_merge_publish_rolls_back_on_preindex_failure(
    spark, tmp_path, monkeypatch
):
    """compactor._execute: a failure between the merged file's rename and
    the index swap must unlink the orphan (inputs stay indexed, the next
    tick re-merges cleanly) — previously the full-size orphan stayed and
    was re-created every tick."""
    import pyarrow.parquet as papq

    from quackpipe_spark.plans.compactor import Compactor
    from quackpipe_spark.plans.index import PartitionIndex

    cat, w = _mk_table(spark, tmp_path)
    # two L1 files in one partition → one merge plan
    for _ in range(2):
        w.write_parsed_df("d", "t", _bulk_df(spark, [1]))
    t = cat.get("d", "t")
    comp = Compactor(spark, t, drop_delay_s=0.0)
    real = papq.read_metadata

    def bad_meta(path, *a, **k):
        raise RuntimeError("corrupt footer")

    # _execute imports pyarrow.parquet locally — patch the module attr
    monkeypatch.setattr(papq, "read_metadata", bad_meta)
    with pytest.raises(Exception):
        comp.run_once()
    monkeypatch.setattr(papq, "read_metadata", real)
    pdir = t.partition_dirs()[0]
    idx = PartitionIndex.load(pdir)
    on_disk = {f for f in os.listdir(pdir) if f.endswith(".parquet")}
    indexed = set(idx.files)  # dict name -> FileEntry
    assert on_disk == indexed, f"orphans: {on_disk - indexed}"
    # the next tick merges cleanly
    out = comp.run_once()
    assert out, "re-merge after rollback must succeed"


def test_write_parsed_df_null_times_fill_or_refuse(spark, tmp_path):
    """NULL rows in the time column previously landed in
    date=__HIVE_DEFAULT_PARTITION__ (never pruned, never matched).
    auto_timestamp on → arrival-ns fill like write_columnar; off →
    loud refusal with nothing committed."""
    cat, w = _mk_table(spark, tmp_path)
    df = spark.createDataFrame(
        [(1, 3_600_000_000_000), (2, None)], "v long, __timestamp long"
    )
    w.write_parsed_df("d", "filled", df)
    t = cat.get("d", "filled")
    assert not any(
        "__HIVE_DEFAULT_PARTITION__" in d for d in os.listdir(t.path)
    )
    got = (
        spark.read.parquet(f"{t.path}/date=*/hour=*/*.parquet")
        .where(F.col("__timestamp").isNull())
        .count()
    )
    assert got == 0

    t2 = cat.get_or_create("d", "strict", fields={"v": "INT8", "__timestamp": "INT8"})
    t2.auto_timestamp = False
    with pytest.raises(Exception, match="null values in time column"):
        w.write_parsed_df("d", "strict", df)
    live = [
        f
        for root, _d, files in os.walk(t2.path)
        for f in files
        if f.endswith(".parquet") and "tmp" not in root
    ]
    assert live == []


def test_compactor_sweeps_stale_tmp_entries(spark, tmp_path):
    """Crashed writes leave uuid stage dirs in tmp/ forever; the merge
    ticker now sweeps entries older than the age guard and leaves fresh
    (possibly in-flight) ones alone."""
    from quackpipe_spark.plans.compactor import Compactor

    cat, w = _mk_table(spark, tmp_path)
    w.write_parsed_df("d", "t", _bulk_df(spark, [1]))
    t = cat.get("d", "t")
    stale = os.path.join(t.tmp_dir(), "deadbeef-stale")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-0.parquet"), "wb") as f:
        f.write(b"junk")
    old = time.time() - 7200
    # age the WHOLE tree: the sweep age signal is the newest mtime found
    # anywhere under the entry (a live bulk write touches nested files
    # without touching the top dir — ADVICE r15), so a genuinely crashed
    # stage presents all-old mtimes, not just an old top dir
    os.utime(os.path.join(stale, "part-0.parquet"), (old, old))
    os.utime(stale, (old, old))
    fresh = os.path.join(t.tmp_dir(), "fresh.parquet")
    with open(fresh, "wb") as f:
        f.write(b"inflight")
    Compactor(spark, t, drop_delay_s=0.0).run_once()
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)
