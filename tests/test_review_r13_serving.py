"""Regression tests for the round-13 serving-core review findings
(all execution-confirmed before fixing): parenthesized relations
defeating the pruning self-join guard and the plan-cache pin, a
backticked `where` column opening a phantom WHERE scope, sign-flipped
pre-epoch fractional bounds, trailing-semicolon pruning loss, and the
index save() proceeding past a failed fsync."""

from __future__ import annotations

import pytest

from quackpipe_spark.query import _ts_literal_ns, extract_time_bounds_per_table


def test_paren_join_relations_refuse_pruning():
    """`FROM (events e1 JOIN events e2 ON …)` declares relations
    _FROM_JOIN cannot see — the self-join reference count undercounts
    and a qualified bound on one alias would prune the shared view the
    other alias still reads. The shape must refuse pruning outright
    (same stance as the legacy comma join)."""
    q = (
        "SELECT * FROM (events e1 JOIN events e2 ON e1.event_id = e2.event_id) "
        "WHERE e2.__timestamp >= 1000"
    )
    assert extract_time_bounds_per_table(q, ["events"]) == {}
    # unparenthesized control: the self-join guard already refuses
    q2 = (
        "SELECT * FROM events e1 JOIN events e2 ON e1.event_id = e2.event_id "
        "WHERE e2.__timestamp >= 1000"
    )
    assert extract_time_bounds_per_table(q2, ["events"]) == {}
    # plain single-relation control still prunes
    q3 = "SELECT * FROM events WHERE __timestamp >= 1000"
    assert extract_time_bounds_per_table(q3, ["events"]) == {"events": (1000, None)}
    # subquery parens are NOT the newly-refused shape: the derived-table
    # path's own guards decide (refusing is always safe; the key point is
    # the paren-REL guard doesn't misfire on `FROM (SELECT`)
    q4 = "SELECT * FROM (SELECT * FROM events WHERE __timestamp >= 7) t"
    assert extract_time_bounds_per_table(q4, ["events"]) in ({}, {"events": (7, None)})


def test_paren_temp_view_not_plan_cacheable(spark, tmp_path):
    """`FROM (my_temp_view)` hid the view name from the cacheability
    scan: the query was judged cacheable with the view's contents
    unpinned, so redefining the view kept serving the old plan."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.query import QueryEngine

    qe = QueryEngine(spark, Catalog(str(tmp_path / "root")))
    assert qe._plan_cacheable("SELECT * FROM (my_temp_view) WHERE x = 1", set()) is False
    assert qe._plan_cacheable("SELECT * FROM my_temp_view WHERE x = 1", set()) is False
    # catalog-table queries stay cacheable
    assert qe._plan_cacheable("SELECT * FROM events WHERE x = 1", {"events"}) is True


def test_backticked_where_column_opens_no_phantom_scope():
    """A projected column named `where` (plain-word backtick contents
    stay visible after blanking) must not shift the WHERE scope into the
    SELECT list — a projected boolean is not a row filter."""
    q = "SELECT `where`, a AND __timestamp >= 5 AND b FROM events WHERE c = 1"
    assert extract_time_bounds_per_table(q, ["events"]) == {}
    # the real WHERE keyword still opens the scope
    q2 = "SELECT `where`, x FROM events WHERE __timestamp >= 5"
    assert extract_time_bounds_per_table(q2, ["events"]) == {"events": (5, None)}


def test_trailing_semicolon_keeps_pruning():
    """Spark accepts a trailing ';'; leaving it inside the WHERE scope
    failed the conjunct's scope-end check and silently disabled pruning
    for every copy-pasted query."""
    q = "SELECT * FROM events WHERE __timestamp >= 1000;"
    assert extract_time_bounds_per_table(q, ["events"]) == {"events": (1000, None)}
    q2 = "SELECT * FROM events WHERE __timestamp >= 1000 AND __timestamp < 2000 ;"
    # strict `<` keeps hi at the literal (conservative: a file with
    # min_time == hi is kept though the predicate excludes it)
    assert extract_time_bounds_per_table(q2, ["events"]) == {"events": (1000, 2000)}


def test_pre_epoch_fractional_literal_floors():
    """int(dt.timestamp()) truncated toward zero: a fractional pre-epoch
    literal came back sign-flipped (+0.5 s instead of -0.5 s) and pruned
    files still satisfying the true predicate."""
    assert _ts_literal_ns("epoch_ns('1969-12-31 23:59:59.5')") == -500_000_000
    assert _ts_literal_ns("epoch_ns('1970-01-01 00:00:00.5')") == 500_000_000
    assert _ts_literal_ns("epoch_ns('1969-12-31 23:59:59')") == -1_000_000_000
    assert _ts_literal_ns("epoch_ns('2024-06-01 12:00:00.25')") == (
        1_717_243_200_000_000_000 + 250_000_000
    )


def test_index_save_aborts_on_fsync_failure(tmp_path, monkeypatch):
    """A failed fsync must ABORT the save (keeping the old index), never
    proceed to the rename: Linux clears the dirty state after reporting
    EIO, so renaming anyway publishes a metadata.json whose data blocks
    may never reach disk — the empty-index-after-power-loss hazard."""
    import os

    from quackpipe_spark.plans.index import FileEntry, PartitionIndex

    pdir = str(tmp_path / "p")
    os.makedirs(pdir)
    idx = PartitionIndex(pdir)
    idx.add(FileEntry(name="a.1.parquet", size_bytes=10, row_count=1))
    idx.save()

    real_fsync = os.fsync

    def failing_fsync(fd):
        raise OSError(5, "Input/output error")

    import quackpipe_spark.plans.index as index_mod

    monkeypatch.setattr(index_mod.os, "fsync", failing_fsync)
    idx.add(FileEntry(name="b.1.parquet", size_bytes=20, row_count=2))
    with pytest.raises(OSError):
        idx.save()
    monkeypatch.setattr(index_mod.os, "fsync", real_fsync)
    # the OLD index is intact on disk and the tmp file was cleaned up
    reloaded = PartitionIndex.load(pdir)
    assert set(reloaded.files) == {"a.1.parquet"}
    assert not [f for f in os.listdir(pdir) if f.endswith(".tmp")]
    # and a later healthy save succeeds
    idx.save()
    assert set(PartitionIndex.load(pdir).files) == {"a.1.parquet", "b.1.parquet"}
