"""Differential suite: every declared workload query vs its DuckDB oracle
at sf0.001 — the same gate the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_utils import assert_frames_match

import __spark_entry__ as entrymod

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = _QUERIES[name](spark, SF_DIR)
    if name not in _ORACLE:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    rel = duck.sql(_ORACLE[name])
    assert_frames_match(df, rel, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_oracle_keys_subset():
    assert set(_ORACLE) <= set(_QUERIES)


def test_registry_exactly_fifty():
    """The driver verifies (at most) the first 50 registry entries; the
    registry is pinned to EXACTLY 50 so every declared operator family has
    a recorded driver row — an entry past the window would be silently
    untested (the round-3 failure mode this guards against)."""
    assert len(_QUERIES) == 50
    # every auxiliary registry (STATEFUL, PREBUILD) must point at real rows
    from quackpipe_spark import workloads as W

    for m in W._MODULES:
        for name in getattr(m, "STATEFUL", set()):
            assert name in m.QUERIES, f"STATEFUL names unknown query {name}"
        for name in getattr(m, "PREBUILD", {}):
            assert name in m.QUERIES, f"PREBUILD names unknown query {name}"


def test_contamination_gate_broadcasts_benchmark(spark):
    """The benchmark shingle set must broadcast — a shuffle join here
    would repartition the full corpus shingle table at 100 TB."""
    from quackpipe_spark.workloads import curation

    plan = curation.contamination_scan(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lineproto_parse_demoted_oracle(spark, duck):
    """The single-batch lineproto_parse was demoted from the 50-row driver
    window (the distributed variant covers the gate), but its oracle SQL
    stays checked here so future parser edits can't silently invalidate
    it."""
    from quackpipe_spark.workloads import dataflow as DF

    df = DF.lineproto_parse(spark, SF_DIR)
    assert_frames_match(df, duck.sql(DF.LINEPROTO_PARSE_SQL), "lineproto_parse")


def test_asof_last_login_library_query_matches_oracle(spark, duck):
    """asof_last_login lost its registry slot when the consolidated
    asof_battery took over (the driver verifies exactly 50 entries); its
    per-row output stays covered by the battery's rowhash_backward
    checksum AND this direct differential so the library query can't
    rot unnoticed."""
    from quackpipe_spark.workloads.timeseries import ASOF_SQL, asof_last_login

    assert_frames_match(
        asof_last_login(spark, SF_DIR), duck.sql(ASOF_SQL), "asof_last_login"
    )
