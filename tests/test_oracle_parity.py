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
