"""Physical-plan assertions: the scale contracts (.explain discipline).

These pin the plan shapes that make queries survive 100 TB: predicate
pushdown reaching the scan, column pruning, broadcast joins for dims,
the top-K rewrite, and partial aggregation — regressions here are silent
at test scale and catastrophic at cluster scale."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_DIR

from quackpipe_spark.workloads import sql_surface as S


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_pushdown_and_pruning(spark):
    p = plan_text(S.QUERIES["q6_forecast_revenue"](spark, SF_DIR))
    assert "PushedFilters:" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_quantity" in p
    # column pruning: only the 4 needed columns in ReadSchema
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" in read_schema and "l_orderkey" not in read_schema
    assert "l_returnflag" not in read_schema


def test_q3_broadcast_and_topk(spark):
    p = plan_text(S.QUERIES["q3_shipping_priority"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p  # dims must broadcast at this scale


def test_q1_partial_aggregation(spark):
    p = plan_text(S.QUERIES["q1_pricing_summary"](spark, SF_DIR))
    # partial + final HashAggregate pair (map-side combine)
    assert p.count("HashAggregate") >= 2


def test_topk_rewrite(spark):
    p = plan_text(S.QUERIES["topk_orders"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "GlobalLimit" not in p  # rewritten, not sort-then-limit


def test_semi_anti_join_physical(spark):
    p = plan_text(S.join_semi_anti(spark, SF_DIR))
    assert "LeftSemi" in p and "LeftAnti" in p


def test_scan_reuse_cache(spark):
    """table_df returns the same DataFrame per (session, dir, table)."""
    from quackpipe_spark.sources.tables import table_df

    a = table_df(spark, SF_DIR, "lineitem")
    b = table_df(spark, SF_DIR, "lineitem")
    assert a is b
