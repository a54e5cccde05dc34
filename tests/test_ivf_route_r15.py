"""ivf_search_rows literal-plan bound (VERDICT r14 #3 → r15).

The small-batch serving path inlines ≈ batch×nprobe query vectors as
plan literals; above ``max_probe_literals`` it must ROUTE to the
distributed ivf_search instead of bloating the plan — with identical
results (both paths share assign_cells' rounded probe choice and the
sequential-fold query norm).
"""

from __future__ import annotations

import pytest

import quackpipe_spark.operators.similarity as S
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def index_and_queries(spark):
    from quackpipe_spark.sources.tables import table_df

    emb = table_df(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    )
    index = S.build_seeded_ivf_index(emb, n_cells=8)
    rows = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 12)
        .select("vec_id", "embedding")
        .collect()
    )
    yield index, rows
    index.unpersist()


def _collect(df):
    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos"])
        for r in df.collect()
    )


def test_wide_batch_routes_to_distributed_path(index_and_queries, monkeypatch):
    index, rows = index_and_queries
    routed = {"n": 0}
    real = S.ivf_search

    def spy(*a, **kw):
        routed["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(S, "ivf_search", spy)
    # 12 queries × nprobe 3 = 36 probes > bound 10 → must route
    wide = S.ivf_search_rows(index, rows, k=5, nprobe=3, max_probe_literals=10)
    assert routed["n"] == 1, "wide batch did not route to ivf_search"
    # same batch under the bound stays on the literal path
    narrow = S.ivf_search_rows(
        index, rows, k=5, nprobe=3, max_probe_literals=1_000_000
    )
    assert routed["n"] == 1, "narrow batch must NOT route"
    # the two paths agree row for row (cos included)
    assert _collect(wide) == _collect(narrow)


def test_default_bound_keeps_gate_batches_literal(index_and_queries, monkeypatch):
    """The pinned 5-query gate batch (and any sane serving batch) stays
    far under the default bound — the route must not fire there."""
    index, rows = index_and_queries
    monkeypatch.setattr(
        S, "ivf_search", lambda *a, **kw: pytest.fail("unexpected route")
    )
    out = S.ivf_search_rows(index, rows[:5], k=5, nprobe=4)
    assert out.count() > 0


def test_bound_arithmetic_counts_probes_not_queries(index_and_queries):
    index, rows = index_and_queries
    # bound expressed in PROBES: 12 queries at nprobe=1 is 12 probes —
    # under a bound of 12 it must stay literal even though 12 queries
    # at nprobe=2 (24 probes) would route
    df = S.ivf_search_rows(index, rows, k=3, nprobe=1, max_probe_literals=12)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "literal path must not contain a join"
