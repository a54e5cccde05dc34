"""SemDeDup-style semantic dedup: planted semantic clusters collapse to
one survivor each, and — the part pair-local dropping gets wrong —
similarity CHAINS collapse even when the chain's ends are dissimilar."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quackpipe_spark.operators.similarity import semantic_dedup


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_planted_semantic_clusters_collapse(spark):
    # three planted clusters of near-identical directions + singletons
    base = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    vid = 0
    expect_groups = []
    for c, b in base.items():
        members = []
        for j in range(3):
            # tiny deterministic perturbation keeps cosine ≈ 0.999
            v = [x + (0.01 * ((vid + k) % 3)) for k, x in enumerate(b)]
            rows.append((vid, _unit(v)))
            members.append(vid)
            vid += 1
        expect_groups.append(members)
    # far-away singletons
    rows.append((100, _unit([1.0, 1.0, 1.0, 1.0])))
    rows.append((101, _unit([-1.0, 1.0, -1.0, 1.0])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, threshold=0.95, n_cells=2).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(out) == len(rows)  # annotate, don't drop
    for members in expect_groups:
        comps = {by_id[m]["component"] for m in members}
        assert comps == {min(members)}, f"cluster {members} got {comps}"
        canon = [m for m in members if by_id[m]["is_canonical"]]
        assert canon == [min(members)]
    for s in (100, 101):
        assert by_id[s]["component"] == s and by_id[s]["is_canonical"]


def test_similarity_chain_collapses_transitively(spark):
    # A and C are ~63° apart (cos ≈ 0.45 < threshold) but both are within
    # ~32° of B: the pair list is {(A,B),(B,C)} only, and the closure must
    # still collapse all three. n_cells=1 so blocking can't hide pairs.
    a = [1.0, 0.0]
    b = [math.cos(math.radians(32)), math.sin(math.radians(32))]
    c = [math.cos(math.radians(64)), math.sin(math.radians(64))]
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(df, threshold=0.8, n_cells=1).collect()
    assert {r["component"] for r in out} == {1}
    assert sorted(r["vec_id"] for r in out if r["is_canonical"]) == [1]


def test_semantic_dedup_on_real_embeddings(spark):
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = semantic_dedup(emb, threshold=0.9)
    n = emb.count()
    res = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("is_canonical").cast("int")).alias("canon"),
    ).first()
    assert res["n"] == n  # every row labeled exactly once
    assert 0 < res["canon"] <= n
    # survivors are exactly the component minima
    bad = out.filter(
        (F.col("vec_id") == F.col("component")) != F.col("is_canonical")
    ).count()
    assert bad == 0


def test_fused_and_distributed_near_pairs_identical(spark, monkeypatch):
    """blocked_near_pairs has two physical paths — the fused single-task
    kernel (sub-32MB inputs) and the shuffled per-cell stage — that must
    emit the IDENTICAL pair set with bit-identical cosines. Force the
    distributed path by making the size probe report a huge plan."""
    import quackpipe_spark.operators.similarity as S

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where("embedding is not null and size(embedding) = 64")
        .select("vec_id", "embedding")
    )
    fused = sorted(
        map(tuple, S.blocked_near_pairs(emb, threshold=0.3, n_cells=8, probes=2).collect())
    )
    monkeypatch.setattr(S, "plan_size_bytes", lambda df: 1 << 40)
    dist = sorted(
        map(tuple, S.blocked_near_pairs(emb, threshold=0.3, n_cells=8, probes=2).collect())
    )
    assert fused == dist and len(fused) > 0
    # string-id corpora ride the same kernels
    emb_s = emb.selectExpr("concat('d', vec_id) AS vec_id", "embedding")
    dist_s = sorted(
        map(tuple, S.blocked_near_pairs(emb_s, threshold=0.3, n_cells=8, probes=2).collect())
    )
    monkeypatch.undo()
    fused_s = sorted(
        map(tuple, S.blocked_near_pairs(emb_s, threshold=0.3, n_cells=8, probes=2).collect())
    )
    # (no count comparison vs the int-id run: md5('d0') ≠ md5('0') picks
    # different centers, so the pair sets legitimately differ)
    assert fused_s == dist_s and len(fused_s) > 0
