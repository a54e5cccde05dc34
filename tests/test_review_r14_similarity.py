"""Regression tests for the r14 similarity-module review findings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb(spark, n=64, dims=8, seed=1):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.normal(size=dims)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_probe_order_tiled_bit_identical(spark, monkeypatch):
    """The center-tiled probe kernel must produce EXACTLY the
    single-matmul path's assignments (top-n of a union == top-n of
    per-tile top-ns under the same total order) — pinned end-to-end
    through assign_cells with a forced tiny tile."""
    import quackpipe_spark.operators.similarity as S

    emb = _emb(spark, n=200, dims=8)
    centers = S.seeded_centers(emb, n_cells=40)
    full = sorted(
        (r["vec_id"], r["cell"])
        for r in S.assign_cells(emb, centers, "vec_id", "embedding", probes=3).collect()
    )
    monkeypatch.setattr(S, "_PROBE_TILE_ELEMS", 1)  # force per-center tiles
    tiled = sorted(
        (r["vec_id"], r["cell"])
        for r in S.assign_cells(emb, centers, "vec_id", "embedding", probes=3).collect()
    )
    assert full == tiled


def test_lsh_topk_no_forced_broadcast_over_bound(spark):
    """The query side must not force-broadcast past the bound: results
    identical either side of the gate (the r12 ivf_search OOM class)."""
    from quackpipe_spark.operators.similarity import lsh_topk

    corpus = _emb(spark, n=80, dims=64, seed=2)
    queries = _emb(spark, n=10, dims=64, seed=3)
    a = sorted(map(tuple, lsh_topk(corpus, queries, k=3).collect()))
    b = sorted(
        map(tuple, lsh_topk(corpus, queries, k=3, broadcast_max_rows=0).collect())
    )
    assert a == b and a


def test_hyperplane_buckets_drop_null_element_vectors(spark):
    """A correct-length vector with a NULL element previously landed in
    bucket 0 (every projection NULL → otherwise-branch 0) and took
    top-k ranks with NULL cosines; it must drop like the other
    malformed shapes."""
    from quackpipe_spark.operators.similarity import hyperplane_buckets

    rows = [
        (1, [1.0] * 64),
        (2, [1.0] * 63 + [None]),  # null element, correct length
        (3, None),
        (4, [1.0] * 10),  # wrong length
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"] for r in hyperplane_buckets(df).collect()}
    assert got == {1}


def test_seeded_centers_skip_null_vectors(spark):
    """A NULL embedding ranking into the seed window crashed the driver
    with a bare TypeError; the quantizer samples only real vectors."""
    from quackpipe_spark.operators.similarity import seeded_centers

    rows = [(i, [float(i)] * 4 if i % 2 else None) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers = seeded_centers(df, n_cells=8)
    assert len(centers) == 8
    assert all(v is not None and len(v) == 4 for _c, v in centers)


def test_prototype_sample_refuses_cell_collision(spark):
    """Joining the helper columns onto a corpus that already carries
    'cell' produced AMBIGUOUS_REFERENCE far from the cause; refuse
    loudly at the entry point."""
    from quackpipe_spark.operators.similarity import prototype_sample

    df = _emb(spark, n=16, dims=4).withColumn("cell", F.lit(1))
    with pytest.raises(ValueError, match="cell"):
        prototype_sample(df, per_cell=2)


def test_ivf_search_forwards_round_to(spark):
    """Both serving paths must probe with the SAME rounding: at a coarse
    round_to the distributed path's probe cells must match the
    driver-side mirror's."""
    import quackpipe_spark.operators.similarity as S

    emb = _emb(spark, n=120, dims=8, seed=5)
    idx = S.build_seeded_ivf_index(emb, n_cells=12)
    q = _emb(spark, n=4, dims=8, seed=6)
    a = S.ivf_search(idx, q, k=3, nprobe=2, round_to=2)
    rows_in = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in q.collect()
    )
    b = S.ivf_search_rows(idx, rows_in, k=3, nprobe=2, round_to=2)
    ra = sorted(map(tuple, a.select("query_id", "rank", "neighbor_id").collect()))
    rb = sorted(map(tuple, b.select("query_id", "rank", "neighbor_id").collect()))
    assert ra == rb
