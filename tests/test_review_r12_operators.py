"""Regression tests for the round-12 operator-layer review findings:
NULL-text docs in the index diff and in exact dedup, the IVF query-side
broadcast gate, and reproducible IVF training sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_diff_fingerprint_indexes_null_text(spark, tmp_path):
    """NULL fingerprints mean NULL TEXT, not row absence: a NULL-text doc
    present in both snapshots is 'same', text→NULL is 'changed' (the old
    nullness-based status called them 'added'/'removed', review r12)."""
    from quackpipe_spark.operators import dedup as D

    a = spark.createDataFrame(
        [(1, None), (2, "hello"), (3, "bye"), (5, "gone")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(1, None), (2, None), (3, "bye"), (4, "new"), (6, None)],
        "doc_id long, text string",
    )
    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    D.write_minhash_index(a, pa_)
    D.write_minhash_index(b, pb)
    got = {
        r["doc_id"]: r["status"]
        for r in D.diff_fingerprint_indexes(spark, pa_, pb).collect()
    }
    assert got == {
        1: "same",      # NULL → NULL (was 'added')
        2: "changed",   # text → NULL (was 'removed')
        3: "same",
        4: "added",
        5: "removed",
        6: "added",     # NULL-text doc new in B (was 'added' by luck; pinned)
    }


def test_exact_dedup_excludes_null_text(spark):
    """N NULL-text docs are NOT one duplicate cluster (their content is
    unknown, not identical): they are absent from the cluster report,
    matching exact_dups_against_index's NULL-never-matches equi-join."""
    from quackpipe_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None), (4, None), (5, None)],
        "doc_id long, text string",
    )
    rows = D.exact_dedup(docs).collect()
    assert len(rows) == 1
    assert rows[0]["keep_id"] == 1 and rows[0]["n_copies"] == 2


def test_ivf_search_query_broadcast_is_gated(spark):
    """The probed query frame broadcasts only under the row bound; an
    oversized query set falls back to a shuffle join with identical
    results (the unconditional F.broadcast was an OOM at ~10M queries on
    the path documented FOR large query frames, review r12)."""
    from quackpipe_spark.operators import similarity as S

    corpus = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(1, 61)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100 + i, [1.0, float(i % 4), 0.5]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    idx = S.build_seeded_ivf_index(corpus, n_cells=4)
    small = S.ivf_search(idx, queries, k=3, nprobe=2)
    big = S.ivf_search(idx, queries, k=3, nprobe=2, broadcast_max_rows=1)
    assert "BroadcastHashJoin" in small._jdf.queryExecution().executedPlan().toString()
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect()))


def test_build_ivf_index_training_is_partition_invariant(spark):
    """Re-indexing the same corpus after a repartition must train on the
    same md5(id)-ordered sample and produce identical centroids — a bare
    limit(sample_n) was partition-layout-dependent (review r12)."""
    from quackpipe_spark.operators import similarity as S

    corpus = spark.createDataFrame(
        [(i, [float((i * 7) % 11), float((i * 3) % 13), float(i % 5)]) for i in range(1, 101)],
        "vec_id long, embedding array<double>",
    )
    i1 = S.build_ivf_index(corpus.repartition(1), n_cells=4, sample_n=40)
    i2 = S.build_ivf_index(corpus.repartition(7, "vec_id"), n_cells=4, sample_n=40)
    assert i1.centers == i2.centers
    a1 = sorted(map(tuple, i1.assigned.select("neighbor_id", "cell").collect()))
    a2 = sorted(map(tuple, i2.assigned.select("neighbor_id", "cell").collect()))
    assert a1 == a2
    i1.assigned.unpersist()
    i2.assigned.unpersist()
