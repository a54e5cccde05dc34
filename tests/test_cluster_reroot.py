"""cluster_near_dups re-rooting: when pairs were computed over a
superset of docs, a cluster whose global minimum is absent must keep
its smallest PRESENT member rather than shipping nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackpipe_spark.operators.cluster import cluster_near_dups


def test_missing_minimum_reroots_on_present_member(spark):
    # cluster {1,2,3}; doc 1 was filtered out of docs before clustering
    docs = spark.createDataFrame(
        [(2, "x"), (3, "x"), (9, "y")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    out = {r["doc_id"]: r for r in cluster_near_dups(docs, pairs).collect()}
    assert out[2]["component"] == 2 and out[2]["is_canonical"]
    assert out[3]["component"] == 2 and not out[3]["is_canonical"]
    assert out[9]["component"] == 9 and out[9]["is_canonical"]
    # exactly one survivor per cluster — content never vanishes
    survivors = [d for d, r in out.items() if r["is_canonical"]]
    assert sorted(survivors) == [2, 9]


def test_edge_bound_passthrough_stays_lazy_and_correct(spark):
    docs = spark.createDataFrame(
        [(i, "t") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "a long, b long")
    out = cluster_near_dups(docs, pairs, edge_bound=3)
    got = {(r["doc_id"], r["component"]) for r in out.collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (3, 3), (4, 4), (5, 4)}


def test_minhash_clusters_one_call(spark):
    """minhash_clusters: the one-call pipeline collapses planted
    transitive dup chains to a single survivor and annotates, never
    drops, the corpus."""
    from quackpipe_spark.operators.dedup import minhash_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),
        (3, base),
        (10, "completely different content about spark execution plans here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in minhash_clusters(docs, threshold=0.5).collect()}
    assert len(out) == 4
    assert out[1]["is_canonical"]
    assert not out[3]["is_canonical"] and out[3]["component"] == 1
    assert out[10]["is_canonical"] and out[10]["component"] == 10
    survivors = sorted(d for d, r in out.items() if r["is_canonical"])
    assert 1 in survivors and 3 not in survivors
