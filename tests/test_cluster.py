"""Connected-components dedup clustering: differential vs a DuckDB
recursive-CTE oracle, convergence-speed proof, and the end-to-end
minhash→cluster→survivors pipeline."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from quackpipe_spark.operators.cluster import (
    cluster_near_dups,
    cluster_sizes,
    connected_components,
)

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


CC_ORACLE = """
WITH RECURSIVE sym AS (
    SELECT a AS u, b AS v FROM pairs WHERE a <> b
    UNION
    SELECT b AS u, a AS v FROM pairs WHERE a <> b
), reach(u, v) AS (
    SELECT u, v FROM sym
    UNION
    SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
)
SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
"""


def _duck_cc(pairs_rows, columns=("a", "b")):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("pairs", pd.DataFrame(pairs_rows, columns=list(columns)))
    out = con.execute(CC_ORACLE).fetchall()
    con.close()
    return sorted((r[0], r[1]) for r in out)


def test_cc_matches_duckdb_on_random_graph(spark):
    rng = random.Random(42)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = sorted(
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    )
    assert got == _duck_cc(edges)
    # the distributed star path must agree with the union-find fast path
    star = sorted(
        (r["node"], r["component"])
        for r in connected_components(pairs, small_graph_edges=0).collect()
    )
    assert star == got
    # every component label is the component's own minimum member
    comp = dict(got)
    for node, c in got:
        assert comp[c] == c
        assert c <= node


def test_cc_long_chain_needs_log_rounds_not_diameter(spark):
    # a 512-node chain has diameter 511: hash-min label propagation would
    # need 511 rounds. Large-star/small-star must close it in O(log n).
    edges = [(i, i + 1) for i in range(511)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    labels = connected_components(pairs, max_iter=12, small_graph_edges=0).collect()
    assert len(labels) == 512
    assert {r["component"] for r in labels} == {0}


def test_cc_string_ids_rings_and_selfloops(spark):
    # two rings, a self-loop-only node (drops out: no real edge), and
    # lexicographic (string) ordering for the canonical label
    edges = (
        [(f"r{i}", f"r{(i + 1) % 5}") for i in range(5)]
        + [(f"s{i}", f"s{(i + 1) % 4}") for i in range(4)]
        + [("zz", "zz")]
    )
    pairs = spark.createDataFrame(edges, "a string, b string")
    for thresh in (0, 1 << 20):  # both paths, string keys
        got = sorted(
            (r["node"], r["component"])
            for r in connected_components(
                pairs, small_graph_edges=thresh
            ).collect()
        )
        assert got == _duck_cc(edges)
    comps = {c for _, c in got}
    assert comps == {"r0", "s0"}
    assert all(node != "zz" for node, _ in got)


def test_cc_empty_pairs(spark):
    pairs = spark.createDataFrame([], "a long, b long")
    assert connected_components(pairs).count() == 0
    # the lazy edge_bound path must also handle empty (and self-loop-only)
    assert connected_components(pairs, edge_bound=0).count() == 0
    loops = spark.createDataFrame([(7, 7)], "a long, b long")
    assert connected_components(loops, edge_bound=1).count() == 0


def test_cluster_near_dups_transitive_chain(spark):
    # a≈b, b≈c, but (a,c) never emitted as a pair: pair-local "keep min of
    # each pair" would keep {1, 2→no...}; component semantics keeps only 1.
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "z")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    out = cluster_near_dups(docs, pairs).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["component"], r["is_canonical"]) for r in out] == [
        (1, 1, True),
        (2, 1, False),
        (3, 1, False),
        (4, 4, True),
        (5, 5, True),
    ]
    sizes = {
        r["component"]: r["n_members"]
        for r in cluster_sizes(
            connected_components(pairs)
        ).collect()
    }
    assert sizes == {1: 3}


def test_minhash_to_clusters_end_to_end(spark, docs):
    """Full pipeline at sf0.001: Spark minhash pairs → Spark CC survivors,
    cross-checked against DuckDB recursive closure over the same pairs."""
    from quackpipe_spark.operators.dedup import minhash_dedup

    pairs = minhash_dedup(docs, threshold=0.5).select("a", "b")
    edge_rows = [(r["a"], r["b"]) for r in pairs.collect()]
    if not edge_rows:
        pytest.skip("no near-dup pairs at this threshold in sf0.001")
    clustered = cluster_near_dups(docs, pairs)
    survivors = {
        r["doc_id"] for r in clustered.filter("is_canonical").collect()
    }
    oracle = dict(_duck_cc(edge_rows))
    n_docs = docs.count()
    # oracle survivors: docs not in any pair + component minima
    paired = set(oracle)
    minima = {c for c in oracle.values()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert survivors == (all_ids - paired) | minima
    assert clustered.count() == n_docs
