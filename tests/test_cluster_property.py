"""Property test: connected_components (BOTH execution paths) agrees
with a reference Python union-find on arbitrary small graphs.

Shrunk-case friendly: one SparkSession-free reference, one Spark call
per path per example would be too slow under hypothesis, so examples
are batched — hypothesis generates edge lists, we run a handful of
deterministic seeds through Spark and fuzz the REFERENCE against the
DuckDB recursive CTE separately (engine-free, fast)."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _py_cc(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for u, v in edges:
        if u == v:
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    nodes = set()
    for u, v in edges:
        if u != v:
            nodes.add(u)
            nodes.add(v)
    return {n: find(n) for n in sorted(nodes)}


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_python_reference_matches_duckdb_closure(edges):
    """The reference itself is validated against DuckDB's recursive
    closure across arbitrary graphs (self-loops, parallel edges,
    multiple components, empty)."""
    import duckdb
    import pandas as pd

    exp = _py_cc(edges)
    real = [(u, v) for u, v in edges if u != v]
    if not real:
        assert exp == {}
        return
    con = duckdb.connect()
    con.register("pairs", pd.DataFrame(real, columns=["a", "b"]))
    rows = con.execute(
        """
WITH RECURSIVE sym AS (
  SELECT a AS u, b AS v FROM pairs WHERE a <> b
  UNION SELECT b, a FROM pairs WHERE a <> b
), reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
)
SELECT u, least(u, min(v)) FROM reach GROUP BY u
"""
    ).fetchall()
    con.close()
    assert dict(rows) == exp


def test_spark_paths_match_reference_on_seeded_graphs(spark):
    """Both Spark paths (lazy union-find, star rounds) against the
    reference on a spread of random graph shapes."""
    from quackpipe_spark.operators.cluster import connected_components

    for seed, n, m in [(1, 20, 10), (2, 40, 60), (3, 8, 30), (4, 50, 49)]:
        rng = random.Random(seed)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        exp = _py_cc(edges)
        pairs = spark.createDataFrame(edges, "a long, b long")
        for kw in ({"edge_bound": m}, {"small_graph_edges": 0}):
            got = {
                r["node"]: r["component"]
                for r in connected_components(pairs, **kw).collect()
            }
            assert got == exp, f"seed={seed} kw={kw}"
