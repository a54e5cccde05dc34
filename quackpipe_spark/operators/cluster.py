"""Connected components over near-duplicate pair lists → dedup clusters.

The pairwise dedup operators (minhash_dedup, simhash_near_pairs,
blocked_near_pairs) emit edges ``(a, b)``. Removing "one side of each
pair" is wrong the moment duplicates chain (a≈b, b≈c but a!≈c): the
correct semantics is one survivor per *connected component* of the
duplicate graph — the standard closing step of every production dedup
pipeline, and the piece the reference leaves to its caller.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public). Each
round is two shuffles over the *edge* relation only; the edge set
monotonically contracts toward min-rooted stars and the round count is
O(log² n) in the worst case (O(log n) in practice) — unlike naive
hash-min label propagation, whose round count is the graph *diameter*
(a 1M-long duplicate chain = 1M shuffles). State between rounds is one
localCheckpoint'd DataFrame, so lineage stays O(1) per round instead of
growing exponentially; on a cluster with flaky executors prefer
``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` — the
structure is identical.

At 100 TB: the edge list for a near-dup graph is ~(dup_rate · n_docs)
rows — orders of magnitude smaller than the corpus — and every round is
a pair of key-partitioned groupBys with map-side combine. Nothing here
touches the documents themselves until the final (broadcast-eligible,
labels ≪ corpus) join in cluster_near_dups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    """Both orientations of each edge, self-loops dropped. Columns (u, v)."""
    e = edges.select("u", "v").filter(F.col("u") != F.col("v"))
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """For each u with m = min(Γ(u) ∪ {u}): emit {v, m} for v ∈ Γ(u), v > u.

    Connects every larger neighbor to the local minimum, halving the
    height of any path through u. Input must be symmetric; output is an
    undirected edge set stored as (u=max, v=min)."""
    w = Window.partitionBy("u")
    # emitted pair (v, m) satisfies v > u >= m, so it is already strict
    # and (max, min)-oriented — no re-filter or re-canonicalization
    return (
        sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each u over its smaller neighbors N = {v : v < u}, m = min(N):
    emit {x, m} for x ∈ N ∪ {u}, x ≠ m.

    Input/output edges stored as (u=max, v=min) — _large_star's output
    already has that orientation, so no re-symmetrization is needed."""
    w = Window.partitionBy("u")
    m = F.min("v").over(w)
    with_min = edges.withColumn("m", m)
    # neighbor edges (v, m) for v ≠ m, plus the (u, m) edge re-attaching u.
    # Both satisfy first > second (m is the strict minimum of values < u),
    # so the output is already strict and (max, min)-oriented.
    nbr = with_min.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    own = with_min.select(F.col("u"), F.col("m").alias("v"))
    return nbr.union(own).distinct()


def _unionfind_single_task(edges: DataFrame) -> DataFrame:
    """Exact CC for an edge list that fits ONE executor task: classic
    union-find (min-id roots, path compression) inside mapInPandas on a
    single partition. One shuffle + one task — executor-side, never a
    driver collect. The optimal plan whenever the edge relation is small
    in absolute terms (the common case: even at 100 TB of documents, a
    1% dup rate over 10B docs is ~100M edges ≈ a few GB — but the
    threshold is conservative and the star path handles the rest)."""
    import pandas as pd

    node_t = edges.schema["u"].dataType.simpleString()

    def cc(batches):
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for u, v in zip(pdf["u"], pdf["v"]):
                ru, rv = find(u), find(v)
                if ru != rv:
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
        nodes = list(parent.keys()) + [
            r for r in set(parent.values()) if parent.get(r, r) == r
        ]
        nodes = sorted(set(nodes))
        if nodes:  # zero frames for an empty graph — let Spark supply
            yield pd.DataFrame(  # the typed empty result from the schema
                {"node": nodes, "component": [find(n) for n in nodes]}
            )

    return edges.repartition(1).mapInPandas(
        cc, schema=f"node {node_t}, component {node_t}"
    )


def _lazy_unionfind(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Fully LAZY single-task CC: no probe action, no checkpoint, no
    distinct — union-find natively tolerates duplicate edges, both
    orientations, and self-loops, so the raw pair relation feeds it
    after one repartition(1). The whole closure fuses into whatever job
    consumes the labels (zero extra Spark jobs for the caller)."""
    return _unionfind_single_task(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).filter(
            F.col("u") != F.col("v")
        )
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 30,
    small_graph_edges: int = 1 << 20,
    edge_bound: int | None = None,
) -> DataFrame:
    """Label every node that appears in ``pairs`` with its component's
    minimum node id. Returns (node, component); nodes of ``pairs``'s key
    type (any orderable type — longs and strings both work).

    Size-adaptive: the initial checksum pass counts the (deduplicated)
    edges; at or below ``small_graph_edges`` the whole graph is solved
    exactly by union-find in one executor task (one job), otherwise by
    distributed star rounds. A caller that already KNOWS an upper bound
    on the edge count (e.g. the materialized LSH candidate count that
    precedes jaccard verification — verified pairs ⊆ candidates) passes
    ``edge_bound`` to skip the probe action entirely: the single-task
    closure then stays lazy and fuses into the consumer's job, costing
    zero extra Spark jobs. Convergence test for the star path is a
    two-scalar checksum (edge count + sum of xxhash64 over canonical
    pairs) rather than a subtract-based diff — one cheap aggregate per
    round instead of an extra join. The checkpoint is LAZY: the checksum
    aggregate is the action that materializes it, so each round costs
    exactly ONE Spark job. max_iter is a safety rail far above the
    O(log² n) bound; hitting it raises."""
    if edge_bound is not None and edge_bound <= small_graph_edges:
        return _lazy_unionfind(pairs, a_col, b_col)
    # canonicalize to (max, min) — the orientation _small_star preserves;
    # one distinct (canonical form already collapses both orientations)
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = _checksum(edges)
    if 0 < prev[0] <= small_graph_edges:
        return _unionfind_single_task(edges)
    for _ in range(max_iter):
        if prev[0] == 0:
            break
        edges = _small_star(_large_star(_symmetric(edges))).localCheckpoint(
            eager=False
        )
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # Fixed point is min-rooted stars stored (u=member, v=root): members
    # take their root's label, roots label themselves. No window/groupBy
    # needed — the star property makes the labeling a projection.
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        edges.select(F.col("v").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return members.union(roots).distinct()


def cluster_near_dups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    edge_bound: int | None = None,
    small_graph_edges: int = 1 << 20,
) -> DataFrame:
    """Attach (component, is_canonical) to every doc given near-dup pairs.

    Docs absent from any pair are their own singleton component. The
    canonical survivor per cluster is the minimum id AMONG MEMBERS
    PRESENT IN ``docs`` — when pairs were computed over a superset (the
    common shape: dedup the raw corpus, then cluster a quality-filtered
    subset), a cluster whose global minimum was filtered away re-roots
    on its smallest surviving member instead of shipping zero copies of
    that content. Filter on is_canonical to keep one representative per
    duplicate cluster; the choice is deterministic across runs,
    partitionings, and engines.

    ``edge_bound`` / ``small_graph_edges`` pass through to
    :func:`connected_components` (a caller holding a pre-materialized
    candidate count avoids the probe action entirely).

    Scale shape: the label relation has one row per paired node — for
    realistic dup rates a small fraction of the corpus — so the present
    semi-join, the per-component re-root aggregate, and the final
    annotate join all run on the small side (and broadcast); the corpus
    itself is never shuffled."""
    labels = connected_components(
        pairs,
        a_col,
        b_col,
        edge_bound=edge_bound,
        small_graph_edges=small_graph_edges,
    )
    present = labels.join(
        docs.select(F.col(id_col).alias("node")), "node", "left_semi"
    )
    # one component-clustered window pass instead of groupBy + join-back
    # (the same exchange+join saving cluster_near_dups_by_quality
    # documents below — the two siblings now share the re-root shape)
    mapping = present.select(
        F.col("node").alias(id_col),
        F.min("node").over(Window.partitionBy("component")).alias("component"),
    )
    out = docs.join(mapping, on=id_col, how="left")
    return out.withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    ).withColumn("is_canonical", F.col(id_col) == F.col("component"))


def cluster_near_dups_by_quality(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
    a_col: str = "a",
    b_col: str = "b",
    edge_bound: int | None = None,
    small_graph_edges: int = 1 << 20,
) -> DataFrame:
    """:func:`cluster_near_dups` with a quality-aware survivor: the
    canonical member of each cluster is the one with the HIGHEST
    ``score_col`` among members present in ``docs`` (ties → minimum id,
    so the choice stays deterministic across runs, partitionings, and
    engines). The standard curation move — near-dup clusters keep their
    best copy, not their oldest id (min-id keeps whichever crawl
    happened to be ingested first; argmax-quality keeps the cleanest
    rendering of the content).

    The ``component`` label itself stays the min present id (a stable
    cluster KEY should not move when a better-scored duplicate arrives
    later); only ``is_canonical`` follows quality. Same scale shape as
    cluster_near_dups: every aggregate/join runs on the paired-node
    relation, the corpus never shuffles."""
    labels = connected_components(
        pairs, a_col, b_col,
        edge_bound=edge_bound, small_graph_edges=small_graph_edges,
    )
    scored = docs.select(
        F.col(id_col).alias("node"), F.col(score_col).alias("_s")
    )
    present = labels.join(scored, "node")  # inner: present members, scored
    # ONE component-clustered pass instead of groupBy + join-back (r12):
    # both window specs share the partition key, so Catalyst plans one
    # exchange + one sort feeding chained WindowExecs — the per-component
    # min (stable cluster KEY) and the argmax rank (quality DESC, id ASC
    # tie-break) come out of the same shuffled partition, saving the
    # aggregate exchange AND the per-node ⋈ per-component join at every
    # scale.
    wp = Window.partitionBy("component")
    wr = wp.orderBy(F.desc("_s"), F.asc("node"))
    mapping = present.select(
        F.col("node").alias(id_col),
        F.min("node").over(wp).alias("_root"),
        (F.row_number().over(wr) == 1).alias("_is_best"),
    ).withColumnRenamed("_root", "component")
    out = docs.join(mapping, on=id_col, how="left")
    return (
        out.withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
        .withColumn("is_canonical", F.coalesce(F.col("_is_best"), F.lit(True)))
        .drop("_is_best")
    )


def cluster_sizes(labels: DataFrame) -> DataFrame:
    """(component, n_members) for a (node, component) labeling."""
    return labels.groupBy("component").agg(F.count("*").alias("n_members"))
