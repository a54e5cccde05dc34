"""Similarity search over embedding columns (array<float>).

Scale design:

- **cosine** is pure JVM expression work: zip_with product + aggregate
  fold in double precision — no UDF, stays in codegen.
- **brute-force top-k** broadcasts the (small) query set against the
  corpus: the corpus never shuffles, each partition ranks locally and
  only k rows per query survive the final TakeOrdered.
- **blocked/IVF-ish variant** equi-joins on a partition key (here the
  `label` column; in a real pipeline a coarse-quantizer cell id) so the
  pair space is per-block, not n².
- **LSH variant** buckets by random-hyperplane sign bits derived from
  md5 (deterministic across engines/runs), then searches within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a, b) -> Column:
    """Σ a_i·b_i in double (ordered fold → deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query vector (the correctness baseline).

    The query set is broadcast; norms are computed once per row BEFORE the
    pair join (pair space only pays the dot product); ranking keys round
    the cosine (reproducible across engines) and tie-break on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")),
                round_to,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def blocked_near_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.45,
    round_to: int = 4,
) -> DataFrame:
    """Near-duplicate pairs within blocks (IVF-style pruning): only pairs
    sharing `block_col` are compared — the equi-join keeps the pair space
    linear in block size instead of n²."""
    a = corpus.select(
        F.col(id_col).alias("a"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na_"),
    )
    b = corpus.select(
        F.col(id_col).alias("b"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb_"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            # norms precomputed per row (linear), only the dot is pairwise
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na_") * F.col("nb_")), round_to
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def hyperplane_buckets(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (the scale path).

    Hyperplane p's component for dimension i is a deterministic ±1 from
    md5(p|i) — reproducible everywhere with no stored model. sign bit p =
    (Σ_i v_i·h_pi) ≥ 0; bucket = Σ bit_p<<p. Cosine-near vectors agree on
    most sign bits, so candidate search = same-bucket (or near-bucket)
    membership."""
    import hashlib

    v = F.col(vec_col)

    def plane_signs(plane: int) -> list[float]:
        # ±1 component i of hyperplane p = low bit of md5('{p}|{i}') —
        # computed DRIVER-side once and inlined as a literal array, so the
        # executor does a plain zip_with product instead of re-hashing per
        # row (same values any engine would derive from the same recipe).
        return [
            1.0 if hashlib.md5(f"{plane}|{i}".encode()).digest()[-1] & 1 else -1.0
            for i in range(dims)
        ]

    bits = []
    for p in range(n_planes):
        signs = F.array(*[F.lit(s) for s in plane_signs(p)])
        proj = F.aggregate(
            F.zip_with(v, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(0))
    bucket = bits[0]
    for t in bits[1:]:
        bucket = bucket + t
    return corpus.select(F.col(id_col), v.alias(vec_col), bucket.cast("int").alias("bucket"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer (Spark ML KMeans).

    Index: KMeans cells over the corpus; every vector gets a cell id.
    Search: each query probes its ``nprobe`` nearest cells and ranks only
    those vectors — compared fraction ≈ nprobe/n_cells. The centroid set
    is tiny and rides along as a broadcast; at 100 TB the corpus
    assignment is one ML transform (a projection) and search is an
    equi-join on cell id, the same shape as the LSH variant but with
    data-adaptive cells (better recall on clustered corpora).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = array_to_vector(F.col(vec_col).cast("array<double>"))
    c_feat = corpus.select(F.col(id_col), F.col(vec_col), feat.alias("_feat"))
    # a coarse quantizer doesn't need convergence — a few Lloyd iterations
    # give cells good enough for routing, at a fraction of the training jobs
    model = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=5,
        initMode="random",  # k-means|| init costs several extra passes;
        # random init + a few iterations is plenty for cell routing
        featuresCol="_feat",
        predictionCol="_cell",
    ).fit(c_feat)
    assigned = model.transform(c_feat).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col("_cell").alias("cell"),
    )
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    centers_df = queries.sparkSession.createDataFrame(
        centers, "cell int, center array<double>"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    # nprobe nearest cells per query (query set × centroids is tiny)
    probed = (
        q.crossJoin(F.broadcast(centers_df))
        .select(
            "query_id",
            "qvec",
            "cell",
            cosine(F.col("qvec"), F.col("center")).alias("_ccos"),
        )
        .withColumn(
            "_crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("_ccos"), F.asc("cell"))
            ),
        )
        .filter(F.col("_crank") <= nprobe)
        .select("query_id", "qvec", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    round_to: int = 6,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.

    At 100 TB the bucket join replaces the broadcast-cross-product; with
    2^n_planes buckets the compared fraction is ~2^-n_planes (recall is
    tunable via n_planes / multi-probe)."""
    cb = hyperplane_buckets(corpus, id_col, vec_col, n_planes, dims)
    qb = hyperplane_buckets(queries, id_col, vec_col, n_planes, dims).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("qvec"), F.col(vec_col)), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
