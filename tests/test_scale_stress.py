"""Scale-stress: the new dedup/curation operators on corpora 2-3 orders
above the toy tests, built EXECUTOR-side (spark.range + expressions, no
driver lists). These catch quadratic blowups and hot-key cliffs that
sf0.001 can't see; loose wall-clock rails flag a regressed plan."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_line_dedup_30k_docs_with_hot_boilerplate(spark):
    # 30k docs × 12 lines; 2 boilerplate lines shared corpus-wide (one of
    # them appears in EVERY doc — the hot-key case) + 10 unique lines
    n = 30_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.lit("SUBSCRIBE to our newsletter today please"),
            F.concat(F.lit("cookie banner variant "), (F.col("id") % 3).cast("string")),
            *[
                F.concat(
                    F.lit(f"unique line {j} of doc "), F.col("id").cast("string")
                )
                for j in range(10)
            ],
        ).alias("text"),
    )
    from quackpipe_spark.operators.dedup import line_dedup

    t0 = time.time()
    out = line_dedup(docs)
    stats = out.agg(
        F.count("*").alias("n"),
        F.sum("n_removed").alias("removed"),
        F.min("n_removed").alias("mn"),
        F.max("n_removed").alias("mx"),
    ).first()
    wall = time.time() - t0
    assert stats["n"] == n
    # every doc loses exactly its 2 boilerplate lines, never a unique one
    assert stats["mn"] == 2 and stats["mx"] == 2
    assert stats["removed"] == 2 * n
    assert wall < 120, f"line_dedup took {wall:.0f}s on 360k lines"


def test_duplicate_passages_20k_docs_planted(spark):
    # every 20th doc carries the same 8-token passage inside unique text
    n = 20_000
    passage = "shared verbatim passage tokens one two three four"
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("head "), F.col("id").cast("string")),
            *[
                F.concat(F.lit(f"u{j}x"), F.col("id").cast("string"))
                for j in range(12)
            ],
            F.when(F.col("id") % 20 == 0, F.lit(passage)).otherwise(
                F.concat(F.lit("tail "), F.col("id").cast("string"))
            ),
        ).alias("text"),
    )
    from quackpipe_spark.operators.dedup import duplicate_passages

    t0 = time.time()
    spans = duplicate_passages(docs, k=8).cache()
    n_spans = spans.count()
    wall = time.time() - t0
    flagged = {r["doc_id"] for r in spans.select("doc_id").collect()}
    spans.unpersist()
    expect = {i for i in range(0, n, 20)}
    assert flagged == expect, (
        f"missing={len(expect - flagged)} extra={len(flagged - expect)}"
    )
    assert n_spans == len(expect)  # one merged span per planted doc
    assert wall < 120, f"duplicate_passages took {wall:.0f}s on 20k docs"


def test_cc_star_path_agrees_with_unionfind_at_100k_edges(spark):
    # 100k deterministic edges over 40k nodes: the distributed star path
    # must agree with the single-task union-find and converge fast
    from quackpipe_spark.operators.cluster import connected_components
    from quackpipe_spark.operators.sampling import hash_mod

    n_nodes, n_edges = 40_000, 100_000
    edges = spark.range(n_edges).select(
        hash_mod(F.col("id"), n_nodes, salt="u").cast("long").alias("a"),
        hash_mod(F.col("id"), n_nodes, salt="v").cast("long").alias("b"),
    ).cache()
    edges.count()
    t0 = time.time()
    star = connected_components(edges, small_graph_edges=0, max_iter=15)
    star_rows = {(r["node"], r["component"]) for r in star.collect()}
    star_wall = time.time() - t0
    t0 = time.time()
    uf = connected_components(edges, edge_bound=n_edges)
    uf_rows = {(r["node"], r["component"]) for r in uf.collect()}
    uf_wall = time.time() - t0
    edges.unpersist()
    assert star_rows == uf_rows
    assert len({c for _, c in uf_rows}) >= 1
    assert star_wall < 180, f"star path took {star_wall:.0f}s"
    assert uf_wall < 60, f"union-find path took {uf_wall:.0f}s"


def test_incremental_probe_40k_corpus_2k_batch(spark, tmp_path):
    # 40k-doc indexed corpus probed by a 2k batch where every 10th batch
    # doc clones a corpus doc verbatim — the daily-increment shape. Rails:
    # linear index build, probe wall bounded, recall of planted clones
    # exact. Texts are executor-built expressions (no driver lists).
    import time

    from quackpipe_spark.operators.dedup import (
        dedup_against_index,
        write_minhash_index,
    )

    n, m = 40_000, 2_000
    text_of = lambda idc: F.concat_ws(
        " ",
        F.lit("corpus body"),
        *[
            F.concat(F.lit(f"w{j}-"), (idc % 997).cast("string"))
            for j in range(10)
        ],
        idc.cast("string"),
    )
    corpus = spark.range(n).select(
        F.col("id").alias("doc_id"), text_of(F.col("id")).alias("text")
    )
    # clone source id = (id*10) % n so clones spread over the corpus;
    # non-clones get a distinct marker token making them novel
    batch = spark.range(m).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0, text_of((F.col("id") * 10) % n)
        ).otherwise(
            F.concat(
                text_of(F.col("id") + 555_000),
                F.lit(" novel-"),
                F.col("id").cast("string"),
            )
        ).alias("text"),
    )
    path = str(tmp_path / "stress_idx")
    t0 = time.time()
    write_minhash_index(corpus, path)
    build = time.time() - t0
    t0 = time.time()
    flags = dedup_against_index(batch, path)
    hit_new = {
        r["new_id"] for r in flags.select("new_id").distinct().collect()
    }
    probe = time.time() - t0
    planted = {1_000_000 + i for i in range(0, m, 10)}
    assert planted <= hit_new, "every verbatim clone must band-collide"
    assert build < 180, f"index build took {build:.0f}s on 40k docs"
    assert probe < 120, f"probe took {probe:.0f}s for a 2k batch"


def test_pq_200k_vectors_encode_and_search(spark):
    # 200k clustered 32-dim vectors, executor-built: cluster base =
    # sin((cid+1)*(j+1)), small per-id wobble. Train on the default 10k
    # sample, encode all, ADC-search one query — neighbors must come
    # overwhelmingly from the query's cluster, inside loose wall rails.
    import time

    from quackpipe_spark.operators import similarity as SIM

    n, n_clusters, dim = 200_000, 64, 32
    cid = F.col("id") % n_clusters

    def h(expr, j):
        # deterministic uniform [-1, 1) from md5 — sin((cid+1)(j+1))
        # aliases badly (measured center pairs at cosine 0.96)
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(expr.cast("string"), F.lit(f"|{j}"))), 1, 6
                ),
                16,
                10,
            ).cast("double")
            / (16**6 / 2.0)
            - 1.0
        )

    vec = F.array(
        *[
            (h(cid, j) + h(F.col("id"), j + 1000) * 0.05).cast("float")
            for j in range(dim)
        ]
    )
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).persist()
    corpus.count()
    t0 = time.time()
    books = SIM.train_pq(corpus, m=4, k=32, iters=4)
    codes = SIM.pq_encode(corpus, books).persist()
    n_codes = codes.count()
    build = time.time() - t0
    assert n_codes == n
    t0 = time.time()
    q = corpus.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    out = SIM.pq_topk(codes, books, q, topk=50).collect()
    search = time.time() - t0
    same_cluster = sum(1 for r in out if r["neighbor_id"] % n_clusters == 7)
    assert same_cluster >= 45, f"only {same_cluster}/50 from the query cluster"
    assert build < 240, f"train+encode took {build:.0f}s for 200k vectors"
    assert search < 90, f"ADC search took {search:.0f}s over 200k codes"
    codes.unpersist()
    corpus.unpersist()


def test_ivf_written_index_serving_200k_vectors(spark, tmp_path):
    # The 100TB serving story end-to-end at 200k vectors: build the
    # seeded IVF index, WRITE it (postings partitioned by cell), then
    # serve an 8-query batch through ivf_search_rows — driver-planned
    # probes, literal-inlined batch, static cell partition pruning. The
    # clustered corpus (same md5 recipe as the PQ stress) lets us assert
    # recall by construction: top neighbors must come overwhelmingly
    # from each query's cluster. Wall rails are loose; the plan
    # assertion (static PartitionFilters on cell) is the real pin —
    # a regression to a full-index scan fails it regardless of speed.
    import time

    from quackpipe_spark.operators import similarity as SIM

    n, n_clusters, dim = 200_000, 64, 32
    cid = F.col("id") % n_clusters

    def h(expr, j):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(expr.cast("string"), F.lit(f"|{j}"))), 1, 6
                ),
                16,
                10,
            ).cast("double")
            / (16**6 / 2.0)
            - 1.0
        )

    vec = F.array(
        *[
            (h(cid, j) + h(F.col("id"), j + 1000) * 0.05).cast("float")
            for j in range(dim)
        ]
    )
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    t0 = time.time()
    idx = SIM.build_seeded_ivf_index(corpus, n_cells=64)
    path = str(tmp_path / "ivf200k")
    SIM.write_ivf_index(idx, path)
    idx.unpersist()
    build = time.time() - t0
    lazy = SIM.load_ivf_index(spark, path, pin=False)
    qrows = sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in corpus.filter(F.col("vec_id") < 8).collect()
    )
    t0 = time.time()
    res = SIM.ivf_search_rows(lazy, qrows, k=20, nprobe=8)
    rows = res.collect()
    search = time.time() - t0
    assert len(rows) == 8 * 20
    for qid in range(8):
        mine = [r for r in rows if r["query_id"] == qid]
        same = sum(1 for r in mine if r["neighbor_id"] % n_clusters == qid)
        assert same >= 16, f"query {qid}: only {same}/20 from its cluster"
    plan = (
        SIM.ivf_search_rows(lazy, qrows, k=20, nprobe=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_line = next(
        ln for ln in plan.splitlines() if "FileScan" in ln and "cvec" in ln
    )
    assert "PartitionFilters: [" in scan_line
    assert "cell" in scan_line.split("PartitionFilters:", 1)[1][:200]
    assert build < 240, f"index build+write took {build:.0f}s for 200k vectors"
    assert search < 60, f"batch serve took {search:.0f}s over the written index"
