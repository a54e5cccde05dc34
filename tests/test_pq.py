"""Product quantization: deterministic training, bounded reconstruction,
recall against exact brute-force cosine, JVM-only search plan, and the
IVF-cell composition."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quackpipe_spark.operators import similarity as SIM
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def books(emb):
    return SIM.train_pq(emb, m=4, k=16, iters=8)


def test_training_is_deterministic(emb, books):
    again = SIM.train_pq(emb, m=4, k=16, iters=8)
    assert again.centers == books.centers
    assert (books.m, books.k) == (4, 16)


def test_codes_compact_and_in_range(emb, books):
    codes = SIM.pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == books.m
        assert all(0 <= c < books.k for c in r["codes"])


def test_recall_vs_bruteforce_on_clustered_corpus(spark):
    """ADC top-10 must recover most of the exact cosine top-10 on data
    with CLUSTER structure (what real embeddings have — the sf testdata
    embeddings are near-uniform random, which no 8x-compressing
    quantizer can rank faithfully: measured recall ~0.2 there vs ~1.0
    here; PQ's contract is lossy compression of clusterable data)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, 32))
    rows = []
    for i in range(600):
        v = centers[i % 20] + rng.normal(scale=0.15, size=32)
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = SIM.train_pq(corpus, m=4, k=16, iters=8, sample=600)
    codes = SIM.pq_encode(corpus, books).cache()
    codes.count()
    raw_recalls, rr_recalls = [], []
    for qid in (0, 7, 113):
        q = rows[qid][1]
        exact = {
            r["neighbor_id"]
            for r in SIM.brute_force_topk(
                corpus,
                spark.createDataFrame(
                    [(qid, q)], "vec_id long, embedding array<float>"
                ),
                k=10,
            ).collect()
        }
        raw = {
            r["neighbor_id"]
            for r in SIM.pq_topk(codes, books, q, topk=11).collect()
            if r["neighbor_id"] != qid
        }
        rr = {
            r["neighbor_id"]
            for r in SIM.pq_topk(
                codes, books, q, topk=11, rerank=corpus, shortlist=44
            ).collect()
            if r["neighbor_id"] != qid
        }
        raw_recalls.append(len(exact & raw) / len(exact))
        rr_recalls.append(len(exact & rr) / len(exact))
    # raw ADC ties inside a tight cluster (shared codes), so only the
    # cluster is guaranteed; rerank restores near-exact ranking
    assert sum(rr_recalls) / len(rr_recalls) >= 0.9, (raw_recalls, rr_recalls)
    assert sum(rr_recalls) >= sum(raw_recalls)
    codes.unpersist()


def test_search_plan_is_jvm_only(emb, books):
    codes = SIM.pq_encode(emb, books)
    q = [0.1] * books.dim
    plan = (
        SIM.pq_topk(codes, books, q, topk=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # encoding is the one Arrow stage; scoring + top-k must stay JVM:
    # exactly one python eval (the encode udf), TakeOrdered for the limit
    assert plan.count("Python") <= 1 or "ArrowEvalPython" in plan
    assert "TakeOrderedAndProject" in plan
    scoring = plan.split("Python")[0]
    assert "element_at" in scoring or "TakeOrdered" in scoring


def test_ivf_cell_composition(spark, emb, books):
    """codes built with an IVF cell column prune to probed cells before
    scoring — the IVF-PQ layout."""
    centers = SIM.seeded_centers(emb, n_cells=8)
    assigned = SIM.assign_cells(emb, centers, "vec_id", "embedding", probes=1)
    codes = SIM.pq_encode(assigned, books, extra_cols=["cell"])
    q = [r["embedding"] for r in emb.limit(1).collect()][0]
    # probe the query's own cell
    qcell = (
        SIM.assign_cells(
            spark.createDataFrame([(0, q)], "vec_id long, embedding array<float>"),
            centers,
            "vec_id",
            "embedding",
            probes=1,
        ).collect()[0]["cell"]
    )
    pruned = codes.filter(F.col("cell") == qcell)
    out = SIM.pq_topk(pruned, books, q, topk=5).collect()
    assert 0 < len(out) <= 5
    n_cell = pruned.count()
    assert n_cell < emb.count(), "cell pruning must reduce the scored set"


def test_dim_mismatch_raises(emb, books):
    with pytest.raises(ValueError, match="dim"):
        SIM.pq_topk(SIM.pq_encode(emb, books), books, [0.1] * 7)


def test_pq_index_roundtrip(spark, emb, books, tmp_path):
    """Written codes+codebooks reopen to byte-identical search results;
    with the IVF cell column present the codes land partitioned by cell."""
    import os

    centers = SIM.seeded_centers(emb, n_cells=4)
    assigned = SIM.assign_cells(emb, centers, "vec_id", "embedding", probes=1)
    codes = SIM.pq_encode(assigned, books, extra_cols=["cell"])
    path = str(tmp_path / "pq_idx")
    SIM.write_pq_index(codes, books, path)
    assert any(
        d.startswith("cell=") for d in os.listdir(os.path.join(path, "codes"))
    )
    codes2, books2 = SIM.load_pq_index(spark, path)
    assert books2.centers == books.centers
    q = [0.2] * books.dim
    a = SIM.pq_topk(codes, books, q, topk=5).collect()
    b = SIM.pq_topk(codes2, books2, q, topk=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_seeded_codebooks_are_verbatim_subvectors(spark, emb):
    """Seeded (zero-iteration) codebooks: every center is a verbatim raw
    subvector of some corpus vector, derivation is deterministic, and the
    k centers per subspace are distinct."""
    e64 = emb.filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
    books = SIM.seeded_pq_codebooks(e64, m=4, k=16, sample=256)
    again = SIM.seeded_pq_codebooks(e64, m=4, k=16, sample=256)
    assert again.centers == books.centers
    raws = {
        tuple(float(x) for x in r["embedding"][s * 16 : (s + 1) * 16])
        for r in e64.limit(2000).collect()
        for s in range(4)
    }
    for s in range(4):
        cs = [tuple(c) for c in books.centers[s]]
        assert len(set(cs)) == 16
        assert all(c in raws for c in cs)


def test_seeded_raw_encode_matches_numpy_reference(spark, emb):
    """Raw-subvector encoding with d2_round: the distributed pandas-UDF
    path must agree code-for-code with a driver-side numpy restatement."""
    e64 = emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    ).limit(300)
    books = SIM.seeded_pq_codebooks(e64, m=4, k=8, sample=128)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in SIM.pq_encode(e64, books, normalize=False, d2_round=6).collect()
    }
    Cs = [np.array(c) for c in books.centers]
    for r in e64.collect():
        v = np.array(r["embedding"], dtype=np.float64)
        exp = []
        for s in range(4):
            d2 = ((v[s * 16 : (s + 1) * 16][None, :] - Cs[s]) ** 2).sum(axis=1)
            exp.append(int(np.argmin(np.round(d2, 6))))
        assert got[r["vec_id"]] == exp


def test_pq_topk_multi_matches_per_query(spark, emb, books):
    """The one-pass multi-query search must agree query-for-query with
    N independent pq_topk calls, with and without rerank."""
    e64 = emb.filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
    codes = SIM.pq_encode(e64, books)
    qrows = e64.filter(F.col("vec_id") < 3).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]
    multi = SIM.pq_topk_multi(codes, books, queries, topk=5)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_cos"])
        for r in multi.collect()
    }
    for qid, qv in queries:
        single = SIM.pq_topk(codes, books, qv, topk=5)
        for r in single.collect():
            assert got[(qid, r["rank"])] == (r["neighbor_id"], r["adc_cos"]), (qid, r)
    # rerank path
    multi_r = SIM.pq_topk_multi(codes, books, queries, topk=5, rerank=e64)
    got_r = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in multi_r.collect()
    }
    for qid, qv in queries:
        single = SIM.pq_topk(codes, books, qv, topk=5, rerank=e64)
        for r in single.collect():
            assert got_r[(qid, r["rank"])] == (r["neighbor_id"], r["cos"]), (qid, r)


def test_pq_topk_multi_single_scan_plan(spark, emb, books, tmp_path):
    """Plan shape over a WRITTEN code table (the deployment scenario):
    the whole multi-query search is JVM-only — no Python/pandas nodes,
    window ranking over one scan."""
    e64 = emb.filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
    SIM.write_pq_index(SIM.pq_encode(e64, books), books, str(tmp_path / "pq"))
    codes, books2 = SIM.load_pq_index(spark, str(tmp_path / "pq"))
    df = SIM.pq_topk_multi(codes, books2, [(0, [0.1] * 64), (1, [0.2] * 64)], topk=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    assert "Window" in plan


def test_seeded_codebooks_negative_zero_keys_like_zero(spark):
    """-0.0 and 0.0 are the SAME value under SQL GROUP BY, so the seeded
    distinctness scan must not count them as two distinct subvectors —
    raw float64 bytes would. Corpus: k vectors that differ only in zero
    sign must yield ONE center (and thus fail to reach k=2), while a
    genuinely distinct second vector succeeds."""
    rows = [(1, [0.0, 1.0]), (2, [-0.0, 1.0]), (3, [0.5, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = SIM.seeded_pq_codebooks(df, m=1, k=2, sample=10)
    flat = {tuple(c) for c in books.centers[0]}
    assert flat == {(0.0, 1.0), (0.5, 1.0)}
    # and the kept zero is canonical +0.0 (sign-of-zero never leaks)
    for c in books.centers[0]:
        for x in c:
            assert not (x == 0.0 and np.signbit(x))
    with pytest.raises(ValueError, match="distinct"):
        SIM.seeded_pq_codebooks(
            spark.createDataFrame(rows[:2], "vec_id long, embedding array<double>"),
            m=1,
            k=2,
            sample=10,
        )


def test_seeded_codebooks_dims_filters_ragged_like_oracle(spark):
    """A ragged corpus: dims= excludes wrong-length vectors BEFORE the
    md5-ordered sample cut (the oracle's len(embedding)=dims predicate);
    without dims= the ragged sample raises a clear error instead of a
    misleading shape failure."""
    rows = [(i, [float(i), float(i + 1)]) for i in range(8)] + [
        (100, [1.0, 2.0, 3.0])  # ragged
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = SIM.seeded_pq_codebooks(df, m=1, k=4, sample=20, dims=2)
    assert all(len(c) == 2 for c in books.centers[0])
    ref = SIM.seeded_pq_codebooks(
        spark.createDataFrame(rows[:8], "vec_id long, embedding array<double>"),
        m=1,
        k=4,
        sample=20,
    )
    assert books.centers == ref.centers
    with pytest.raises(ValueError, match="dims"):
        SIM.seeded_pq_codebooks(df, m=1, k=4, sample=20)
