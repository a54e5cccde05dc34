"""Operator-quality tests for the LLM-pipeline operators — beyond oracle
parity (covered in test_oracle_parity), these assert the *semantics*:
near-dup recall on planted duplicates, LSH vs brute-force agreement,
multimodal plumbing determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from quackpipe_spark.operators import dedup as D
from quackpipe_spark.operators import multimodal as M
from quackpipe_spark.operators import similarity as S
from quackpipe_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def planted_pairs(duck):
    """The generator plants near-dups as docs sharing a 50-char prefix."""
    rows = duck.sql(
        """
        SELECT list(doc_id ORDER BY doc_id) ids FROM documents
        GROUP BY substr(text, 1, 50) HAVING count(*) > 1
        """
    ).fetchall()
    return {(r[0][0], r[0][1]) for r in rows}


def test_minhash_finds_planted_dups(docs, duck):
    planted = planted_pairs(duck)
    found = {
        (r["a"], r["b"])
        for r in D.minhash_dedup(docs, threshold=0.8).collect()
    }
    # LSH is probabilistic-by-construction (deterministic here, but banding
    # can drop borderline pairs); require ≥90% recall of planted dups.
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, f"minhash recall {recall}: {planted - found}"
    # and high precision: verified jaccard ≥ 0.8 should not fire on
    # unrelated random docs
    assert all(a < b for a, b in found)


def test_exact_dedup_survivors(spark, docs):
    # duplicate the corpus with shifted ids → every text has exactly 2
    # copies; survivor = original (smaller id)
    doubled = docs.union(docs.withColumn("doc_id", F.col("doc_id") + 10_000))
    out = D.exact_dedup(doubled)
    assert out.count() == docs.count()
    assert out.filter(F.col("n_copies") != 2).count() == 0
    assert out.filter(F.col("keep_id") >= 10_000).count() == 0


def test_simhash_null_text_and_single_band(spark):
    """NULL-text docs must produce NO signature row (grouped-form/oracle
    parity), and bands=1 must not crash the first-match-band filter."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    sigs = D.simhash(df)
    assert {r["doc_id"] for r in sigs.collect()} == {1, 3}
    pairs = D.simhash_near_pairs(sigs, bands=1, max_hamming=0).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(1, 3)}


def test_simhash_identical_and_perturbed(spark):
    base = " ".join(f"w{i}" for i in range(120))
    toks = base.split()
    toks[5], toks[80] = "zz", "qq"  # exactly two tokens edited
    rows = [
        (1, base),
        (2, base),  # identical → hamming 0
        (3, " ".join(toks)),  # light edit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash(df).collect()}
    assert sigs[1] == sigs[2]
    assert 0 < bin(sigs[1] ^ sigs[3]).count("1") <= 8  # near, not equal


def test_lsh_topk_agrees_with_bruteforce(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    bf = S.brute_force_topk(emb, queries, k=10).collect()
    lsh = S.lsh_topk(emb, queries, k=10, n_planes=4).collect()
    bf_top = {(r["query_id"], r["neighbor_id"]) for r in bf}
    lsh_top = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    # The corpus is near-uniform (max cos ≈ 0.5), so same-bucket odds for a
    # true neighbor are ~(1-θ/π)^planes ≈ 0.63^4 ≈ 0.16 — single-table LSH
    # recall is intrinsically low on data with no cluster structure (real
    # deployments multi-probe or use several tables). Assert non-degenerate.
    assert len(lsh_top) > 0
    overlap = len(bf_top & lsh_top) / len(bf_top)
    assert overlap >= 0.05, f"LSH recall vs brute force too low: {overlap}"
    # every LSH cos must be ≤ the brute-force max for that query (sanity)
    bf_best = {}
    for r in bf:
        bf_best[r["query_id"]] = max(bf_best.get(r["query_id"], -2.0), r["cos"])
    for r in lsh:
        assert r["cos"] <= bf_best[r["query_id"]] + 1e-9


def test_ivf_topk_recall_beats_lsh(emb):
    """IVF (data-adaptive cells) should out-recall single-table
    hyperplane LSH at comparable probe fractions on this corpus."""
    queries = emb.filter(F.col("vec_id") < 5)
    bf = {(r["query_id"], r["neighbor_id"]) for r in S.brute_force_topk(emb, queries, k=10).collect()}
    ivf = {(r["query_id"], r["neighbor_id"]) for r in S.ivf_topk(emb, queries, k=10, n_cells=16, nprobe=4).collect()}
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.3, f"IVF recall too low: {recall}"
    # every IVF result is a real corpus vector with a valid rank
    ranks = [r["rank"] for r in S.ivf_topk(emb, queries, k=10).collect()]
    assert all(1 <= r <= 10 for r in ranks)


def test_ivf_search_rows_matches_distributed_search(spark, emb, tmp_path):
    """The small-batch serving path (driver-planned probes + static cell
    pruning over a written index) must return row-for-row what the
    distributed ivf_search returns for the same queries — same probes
    (assign_cells scoring mirrored), same exact cosines (sequential-fold
    query norms), same ranks."""
    queries = emb.filter(F.col("vec_id") < 20)
    idx = S.build_seeded_ivf_index(emb, n_cells=16)
    expected = sorted(
        tuple(r) for r in S.ivf_search(idx, queries, k=10, nprobe=4).collect()
    )
    path = str(tmp_path / "ivf_rows")
    S.write_ivf_index(idx, path)
    idx.unpersist()
    lazy = S.load_ivf_index(spark, path, pin=False)
    qrows = sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in queries.select("vec_id", "embedding").collect()
    )
    got = sorted(
        tuple(r) for r in S.ivf_search_rows(lazy, qrows, k=10, nprobe=4).collect()
    )
    assert got == expected
    # and the plan prunes: the postings scan must carry a static cell
    # partition filter, not read every cell directory
    plan = (
        S.ivf_search_rows(lazy, qrows, k=10, nprobe=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_line = next(
        ln for ln in plan.splitlines() if "FileScan" in ln and "cvec" in ln
    )
    assert "PartitionFilters: [" in scan_line
    assert "cell" in scan_line.split("PartitionFilters:", 1)[1][:200]


def test_ivf_index_parquet_roundtrip(spark, emb, tmp_path):
    """build → write → load → search must equal in-session search exactly
    (postings parquet partitioned by cell; centers as a second table)."""
    queries = emb.filter(F.col("vec_id") < 5)
    idx = S.build_ivf_index(emb, n_cells=16, seed=42)
    in_session = sorted(
        tuple(r) for r in S.ivf_search(idx, queries, k=10, nprobe=4).collect()
    )
    path = str(tmp_path / "ivf")
    S.write_ivf_index(idx, path)
    idx.unpersist()

    loaded = S.load_ivf_index(spark, path, pin=True)
    assert loaded.centers == idx.centers
    from_disk = sorted(
        tuple(r) for r in S.ivf_search(loaded, queries, k=10, nprobe=4).collect()
    )
    assert from_disk == in_session
    loaded.unpersist()

    # pin=False: single-search sessions keep the scan lazy so partition
    # pruning on the probed cells reaches the parquet reader
    lazy = S.load_ivf_index(spark, path, pin=False)
    assert sorted(
        tuple(r) for r in S.ivf_search(lazy, queries, k=10, nprobe=4).collect()
    ) == in_session
    # cell must survive as a partition directory (pruning-capable layout)
    import os
    assert any(d.startswith("cell=") for d in os.listdir(f"{path}/postings"))


def test_text_quality_and_langid(spark):
    rows = [
        (1, "the cat sat on the mat and it is a good day for the dog"),
        (2, "der hund ist nicht mit der katze und das ist ein problem für alle"),
        (3, "x" * 20_000),  # too long → quality penalty
        (4, "!!! ??? ### $$$ %%%"),  # punctuation soup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.analyze(df).collect()}
    assert out[1]["lang_detected"] == "en"
    assert out[2]["lang_detected"] == "de"
    assert out[1]["quality"] > out[3]["quality"]
    assert out[4]["punct_ratio"] > 0.5
    assert out[1]["n_tokens"] == 15
    # fingerprint is word-order-insensitive
    df2 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    fps = [r["fingerprint"] for r in T.analyze(df2).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] and fps[0] != fps[2]


def test_repetition_signals(spark):
    rows = [
        (1, "spam spam spam spam spam"),      # one token repeated
        (2, "alpha beta gamma delta"),         # no repetition
        (3, "go stop go stop go stop"),        # alternating bigrams
        (4, "single"),                         # too short for a bigram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.analyze(df).collect()}
    # dup_token_ratio = 1 - distinct/total
    assert out[1]["dup_token_ratio"] == round(1 - 1 / 5, 4)
    assert out[2]["dup_token_ratio"] == 0.0
    assert out[4]["dup_token_ratio"] == 0.0
    # "spam spam" ×4 of 4 bigrams → 1.0
    assert out[1]["top_bigram_ratio"] == 1.0
    # all 3 bigrams distinct → 1/3
    assert out[2]["top_bigram_ratio"] == round(1 / 3, 4)
    # "go stop" ×3 of 5 bigrams → 0.6
    assert out[3]["top_bigram_ratio"] == 0.6
    # short doc: no bigram → coalesced 0.0
    assert out[4]["top_bigram_ratio"] == 0.0


def test_seeded_ivf_matches_trained_shape_and_recall(emb):
    """The gate's zero-iteration seeded IVF: assignment covers the whole
    corpus, and nprobe search keeps useful recall vs brute force."""
    queries = emb.filter(F.col("vec_id") < 5)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=10).collect()
    }
    idx = S.build_seeded_ivf_index(emb, n_cells=16)
    assert idx.assigned.count() == emb.count()  # probes=1: every vector in exactly one cell
    assert len(idx.centers) == 16
    got = S.ivf_search(idx, queries, k=10, nprobe=4).collect()
    recall = len(bf & {(r["query_id"], r["neighbor_id"]) for r in got}) / len(bf)
    assert recall >= 0.3, f"seeded-IVF recall too low: {recall}"
    ranks = {(r["query_id"], r["rank"]) for r in got}
    assert len(ranks) == len(got)  # ranks unique per query
    idx.unpersist()


def test_pii_signals(spark):
    rows = [
        (1, "contact me at alice@example.com or https://example.com/x?q=1 today"),
        (2, "no pii here at all"),
        (3, "two mails a@b.io c.d@e-f.org and http://plain.url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.analyze(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_urls"]) == (1, 1)
    assert (out[2]["n_emails"], out[2]["n_urls"]) == (0, 0)
    assert (out[3]["n_emails"], out[3]["n_urls"]) == (2, 1)


def test_hash_sampling_deterministic_and_partition_invariant(spark, docs):
    from quackpipe_spark.operators import sampling as SM

    kept1 = {r["doc_id"] for r in SM.hash_sample(docs, "doc_id", 0.5, "s").collect()}
    # re-run and repartitioned runs keep EXACTLY the same rows
    kept2 = {r["doc_id"] for r in SM.hash_sample(docs, "doc_id", 0.5, "s").collect()}
    kept3 = {
        r["doc_id"]
        for r in SM.hash_sample(docs.repartition(7), "doc_id", 0.5, "s").collect()
    }
    assert kept1 == kept2 == kept3
    n = docs.count()
    assert 0.4 * n < len(kept1) < 0.6 * n  # ~fraction, md5-uniform
    # different salt → a different (still deterministic) subset
    kept_other = {r["doc_id"] for r in SM.hash_sample(docs, "doc_id", 0.5, "t").collect()}
    assert kept_other != kept1
    # fractions nest: a 30% sample is a subset of the 50% sample (same
    # salt) — growing a shard never reshuffles what was already in it
    kept_30 = {r["doc_id"] for r in SM.hash_sample(docs, "doc_id", 0.3, "s").collect()}
    assert kept_30 < kept1
    # fraction edges
    assert SM.hash_sample(docs, "doc_id", 0.0).count() == 0
    assert SM.hash_sample(docs, "doc_id", 1.0).count() == n
    # null keys are neither silently dropped nor all-kept: they hash as a
    # sentinel, one bucket for all nulls — and both engines agree on it
    withnull = spark.createDataFrame(
        [(None, "x"), (1, "y"), (2, "z")], "k int, v string"
    )
    kept_n = SM.hash_sample(withnull, "k", 1.0).count()
    assert kept_n == 3
    null_bucket = SM.hash_sample(withnull.filter(F.col("k").isNull()), "k", 0.5, "s").count()
    assert null_bucket in (0, 1)  # deterministic either way, never an error
    # DuckDB mirror keeps the identical rows
    import duckdb

    con = duckdb.connect()
    dk = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM read_parquet(?) WHERE "
            + SM.hash_sample_sql("doc_id", 0.5, "s"),
            [f"{SF_DIR}/documents.parquet"],
        ).fetchall()
    }
    assert dk == kept1


def test_split_by_hash_partitions_rows(spark, docs):
    from quackpipe_spark.operators import sampling as SM

    out = SM.split_by_hash(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n  # every row labeled exactly once
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # labels are stable across runs
    again = SM.split_by_hash(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.select("doc_id", "split").subtract(again.select("doc_id", "split")).count() == 0
    # salt discipline: sample-then-split with the SAME salt correlates —
    # the val band is exactly what the sampler dropped (empty); distinct
    # salts decorrelate and every label survives
    sampled = SM.hash_sample(docs, "doc_id", 0.9, salt="v1")
    same = SM.split_by_hash(sampled, "doc_id", {"train": 0.95, "val": 0.05}, salt="v1")
    assert same.filter("split = 'val'").count() == 0
    distinct = SM.split_by_hash(sampled, "doc_id", {"train": 0.95, "val": 0.05}, salt="w1")
    assert distinct.filter("split = 'val'").count() > 0


def test_pack_sequences(spark, docs):
    from quackpipe_spark.operators import packing as P

    toks = T.analyze(docs).select("doc_id", "n_tokens")
    budget = 256
    packed = P.pack_sequences(toks, budget=budget, n_shards=8, salt="p")
    rows = packed.collect()
    assert len(rows) == toks.count()  # every doc packed exactly once
    # no pack exceeds budget by more than one doc's tokens (docs unsplit)
    stats = {r["pack_id"]: r for r in P.pack_stats(packed).collect()}
    max_doc = max(r["n_tokens"] for r in rows)
    for s in stats.values():
        assert s["n_tokens"] < budget + max_doc
    # deterministic and partition-invariant
    again = P.pack_sequences(toks.repartition(13), budget=budget, n_shards=8, salt="p")
    assert (
        packed.select("doc_id", "pack_id").subtract(again.select("doc_id", "pack_id")).count()
        == 0
    )
    # contiguous fill keeps packs usefully full
    eff = P.packing_efficiency(packed, budget).collect()[0]["efficiency"]
    assert eff > 0.5, f"packing efficiency too low: {eff}"
    # an oversized doc is never split; it pushes the next doc to a new pack
    big = spark.createDataFrame([(1, 10_000), (2, 10), (3, 12)], "doc_id long, n_tokens long")
    bp = P.pack_sequences(big, budget=100, n_shards=1)
    by_id = {r["doc_id"]: r["pack_id"] for r in bp.collect()}
    assert len(set(by_id.values())) >= 2
    assert len(by_id) == 3


def test_contamination_check(spark, docs, duck):
    """Planted contamination: benchmark docs copied verbatim from the
    corpus must be flagged; unrelated text must not. Differential vs the
    identical 8-gram overlap in DuckDB."""
    leaked = docs.orderBy("doc_id").limit(3).collect()
    bench_rows = [(1000 + i, r["text"]) for i, r in enumerate(leaked)] + [
        (2000, "completely unrelated benchmark question about nothing shared")
    ]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    flagged = {r["doc_id"]: r["n_shared"] for r in D.contamination_check(docs, bench).collect()}
    for r in leaked:
        assert r["doc_id"] in flagged, f"verbatim leak {r['doc_id']} not flagged"
    # differential: same recipe in DuckDB (8-gram distinct shingles)
    import duckdb as _dd

    con = _dd.connect()
    con.execute("CREATE TABLE bench (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO bench VALUES (?, ?)", bench_rows)
    exp = dict(
        con.execute(f"""
WITH c AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(t) - 6),
    i -> array_to_string(t[i:i+7], ' ')))) AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM read_parquet('{SF_DIR}/documents.parquet'))
  WHERE len(t) >= 8
), b AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
    range(1, len(t) - 6),
    i -> array_to_string(t[i:i+7], ' ')))) AS shingle
  FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS t FROM bench)
  WHERE len(t) >= 8
)
SELECT c.doc_id, count(*) FROM c JOIN b USING (shingle) GROUP BY c.doc_id
""").fetchall()
    )
    assert flagged == exp


def test_bm25_search_matches_duckdb(spark, docs):
    """fts.bm25_search vs the identical BM25 restated in DuckDB SQL —
    same top-k ids/ranks, scores equal to 1e-6 (double fold order)."""
    import duckdb

    from quackpipe_spark.operators import fts

    postings = fts.build_postings(docs)
    query = "spark merge table"
    got = fts.bm25_search(postings, query, topk=10).collect()
    assert len(got) == 10
    assert [r["rank"] for r in got] == list(range(1, 11))

    terms = "', '".join(sorted(query.split()))
    con = duckdb.connect()
    exp = con.execute(f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM read_parquet('{SF_DIR}/documents.parquet')
), tfrows AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks
), postings AS (
  SELECT doc_id, term, count(*) AS tf, first(dl) AS dl
  FROM tfrows GROUP BY doc_id, term
), stats AS (
  SELECT count(*) AS N, avg(dl) AS avgdl
  FROM (SELECT doc_id, first(dl) AS dl FROM postings GROUP BY doc_id)
), matched AS (
  SELECT * FROM postings WHERE term IN ('{terms}')
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM matched GROUP BY term
), scored AS (
  SELECT m.doc_id,
         sum(ln(1 + (s.N - d.df + 0.5) / (d.df + 0.5))
             * m.tf * (1.2 + 1.0)
             / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dl / s.avgdl))) AS score
  FROM matched m CROSS JOIN stats s JOIN dfreq d ON d.term = m.term
  GROUP BY m.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
""").fetchall()
    assert [r["doc_id"] for r in got] == [e[0] for e in exp]
    for r, e in zip(got, exp):
        assert abs(r["score"] - e[1]) < 1e-6


def test_postings_index_roundtrip(spark, docs, tmp_path):
    import os

    from pyspark.sql import functions as F

    from quackpipe_spark.operators import fts
    from quackpipe_spark.operators.sampling import hash_mod_py

    postings = fts.build_postings(docs)
    path = str(tmp_path / "fts_index")
    fts.write_postings(postings, path, n_buckets=16)
    loaded = fts.load_postings(spark, path)
    assert loaded.count() == postings.count()
    assert any(d.startswith("term_bucket=") for d in os.listdir(f"{path}/postings"))
    # the scale path: stats from the build artifact + bucket-pruned scan
    # agrees with the in-memory search exactly
    a = fts.bm25_search(postings, "spark merge", topk=5).collect()
    b = fts.search_postings_index(spark, path, "spark merge", topk=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # driver-side bucket naming matches the column the writer used
    from quackpipe_spark.operators.sampling import hash_mod

    terms = ["spark", "merge", "weird.term", None]
    jvm = {
        r["term"]: r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", hash_mod(F.col("term"), 16).alias("b"))
        .collect()
    }
    for t in terms:
        assert hash_mod_py(t, 16) == jvm[t]


def test_multimodal_stub_and_plumbing(spark, docs):
    media = M.attach_binary(docs.limit(30))
    # real decode refuses loudly where no gated backend applies (video
    # has none; image needs Pillow) — text payloads are never silently
    # "decoded"
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        M.decode_media(media.filter("kind = 'video'"), fake=False).collect()
    decoded = M.decode_media(media, fake=True)
    rows = decoded.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_frames"] >= 1
        if r["kind"] == "image":
            assert r["n_frames"] == 1 and r["width"] >= 64
    # determinism: same payload → same decode
    again = {r["media_id"]: r for r in M.decode_media(media, fake=True).collect()}
    for r in rows:
        assert again[r["media_id"]] == r
    # frame sampling: only videos, stride 10
    frames = M.sample_frames(decoded, every_n=10).collect()
    vids = {r["media_id"]: r["n_frames"] for r in rows if r["kind"] == "video"}
    assert {f["media_id"] for f in frames} == set(vids)
    for mid, nf in vids.items():
        idxs = sorted(f["frame_idx"] for f in frames if f["media_id"] == mid)
        assert idxs == list(range(0, nf, 10))


def test_shingles_short_doc_guard(spark):
    df = spark.createDataFrame(
        [(1, "one"), (2, "one two"), (3, "one two three four")],
        "doc_id long, text string",
    )
    out = D.shingle_table(df).groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in out}
    assert 1 not in counts and 2 not in counts
    assert counts[3] == 2  # "one two three", "two three four"


def test_blocked_near_pairs_recall_at_auto_scale(spark):
    """The gate query pins n_cells=32 for oracle parity; this proves the
    auto-scaled path (auto_cells → ~40 cells on a 40k corpus, past the
    old 32-task cap — the `cells > 32` assert below is the claim) still
    finds planted near-duplicates.

    Corpus: 40k deterministic pseudo-random 64-dim vectors built JVM-side
    (md5-derived components, no driver-side data) — the smallest corpus
    that pushes auto_cells past the 32-cell gate pin at any
    SPARK_GRAFT_CPUS (r16: was 100k, which proved the same claim for 3×
    the suite wall-clock). Ids 200000..200099 are near-copies of ids
    0..99 (component-wise perturbation, cos ≈ 1), everything else is
    near-orthogonal noise."""
    dims = 64
    comp = (
        "(cast(conv(substr(md5(concat(id, '|', d)), 1, 8), 16, 10) as double) "
        "% 1000) / 1000.0 - 0.5"
    )
    base = spark.range(40_000).selectExpr(
        "id as vec_id",
        f"transform(sequence(0, {dims - 1}), d -> {comp}) as embedding",
    )
    clones = spark.range(100).selectExpr(
        "id + 200000 as vec_id",
        # additive alternating-sign noise (not a scalar multiple): cos < 1
        # but well above threshold — a genuine near-duplicate
        f"transform(sequence(0, {dims - 1}), "
        f"d -> ({comp}) + 0.02 * (case when d % 2 = 0 then 1 else -1 end)) as embedding",
    )
    corpus = base.unionAll(clones)
    # 1024-row cell budget → ≥40 cells at any SPARK_GRAFT_CPUS (the
    # 4×parallelism floor alone would stop at 32 on an 8-cpu box)
    cells = S.auto_cells(corpus, target_rows_per_cell=1024)
    assert cells > 32  # genuinely past the gate query's pinned cell count
    pairs = S.blocked_near_pairs(
        corpus, threshold=0.9, n_cells=cells, probes=2
    )
    found = {(r["a"], r["b"]) for r in pairs.collect()}
    planted = {(i, i + 200_000) for i in range(100)}
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, f"auto-scale recall {recall}"


def test_auto_cells_scales_with_corpus_and_cluster(spark, emb):
    """The default cell count must grow with BOTH the corpus (bounded
    rows per cell → the O(cell²) score block stays executor-sized) and
    the cluster (≥4× parallelism → the per-cell stage never caps task
    parallelism), so the quantizer-blocked operators hold at 1000×."""
    par = spark.sparkContext.defaultParallelism
    n = emb.count()
    cells = S.auto_cells(emb)
    assert cells >= 4 * par
    assert cells >= -(-n // 4096)
    # shrinking the per-cell budget (≡ growing the corpus) must grow the
    # cell count proportionally — one cell per row at budget 1
    assert S.auto_cells(emb, target_rows_per_cell=1) >= n
    # the None default reaches the operator (no crash, sane output cols)
    pairs = S.blocked_near_pairs(emb.limit(200), threshold=0.40, probes=1)
    assert pairs.columns == ["a", "b", "cos"]
    assert pairs.count() >= 0


def test_bm25_scan_matches_postings_path(spark, docs):
    """Index-free bm25_scan (row-local tf, broadcast stats, score>0 match
    filter) returns the same ranking as the postings path, and its scan
    keeps the pushed filter to a cheap null check — the tokenization must
    not sink into the (possibly single-split) scan."""
    from quackpipe_spark.operators import fts

    query = "spark merge table"
    via_postings = fts.bm25_search(
        fts.build_postings(docs), query, topk=10
    ).collect()
    via_scan = fts.bm25_scan(docs, query, topk=10).collect()
    assert [(r["doc_id"], r["rank"]) for r in via_scan] == [
        (r["doc_id"], r["rank"]) for r in via_postings
    ]
    for a, b in zip(via_scan, via_postings):
        assert abs(a["score"] - b["score"]) < 1e-6

    plan = (
        fts.bm25_scan(docs, query, topk=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_blocks = [
        seg for seg in plan.split("+-") if seg.strip().startswith("FileScan")
    ]
    for seg in scan_blocks:
        assert "split(" not in seg, "tokenization sank into the scan"


def test_decode_media_dim_bound_and_zero_frames(spark):
    from quackpipe_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(3, "vid payload")], "doc_id long, text string"
    )
    media = M.attach_binary(docs)  # id 3 % 3 == 0 -> image... use kind col anyway
    import pytest as _pytest

    with _pytest.raises(ValueError, match="batch_feature_dim"):
        M.decode_media(media, fake=True, batch_feature_dim=16)
    # n_frames=0 videos sample to zero frames, not a sequence() error
    decoded = spark.createDataFrame(
        [(1, "video", 100, 100, 0), (2, "video", 100, 100, 25)],
        "media_id long, kind string, width int, height int, n_frames int",
    )
    got = {(r["media_id"], r["frame_idx"]) for r in M.sample_frames(decoded, 10).collect()}
    assert got == {(2, 0), (2, 10), (2, 20)}


def test_compression_ratio_null_is_null(spark):
    from quackpipe_spark.functions.extensions import compression_ratio

    df = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaaaaaaaaaa"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["cr"]
        for r in df.select("doc_id", compression_ratio("text").alias("cr")).collect()
    }
    assert rows[2] is None
    assert rows[3] == 1.0
    assert 0.0 < rows[1] < 1.0


def test_real_wav_decode_via_stdlib(spark):
    """fake=False audio decode: WAV payloads decode through the stdlib
    wave module (no optional deps) — true frame count, and the feature
    carries (rate, channels, sample_width, duration). A corrupt payload
    skips its row; it must not fail the job or ride through as fake."""
    import io
    import struct as _struct
    import wave as _wave

    def make_wav(n_frames: int, rate: int = 16000, ch: int = 1) -> bytes:
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(
                b"".join(_struct.pack("<h", (i * 37) % 2000 - 1000) for i in range(n_frames * ch))
            )
        return buf.getvalue()

    rows = [
        (1, "audio", make_wav(1600)),
        (2, "audio", make_wav(8000, rate=8000, ch=2)),
        (3, "audio", b"not a wav at all"),  # corrupt: skipped, not fatal
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in __import__("quackpipe_spark.operators.multimodal", fromlist=["decode_media"]).decode_media(media, fake=False, batch_feature_dim=4).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_frames"] == 1600 and got[1]["width"] == 0
    assert got[1]["feature"] == [16000.0, 1.0, 2.0, pytest.approx(0.1)]
    assert got[2]["n_frames"] == 8000
    assert got[2]["feature"][:2] == [8000.0, 2.0]
    assert got[2]["feature"][3] == pytest.approx(1.0)  # 8000 frames @ 8kHz


def test_real_image_decode_pillow_gated(spark):
    """fake=False image decode through Pillow — honest skip where the
    library is absent (this container), real assertions where present."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (320, 200), (200, 30, 30)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", buf.getvalue())], "media_id long, kind string, payload binary"
    )
    from quackpipe_spark.operators import multimodal as M2

    [r] = M2.decode_media(media, fake=False).collect()
    assert (r["width"], r["height"], r["n_frames"]) == (320, 200, 1)
    assert len(r["feature"]) == 8 and all(0.0 <= x <= 1.0 for x in r["feature"])


def test_simhash_64bit_signatures(spark):
    """The 64-bit scale path the simhash_near_pairs docstring promises:
    signatures are deterministic, use the full width (some sign-bit-set
    values across a real corpus), identical docs pair at hamming 0, and
    unsupported widths refuse loudly. 32-bit outputs are oracle-pinned
    elsewhere; this guards the claim that growing bits is a real option."""
    import pytest as _pytest

    from quackpipe_spark.operators import dedup as D
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    s1 = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, bits=64).collect()}
    s2 = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, bits=64).collect()}
    assert s1 == s2 and len(s1) > 0
    # the high 32 bits must actually vary (a 32-bit hash zero-padded to
    # 64 would leave them constant across the corpus)
    assert len({v >> 32 for v in s1.values()}) > 1
    # exact duplicates at hamming 0, found through 64-bit banding
    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "completely different words here")],
        "doc_id long, text string",
    )
    sigs = D.simhash(dup, bits=64)
    pairs = D.simhash_near_pairs(sigs, bits=64, max_hamming=1, bands=2).collect()
    assert [(r["a"], r["b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]
    with _pytest.raises(ValueError, match="bits=32 or 64"):
        D.simhash(dup, bits=48)


def test_redact_pii_matches_duckdb(spark):
    """redact_pii: three chained regexp_replace passes, diffed against
    DuckDB's regexp_replace(..., 'g') with the same patterns — the same
    Java/RE2-intersection discipline the counting signals use — plus
    real documents as a corpus-shaped smoke (no emails survive)."""
    import duckdb

    from quackpipe_spark.operators.text import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        redact_pii,
    )
    from tests.conftest import SF_DIR

    from pyspark.sql import functions as F

    rows = [
        "contact bob.smith+x@corp.example.org or call +1 (555) 123-4567 now",
        "server at 192.168.0.1 and 10.0.0.255, backup 8.8.8.8",
        "no pii here at all",
        "a@b.io then 1.2.3.4 then 0123456789",
        "",
    ]
    df = spark.createDataFrame([(r,) for r in rows], "t string")
    got = [r["o"] for r in df.select(redact_pii(F.col("t")).alias("o")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),"
            " ?, '<IP>', 'g'), ?, '<PHONE>', 'g')",
            [r, EMAIL_RE, IPV4_RE, PHONE_RE],
        ).fetchone()[0]
        for r in rows
    ]
    assert got == want
    assert "<EMAIL>" in got[0] and "<PHONE>" in got[0]
    assert got[1].count("<IP>") == 3 and got[2] == rows[2]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    red = docs.select(redact_pii(F.col("text")).alias("t"))
    assert red.filter(F.col("t").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+")).count() == 0


def test_cluster_survivor_by_quality(spark):
    """Quality-aware canonical selection: per near-dup cluster the
    highest-score present member wins (ties -> min id), the component
    KEY stays the min present id, singletons are their own canonical,
    and a cluster whose best-scored member was filtered out of docs
    re-roots on the best surviving one."""
    from pyspark.sql import functions as F

    from quackpipe_spark.operators.cluster import cluster_near_dups_by_quality

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (5, 0.5), (7, 0.1)],
        "doc_id long, quality double",
    )  # doc 4 exists in pairs but was filtered out of docs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a long, b long"
    )
    out = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in cluster_near_dups_by_quality(docs, pairs).collect()
    }
    # cluster {1,2,3}: key=1 (min id), canonical=2 (score tie 2 vs 3 -> min id)
    assert out[1] == (1, False) and out[2] == (1, True) and out[3] == (1, False)
    # cluster {4,5} with 4 absent: key re-roots to 5, canonical 5
    assert out[5] == (5, True)
    # singleton
    assert out[7] == (7, True)
    # exactly one canonical per component
    from collections import Counter

    c = Counter(comp for comp, canon in out.values() if canon)
    assert all(v == 1 for v in c.values())


def test_simhash_dedup_auto_width_probe(spark, monkeypatch):
    """bits='auto' picks 32-bit signatures up to SIMHASH_AUTO_32_MAX docs
    and 64-bit beyond (the n²/2¹⁶ collision-knee guard, VERDICT r12 #2);
    both paths produce the duplicate pair."""
    calls = []
    real = D.simhash

    def spy(docs, id_col="doc_id", text_col="text", bits=64):
        calls.append(bits)
        return real(docs, id_col, text_col, bits=bits)

    monkeypatch.setattr(D, "simhash", spy)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "unrelated words here")],
        "doc_id long, text string",
    )
    out = D.simhash_dedup(df, max_hamming=0)
    assert {(r["a"], r["b"]) for r in out.collect()} == {(1, 2)}
    assert calls == [32]  # 3 docs <= threshold → gate-parity width
    monkeypatch.setattr(D, "SIMHASH_AUTO_32_MAX", 1)
    out = D.simhash_dedup(df, max_hamming=0)
    assert {(r["a"], r["b"]) for r in out.collect()} == {(1, 2)}
    assert calls[-1] == 64  # past threshold → scale-safe width


def test_simhash_near_pairs_auto_bands_validation(spark):
    """bands='auto' needs max_hamming < bits to have an exact split; the
    check fires before any job (same contract as the divisor check)."""
    class _Boom:
        def persist(self):
            raise AssertionError("persist ran before validation")

    with pytest.raises(ValueError, match="max_hamming"):
        D.simhash_near_pairs(_Boom(), bits=32, max_hamming=32, bands="auto")
    with pytest.raises(ValueError, match="divides"):
        D.simhash_near_pairs(_Boom(), bands="nope")


def test_simhash_dedup_warns_on_auto_width_flip(spark, monkeypatch, caplog):
    """A growing corpus crossing SIMHASH_AUTO_32_MAX flips the auto width,
    which changes the (width-relative) hamming metric space — the flip
    must be LOGGED, not silent (VERDICT r13 #6)."""
    import logging

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(D, "_LAST_AUTO_BITS", None)
    with caplog.at_level(logging.WARNING, logger="quackpipe_spark.operators.dedup"):
        D.simhash_dedup(df, max_hamming=0).collect()  # resolves 32-bit
        assert not [r for r in caplog.records if "width-relative" in r.getMessage()]
        monkeypatch.setattr(D, "SIMHASH_AUTO_32_MAX", 1)
        D.simhash_dedup(df, max_hamming=0).collect()  # flips to 64-bit
    msgs = [r.getMessage() for r in caplog.records]
    assert any("64-bit" in m and "32-bit" in m and "width-relative" in m for m in msgs)
    assert D._LAST_AUTO_BITS == 64
    # pinned bits never touch the auto memory or warn
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="quackpipe_spark.operators.dedup"):
        D.simhash_dedup(df, max_hamming=0, bits=32).collect()
    assert not caplog.records
    assert D._LAST_AUTO_BITS == 64
