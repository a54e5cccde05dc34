"""Incremental dedup against a persisted minhash band index — the
daily-increment workflow: index the corpus once, probe each new batch,
append survivors. Candidates must agree exactly with the batch self-join
formulation on the union, the index side must broadcast-join (never
shuffle), and recipe parameters must be pinned by the index meta."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackpipe_spark.operators import dedup as D
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def split(docs):
    corpus = docs.filter(F.col("doc_id") % 5 != 0).cache()
    batch = docs.filter(F.col("doc_id") % 5 == 0).cache()
    return corpus, batch


@pytest.fixture(scope="module")
def index_path(spark, split, tmp_path_factory):
    corpus, _ = split
    path = str(tmp_path_factory.mktemp("mh_index") / "idx")
    D.write_minhash_index(corpus, path)
    return path


def _expected_cross_candidates(spark, corpus, batch):
    """Reference formulation: band tables of both sides joined on
    (band, bh) — exactly what the full self-join on the union would
    yield, restricted to cross pairs."""
    cb = D.band_table(D.minhash_signatures(corpus))
    bb = D.band_table(D.minhash_signatures(batch))
    return {
        (r["new_id"], r["old_id"])
        for r in cb.join(
            bb.select(F.col("doc_id").alias("new_id"), "band", "bh"),
            ["band", "bh"],
        )
        .select("new_id", F.col("doc_id").alias("old_id"))
        .distinct()
        .collect()
    }


def test_probe_matches_selfjoin_cross_subset(spark, split, index_path):
    corpus, batch = split
    got = {
        (r["new_id"], r["old_id"])
        for r in D.dedup_against_index(batch, index_path).collect()
    }
    assert got == _expected_cross_candidates(spark, corpus, batch)
    assert got, "sf0.001 documents plant near-dups; cross candidates expected"


def test_probe_verified_matches_jaccard_verify(spark, split, index_path):
    corpus, batch = split
    out = D.dedup_against_index(
        batch, index_path, corpus=corpus, threshold=0.5
    ).collect()
    assert out, "planted near-dups should verify at 0.5"
    cands = D.dedup_against_index(batch, index_path)
    pairs = cands.select(F.col("new_id").alias("a"), F.col("old_id").alias("b"))
    both = corpus.select("doc_id", "text").unionByName(batch.select("doc_id", "text"))
    exp = {
        (r["a"], r["b"]): r["jaccard"]
        for r in D.jaccard_verify(both, pairs, threshold=0.5).collect()
    }
    assert {(r["new_id"], r["old_id"]): r["jaccard"] for r in out} == exp


def test_probe_plan_broadcasts_batch_not_index(spark, split, index_path):
    _, batch = split
    plan = (
        D.dedup_against_index(batch, index_path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the index scan feeds the join directly — no shuffle of index rows:
    # between the join node and the broadcast (= the streamed index side)
    # there must be only the scan + null filter
    idx_side = plan.split("BroadcastHashJoin", 1)[1].split("BroadcastExchange")[0]
    assert "bands" in idx_side
    assert "Exchange" not in idx_side


def _plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_probe_broadcast_is_size_gated(spark, split, index_path):
    """The broadcast hint is gated on the batch row count: under the
    bound the plan pins BroadcastHashJoin; over it the hint is DROPPED
    and (with auto-broadcast off, as a real outsized batch would be) the
    join degrades to a shuffle join instead of a forced-broadcast OOM."""
    _, batch = split
    small = _plan_str(
        D.dedup_against_index(batch, index_path, broadcast_max_rows=10_000_000)
    )
    assert "BroadcastHashJoin" in small and "SortMergeJoin" not in small
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = _plan_str(
            D.dedup_against_index(batch, index_path, broadcast_max_rows=1)
        )
        assert "BroadcastHashJoin" not in big
        assert "SortMergeJoin" in big or "ShuffledHashJoin" in big
        big_exact = _plan_str(
            D.exact_dups_against_index(batch, index_path, broadcast_max_rows=1)
        )
        assert "BroadcastHashJoin" not in big_exact
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # results identical either side of the gate
    a = {
        (r["new_id"], r["old_id"])
        for r in D.dedup_against_index(
            batch, index_path, broadcast_max_rows=1
        ).collect()
    }
    b = {
        (r["new_id"], r["old_id"])
        for r in D.dedup_against_index(batch, index_path).collect()
    }
    assert a == b


def test_index_meta_pins_text_col(spark, split, tmp_path):
    """An index built from a non-default text column: probes default to
    the pinned column; an explicit mismatch raises instead of silently
    shingling the wrong column."""
    corpus, batch = split
    path = str(tmp_path / "idx_body")
    corpus_renamed = corpus.withColumnRenamed("text", "body")
    D.write_minhash_index(corpus_renamed, path, text_col="body")
    # batch ALSO carries a 'text' column — the silent-mismatch trap
    probe = batch.withColumn("body", F.col("text")).withColumn(
        "text", F.lit("decoy decoy decoy")
    )
    got = {
        (r["new_id"], r["old_id"])
        for r in D.dedup_against_index(probe, path).collect()
    }
    assert got == _expected_cross_candidates(spark, corpus, batch)
    with pytest.raises(ValueError, match="text_col"):
        D.dedup_against_index(probe, path, text_col="text")
    with pytest.raises(ValueError, match="text_col"):
        D.exact_dups_against_index(probe, path, text_col="text")
    with pytest.raises(ValueError, match="text_col"):
        D.append_to_minhash_index(probe, path, text_col="text")


def test_param_mismatch_raises(split, index_path):
    _, batch = split
    with pytest.raises(ValueError, match="shingle_k"):
        D.dedup_against_index(batch, index_path, shingle_k=5)


def test_append_then_probe_finds_appended(spark, split, index_path, tmp_path):
    corpus, batch = split
    path = str(tmp_path / "idx2")
    D.write_minhash_index(corpus, path)
    D.append_to_minhash_index(batch, path)
    # a clone of an appended batch doc under a fresh id must now collide.
    # Collect the row ONCE: limit(1) without orderBy has no row-order
    # guarantee, so evaluating it twice could pick two different docs.
    row = batch.orderBy("doc_id").limit(1).collect()[0]
    orig_id = row["doc_id"]
    probe = spark.createDataFrame(
        [(orig_id + 10_000_000, row["text"])], "doc_id long, text string"
    )
    got = D.dedup_against_index(probe, path).collect()
    assert any(r["old_id"] == orig_id for r in got)


def test_exact_dups_against_index(spark, split, index_path):
    corpus, batch = split
    # clone two corpus docs verbatim under fresh batch ids
    clones = corpus.limit(2).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    probe = clones.unionByName(
        batch.limit(3).select("doc_id", "text")
    )
    got = {
        (r["new_id"], r["old_id"])
        for r in D.exact_dups_against_index(probe, index_path).collect()
    }
    exp_orig = {r["doc_id"] for r in corpus.limit(2).collect()}
    assert {o for n, o in got if n >= 20_000_000} >= exp_orig
    # batch docs are disjoint from the corpus, so any hit for them must
    # be a genuine full-text duplicate planted by the generator
    fp = {
        r["doc_id"]: r["fingerprint"]
        for r in corpus.select(
            "doc_id", F.md5("text").alias("fingerprint")
        ).collect()
    }
    for n, o in got:
        if n < 20_000_000:
            row = batch.filter(F.col("doc_id") == n).collect()[0]
            import hashlib

            assert hashlib.md5(row["text"].encode()).hexdigest() == fp[o]


def test_streaming_probe_matches_batch_probe(spark, split, index_path, tmp_path):
    """foreachBatch index probing over two micro-batches accumulates the
    same flag set as one batch probe of the concatenated stream."""
    import json

    from quackpipe_spark.streaming.stateful import index_probe_writer

    _, batch = split
    rows = [(r["doc_id"], r["text"]) for r in batch.limit(6).collect()]
    b1, b2 = rows[:3], rows[3:]
    src = tmp_path / "probe_src"
    src.mkdir()
    out_dir = str(tmp_path / "flags")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(index_probe_writer(index_path, out_dir))
        .option("checkpointLocation", str(tmp_path / "probe_ckpt"))
        .start()
    )
    try:
        for bi, chunk in enumerate([b1, b2]):
            (src / f"b{bi}.json").write_text(
                "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in chunk)
            )
            q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r["new_id"], r["old_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    whole = spark.createDataFrame(rows, "doc_id long, text string")
    expected = {
        (r["new_id"], r["old_id"])
        for r in D.dedup_against_index(whole, index_path).collect()
    }
    assert streamed == expected


def test_probe_empty_and_short_batches(spark, index_path):
    """An empty batch or one with only sub-shingle docs probes to zero
    candidates (no crash, no spurious pairs)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert D.dedup_against_index(empty, index_path).count() == 0
    short = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None)], "doc_id long, text string"
    )
    assert D.dedup_against_index(short, index_path).count() == 0
    assert D.exact_dups_against_index(empty, index_path).count() == 0


def test_diff_fingerprint_indexes(spark, split, tmp_path):
    """Version diff over two snapshots: removed / added / changed / same
    classified purely from the fingerprint tables."""
    corpus, _ = split
    v1 = corpus.limit(20).cache()
    rows = v1.collect()
    v1_ids = [r["doc_id"] for r in rows]
    # v2: drop the first doc, add one, change one, keep the rest
    changed_id = v1_ids[1]
    v2 = spark.createDataFrame(
        [(r["doc_id"], r["text"] + (" EDITED" if r["doc_id"] == changed_id else ""))
         for r in rows[1:]] + [(30_000_001, "a brand new doc body")],
        "doc_id long, text string",
    )
    pa, pb = str(tmp_path / "va"), str(tmp_path / "vb")
    D.write_minhash_index(v1, pa)
    D.write_minhash_index(v2, pb)
    got = {r["doc_id"]: r["status"] for r in D.diff_fingerprint_indexes(spark, pa, pb).collect()}
    assert got[v1_ids[0]] == "removed"
    assert got[30_000_001] == "added"
    assert got[changed_id] == "changed"
    assert all(got[i] == "same" for i in v1_ids[2:])


def test_probe_hint_skips_derived_batch(spark):
    """A DERIVED (non-scan) un-cached batch must NOT be evaluated by the
    gate's count() (that would re-run the lineage the probe runs again)
    and must NOT be persisted (the probe is lazy, so a persist here could
    never be released — it would leak executor storage across a
    foreachBatch loop). It takes the no-hint path; AQE still broadcasts
    small executed batches at runtime. A cached derived batch and a
    scan-shaped batch still get the forced-gate count."""
    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return x

    udf = F.udf(bump, "long")
    derived = (
        spark.range(0, 100, 1, 4)
        .withColumn("y", udf("id"))
        .groupBy("y")
        .count()
    )
    probe = derived.select("y")
    out = D._probe_hint(probe, derived, max_rows=10_000)
    assert acc.value == 0  # gate did not evaluate the lineage
    assert not (derived.storageLevel.useMemory or derived.storageLevel.useDisk)
    # no forced broadcast hint on the returned probe plan
    assert "hint" not in out._jdf.queryExecution().logical().toString().lower()
    # caller-persisted derived batch: counts as cached, gate engages
    derived.persist()
    try:
        out2 = D._probe_hint(probe, derived, max_rows=10_000)
        assert acc.value == 100  # one pass (the gate count), cached now
        assert "hint" in out2._jdf.queryExecution().logical().toString().lower()
    finally:
        derived.unpersist()
    # scan-shaped source: gated (cheap count), never persisted
    scan = spark.range(0, 10)
    out3 = D._probe_hint(scan, scan, max_rows=10_000)
    assert not (scan.storageLevel.useMemory or scan.storageLevel.useDisk)
    assert "hint" in out3._jdf.queryExecution().logical().toString().lower()
