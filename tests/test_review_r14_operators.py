"""Regression tests for the r14 operators-module review findings
(cluster/packing/sampling/text)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bigram_lm_empty_model_raises(spark):
    """An empty bigram model (no train doc with >= 2 tokens) previously
    made every score NULL — a ppl-threshold filter then dropped the
    whole corpus silently. Must raise loudly instead."""
    from quackpipe_spark.operators.text import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "hello world foo"), (2, "bar baz")], "doc_id long, text string"
    )
    train = spark.createDataFrame([(9, "single")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bigram model is empty"):
        bigram_lm_score(docs, train=train)


def test_pack_stats_clips_negative_tokens_like_the_packer(spark):
    """pack_sequences packs a corrupt negative n_tokens as 0; pack_stats
    must sum the SAME clipped value or the manifest disagrees with the
    budgets the packer enforced."""
    from quackpipe_spark.operators.packing import pack_sequences, pack_stats

    docs = spark.createDataFrame(
        [(1, 100), (2, -5000), (3, 50)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(docs, budget=1000, n_shards=1)
    stats = pack_stats(packed).collect()
    assert sum(r["n_tokens"] for r in stats) == 150  # -5000 counted as 0


def test_hash_mod_py_matches_column_twin_guard():
    """The Python twin must enforce the SAME int32 modulus bound as the
    Column version (past it the engine side wraps negative — the twin
    would name buckets the engine can never produce)."""
    from quackpipe_spark.operators.sampling import hash_mod_py

    assert isinstance(hash_mod_py("k", 10_000), int)
    with pytest.raises(ValueError, match="int32"):
        hash_mod_py("k", 2**32)
    with pytest.raises(ValueError, match="int32"):
        hash_mod_py("k", 2**31)


def test_pack_sequences_refuses_column_collisions(spark):
    """A pre-existing 'shard' (or pack_col) column was silently
    clobbered by withColumn and the pack window then partitioned on the
    NEW values — caller data lost. Must refuse."""
    from quackpipe_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, 10, 7)], "doc_id long, n_tokens long, shard long"
    )
    with pytest.raises(ValueError, match="shard"):
        pack_sequences(docs)
    docs2 = spark.createDataFrame(
        [(1, 10, 7)], "doc_id long, n_tokens long, pack_id long"
    )
    with pytest.raises(ValueError, match="pack_id"):
        pack_sequences(docs2)


def test_cluster_near_dups_single_window_reroot(spark):
    """The re-root is one component-partitioned window (same shape as
    the quality variant), not groupBy + join-back: values identical,
    one less exchange."""
    from quackpipe_spark.operators.cluster import cluster_near_dups

    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a long, b long"
    )
    rows = {r["doc_id"]: (r["component"], r["is_canonical"])
            for r in cluster_near_dups(docs, pairs).collect()}
    assert rows[1] == (1, True) and rows[2] == (1, False) and rows[3] == (1, False)
    assert rows[5] == (5, True) and rows[6] == (5, False)
    assert rows[4] == (4, True) and rows[7] == (7, True)  # singletons


def test_analyze_tokenizes_once(spark):
    """analyze()'s projection must materialize ONE tokenize(text) array
    consumed by every token metric — not one split per metric (the
    CodegenFallback aggregate re-split the document interpreted). The
    optimized plan carries few split() nodes: the shared _toks,
    fingerprint's own normalization split, and the bigram side's."""
    from quackpipe_spark.operators.text import analyze

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h")], "doc_id long, text string"
    )
    plan = analyze(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") <= 4, plan.count("split(")
    # and values still flow: token metrics populated
    row = {r["doc_id"]: r for r in analyze(docs).collect()}
    assert row[1]["n_tokens"] == 5 and row[2]["n_tokens"] == 3
