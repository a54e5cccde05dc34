"""Randomized differential for duplicate_passages: 60 random corpora
(tiny alphabets force heavy gram collisions and adjacent/overlapping
span merges) checked against an independent pure-Python reference.
All examples ride ONE Spark job: tokens are namespaced per example so
grams can never collide across examples."""

from __future__ import annotations

import random

from quackpipe_spark.operators.dedup import duplicate_passages

K = 3
MIN_DUP = 2


def _py_passages(docs, k, min_dup):
    """Independent reference: gram → doc set, flag, merge (a gram extends
    the span iff its start ≤ previous flagged start + k)."""
    gram_docs = {}
    doc_grams = {}
    for did, toks in docs:
        for i in range(len(toks) - k + 1):
            g = tuple(toks[i : i + k])
            gram_docs.setdefault(g, set()).add(did)
            doc_grams.setdefault(did, []).append((i, g))
    spans = set()
    for did, pg in doc_grams.items():
        flagged = sorted(i for i, g in pg if len(gram_docs[g]) >= min_dup)
        start = prev = None
        n = 0
        for p in flagged:
            if start is None:
                start, prev, n = p, p, 1
            elif p <= prev + k:
                prev, n = p, n + 1
            else:
                spans.add((did, start, prev + k, n))
                start, prev, n = p, p, 1
        if start is not None:
            spans.add((did, start, prev + k, n))
    return spans


def test_random_corpora_match_python_reference(spark):
    rng = random.Random(7)
    examples = []
    for ei in range(60):
        alphabet = [f"e{ei}w{j}" for j in range(rng.randint(2, 5))]
        docs = []
        for did in range(rng.randint(2, 5)):
            length = rng.randint(0, 14)
            docs.append((did, [rng.choice(alphabet) for _ in range(length)]))
        examples.append((ei, docs))

    rows = [
        (ei * 100 + did, " ".join(toks))
        for ei, docs in examples
        for did, toks in docs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicate_passages(df, k=K, min_dup_docs=MIN_DUP).collect()
    }

    expect = set()
    for ei, docs in examples:
        for did, s, e, n in _py_passages(docs, K, MIN_DUP):
            expect.add((ei * 100 + did, s, e, n))
    assert got == expect
    # sanity: the generator actually produced work (collisions are near-
    # certain with 2-5 token alphabets over 60 examples)
    assert len(expect) > 20
