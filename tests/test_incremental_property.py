"""Randomized pure-Python differential for the incremental index probe:
an INDEPENDENT hashlib implementation of the minhash/banding recipe
(tokenize → shingle → 16 min-md5 sigs → 4 band hashes) must predict
exactly which (new, old) pairs the Spark probe emits. Tiny word pools
make band collisions near-certain; every example rides one index +
one probe via per-example id namespacing."""

from __future__ import annotations

import hashlib
import random
import re

from pyspark.sql import functions as F

from quackpipe_spark.operators import dedup as D

NUM_HASHES, BANDS, K = 16, 4, 3
_WS = re.compile(r"\s+", re.ASCII)


def _py_bands(text):
    toks = _WS.split(text.strip().lower())
    if len(toks) < K:
        return []
    sh = {" ".join(toks[j : j + K]) for j in range(len(toks) - K + 1)}
    enc = [s.encode() for s in sh]
    sigs = [
        min(hashlib.md5(f"{i}|".encode() + e).hexdigest() for e in enc)
        for i in range(NUM_HASHES)
    ]
    r = NUM_HASHES // BANDS
    return [
        (b, hashlib.md5("".join(sigs[b * r : (b + 1) * r]).encode()).hexdigest())
        for b in range(BANDS)
    ]


def test_probe_random_matches_python_recipe(spark, tmp_path):
    rng = random.Random(23)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    corpus_rows, batch_rows = [], []
    for ei in range(25):
        base = " ".join(rng.choices(words, k=rng.randint(3, 12)))
        ns = ei * 1000
        corpus_rows.append((ns + 1, base))
        corpus_rows.append(
            (ns + 2, " ".join(rng.choices(words, k=rng.randint(3, 12))))
        )
        # batch: an exact clone (certain collision), a one-word mutation
        # (probable partial collision), and an unrelated doc
        batch_rows.append((ns + 501, base))
        mut = base.split()
        mut[rng.randrange(len(mut))] = rng.choice(words)
        batch_rows.append((ns + 502, " ".join(mut)))
        batch_rows.append(
            (ns + 503, " ".join(rng.choices(words, k=rng.randint(3, 12))))
        )

    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    path = str(tmp_path / "prop_idx")
    D.write_minhash_index(corpus, path)

    got = {
        (r["new_id"], r["old_id"])
        for r in D.dedup_against_index(batch, path).collect()
    }

    corpus_bands = {}
    for did, text in corpus_rows:
        for key in _py_bands(text):
            corpus_bands.setdefault(key, set()).add(did)
    expected = set()
    for did, text in batch_rows:
        for key in _py_bands(text):
            for old in corpus_bands.get(key, ()):
                expected.add((did, old))
    assert got == expected
    # sanity: every exact clone collided
    assert all((ei * 1000 + 501, ei * 1000 + 1) in expected for ei in range(25))


def test_exact_probe_random_matches_md5_reference(spark, tmp_path):
    rng = random.Random(31)
    texts = [f"doc body {i} {'x' * rng.randint(0, 5)}" for i in range(30)]
    corpus_rows = [(i, rng.choice(texts)) for i in range(40)]
    batch_rows = [(1000 + i, rng.choice(texts)) for i in range(15)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    path = str(tmp_path / "prop_idx_exact")
    D.write_minhash_index(corpus, path)

    got = {
        (r["new_id"], r["old_id"])
        for r in D.exact_dups_against_index(batch, path).collect()
    }
    expected = {
        (n, o)
        for n, tn in batch_rows
        for o, to in corpus_rows
        if tn == to
    }
    assert got == expected and expected
