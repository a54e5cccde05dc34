"""Round-16 chunked pair emission: a degenerate (all-colliding) bucket
must emit its full quadratic pair set through O(m)-sized physical rows —
never one m*(m-1)/2-struct row (the skewed-bucket OOM class the r15
flatten(transform(transform)) form carried; guide §2.5 / ADVICE r15)."""

from __future__ import annotations

import itertools
import re

from quackpipe_spark.operators import dedup as D


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _degenerate_docs(spark, n=120):
    # n identical texts -> identical signatures -> ONE bucket per band
    # holding every doc: the worst-case skew shape (boilerplate corpus)
    return spark.createDataFrame(
        [(i, "the exact same boilerplate text repeated in every document")
         for i in range(n)],
        "doc_id long, text string",
    )


def test_lsh_candidates_degenerate_bucket_full_pairs(spark):
    docs = _degenerate_docs(spark, 120)
    sigs = D.minhash_signatures(docs, num_hashes=12)
    got = {(r.a, r.b) for r in D.lsh_candidates(sigs, num_hashes=12).collect()}
    expect = set(itertools.combinations(range(120), 2))
    assert got == expect  # nothing capped, nothing duplicated, all a < b


def test_simhash_degenerate_bucket_full_pairs(spark):
    docs = _degenerate_docs(spark, 120)
    sigs = D.simhash(docs, bits=32)
    rows = D.simhash_near_pairs(sigs, bits=32, max_hamming=1, bands=2).collect()
    got = {(r.a, r.b) for r in rows}
    expect = set(itertools.combinations(range(120), 2))
    assert got == expect
    assert all(r.hamming == 0 for r in rows)


def test_pair_emission_is_chunked_not_single_row(spark):
    """Both emitters: the pair stream must come from TWO stacked
    generates (posexplode member index, then the per-member tail slice)
    so each physical row is O(bucket size); the single-row
    explode(flatten(transform(transform(...)))) shape is the regression
    this test pins out."""
    docs = _degenerate_docs(spark, 8)
    for df in (
        D.lsh_candidates(D.minhash_signatures(docs, num_hashes=12), num_hashes=12),
        D.simhash_near_pairs(D.simhash(docs, bits=32), bits=32, max_hamming=1),
    ):
        p = _plan(df)
        assert "explode(flatten(transform(" not in p
        assert "posexplode" in p
        # the slice feeding the upper explode is computed per exploded
        # member row (start = the posexplode index + 2), not inside one
        # nested per-bucket expression
        assert re.search(r"explode\(slice\(", p)
