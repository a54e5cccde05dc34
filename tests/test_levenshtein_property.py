"""Property test for the batch-vectorized levenshtein kernel (r12).

The Spark-side differential (tests/test_extensions_planner.py) checks the
UDF against the JVM built-in over fixed + 200 random ASCII pairs; this
property drives the raw kernel (``levenshtein_vec.func``, driver-side —
no jobs) against a classic scalar DP over arbitrary-unicode strings,
covering surrogate-adjacent code points, repeated characters, empty
strings, and mixed-length batches in one call (the batching itself is
part of what's under test: padded rows must not bleed into each other).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def _scalar_lev(s: str, t: str) -> int:
    if s == t:
        return 0
    if not s:
        return len(t)
    if not t:
        return len(s)
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


# arbitrary unicode minus surrogates (not encodable to utf-32)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
)


@settings(max_examples=100, deadline=None)
@given(pairs=st.lists(st.tuples(_text, _text), min_size=1, max_size=25))
def test_batch_kernel_matches_scalar_dp(spark, pairs):
    from quackpipe_spark.functions.extensions import levenshtein_vec

    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = levenshtein_vec.func(a, b)
    for k, (s, t) in enumerate(pairs):
        assert got.iloc[k] == _scalar_lev(s, t), (k, s, t)


@settings(max_examples=25, deadline=None)
@given(pairs=st.lists(st.tuples(_text, _text), min_size=1, max_size=25))
def test_chunked_batches_match_unchunked(spark, pairs):
    """The cell-budget chunker (review r12: one long outlier must not pad
    the whole batch's DP grid) is a pure partitioning of the batch — a
    pathologically tiny budget that forces one-row chunks must produce
    byte-identical results to the default single-chunk path."""
    import os

    from quackpipe_spark.functions.extensions import levenshtein_vec

    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    base = levenshtein_vec.func(a, b)
    os.environ["QS_LEV_CELL_BUDGET"] = "1"  # one-row chunks
    try:
        assert levenshtein_vec.func(a, b).equals(base)
    finally:
        del os.environ["QS_LEV_CELL_BUDGET"]


def test_long_outlier_pads_only_its_own_chunk(spark):
    """A ~100 KB string mixed into a batch of short rows runs in bounded
    memory (the outlier gets its own chunk) and every row still matches
    the scalar reference on the short rows / length identity on the long
    one (s vs '' → distance = len)."""
    from quackpipe_spark.functions.extensions import levenshtein_vec

    long_s = "ab" * 50_000
    a = pd.Series(["kitten", long_s, "flaw", None])
    b = pd.Series(["sitting", "", "lawn", "x"])
    got = levenshtein_vec.func(a, b)
    assert got.iloc[0] == 3
    assert got.iloc[1] == len(long_s)
    assert got.iloc[2] == 2
    assert pd.isna(got.iloc[3])
