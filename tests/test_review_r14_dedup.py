"""Regression tests for the r14 dedup-module review findings."""

from __future__ import annotations

import os

import pytest


def test_band_table_rejects_zero_hashes(spark):
    """num_hashes=0 slipped the modulo-only guard (0 % bands == 0) and
    degenerated every band hash to md5('') — the documented full n×n
    cross product with no error (execution-confirmed)."""
    from quackpipe_spark.operators.dedup import lsh_candidates

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ee ff gg hh"), (3, "ii jj kk ll")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="bands must divide"):
        lsh_candidates(docs, num_hashes=0, bands=4).collect()


def test_strip_duplicate_passages_preserves_null_text(spark):
    """Same NULL→'' rewrite class as line_dedup: a NULL-text doc must
    come back NULL, not as an empty string that collapses with every
    other formerly-NULL doc in downstream exact dedup."""
    from quackpipe_spark.operators.dedup import strip_duplicate_passages

    base = "one two three four five six seven eight nine ten " * 3
    df = spark.createDataFrame(
        [(1, base + "tail one"), (2, base + "tail two"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in strip_duplicate_passages(df, k=8).collect()}
    assert rows[3]["text"] is None


def test_append_pending_marker_detects_torn_append(spark, tmp_path):
    """A leftover .append-pending marker (crash between the bands and
    fingerprints appends) must refuse index access loudly — the halves
    may disagree and no repair can identify the torn rows."""
    from quackpipe_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon token{i}") for i in range(30)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    D.write_minhash_index(docs, path)
    # clean append leaves no marker
    more = spark.createDataFrame(
        [(100 + i, f"zeta eta theta iota kappa word{i}") for i in range(10)],
        "doc_id long, text string",
    )
    D.append_to_minhash_index(more, path)
    assert not [f for f in os.listdir(path) if f.startswith(".append-pending-")]
    # simulate the torn state
    open(os.path.join(path, ".append-pending-deadbeef"), "w").close()
    with pytest.raises(RuntimeError, match="append-pending"):
        D.dedup_against_index(more, path)
