"""Non-triviality pins for gate queries (round-14 audit).

Round 13 found a gate passing trivially (asof_last_login's right side was
EMPTY — the filtered event type didn't exist in the corpus). A follow-up
audit of all 50 gates' result shapes found the same class hiding in four
more: the synthetic corpus has no exact-duplicate texts, no multi-line
docs, and no punctuation/PII at the verification SFs, so dedup_exact
never formed a >1 cluster, line_dedup_boilerplate never removed a line,
text_analyze verified its PII/punct signals as constant zeros (and the
3-pass redact chain as an identity hash), and pivot_event_types carried
two all-zero columns for event types that don't exist. The gates now
synthesize the stressed feature deterministically inside the query (both
engines); these tests pin that the stressed path actually FIRES, so a
future corpus or query change can't quietly restore the trivial pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_no_gate_returns_empty(spark):
    """An EMPTY Spark result matching an EMPTY oracle still hash-passes —
    that's exactly how r13's asof_last_login trivial pass hid. Every gate
    must return at least one row even at the smallest SF, so an
    empty-in-empty-out regression (a filter on a value that stops
    existing, a join side going dry) fails loudly here instead of
    passing quietly in the oracle compare."""
    import __spark_entry__ as em

    qs = em.queries()
    empty = [n for n in sorted(qs) if qs[n](spark, SF_DIR).count() == 0]
    assert not empty, f"gates with empty results at {SF_DIR}: {empty}"


def test_dedup_exact_gate_forms_real_clusters(spark):
    from quackpipe_spark.workloads.llm_ops import dedup_exact

    rows = dedup_exact(spark, SF_DIR).collect()
    multi = [r for r in rows if r["n_copies"] > 1]
    assert multi, "dedup_exact gate must exercise >1-copy clusters"
    # survivor rule: the replica ids are shifted by +1e9, so min-id must
    # always pick an ORIGINAL doc id
    assert all(r["keep_id"] < 1_000_000_000 for r in multi)


def test_line_dedup_gate_removes_and_protects(spark):
    from quackpipe_spark.workloads.curation import line_dedup_boilerplate

    rows = line_dedup_boilerplate(spark, SF_DIR).collect()
    assert any(r["n_removed"] > 0 for r in rows), "boilerplate removal must fire"
    assert any(r["n_removed"] == 0 for r in rows), "removal must vary by doc"
    # the short 'd<digit>' line is duplicated across docs but under the
    # 8-char eligibility floor: protection must keep it in every doc
    assert all(
        r["text"].splitlines()[-1].startswith("d") and len(r["text"].splitlines()[-1]) <= 3
        for r in rows
        if r["text"]
    )


def test_text_analyze_gate_exercises_pii_and_punct(spark):
    from quackpipe_spark.workloads.llm_ops import text_analyze

    rows = text_analyze(spark, SF_DIR).collect()
    assert any(r["n_emails"] > 0 for r in rows)
    assert any(r["n_urls"] > 0 for r in rows)
    assert any(r["punct_ratio"] > 0 for r in rows)
    # the untouched fifth keeps the zero path alive
    assert any(r["n_emails"] == 0 for r in rows)
    # redaction must be NON-identity where PII was injected: the redacted
    # fingerprint of an augmented doc differs from the md5 of the SAME
    # augmented text the gate analyzed (comparing against the raw corpus
    # text would hold even for a no-op redaction — the tail alone
    # changes the hash)
    aug = [r for r in rows if r["n_emails"] > 0]
    from quackpipe_spark.sources.tables import table_df
    from quackpipe_spark.workloads.llm_ops import _text_aug_col

    docs = {
        r["doc_id"]: r["fp"]
        for r in table_df(spark, SF_DIR, "documents")
        .select("doc_id", F.md5(_text_aug_col()).alias("fp"))
        .collect()
    }
    assert all(r["redacted_fp"] != docs[r["doc_id"]] for r in aug)
    # and the untouched fifth IS identity (no PII → redaction changes
    # nothing): pins that the inequality above comes from redaction, not
    # an accidental text mismatch
    plain = [r for r in rows if r["doc_id"] % 5 == 4]
    assert plain and all(r["redacted_fp"] == docs[r["doc_id"]] for r in plain)


def test_passage_spans_gate_has_nonzero_starts(spark):
    from quackpipe_spark.workloads.curation import duplicate_passage_spans

    rows = duplicate_passage_spans(spark, SF_DIR).collect()
    assert rows, "passage detection must fire"
    # the per-doc unique prefix shifts every shared span off position 0,
    # exercising the gram-offset/min-pos arithmetic with varying values
    assert all(r["span_start"] > 0 for r in rows)
    assert len({r["span_start"] for r in rows}) > 1


def test_dialect_gate_dup_token_ratio_varies(spark):
    from quackpipe_spark.workloads.sql_surface import ch_dialect_functions

    rows = ch_dialect_functions(spark, SF_DIR).collect()
    ratios = {r["name_dup_ratio"] for r in rows}
    assert any(x > 0 for x in ratios) and 0.0 in ratios


def test_pivot_gate_has_real_and_zero_fill_columns(spark):
    from quackpipe_spark.workloads.sql_surface import pivot_event_types

    rows = pivot_event_types(spark, SF_DIR).collect()
    for real in ("click", "view", "purchase", "signup"):
        assert any(r[real] > 0 for r in rows), f"{real} must carry real counts"
    # 'login' stays DELIBERATELY absent from the corpus: the all-zero
    # column pins the explicit-values + na.fill(0) zero-fill path
    assert all(r["login"] == 0 for r in rows)
