"""Cross-document line-level dedup: planted-boilerplate semantics plus a
full differential against the identical recipe in DuckDB on the real
sf0.001 documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from quackpipe_spark.operators.dedup import line_dedup


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_line_dedup_planted_boilerplate(spark):
    banner = "ACCEPT ALL COOKIES to continue reading this site"
    rows = [
        (1, f"{banner}\nunique alpha content line one\nshort", "web"),
        (2, f"unique beta content line two\n{banner}", "web"),
        (3, "no boilerplate here at all today", "book"),
        (4, f"  {banner}  \nunique gamma content", "web"),  # trim-normalized
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert out[1]["text"] == "unique alpha content line one\nshort"
    assert out[1]["n_removed"] == 1 and out[1]["n_lines"] == 3
    assert out[2]["text"] == "unique beta content line two"
    # trimming normalizes the key but the surviving text keeps its own form
    assert out[4]["text"] == "unique gamma content"
    assert out[3]["text"] == rows[2][1] and out[3]["n_removed"] == 0
    # non-text columns survive
    assert out[3]["source"] == "book"


def test_line_dedup_short_lines_protected_and_empty_doc(spark):
    rows = [
        (1, "---\nreal content only in doc one"),
        (2, "---\nreal content only in doc two"),
        (3, "the whole doc is boilerplate text"),
        (4, "the whole doc is boilerplate text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    # "---" is under min_line_chars: shared but never removed
    assert out[1]["text"].startswith("---\n")
    assert out[3]["text"] == "" and out[3]["n_removed"] == 1


def test_line_dedup_matches_duckdb(spark, docs, duck):
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in line_dedup(docs).collect()
    }
    exp = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            """
WITH lines AS (
  SELECT doc_id, generate_subscripts(sp, 1) AS pos, unnest(sp) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS sp FROM documents)
), keyed AS (
  SELECT doc_id, pos, line, md5(trim(line)) AS k,
         len(trim(line)) >= 8 AS eligible
  FROM lines
), dup AS (
  SELECT k FROM (SELECT DISTINCT doc_id, k FROM keyed WHERE eligible)
  GROUP BY k HAVING count(*) >= 2
), kept AS (
  SELECT doc_id, pos, line FROM keyed
  WHERE NOT eligible OR k NOT IN (SELECT k FROM dup)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(r.clean, '') AS text,
       len(string_split(d.text, chr(10))) AS n_lines,
       len(string_split(d.text, chr(10))) - coalesce(r.n_kept, 0) AS n_removed
FROM documents d LEFT JOIN rebuilt r USING (doc_id)
"""
        ).fetchall()
    }
    assert got == exp
    removed = sum(v[2] for v in got.values())
    assert removed >= 0


def test_line_dedup_null_text_counts_zero_lines(spark):
    """NULL text must yield n_lines=0/n_removed=0 and STAY NULL —
    size(split(NULL)) is -1 under non-ANSI legacy sizeOfNull semantics
    (which leaked through before), and the earlier ''-rewrite collapsed
    every formerly-NULL doc into ONE md5('') cluster downstream in
    exact_dedup, whose survivors rule would delete N−1 docs of unknown
    content (review r14; the gate oracle mirrors the NULL-preserving
    CASE)."""
    from quackpipe_spark.operators.dedup import exact_dedup, line_dedup

    df = spark.createDataFrame(
        [(1, "hello world line\nother"), (2, None), (3, "hello world line\nmore"), (4, None)],
        "doc_id long, text string",
    )
    out = line_dedup(df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["text"] is None
    assert rows[2]["n_lines"] == 0
    assert rows[2]["n_removed"] == 0
    # the downstream consequence the fix exists for: NULL-text docs must
    # NOT form an exact-dup cluster after reassembly
    clusters = exact_dedup(out).collect()
    assert all(r["n_copies"] == 1 for r in clusters)
