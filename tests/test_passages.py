"""Duplicate-passage detection/removal (substring-granularity dedup):
planted shared passages, span merging, and the DuckDB differential on
the real sf0.001 documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from quackpipe_spark.operators.dedup import (
    duplicate_passages,
    strip_duplicate_passages,
)

PASSAGE_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
), eligible AS (
  SELECT doc_id, t FROM base WHERE len(t) >= {k}
), grams0 AS (
  SELECT doc_id, list_transform(range(1, len(t) - {k} + 2),
         i -> md5(array_to_string(t[i:i+{k}-1], ' '))) AS gs
  FROM eligible
), grams AS (
  SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos, unnest(gs) AS g
  FROM grams0
), dup AS (
  SELECT g FROM (SELECT DISTINCT doc_id, g FROM grams)
  GROUP BY g HAVING count(*) >= {min_dup}
), flagged AS (
  SELECT doc_id, pos FROM grams JOIN dup USING (g)
), marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {k} THEN 1 ELSE 0 END AS ns
  FROM flagged WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), spanned AS (
  SELECT doc_id, pos,
         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
  FROM marked
)
SELECT doc_id, min(pos) AS span_start, max(pos) + {k} AS span_end,
       count(*) AS n_grams
FROM spanned GROUP BY doc_id, sid
"""


def test_planted_shared_passage_found_and_stripped(spark):
    shared = " ".join(f"shared{i}" for i in range(6))  # 6-token passage
    rows = [
        (1, f"alpha beta gamma {shared} delta epsilon zeta"),
        (2, f"one two {shared} three four five six"),
        (3, "totally unrelated words only here appearing once each"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_passages(docs, k=4, min_dup_docs=2).collect()
    by_doc = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in spans}
    # doc 1: passage = tokens 3..9, doc 2: tokens 2..8 — each one merged span
    assert by_doc[1] == (3, 9) and by_doc[2] == (2, 8)
    assert 3 not in by_doc
    assert len(spans) == 2  # overlapping grams merged, one span per doc
    stripped = {
        r["doc_id"]: r for r in strip_duplicate_passages(docs, k=4).collect()
    }
    assert stripped[1]["text"] == "alpha beta gamma delta epsilon zeta"
    assert stripped[2]["text"] == "one two three four five six"
    assert stripped[1]["n_removed_tokens"] == 6
    assert stripped[3]["n_removed_tokens"] == 0
    # normalized stream: lowercase, single-space
    assert stripped[3]["text"] == rows[2][1]


def test_intra_doc_repeat_not_flagged(spark):
    # the repeated passage lives in ONE doc: distinct-doc count stays 1
    p = " ".join(f"w{i}" for i in range(5))
    docs = spark.createDataFrame(
        [(1, f"{p} filler middle words {p}"), (2, "other text entirely here")],
        "doc_id long, text string",
    )
    assert duplicate_passages(docs, k=5).count() == 0


def test_two_separate_spans_not_merged(spark):
    a = " ".join(f"a{i}" for i in range(5))
    b = " ".join(f"b{i}" for i in range(5))
    gap = " ".join(f"u{i}" for i in range(12))  # > k gap between passages
    docs = spark.createDataFrame(
        [(1, f"{a} {gap} {b}"), (2, f"{a} unrelated padding tokens {b}")],
        "doc_id long, text string",
    )
    spans = duplicate_passages(docs, k=5, min_dup_docs=2)
    assert spans.filter("doc_id = 1").count() == 2


def test_passages_match_duckdb(spark, duck):
    k, min_dup = 8, 2
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        map(
            tuple,
            duplicate_passages(docs, k=k, min_dup_docs=min_dup)
            .select("doc_id", "span_start", "span_end", "n_grams")
            .collect(),
        )
    )
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            PASSAGE_ORACLE.format(k=k, min_dup=min_dup)
        ).fetchall()
    )
    assert got == exp
    assert len(got) > 0  # the planted near-dups share 50-char prefixes
