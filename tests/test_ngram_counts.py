"""ngram_counts: planted semantics plus DuckDB differentials for
unigrams and bigrams on the real documents table."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from quackpipe_spark.operators.text import ngram_counts


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_ngram_counts_planted(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, None)],
        "doc_id long, text string",
    )
    uni = {
        r["ngram"]: (r["count"], r["n_docs"])
        for r in ngram_counts(df, n=1).collect()
    }
    assert uni == {"a": (3, 2), "b": (3, 2), "c": (1, 1), "x": (1, 1)}
    bi = {
        r["ngram"]: (r["count"], r["n_docs"])
        for r in ngram_counts(df, n=2).collect()
    }
    assert bi == {
        "a b": (3, 2),
        "b a": (1, 1),
        "b c": (1, 1),
        "b x": (1, 1),
    }
    top = ngram_counts(df, n=1, top_k=2).collect()
    assert [(r["ngram"], r["count"]) for r in top] == [("a", 3), ("b", 3)]
    with pytest.raises(ValueError):
        ngram_counts(df, n=0)


@pytest.mark.parametrize("n", [1, 2])
def test_ngram_counts_match_duckdb(spark, docs, duck, n):
    got = sorted(
        (r["ngram"], r["count"], r["n_docs"])
        for r in ngram_counts(docs, n=n, min_count=2).collect()
    )
    if n == 1:
        gram_expr = "unnest(t)"
    else:
        gram_expr = (
            f"unnest(list_transform(range(1, len(t) - {n} + 2),"
            f" i -> array_to_string(t[i:i+{n}-1], ' ')))"
        )
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id, {gram_expr} AS ngram FROM toks WHERE len(t) >= {n}
)
SELECT ngram, count(*) AS count, count(DISTINCT doc_id) AS n_docs
FROM grams GROUP BY ngram HAVING count(*) >= 2
"""
        ).fetchall()
    )
    assert got == exp
    assert len(got) > 0
