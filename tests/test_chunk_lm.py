"""chunk_documents (context-window chunking) and bigram_lm_score
(corpus-trained fluency signal): planted semantics, a pure-Python
reference differential, and behavior on the real documents table."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from quackpipe_spark.operators.packing import chunk_documents
from quackpipe_spark.operators.text import bigram_lm_score


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_chunking_no_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, max_tokens=4).collect()
    )
    assert out == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t4 t5 t6 t7", 4),
        (1, 2, "t8 t9", 2),
        (2, 0, "short doc", 2),
    ]


def test_chunking_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {
        r["chunk_id"]: (r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, max_tokens=4, overlap=1).collect()
    }
    # stride 3: starts 0,3,6 — chunk 2 reaches the end, so no start at 9
    # (a chunk there would be fully contained in chunk 2: pure dup text)
    assert out[0] == ("t0 t1 t2 t3", 4)
    assert out[1] == ("t3 t4 t5 t6", 4)
    assert out[2] == ("t6 t7 t8 t9", 4)
    assert len(out) == 3
    # a tail with exactly one NEW token still gets its chunk
    df11 = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(11)))], "doc_id long, text string"
    )
    out11 = {
        r["chunk_id"]: r["chunk_text"]
        for r in chunk_documents(df11, max_tokens=4, overlap=1).collect()
    }
    assert out11[3] == "t9 t10"
    # short doc: one chunk even when n <= overlap
    one = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert chunk_documents(one, max_tokens=4, overlap=2).count() == 1
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)


def test_chunking_matches_duckdb(spark, docs, duck):
    mx, ov = 32, 8
    stride = mx - ov
    got = sorted(
        map(
            tuple,
            chunk_documents(docs, max_tokens=mx, overlap=ov)
            .select("doc_id", "chunk_id", "chunk_text", "chunk_tokens")
            .collect(),
        )
    )
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents WHERE length(regexp_replace(text, '\\s', '', 'g')) > 0
), idx AS (
  SELECT doc_id, t,
         unnest(range(0, greatest(1,
           cast(ceil((len(t) - {ov}) / {stride}.0) AS BIGINT)))) AS i
  FROM base
)
SELECT doc_id, i AS chunk_id,
       array_to_string(t[i*{stride}+1 : i*{stride}+{mx}], ' ') AS chunk_text,
       least(len(t) - i*{stride}, {mx}) AS chunk_tokens
FROM idx
"""
        ).fetchall()
    )
    assert got == exp
    assert len(got) > 0


def _py_bigram_scores(train_texts, score_rows, alpha):
    """Reference model: prefix-count denominators — c(w1·) = Σ_w2
    c(w1,w2), V = |distinct prefixes| — mirroring the operator."""

    def toks(s):
        return s.strip().lower().split()

    big = Counter()
    for s in train_texts:
        t = toks(s)
        for a, b in zip(t, t[1:]):
            big[(a, b)] += 1
    pre = Counter()
    for (a, _b), c in big.items():
        pre[a] += c
    V = len({b for (_a, b) in big})  # successor vocabulary
    out = {}
    for doc_id, s in score_rows:
        t = toks(s)
        if len(t) < 2:
            continue
        lps = [
            math.log2(
                (big.get((a, b), 0) + alpha) / (pre.get(a, 0) + alpha * V)
            )
            for a, b in zip(t, t[1:])
        ]
        out[doc_id] = (sum(lps) / len(lps), len(lps))
    return out


def test_bigram_lm_matches_python_reference(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the cat"),
        (3, "colorless green ideas sleep furiously tonight"),
        (4, "single"),
        (5, "zz qq vv zz qq"),
        (6, "   "),  # whitespace-only: no phantom '' token in the vocab
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["avg_logp"], r["n_bigrams"])
        for r in bigram_lm_score(df, alpha=0.4).collect()
    }
    exp = _py_bigram_scores([t for _, t in rows], rows, 0.4)
    assert set(got) == set(exp)  # doc 4 (one token) omitted in both
    for k in exp:
        assert got[k][1] == exp[k][1]
        assert abs(got[k][0] - exp[k][0]) < 1e-9
    # repeated fluent patterns outscore one-off rare-token strings
    assert got[2][0] > got[5][0]


def test_bigram_lm_train_score_split_handles_unseen(spark):
    train = spark.createDataFrame(
        [(1, "the cat sat on the mat " * 3)], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "completely unseen tokens here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in bigram_lm_score(score, train=train).collect()
    }
    assert out[10]["avg_logp"] > out[11]["avg_logp"]
    assert math.isfinite(out[11]["avg_logp"])  # smoothing floor, not -inf
    assert out[11]["ppl"] > out[10]["ppl"] > 1.0


def test_bigram_lm_flags_gibberish_on_real_corpus(spark, docs):
    gib = " ".join(f"xq{i}z wv{i*7}k" for i in range(40))
    scored = bigram_lm_score(
        docs.select("doc_id", "text").union(
            spark.createDataFrame([(999999, gib)], "doc_id long, text string")
        )
    )
    rows = scored.select("doc_id", "ppl").collect()
    ppls = {r["doc_id"]: r["ppl"] for r in rows}
    real = [v for k, v in ppls.items() if k != 999999]
    real_median = sorted(real)[len(real) // 2]
    assert ppls[999999] > real_median  # gibberish is an outlier upward


def test_linear_text_score_matches_reference(spark):
    """Hand-computed sigmoid(mean weight) scores, incl. a weightless doc
    (sigmoid(bias)) and a NULL-text doc (scores sigmoid(bias) too — the
    contract is every doc gets a score; dropping NULL texts would
    silently lose them from an inner-join score gate)."""
    import math

    from quackpipe_spark.operators.text import linear_text_score

    docs = spark.createDataFrame(
        [
            (1, "good good bad"),
            (2, "neutral words only"),
            (3, None),
            (4, "bad bad bad bad"),
        ],
        "doc_id long, text string",
    )
    w = spark.createDataFrame(
        [("good", 2.0), ("bad", -1.5)], "term string, weight double"
    )
    out = {r["doc_id"]: r["lin_score"] for r in linear_text_score(docs, w, bias=0.3).collect()}

    def sig(z):
        return round(1.0 / (1.0 + math.exp(-z)), 6)

    assert out[1] == sig(0.3 + (2.0 + 2.0 - 1.5) / 3)
    assert out[2] == sig(0.3)
    assert out[4] == sig(0.3 + (-1.5 * 4) / 4)
    assert out[3] == sig(0.3)  # NULL text: empty token set, pure bias


def test_linear_text_score_matches_duckdb(spark, duck):
    """Full-corpus differential against the identical recipe in DuckDB
    (stopword-keyed synthetic weights)."""
    from tests.conftest import SF_DIR
    from quackpipe_spark.operators.text import linear_text_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wrows = [("the", 1.0), ("and", 0.5), ("data", -0.75), ("merge", 2.0)]
    w = spark.createDataFrame(wrows, "term string, weight double")
    got = {
        r["doc_id"]: r["lin_score"]
        for r in linear_text_score(docs, w, bias=-0.1).collect()
    }
    wvals = ", ".join(f"('{t}', {x})" for t, x in wrows)
    exp = {
        r[0]: r[1]
        for r in duck.execute(f"""
WITH w(term, weight) AS (VALUES {wvals}),
toks AS (
  SELECT doc_id,
         coalesce(string_split_regex(trim(lower(text)), '\\s+'), []) AS t
  FROM documents
), dl AS (SELECT doc_id, len(t) AS dl FROM toks),
m AS (
  SELECT doc_id, sum(weight) AS wsum
  FROM (SELECT doc_id, unnest(t) AS term FROM toks) JOIN w USING (term)
  GROUP BY doc_id
)
SELECT dl.doc_id,
       round(1.0 / (1.0 + exp(-(-0.1 + coalesce(m.wsum, 0.0) / greatest(dl.dl, 1)))), 6)
FROM dl LEFT JOIN m USING (doc_id)
""").fetchall()
    }
    assert got == exp


def test_corpus_report(spark, duck):
    """Per-source report vs a DuckDB restatement of the same metrics
    (counts and token totals exact; averages rounded both sides)."""
    from tests.conftest import SF_DIR
    from quackpipe_spark.operators.text import corpus_report

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {r["source"]: r for r in corpus_report(docs).collect()}
    exp = {
        r[0]: r
        for r in duck.execute("""
SELECT source, count(*) AS n_docs,
       CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT) AS n_tokens
FROM documents GROUP BY source
""").fetchall()
    }
    assert set(got) == set(exp)
    for s in exp:
        assert got[s]["n_docs"] == exp[s][1]
        assert got[s]["n_tokens"] == exp[s][2]
        assert 0.0 <= got[s]["avg_quality"] <= 1.0
        assert 0.0 <= got[s]["pii_doc_rate"] <= 1.0


def test_corpus_report_null_text(spark):
    """NULL-text docs are COUNTED with zero contribution to every metric
    — no legacy size(NULL)=-1 subtraction from n_tokens, no
    dup_token_ratio(NULL)=2.0 inflating avg_dup_ratio, no silent
    avg()-drop of the doc from some metrics while n_docs counts it."""
    from quackpipe_spark.operators.text import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "web", "alpha beta beta"),
            (2, "web", "gamma delta"),
            (3, "web", None),
        ],
        "doc_id long, source string, text string",
    )
    r = corpus_report(docs).collect()[0]
    assert r["n_docs"] == 3
    assert r["n_tokens"] == 5  # 3 + 2 + 0, NOT 4 (3 + 2 - 1)
    # dup ratios: 1-2/3=0.3333, 0.0, 0.0 -> avg 0.1111 (NOT (0.3333+0+2)/3)
    assert abs(r["avg_dup_ratio"] - round((1 - 2 / 3) / 3, 4)) < 1e-3
    # chars: 15, 11, 0 -> NULL counted as 0, not dropped from the avg
    assert abs(r["avg_chars"] - round((15 + 11 + 0) / 3, 2)) < 1e-9
    assert r["pii_doc_rate"] == 0.0
    assert 0.0 <= r["avg_quality"] <= 1.0


def test_chunking_tab_only_doc_yields_no_chunks(spark):
    """trim() strips only spaces: a tab/newline-only doc must still count
    as blank (zero chunks), not emit a phantom 2-token chunk."""
    df = spark.createDataFrame(
        [(1, "\t"), (2, "\n\n"), (3, " \t \n "), (4, "real text")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, max_tokens=4).collect()
    assert {r["doc_id"] for r in out} == {4}


def test_analyze_null_text_metrics_are_null(spark):
    """ANSI-off size(NULL)=-1 must not leak: NULL-text docs report NULL
    for every token-derived metric (matching the DuckDB oracle), not
    n_tokens=-1 / dup_token_ratio=2.0 / stopword_ratio=-1.0."""
    from quackpipe_spark.operators.text import analyze

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in analyze(df).collect()}
    r2 = rows[2]
    for col in ("n_tokens", "bpe_tokens_est", "stopword_ratio_en",
                "dup_token_ratio", "fingerprint", "n_chars"):
        assert r2[col] is None, col
    assert r2["quality"] == 0.0 and r2["lang_detected"] == "und"
    assert rows[1]["n_tokens"] == 3
