"""Driver-gate queries for the training-data curation operators.

Round 5 added the curation surface a large-scale LLM data pipeline needs
(line-level dedup, substring-passage dedup, deterministic sampling and
domain mixing, BM25 retrieval, context-window chunking, n-gram vocab
tables, benchmark-contamination checks) with full DuckDB differentials in
``tests/``. This module promotes each into the driver's 50-row
correctness window: one registry entry + one DuckDB oracle per family,
restating the exact recipe in SQL so the driver's hash compare is exact.

Every recipe here is deliberately md5/integer/rational arithmetic (the
cross-engine determinism contract shared by the dedup/ANN oracles); the
one transcendental (BM25's ln-based idf) is folded in a deterministic
per-doc term order on BOTH engines so the only residual is libm ulp —
absorbed by round-to-6 before compare (see fts_bm25_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from quackpipe_spark.operators import dedup as D
from quackpipe_spark.operators import fts as FTS
from quackpipe_spark.operators import packing as P
from quackpipe_spark.operators import sampling as S
from quackpipe_spark.operators import text as T
from quackpipe_spark.workloads.sql_surface import _digest_sql, _union_digests


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackpipe_spark.sources.tables import table_df

    return table_df(spark, sf_dir, "documents")


# --- cross-document line-level dedup ---------------------------------------

def line_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MassiveText/RefinedWeb boilerplate removal over the whole corpus:
    lines whose trimmed form appears in >= 2 distinct docs are removed
    from every doc, short lines protected, order-preserving rebuild
    (operators/dedup.line_dedup).

    The synthetic corpus is SINGLE-LINE docs with (at the verification
    SFs) no cross-doc repeats, so a plain run verified n_lines=1 /
    n_removed=0 everywhere — removal, rebuild order, and the short-line
    protection never fired (the r13 trivially-passing-gate class). The
    gate therefore appends two deterministic lines per doc: a long
    boilerplate footer on 2/3 of docs (eligible + duplicated → REMOVED,
    and n_removed varies 0/1 by doc) and a short 'd<digit>' line
    (duplicated across ~10% of docs but under the 8-char eligibility
    floor → protection keeps it)."""
    d = _docs(spark, sf_dir)
    aug = F.concat_ws(
        "\n",
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 != 2,
            F.lit("boilerplate footer please subscribe now"),
        ),
        F.concat(F.lit("d"), (F.col("doc_id") % 10).cast("string")),
    )
    out = D.line_dedup(d.withColumn("text", aug))
    return out.select(
        "doc_id",
        "text",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


LINE_DEDUP_SQL = """
WITH docs2 AS (
  SELECT doc_id, concat_ws(chr(10), text,
         CASE WHEN doc_id % 3 <> 2
              THEN 'boilerplate footer please subscribe now' END,
         'd' || (doc_id % 10)) AS text
  FROM documents
), lines AS (
  SELECT doc_id, generate_subscripts(sp, 1) AS pos, unnest(sp) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS sp FROM docs2)
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
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(r.clean, '') END AS text,
       CAST(coalesce(len(string_split(d.text, chr(10))), 0) AS BIGINT) AS n_lines,
       CAST(coalesce(len(string_split(d.text, chr(10))), 0) - coalesce(r.n_kept, 0)
         AS BIGINT) AS n_removed
FROM docs2 d LEFT JOIN rebuilt r USING (doc_id)
"""


# --- duplicate-passage (substring) dedup -----------------------------------

_PASS_K = 8
_PASS_MIN_DUP = 2


def duplicate_passage_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee-et-al-2021 substring dedup: maximal spans of positioned
    8-token grams shared by >= 2 distinct docs
    (operators/dedup.duplicate_passages).

    The corpus's shared passages all begin at the document start, so a
    plain run verified span_start as a constant 0 — the position
    arithmetic (gram offset, span min) never produced a nonzero value.
    The gate prepends 1-3 per-doc-unique tokens (varying by doc_id % 3),
    shifting every shared span to a doc-varying nonzero start while
    leaving WHICH grams are shared untouched (gate-triviality audit,
    r14)."""
    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.expr(
            "repeat(concat('u', cast(doc_id AS string), ' '),"
            " cast(doc_id % 3 + 1 AS int))"
        ),
        F.col("text"),
    )
    out = D.duplicate_passages(
        d.withColumn("text", aug), k=_PASS_K, min_dup_docs=_PASS_MIN_DUP
    )
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )


PASSAGE_SQL = f"""
WITH docs2 AS (
  SELECT doc_id,
         repeat('u' || doc_id || ' ', (doc_id % 3) + 1) || text AS text
  FROM documents
), base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM docs2
), eligible AS (
  SELECT doc_id, t FROM base WHERE len(t) >= {_PASS_K}
), grams0 AS (
  SELECT doc_id, list_transform(range(1, len(t) - {_PASS_K} + 2),
         i -> md5(array_to_string(t[i:i+{_PASS_K}-1], ' '))) AS gs
  FROM eligible
), grams AS (
  SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos, unnest(gs) AS g
  FROM grams0
), dup AS (
  SELECT g FROM (SELECT DISTINCT doc_id, g FROM grams)
  GROUP BY g HAVING count(*) >= {_PASS_MIN_DUP}
), flagged AS (
  SELECT doc_id, pos FROM grams JOIN dup USING (g)
), marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {_PASS_K} THEN 1 ELSE 0 END AS ns
  FROM flagged WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), spanned AS (
  SELECT doc_id, pos,
         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
  FROM marked
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {_PASS_K} AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM spanned GROUP BY doc_id, sid
"""


# --- deterministic sampling / splits / mixing ------------------------------

_MIX_WEIGHTS = {"src0": 0.3, "src1": 1.7, "src2": 2.0, "src3": 0.0}
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def sampling_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (salt, key)-hash sampling family: fractional sample,
    train/val/test split, per-stratum quota, domain-mixture reweighting
    (operators/sampling) — each a pure function of (salt, key), identical
    at any parallelism and in any engine."""
    d = _docs(spark, sf_dir)
    return _union_digests(
        [
            (
                "hash_sample",
                S.hash_sample(d, "doc_id", 0.35, salt="g1").select("doc_id"),
            ),
            (
                "split",
                S.split_by_hash(d, "doc_id", _SPLIT_WEIGHTS, salt="sp1").select(
                    "doc_id", "split"
                ),
            ),
            (
                "stratified",
                S.stratified_sample(d, "source", 10, "doc_id", salt="s9").select(
                    "doc_id"
                ),
            ),
            (
                "mix",
                S.mix_domains(
                    d, "source", _MIX_WEIGHTS, "doc_id", salt="m7"
                ).select("doc_id", F.col("copy").cast("long").alias("copy")),
            ),
        ]
    )


def _bucket_sql(salt: str) -> str:
    # single-sourced md5 recipe (sampling.order_key's cross-engine contract)
    return S.bucket_sql("doc_id", salt)


def _sampling_battery_sql() -> str:
    sample_sql = (
        "SELECT doc_id FROM documents WHERE "
        + S.hash_sample_sql("doc_id", 0.35, "g1")
    )
    # split boundaries and mix copy-counts come from sampling.py's own
    # renderers (split_case_sql / mix_copies_case_sql), which share their
    # arithmetic with split_by_hash / mix_domains — the weights can
    # change without this oracle going stale
    split_sql = f"""
SELECT doc_id,
       {S.split_case_sql('b', _SPLIT_WEIGHTS)} AS split
FROM (SELECT doc_id, {_bucket_sql('sp1')} AS b FROM documents)
"""
    strat_sql = f"""
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (
    PARTITION BY source
    ORDER BY {S.order_key_sql("doc_id", "s9")},
             doc_id
  ) AS rk
  FROM documents
) WHERE rk <= 10
"""
    mix_sql = f"""
SELECT doc_id, CAST(copy AS BIGINT) AS copy FROM (
  SELECT doc_id, unnest(generate_series(0, n - 1)) AS copy FROM (
    SELECT doc_id, {S.mix_copies_case_sql('b', _MIX_WEIGHTS)} AS n
    FROM (SELECT doc_id, source, {_bucket_sql('m7')} AS b FROM documents)
  ) WHERE n >= 1
)
"""
    return "\nUNION ALL\n".join(
        [
            _digest_sql("hash_sample", sample_sql, [("doc_id", "s")]),
            _digest_sql("split", split_sql, [("doc_id", "s"), ("split", "s")]),
            _digest_sql("stratified", strat_sql, [("doc_id", "s")]),
            _digest_sql("mix", mix_sql, [("doc_id", "s"), ("copy", "s")]),
        ]
    )


SAMPLING_BATTERY_SQL = _sampling_battery_sql()


# --- BM25 full-text retrieval ----------------------------------------------

_BM25_QUERY = "spark merge table"
_BM25_TOPK = 20
_BM25_K1 = 1.2
_BM25_B = 0.75


def fts_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k keyword retrieval over the corpus, index-free
    (operators/fts.bm25_scan): per-doc term frequencies are ROW-LOCAL
    array scans and stats broadcast back from one aggregation — the
    corpus never explodes and nothing wide shuffles, unlike routing an
    ad-hoc query through a full postings build. Scoring adds per-term
    contributions in sorted term order — bit-identical to the oracle's
    ordered list_reduce, so the only cross-engine residual is ln() libm
    ulp (~1e-15 relative), absorbed by the round to 6 decimals both
    sides apply."""
    out = FTS.bm25_scan(
        _docs(spark, sf_dir),
        _BM25_QUERY,
        topk=_BM25_TOPK,
        k1=_BM25_K1,
        b=_BM25_B,
    )
    return out.select(
        "doc_id", F.col("rank").cast("long").alias("rank"), "score"
    )


# render the IN-list from the SAME tokenizer the Spark side uses
# (FTS._terms lowercases/dedupes; a hand-rolled split() would diverge the
# moment _BM25_QUERY gains uppercase or duplicate terms); SQL-escape each
# term so a future query containing an apostrophe breaks neither engine
_BM25_TERMS_SQL = "', '".join(t.replace("'", "''") for t in FTS._terms(_BM25_QUERY))

BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
), tfrows AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks
), postings AS (
  SELECT doc_id, term, count(*) AS tf, first(dl) AS dl
  FROM tfrows GROUP BY doc_id, term
), stats AS (
  SELECT count(*) AS N, avg(dl) AS avgdl
  FROM (SELECT doc_id, first(dl) AS dl FROM postings GROUP BY doc_id)
), matched AS (
  SELECT * FROM postings WHERE term IN ('{_BM25_TERMS_SQL}')
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM matched GROUP BY term
), scored AS (
  SELECT m.doc_id,
         list_reduce(
           list_prepend(0.0, array_agg(
             ln(1 + (s.N - d.df + 0.5) / (d.df + 0.5))
             * m.tf * ({_BM25_K1} + 1.0)
             / (m.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * m.dl / s.avgdl))
             ORDER BY m.term)),
           (a, b) -> a + b) AS score
  FROM matched m CROSS JOIN stats s JOIN dfreq d ON d.term = m.term
  GROUP BY m.doc_id
), top AS (
  SELECT doc_id, score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {_BM25_TOPK}
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       round(score, 6) AS score
FROM top
"""


# --- context-window chunking -----------------------------------------------

_CHUNK_MAX = 32
_CHUNK_OVERLAP = 8


def chunk_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: <=32-token chunks with 8-token overlap,
    row-local slice explode (operators/packing.chunk_documents)."""
    out = P.chunk_documents(
        _docs(spark, sf_dir), max_tokens=_CHUNK_MAX, overlap=_CHUNK_OVERLAP
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "chunk_text",
        F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
    )


_CHUNK_STRIDE = _CHUNK_MAX - _CHUNK_OVERLAP

CHUNK_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents WHERE length(regexp_replace(text, '\\s', '', 'g')) > 0
), idx AS (
  SELECT doc_id, t,
         unnest(range(0, greatest(1,
           cast(ceil((len(t) - {_CHUNK_OVERLAP}) / {_CHUNK_STRIDE}.0) AS BIGINT)))) AS i
  FROM base
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       array_to_string(t[i*{_CHUNK_STRIDE}+1 : i*{_CHUNK_STRIDE}+{_CHUNK_MAX}], ' ') AS chunk_text,
       CAST(least(len(t) - i*{_CHUNK_STRIDE}, {_CHUNK_MAX}) AS BIGINT) AS chunk_tokens
FROM idx
"""


# --- n-gram vocabulary / frequency tables ----------------------------------

def ngram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency table with doc frequencies, long tail
    pruned (operators/text.ngram_counts) — subsumes the former
    explode_word_frequencies row (same lateral-explode surface, n=1)."""
    out = T.ngram_counts(_docs(spark, sf_dir), n=2, min_count=2)
    return out.select(
        "ngram",
        F.col("count").cast("long").alias("count"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


NGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> array_to_string(t[i:i+1], ' '))) AS ngram
  FROM toks WHERE len(t) >= 2
)
SELECT ngram, count(*) AS count, count(DISTINCT doc_id) AS n_docs
FROM grams GROUP BY ngram HAVING count(*) >= 2
"""


# --- benchmark contamination ------------------------------------------------

def contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style benchmark-contamination scan: corpus docs sharing an
    8-token shingle with the 'benchmark' slice (every 97th doc — a
    deterministic stand-in eval set, planted-in-corpus by construction)
    (operators/dedup.contamination_check)."""
    d = _docs(spark, sf_dir)
    bench = d.filter((F.col("doc_id") % 97) == 0)
    out = D.contamination_check(d, bench)
    return out.select("doc_id", F.col("n_shared").cast("long").alias("n_shared"))


CONTAMINATION_SQL = """
WITH c AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(t) - 6),
    i -> array_to_string(t[i:i+7], ' ')))) AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents)
  WHERE len(t) >= 8
), b AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
    range(1, len(t) - 6),
    i -> array_to_string(t[i:i+7], ' ')))) AS shingle
  FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE doc_id % 97 = 0)
  WHERE len(t) >= 8
)
SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM c JOIN b USING (shingle) GROUP BY c.doc_id
"""


QUERIES = {
    "line_dedup_boilerplate": line_dedup_boilerplate,
    "duplicate_passage_spans": duplicate_passage_spans,
    "sampling_battery": sampling_battery,
    "fts_bm25_topk": fts_bm25_topk,
    "chunk_context_windows": chunk_context_windows,
    "ngram_vocab": ngram_vocab,
    "contamination_scan": contamination_scan,
}

# no stateful entries: fts_bm25_topk is one fully-lazy action (stats join
# back as a broadcast instead of a driver collect), so its plan is cacheable
STATEFUL: set[str] = set()

ORACLE = {
    "line_dedup_boilerplate": LINE_DEDUP_SQL,
    "duplicate_passage_spans": PASSAGE_SQL,
    "sampling_battery": SAMPLING_BATTERY_SQL,
    "fts_bm25_topk": BM25_SQL,
    "chunk_context_windows": CHUNK_SQL,
    "ngram_vocab": NGRAM_SQL,
    "contamination_scan": CONTAMINATION_SQL,
}
