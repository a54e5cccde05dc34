"""Full-text search: inverted postings + BM25 ranking, Spark-first.

The reference ships DuckDB's `fts` extension installed but unused
(reference Dockerfile:11); this module provides the equivalent surface
as first-class DataFrame ops so a corpus-curation pipeline can do
keyword retrieval at 100 TB scale.

Scale design:

- **postings build** is the one heavy pass: docs are id-repartitioned
  BEFORE the token explode (the shingle_table lesson), so the per-doc
  term-frequency groupBy clusters on already-satisfied partitioning —
  the exploded token rows never shuffle; only compact (term, doc, tf)
  rows leave the stage. Materialize with `write_postings` partitioned
  by a term hash bucket: a query touching q terms then prunes to q
  buckets of the index instead of scanning it.
- **search** never scans the corpus: query terms are a driver-side
  literal list, so the postings filter (`term IN (...)`) pushes into
  the scan; document frequencies for idf aggregate over just those
  terms' postings; scoring is one small groupBy over candidate docs.

Scoring is classic BM25 (Robertson/Spärck Jones):
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avg_len))
All arithmetic is double-precision JVM expressions — deterministic and
restatable in any engine (tests mirror it in DuckDB SQL verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quackpipe_spark.operators.dedup import tokenize


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, id, tf) inverted postings plus per-doc length ``dl``.

    One exchange total (the id-repartition); the explode and both
    aggregates run exchange-free on top of it."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = (
        docs.repartition(par, F.col(id_col))
        .select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))
        .select(id_col, F.size("_toks").alias("dl"), F.explode("_toks").alias("term"))
    )
    return toks.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )


def write_postings(postings: DataFrame, path: str, n_buckets: int = 64) -> None:
    """Materialize the index partitioned by term hash bucket — a q-term
    query reads q directories (partition pruning), the on-disk analogue
    of the in-memory `isin` pushdown."""
    out = postings.withColumn(
        "term_bucket", F.abs(F.hash("term")) % F.lit(n_buckets)
    )
    out.write.partitionBy("term_bucket").mode("overwrite").parquet(path)


def load_postings(spark, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("term_bucket")


def bm25_search(
    postings: DataFrame,
    query: str,
    id_col: str = "doc_id",
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs for a keyword query, scored by BM25.

    Corpus stats (N, avg_len) aggregate over the postings' per-doc rows;
    df per term over just the matched postings. Returns
    (id, score, rank) with deterministic tie-breaks on id."""
    import re

    # driver-side tokenization MUST mirror dedup.tokenize (trim+lower+\s+)
    # so a query term matches the postings' term domain exactly
    terms = sorted({t for t in re.split(r"\s+", query.strip().lower()) if t})
    if not terms:
        raise ValueError("empty query")
    # N and avg_len: one tiny agg over distinct docs (dl repeats per term row)
    stats = postings.select(id_col, "dl").groupBy(id_col).agg(F.first("dl").alias("dl"))
    g = stats.agg(
        F.count("*").alias("N"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = g["N"], float(g["avgdl"] or 1.0)

    matched = postings.filter(F.col("term").isin(terms))
    dfreq = matched.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    contrib = idf * tf * (k1 + 1.0) / denom
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .select(F.col(id_col), contrib.alias("_c"))
        .groupBy(id_col)
        .agg(F.round(F.sum("_c"), 6).alias("score"))
    )
    # distributed top-k first (TakeOrderedAndProject — no global window over
    # the full candidate set), then rank the ≤topk survivors
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(topk)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", "score"
    )
