"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All pure JVM expressions (split/regexp/aggregate) — at 100 TB these run
inside the parquet scan stage with zero extra shuffles: each is a
row-local projection."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quackpipe_spark.operators.dedup import tokenize

# Tiny per-language stopword lists for the n-gram/stopword-voting heuristic.
# (Real pipelines plug fasttext etc. — the operator shape is the point.)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "para", "con"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count + a BPE-ish subword estimate (word-piece ≈
    ceil(chars/4) per token, the common heuristic for budget planning)."""
    return F.size(tokenize(text))


def bpe_estimate(text: Column) -> Column:
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{L}\p{N}\s]", "")
    return F.round(
        (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1)), 4
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokenize(text)
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    # distinct-hit ratio over distinct tokens (array_intersect dedups)
    return F.round(hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1)), 4)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: length band + punctuation sanity + mean
    word length band — the classic cheap pre-filter before model scoring."""
    n_chars = F.length(text)
    toks = tokenize(text)
    n_toks = F.size(toks)
    mean_word = n_chars / F.greatest(n_toks, F.lit(1))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), 1.0).otherwise(0.0)
    word_ok = F.when((mean_word >= 2.5) & (mean_word <= 12), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    return F.round((len_ok + word_ok + punct_ok) / 3.0, 4)


def detect_language(text: Column) -> Column:
    """Stopword-voting language ID: the language whose stopword list hits
    the most distinct tokens; 'und' (undetermined) when nothing hits."""
    toks = F.array_distinct(tokenize(text))
    scores = [
        (
            lang,
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))),
        )
        for lang, words in STOPWORDS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # reversed so earlier languages win ties (deterministic order)
    for lang, s in reversed(scores):
        result = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(result)
    return result


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 over lowercased, punctuation-free,
    whitespace-collapsed, sorted-token text — catches shuffled/reformatted
    duplicates that exact hashing misses."""
    normalized = F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}\s]", " ")
    toks = F.array_sort(F.array_distinct(F.split(F.trim(normalized), r"\s+")))
    return F.md5(F.concat_ws(" ", toks))


def analyze(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The full text-analysis projection in one pass."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        token_count(t).alias("n_tokens"),
        bpe_estimate(t).alias("bpe_tokens_est"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t, "en").alias("stopword_ratio_en"),
        quality_score(t).alias("quality"),
        detect_language(t).alias("lang_detected"),
        fingerprint(t).alias("fingerprint"),
    )
