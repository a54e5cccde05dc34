"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All pure JVM expressions (split/regexp/aggregate) — at 100 TB these run
inside the parquet scan stage with zero extra shuffles: each is a
row-local projection."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quackpipe_spark.operators.dedup import gram_array, tokenize

# Tiny per-language stopword lists for the n-gram/stopword-voting heuristic.
# (Real pipelines plug fasttext etc. — the operator shape is the point.)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "para", "con"],
}


# The token-based metrics all accept an optional pre-tokenized array
# (``toks``): analyze() projects tokenize(text) ONCE and feeds it to
# every metric, so the document isn't re-split per metric — Catalyst's
# CollapseProject keeps a multiply-referenced non-cheap alias
# materialized, and bpe_estimate's aggregate() (CodegenFallback, outside
# codegen CSE) consumes the precomputed attribute instead of its own
# interpreted split (review r14). Passing toks=None keeps the original
# single-metric behavior bit-exactly (same tokenize expression).


def token_count(text: Column, toks: Column | None = None) -> Column:
    """Whitespace token count + a BPE-ish subword estimate (word-piece ≈
    ceil(chars/4) per token, the common heuristic for budget planning)."""
    return F.size(tokenize(text) if toks is None else toks)


def bpe_estimate(text: Column, toks: Column | None = None) -> Column:
    toks = tokenize(text) if toks is None else toks
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


def stopword_ratio(
    text: Column, lang: str = "en", toks: Column | None = None
) -> Column:
    toks = tokenize(text) if toks is None else toks
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    # distinct-hit ratio over distinct tokens (array_intersect dedups)
    return F.round(hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1)), 4)


def quality_score(text: Column, toks: Column | None = None) -> Column:
    """Composite [0,1] quality: length band + punctuation sanity + mean
    word length band — the classic cheap pre-filter before model scoring."""
    n_chars = F.length(text)
    toks = tokenize(text) if toks is None else toks
    n_toks = F.size(toks)
    mean_word = n_chars / F.greatest(n_toks, F.lit(1))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), 1.0).otherwise(0.0)
    word_ok = F.when((mean_word >= 2.5) & (mean_word <= 12), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    return F.round((len_ok + word_ok + punct_ok) / 3.0, 4)


def detect_language(text: Column, toks: Column | None = None) -> Column:
    """Stopword-voting language ID: the language whose stopword list hits
    the most distinct tokens; 'und' (undetermined) when nothing hits."""
    toks = F.array_distinct(tokenize(text) if toks is None else toks)
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


# PII / boilerplate surface signals. Patterns restricted to syntax that
# means the same thing in Java regex (Spark) and DuckDB's RE2 — both
# sides must count identical matches for the oracle to hash-match.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
URL_RE = r"https?://[^\s]+"


def email_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_RE)).cast("int")


def url_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(URL_RE)).cast("int")


# Redaction patterns, same Java-regex/RE2 intersection discipline as the
# counting patterns above (the redact test diffs against DuckDB's
# regexp_replace 'g'). IPv4 before PHONE: both match digit runs, and the
# email pass first keeps user@host digits from being eaten as phones.
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def redact_pii(text: Column) -> Column:
    """Mask emails, IPv4s, and phone-like digit runs with typed
    placeholder tokens — the release-side counterpart of the PII
    COUNTING signals above (counting decides which docs to drop;
    redaction sanitizes the ones kept). Three chained JVM
    regexp_replace passes riding the scan stage: no UDF, no shuffle,
    order fixed (see pattern comment) so the passes can't partially
    consume each other's matches."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def dup_token_ratio(text: Column, toks: Column | None = None) -> Column:
    """Gopher-style repetition signal: fraction of tokens that repeat an
    earlier token (1 − distinct/total). Row-local JVM expression — rides
    the scan stage like every other per-row metric."""
    toks = tokenize(text) if toks is None else toks
    return F.round(
        1 - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 4
    )


def bigram_repetition(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, top_bigram_ratio): occurrences of the most frequent word
    2-gram over total 2-grams — the Gopher top-n-gram repetition filter
    (boilerplate/spam detector).

    Per-doc mode-frequency is computed by explode + two groupBys, NOT a
    per-row fold: the input is id-repartitioned BEFORE the explode (the
    shingle_table lesson), so both groupBys cluster on already-satisfied
    partitioning — Catalyst inserts no exchange, the gram rows never
    cross the wire, and the count/max/sum aggregates stay inside
    whole-stage codegen. (A per-row distinct×filter formulation is
    O(n·d) interpreted lambda steps per doc — quadratic in doc length.)
    Docs with <2 tokens emit no row; callers left-join and coalesce."""
    from quackpipe_spark.operators.util import sized_parts

    # data-sized id exchange (see dedup.shingle_table): clustering kept,
    # partition count follows the data instead of the core count
    return _top_bigram(
        docs.repartition(sized_parts(docs, 1 << 20), F.col(id_col)),
        id_col,
        text_col,
    )


def _top_bigram(base: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gram counting over an ALREADY id-partitioned input (see
    bigram_repetition for the plan rationale)."""
    toks = (
        base.select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))
        .filter(F.size("_toks") >= 2)
    )
    grams = toks.select(
        id_col, F.explode(gram_array(F.col("_toks"), 2)).alias("gram")
    )
    counts = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    return counts.groupBy(id_col).agg(
        F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_ratio")
    )


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 over lowercased, punctuation-free,
    whitespace-collapsed, sorted-token text — catches shuffled/reformatted
    duplicates that exact hashing misses."""
    normalized = F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}\s]", " ")
    toks = F.array_sort(F.array_distinct(F.split(F.trim(normalized), r"\s+")))
    return F.md5(F.concat_ws(" ", toks))


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) consecutive token pairs; docs under 2 tokens drop.

    Deliberately a second gram formulation next to dedup.gram_array: the
    LM needs the two words as SEPARATE columns (uni_counts groups by w1
    alone), which gram_array's joined 'w1 w2' string can't give without
    a re-split. Both derive from the same tokenize(), so the token
    definition can't drift — only the pairing shape differs."""
    base = docs.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("_toks")
    ).filter(F.size("_toks") >= 2)
    t = F.col("_toks")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.struct(
            F.element_at(t, i).alias("w1"),
            F.element_at(t, i + 1).alias("w2"),
        ),
    )
    return base.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


# persisted bigram count tables (the eager "models" of bigram_lm_score):
# tracked so callers can release them — see release_lm_caches
_LM_CACHES: list[DataFrame] = []


def release_lm_caches() -> int:
    """Unpersist every bigram-LM count table built by
    :func:`bigram_lm_score` this session. Call between scoring batches
    in a long-lived engine; score frames already computed are
    unaffected, and un-consumed lazy score frames simply recompute their
    counts. Returns the number of caches released."""
    n = len(_LM_CACHES)
    for df in _LM_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _LM_CACHES.clear()
    return n


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train: DataFrame | None = None,
    alpha: float = 0.4,
) -> DataFrame:
    """Perplexity-style fluency signal from a corpus-trained bigram LM —
    the CCNet/KenLM filtering idea (public) without an external model:
    train add-α-smoothed bigram probabilities on ``train`` (default: the
    scored corpus itself) and score each doc by its mean log₂
    P(w2|w1). Gibberish, boilerplate-shuffled, and wrong-language docs
    score far below fluent text under ANY reasonable LM, which is all a
    filtering threshold needs.

    Returns (id, avg_logp, ppl, n_bigrams): ppl = 2^(−avg_logp).
    P(w2|w1) = (c(w1,w2)+α) / (c(w1·)+α·V) with PREFIX counts —
    c(w1·) = Σ_w2 c(w1,w2) and V = |distinct SUCCESSOR words| (the
    output vocabulary the conditional distributes over) — add-α's
    standard denominator: Σ_w2 P(w2|w1) = (c(w1·)+α·V)/(c(w1·)+α·V) ≤ 1
    for the seen successors plus the smoothing mass, which makes ppl a
    true perplexity. (An earlier revision used |distinct prefixes| for
    V — over-unity conditionals whenever a prefix's fan-out exceeded the
    prefix count.) Every statistic derives from ONE bigram relation: no
    separate unigram tokenize pass, and a whitespace-only doc's phantom
    '' token can never enter the vocab because _doc_bigrams drops
    <2-token docs. Unseen bigrams/prefixes hit the smoothing floor
    instead of −∞. Docs with < 2 tokens are omitted.

    Scale shape: the MODEL is the aggregated bigram count table — it is
    persisted with a blocking count (training is deliberately eager:
    build once, score many; the cached table is the aggregated counts,
    never the token-exploded stream, and MEMORY_AND_DISK spills rather
    than OOMs). Without the persist, Catalyst re-expands the corpus-wide
    bigram explode once per consumer (count join, prefix table, vocab —
    measured 4 emissions); with it, a scoring action emits the SCORED
    side's bigrams exactly once (plan-pinned). The prefix table and V
    derive from the cached counts; V rides a broadcast one-row
    crossJoin, never a driver collect.

    Cache lifetime: the persisted count table must outlive the returned
    (lazy) score frame, so it cannot be unpersisted here. It is tracked
    in a module registry — a long-lived engine scoring many slices calls
    :func:`release_lm_caches` between batches (or after the score frame
    is consumed) to release the accumulated model tables; otherwise one
    cached relation per call lives until session end."""
    if alpha <= 0:
        raise ValueError("alpha must be positive (zero breaks smoothing)")
    train_big = _doc_bigrams(train if train is not None else docs, id_col, text_col)
    big_counts = train_big.groupBy("w1", "w2").agg(
        F.count("*").alias("_c12")
    ).persist()
    n_model = big_counts.count()  # blocking: consumers must hit the cache
    if n_model == 0:
        # an empty model (empty train slice, or no train doc with >= 2
        # tokens) makes _V = 0 and every denominator 0 → ANSI-off NULL →
        # every doc scores (avg_logp=NULL, ppl=NULL) and a downstream
        # ppl-threshold filter silently drops the ENTIRE corpus. The
        # count above already materialized the model, so the check is
        # free (review r14).
        big_counts.unpersist()
        raise ValueError(
            "bigram model is empty: no training doc has >= 2 tokens — "
            "every score would be NULL"
        )
    _LM_CACHES.append(big_counts)
    score_big = _doc_bigrams(docs, id_col, text_col)
    uni_counts = big_counts.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    vocab = big_counts.select("w2").distinct().agg(F.count("*").alias("_V"))
    scored = (
        score_big
        .join(big_counts, ["w1", "w2"], "left")
        .join(uni_counts, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log2(
                (F.coalesce("_c12", F.lit(0)) + alpha)
                / (F.coalesce("_c1", F.lit(0)) + alpha * F.col("_V"))
            ).alias("_logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.avg("_logp").alias("avg_logp"),
        F.pow(F.lit(2.0), -F.avg("_logp")).alias("ppl"),
        F.count("*").alias("n_bigrams"),
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 1,
    text_col: str = "text",
    min_count: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus n-gram frequency table — the vocabulary/LM-prep statistic
    (unigram counts = tokenizer vocab candidates; higher n feeds LM
    smoothing and collocation mining). Returns (ngram, count, n_docs),
    descending by count with the ngram string as deterministic
    tiebreak; ``min_count`` prunes the long tail before any sort and
    ``top_k`` caps the result via a distributed TakeOrdered (never a
    global sort of the full table).

    Scale shape: one explode + one count aggregation with map-side
    partials (the same exchange-free pre-partitioned explode as
    shingle_table); n_docs rides the same aggregate via count(distinct)
    rewrite. Linear in corpus tokens."""
    if n < 1:
        raise ValueError("ngram order n must be >= 1")
    from quackpipe_spark.operators.util import fan_out

    toks = tokenize(F.col(text_col))
    # fan_out, not an unconditional repartition: the explode needs
    # per-row parallelism but nothing downstream needs id-partitioning
    # (the only groupBy is on ngram) — a round-robin shuffle of an
    # already well-split 100 TB scan moved every row for no gain (r12).
    # Data-sized (r16, guide §2.2): one task per ~256 KB of docs, so a
    # toy corpus is not smeared over `parallelism` tasks per stage while
    # a growth-SF corpus still fans fully out (1 MB/task measured +31%
    # at 20× — the explode+count-distinct work is heavy per byte)
    base = (
        fan_out(docs, bytes_per_task=256 << 10)
        .select(toks.alias("_toks"), F.monotonically_increasing_id().alias("_d"))
        .filter(F.size("_toks") >= n)
    )
    t = F.col("_toks")
    # n=1: tokenize('') yields [''] (size 1 passes the >= n filter), so a
    # blank/whitespace-only doc would inject a phantom '' vocab entry —
    # the same trap bigram_lm_score documents; drop the empty token
    # (n > 1 can't produce it: a blank doc's single '' fails size >= 2)
    grams = gram_array(t, n) if n > 1 else F.filter(t, lambda x: x != "")
    counted = (
        base.select(F.col("_d"), F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count("*").alias("count"),
            F.countDistinct("_d").alias("n_docs"),
        )
        .filter(F.col("count") >= min_count)
    )
    ordered = counted.orderBy(F.desc("count"), F.asc("ngram"))
    return ordered.limit(top_k) if top_k is not None else ordered


def analyze(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    repetition: bool = True,
    redact: bool = True,
) -> DataFrame:
    """The full text-analysis battery: one row-local projection pass for
    the per-row metrics, plus (with ``repetition``) the grouped
    top-bigram signal joined back on id. ONE exchange total in that
    mode: the input is id-repartitioned once and both sides derive from
    it — the projection preserves the partitioning, the gram groupBys
    cluster on it, and the final join is co-partitioned, so neither the
    grams nor the metrics rows ever shuffle. Docs too short for a
    bigram get ratio 0.0.

    ``repetition=False`` skips the grouped signal AND the repartition —
    a pure zero-shuffle scan-stage projection. Catalyst cannot eliminate
    the left join when a caller drops top_bigram_ratio (no unique-key
    inference for aggregated relations), so callers that don't need it
    must opt out rather than rely on pruning (corpus_clean_pipeline
    does).

    ``redact`` (default on) adds ``redacted_fp`` = md5 of the
    :func:`redact_pii` output — the release-side redaction pass riding
    the same scan stage, surfaced as a fingerprint so the gate oracle
    can hash-verify the full three-pass regex chain without shipping
    redacted text through the result (r12, VERDICT r11 #7). Callers
    that only need the scoring columns pass redact=False so the oracle
    stays work-symmetric."""
    t = F.col(text_col)

    # NULL-text guard (the corpus_report lesson): under the engine's
    # ANSI-off session size(NULL) is -1, so unguarded NULL docs would
    # report n_tokens=-1, stopword_ratio=-1.0, dup_token_ratio=2.0 — and
    # a Gopher-style 'dup_token_ratio > 0.3' filter would flag every
    # NULL doc as repetitive spam. The DuckDB oracle yields NULL for all
    # token-derived metrics of a NULL text; mirror that exactly
    # (fingerprint too: concat_ws skips the NULL array → md5('') where
    # the oracle has NULL).
    def _nn(expr):
        return F.when(t.isNull(), F.lit(None)).otherwise(expr)

    def _proj(src: DataFrame) -> DataFrame:
        # tokenize ONCE: the token array is projected as an attribute
        # and every token-based metric consumes it (see the toks-param
        # note above token_count) — same tokenize expression, so values
        # are bit-identical to per-metric tokenization
        staged = src.select(F.col(id_col), t, tokenize(t).alias("_toks"))
        tk = F.col("_toks")
        cols = [
            F.col(id_col),
            F.length(t).alias("n_chars"),
            _nn(token_count(t, toks=tk)).alias("n_tokens"),
            _nn(bpe_estimate(t, toks=tk)).alias("bpe_tokens_est"),
            punct_ratio(t).alias("punct_ratio"),
            _nn(stopword_ratio(t, "en", toks=tk)).alias("stopword_ratio_en"),
            _nn(dup_token_ratio(t, toks=tk)).alias("dup_token_ratio"),
            email_count(t).alias("n_emails"),
            url_count(t).alias("n_urls"),
            quality_score(t, toks=tk).alias("quality"),
            detect_language(t, toks=tk).alias("lang_detected"),
            _nn(fingerprint(t)).alias("fingerprint"),
        ]
        if redact:
            # md5(NULL) is NULL in both engines — no _nn guard needed
            cols.append(F.md5(redact_pii(t)).alias("redacted_fp"))
        return staged.select(*cols)

    if not repetition:
        return _proj(docs)
    from quackpipe_spark.operators.util import sized_parts

    # data-sized id exchange (see dedup.shingle_table)
    base = docs.repartition(sized_parts(docs, 1 << 20), F.col(id_col))
    rep = _top_bigram(base, id_col, text_col)
    # MERGE hint: rep is a corpus-scaled per-doc aggregate with NO
    # shuffle below it (it reuses base's id-partitioning), so AQE never
    # sees its real size and the static estimate had Catalyst BROADCAST
    # it — collecting a per-doc relation to the driver and discarding
    # the co-partitioned design this docstring describes (r11 100× plan
    # audit). The hint pins the exchange-free co-partitioned sort-merge
    # at every scale.
    return _proj(base).join(rep.hint("merge"), id_col, "left").withColumn(
        "top_bigram_ratio", F.coalesce(F.col("top_bigram_ratio"), F.lit(0.0))
    )


def linear_text_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: float = 0.0,
    round_to: int = 6,
) -> DataFrame:
    """Apply a pretrained LINEAR text classifier at corpus scale — the
    fastText/CCNet-style quality-model filtering step (public recipe:
    classifier scores gate which documents enter the training set). The
    model arrives as data, not code: ``weights`` is a (term, weight)
    DataFrame trained elsewhere; score(doc) = sigmoid(bias +
    Σ_t w_t·tf_t / dl) — the mean-of-term-weights formulation fastText
    uses for its linear bag-of-words classifiers.

    Scale shape: one id-repartitioned token explode (the shingle_table
    discipline), an INNER join against the broadcast weights table
    (vocabulary tables are ~10⁶ rows — broadcast-sized at any corpus
    scale; unmatched tokens contribute 0 and never leave the stage), one
    per-doc sum with map-side partials, and a left join back so
    weightless docs still score sigmoid(bias). All JVM expressions;
    exp() is the only libm call, absorbed by round-to-``round_to`` for
    cross-engine comparison."""
    from quackpipe_spark.operators.util import sized_parts

    # NULL text → empty token array (not a filter): the contract is that
    # EVERY doc scores at least sigmoid(bias); dropping NULL-text rows
    # would silently lose them from an inner-join score gate
    # (id exchange data-sized — see dedup.shingle_table)
    base = docs.repartition(sized_parts(docs, 1 << 20), F.col(id_col)).select(
        F.col(id_col),
        F.coalesce(
            tokenize(F.col(text_col)), F.array().cast("array<string>")
        ).alias("_toks"),
    )
    dl = base.select(id_col, F.size("_toks").alias("_dl"))
    matched = (
        base.select(F.col(id_col), F.explode("_toks").alias("term"))
        .join(F.broadcast(weights.select("term", "weight")), "term")
        .groupBy(id_col)
        .agg(F.sum("weight").alias("_wsum"))
    )
    z = F.lit(float(bias)) + F.coalesce(F.col("_wsum"), F.lit(0.0)) / F.greatest(
        F.col("_dl"), F.lit(1)
    )
    return (
        dl.join(matched, id_col, "left")
        .select(
            F.col(id_col),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to).alias(
                "lin_score"
            ),
        )
    )


def corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = "source",
) -> DataFrame:
    """Per-group corpus health report — the one-call audit a pipeline
    runs before and after each curation release: doc/token counts,
    length and quality distribution, repetition and PII rates. One
    row-local projection + one aggregation (two shuffle-free stages over
    the scan at any corpus size; grouping adds the single groupBy
    shuffle)."""
    # NULL-text docs are COUNTED, with zero contribution to every metric.
    # Guarding matters twice over: the engine session runs ANSI-off, where
    # size(NULL) is -1 (legacy sizeOfNull — would SUBTRACT from n_tokens)
    # and dup_token_ratio(NULL) evaluates to 2.0 (would inflate
    # avg_dup_ratio); and unguarded NULL lengths/PII would silently drop
    # out of the avg()s while n_docs still counted the doc — mutually
    # inconsistent metrics in the one report billed as the release audit.
    toks = tokenize(F.col(text_col))
    is_null = F.col(text_col).isNull()
    proj = docs.select(
        *( [F.col(group_col)] if group_col else [] ),
        F.when(is_null, F.lit(0)).otherwise(F.size(toks)).alias("_nt"),
        F.coalesce(F.length(text_col), F.lit(0)).alias("_nc"),
        quality_score(F.col(text_col)).alias("_q"),
        F.when(is_null, F.lit(0.0))
        .otherwise(dup_token_ratio(F.col(text_col)))
        .alias("_dup"),
        F.coalesce(
            email_count(F.col(text_col)) + url_count(F.col(text_col)), F.lit(0)
        ).alias("_pii"),
    )
    g = proj.groupBy(group_col) if group_col else proj.groupBy()
    return g.agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.round(F.avg("_nc"), 2).alias("avg_chars"),
        F.round(F.avg("_q"), 4).alias("avg_quality"),
        F.round(F.avg("_dup"), 4).alias("avg_dup_ratio"),
        F.round(F.avg((F.col("_pii") > 0).cast("double")), 4).alias("pii_doc_rate"),
    )
