"""Token-budget sequence packing for training-data preparation.

Groups documents into ~``budget``-token packs (the "sequence packing" /
"example packing" step before tokenized training shards are written).
Docs are never split; a pack may overflow by less than one doc — the
standard contiguous-fill approximation, whose pack boundaries are a pure
function of (salt, doc ids, token counts) and therefore reproducible
across runs and engines.

Scale design: a single global running-sum window would serialize the
whole corpus through ONE task — instead the corpus is first scattered
into ``n_shards`` deterministic md5 buckets (`sampling.hash_mod`),
and the running sum + pack assignment run per shard (window PARTITION BY
shard), so parallelism is n_shards regardless of corpus size and the
only shuffle is the one hash exchange the window needs anyway. Pack ids
are (shard, seq) pairs flattened into one long — globally unique without
any cross-shard coordination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quackpipe_spark.operators.dedup import tokenize
from quackpipe_spark.operators.sampling import hash_mod, order_key

_SEQ_BITS = 40  # packs per shard headroom: 2^40 ≈ 1e12


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 256,
    salt: str = "",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign every doc a ``pack_col`` so each pack's token total is
    ~``budget`` (contiguous fill in deterministic md5 order within a
    shard): a doc goes to the pack its FIRST token falls into, so docs
    are never split and a pack overflows by at most the tokens of its
    last doc (an oversized doc dominates its pack and pushes the next
    doc into a fresh one).

    Returns the input plus (shard, pack_col). Pack membership is stable
    under repartitioning and engine changes — the order inside a shard is
    md5(salt|id), tie-broken by id."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")  # % 0 would NULL every shard
    for reserved in ("shard", pack_col):
        if reserved in docs.columns:
            # withColumn would silently OVERWRITE caller data and the
            # pack window would partition on the new values (review r14)
            raise ValueError(
                f"pack_sequences writes a {reserved!r} column but docs "
                "already has one — rename it or pass a different pack_col"
            )
    if n_shards > (1 << (63 - _SEQ_BITS)):
        # pack_id = shard << _SEQ_BITS | seq must fit int64: beyond 2^23
        # shards the multiply wraps (ANSI off, silently) and two distinct
        # shards can emit COLLIDING pack_ids — merged packs downstream
        # with no error. 8M shards is far past any real parallelism; the
        # bound fails loudly instead of corrupting.
        raise ValueError(
            f"n_shards must be <= {1 << (63 - _SEQ_BITS)} so pack_id "
            f"(shard * 2^{_SEQ_BITS} + seq) fits int64; got {n_shards}"
        )
    # shard straight from the md5 domain — squeezing through the 10000-
    # bucket sampling granularity would cap parallelism at 10000 shards
    # and skew shard sizes whenever 10000 % n_shards != 0
    shard = hash_mod(F.col(id_col), n_shards, salt)
    # shared order_key: same md5 domain as the shard hash, and the NULL
    # sentinel keeps a null-id row's position deterministic (a bare md5
    # of NULL sorts all null ids first as an indistinguishable clump)
    okey = order_key(F.col(id_col), salt)
    # token-count tiebreak after the id: ≥2 NULL-id docs share the md5
    # sentinel AND the NULL id tiebreak, so without it their relative
    # order (hence pack membership) would be partition-layout-dependent.
    # Full determinism still requires ids unique-or-null-with-distinct-
    # lengths — duplicate keys with equal lengths are interchangeable in
    # the pack math but their payloads could differ; unique doc ids are
    # the documented contract.
    w = (
        Window.partitionBy("shard")
        .orderBy(okey, F.col(id_col), F.col(token_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pack seq = how many FULL budgets precede this doc's first token:
    # floor((running_sum - n_tokens) / budget) — a doc straddling a
    # boundary stays whole in the earlier pack's successor (never split).
    tok = F.greatest(F.col(token_col).cast("long"), F.lit(0))
    cum = F.sum(tok).over(w)
    seq = F.floor((cum - tok) / F.lit(budget))
    return (
        docs.withColumn("shard", shard)
        .withColumn(
            pack_col, F.col("shard").cast("long") * F.lit(1 << _SEQ_BITS) + seq
        )
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split long documents into ≤``max_tokens``-token chunks with
    ``overlap`` tokens of context carried between consecutive chunks —
    the context-window preparation step before packing/tokenization
    (chunking splits WITHIN docs; pack_sequences then fills budgets
    ACROSS them). Emits (id, chunk_id, chunk_text, chunk_tokens) over
    the normalized token stream; chunk_id is 0-based and chunk starts
    advance by ``max_tokens - overlap``.

    Row-local: one slice-per-chunk explode inside the scan stage — no
    shuffle, no UDF, linear in corpus tokens (×(1+overlap/stride)
    amplification, the explicit overlap cost). A doc with fewer tokens
    than ``max_tokens`` yields exactly itself as chunk 0; empty/null
    text yields no chunks."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    # Materialize the token array ONCE per row as a projection attribute
    # before the higher-order transform: HOF lambdas evaluate their body
    # interpreted, per element, with no common-subexpression elimination
    # — inlining the split() expression into the lambda re-tokenized the
    # whole document once PER CHUNK (measured 0.74s → 0.18s at sf0.1).
    # The split is non-cheap and multiply-referenced, so CollapseProject
    # keeps the projection boundary instead of re-inlining it.
    # blank check strips ALL whitespace (trim only strips spaces — a
    # tab/newline-only doc would otherwise emit a phantom ['",""]-token
    # chunk); the DuckDB oracle mirrors the same regexp
    base = docs.select(
        F.col(id_col),
        tokenize(F.col(text_col)).alias("_toks"),
        (
            F.length(F.regexp_replace(F.col(text_col), r"\s", "")) > 0
        ).alias("_nonblank"),
    )
    t = F.col("_toks")
    n = F.size(t)
    # chunk starts: 0, stride, … until the previous chunk reached the
    # end: ceil((n - overlap) / stride) chunks, floored at 1 — counting
    # every start ≤ n-1 instead would emit a trailing chunk FULLY
    # CONTAINED in its predecessor whenever the tail has ≤ overlap
    # tokens (pure duplicated content). Null/blank text → 0 chunks, and
    # the sequence() is guarded because sequence(0, -1) infers a
    # negative step (the shingles trap).
    n_chunks = F.when(
        F.col("_nonblank"),
        F.greatest(F.lit(1), F.ceil((n - overlap) / F.lit(stride))),
    ).otherwise(F.lit(0))
    seq = F.when(
        n_chunks >= 1, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        seq,
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(t, i * stride + 1, max_tokens)
            ).alias("chunk_text"),
            F.least(n - i * stride, F.lit(max_tokens)).alias("chunk_tokens"),
        ),
    )
    return (
        base.select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.chunk_tokens").alias("chunk_tokens"),
        )
    )


def pack_stats(packed: DataFrame, token_col: str = "n_tokens", pack_col: str = "pack_id") -> DataFrame:
    """Per-pack fill statistics (docs, tokens) — the shard-writer's
    manifest input and the packing-efficiency check. Token counts clip
    negatives to 0 exactly like pack_sequences' running sum does, so the
    manifest totals match the budgets the packer actually enforced (a
    corrupt negative n_tokens previously summed raw here while packing
    as 0 there — review r14)."""
    return packed.groupBy(pack_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.greatest(F.col(token_col).cast("long"), F.lit(0))
        ).alias("n_tokens"),
    )


def packing_efficiency(
    packed: DataFrame, budget: int, token_col: str = "n_tokens", pack_col: str = "pack_id"
) -> DataFrame:
    """One-row frame: efficiency = total tokens / (packs × budget)."""
    stats = pack_stats(packed, token_col, pack_col)
    return stats.agg(
        F.round(F.sum("n_tokens") / (F.count("*") * F.lit(budget)), 4).alias("efficiency")
    )
