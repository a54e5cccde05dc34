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

from quackpipe_spark.operators.sampling import hash_mod

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
    # shard straight from the md5 domain — squeezing through the 10000-
    # bucket sampling granularity would cap parallelism at 10000 shards
    # and skew shard sizes whenever 10000 % n_shards != 0
    shard = hash_mod(F.col(id_col), n_shards, salt)
    okey = F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy("shard")
        .orderBy(okey, F.col(id_col))
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


def pack_stats(packed: DataFrame, token_col: str = "n_tokens", pack_col: str = "pack_id") -> DataFrame:
    """Per-pack fill statistics (docs, tokens) — the shard-writer's
    manifest input and the packing-efficiency check."""
    return packed.groupBy(pack_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
    )


def packing_efficiency(
    packed: DataFrame, budget: int, token_col: str = "n_tokens", pack_col: str = "pack_id"
) -> DataFrame:
    """One-row frame: efficiency = total tokens / (packs × budget)."""
    stats = pack_stats(packed, token_col, pack_col)
    return stats.agg(
        F.round(F.sum("n_tokens") / (F.count("*") * F.lit(budget)), 4).alias("efficiency")
    )
