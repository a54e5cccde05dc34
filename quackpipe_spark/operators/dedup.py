"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB regime:

- **exact**: one hash-groupBy on a text fingerprint — a single shuffle on
  md5(text); survivors picked with min(id) (no window needed).
- **minhash-LSH**: shingle explode → one groupBy(doc) computing all k
  minhashes as k aggregates (ONE shuffle, map-side partial min) → band
  hashes → self-join on (band, hash). Join cardinality is bounded by
  bucket sizes, not n²; skewed buckets are handled by AQE skew-join.
- **simhash**: token explode → one groupBy(doc) with per-bit signed sums
  → byte-banded self-join for hamming candidates.
- **jaccard verify**: candidate pairs only (never all pairs) — shingle
  semi-joined to the candidate set before the intersection count.

All hashes are md5-derived so any engine (the DuckDB oracle included)
reproduces identical signatures — no engine-private hash functions in
results. Determinism is part of the operator contract: re-running dedup
on the same corpus keeps the same survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(col) -> Column:
    """Whitespace tokenization with trim+lower normalization (identical
    semantics to the oracle's string_split_regex(trim(lower(x)), '\\s+'))."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def shingles(tokens: Column, k: int = 3) -> Column:
    """Distinct k-word shingles as an array column (JVM-side:
    transform+sequence+slice, no UDF). Guarded for size<k: Spark's
    sequence(1, n) with n<1 infers a NEGATIVE step and produces garbage
    indices — short docs must short-circuit to an empty array."""
    return F.when(
        F.size(tokens) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tokens) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingle) pairs — the exploded form every stage shares."""
    toks = tokenize(F.col(text_col))
    return (
        docs.select(F.col(id_col), shingles(toks, k).alias("sh"))
        .filter(F.size("sh") > 0)
        .select(id_col, F.explode("sh").alias("shingle"))
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct text, keeping the
    smallest id (deterministic survivor), with the duplicate count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """k min-hashes per doc in ONE aggregation pass.

    minhash_i(doc) = min over shingles of md5('{i}|' + shingle) — the md5
    hex string ordering is the hash ordering (portable across engines).
    """
    sh = shingle_table(docs, id_col, text_col, shingle_k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Band the signature and self-join on (band, band_hash) → candidate
    pairs (a < b). Rows per band r = num_hashes/bands; P(candidate) =
    1-(1-j^r)^b — tune (bands, r) per corpus similarity target."""
    rows = num_hashes // bands
    band_hashes = F.array(
        *[
            F.md5(F.concat_ws("", *[F.col(f"h{b * rows + i}") for i in range(rows)]))
            for b in range(bands)
        ]
    )
    banded = sigs.select(F.col(id_col), F.posexplode(band_hashes).alias("band", "bh"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only.

    |A∩B| via a shingle join restricted (semi-join) to candidate ids;
    |A∪B| = |A|+|B|-|A∩B|. Output (a, b, jaccard) filtered to ≥ threshold.
    """
    cand_ids = (
        pairs.select(F.col("a").alias(id_col))
        .union(pairs.select(F.col("b").alias(id_col)))
        .distinct()
    )
    sh = shingle_table(docs, id_col, text_col, shingle_k).join(
        F.broadcast(cand_ids), id_col, "left_semi"
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    sa = sh.select(F.col(id_col).alias("a"), "shingle")
    sb = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        pairs.join(sa, "a").join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 3
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Full near-dup pipeline: minhash → LSH candidates → exact-jaccard
    verification. Returns (a, b, jaccard ≥ threshold)."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k)
    cands = lsh_candidates(sigs, id_col, num_hashes, bands)
    return jaccard_verify(docs, cands, id_col, text_col, shingle_k, threshold)


# --- simhash ---------------------------------------------------------------

def _token_hash32() -> Column:
    """32-bit int from the first 8 md5 hex chars of the token (portable:
    conv() here, ('0x'||…)::BIGINT in the oracle)."""
    return F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Per-doc SimHash: bit j of the signature is the sign of the sum of
    (2·bit_j(token_hash)−1) over tokens. One explode + one groupBy with
    `bits` conditional-sum aggregates — a single shuffle."""
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    ).withColumn("th", _token_hash32())
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(0)
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 6,
    bands: int = 4,
) -> DataFrame:
    """Hamming-near pairs via byte banding: two 32-bit signatures within
    hamming ≤ 6 share at least one of 4 bytes whenever the differing bits
    concentrate — candidates join on (band, byte), verified by
    bit_count(xor). (Banding is a recall heuristic, same as the reference
    LSH trade-off; the verify step keeps precision exact.)"""
    width = bits // bands
    mask = (1 << width) - 1
    band_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(mask)
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col), F.col("simhash"), F.posexplode(band_vals).alias("band", "bv")
    )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
