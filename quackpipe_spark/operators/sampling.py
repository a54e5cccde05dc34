"""Deterministic hash sampling and splits for training-data pipelines.

The sampling decision for a row depends ONLY on (salt, key): re-running
the pipeline, adding machines, or reordering partitions never changes
which rows are kept — the property that makes sampled corpora and
train/val splits reproducible across engines and runs (Spark's
``DataFrame.sample`` is seed-stable only for a fixed partitioning, so it
is NOT reproducible under repartition/scale-out; a keyed hash is).

All decisions derive from md5, the same recipe every oracle mirrors:
bucket(key) = ('0x' || first 8 hex of md5('{salt}|' + key)) mod 10_000.
Row-local JVM expressions — zero shuffles, ride the scan stage, and the
filter pushes down past column pruning like any other predicate.

Salt discipline: decisions with the same (salt, key) are IDENTICAL, so
stages composed over the same keys must use DISTINCT salts unless
correlation is intended. A pipeline that samples with salt s and then
splits with the same s carves its val band out of exactly the bucket
range the sampler already dropped — val comes out empty. (Intentional
correlation is the nesting property: growing a sample fraction at one
salt only ADDS rows.)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000  # 0.01% sampling granularity


def _cut(fraction: float) -> int:
    """fraction → bucket cutoff, rounded HALF-UP — matching SQL round()
    (Spark's hash_sample_keep and DuckDB both round half-up; Python's
    built-in round() is half-even and would keep a different row set for
    fractions landing exactly on a half-bucket)."""
    f = max(0.0, min(1.0, fraction))
    return int(math.floor(f * _BUCKETS + 0.5))


def order_key(key: Column, salt: str = "") -> Column:
    """md5('{salt}|' + key) with the NULL sentinel — the ONE deterministic
    order/hash domain every keyed decision derives from (hash_mod takes
    its 32-bit prefix; stratified_sample and pack_sequences sort by it).
    A single definition keeps the engine-mirroring oracles in lockstep:
    changing the recipe here is a cross-engine contract change."""
    s = F.coalesce(key.cast("string"), F.lit("\x00null"))
    return F.md5(F.concat(F.lit(f"{salt}|"), s))


def hash_mod(key: Column, n: int, salt: str = "") -> Column:
    """Deterministic value in [0, n) from the 32-bit md5('{salt}|'+key)
    prefix — the base primitive for any keyed scatter (sampling buckets,
    packing shards). The conv() result is non-negative, so plain % stays
    in-domain; modulo bias over 2^32 is ≤ n/2^32 (irrelevant for any
    practical n).

    NULL keys hash as the sentinel '\\x00null' rather than propagating
    NULL — otherwise hash_sample would silently drop null-key rows while
    split_by_hash routed them to the fallback label (inconsistent, and
    both invisible). With the sentinel every row gets one deterministic
    bucket regardless of key nullability."""
    if n < 1:
        # % 0 NULLs every bucket JVM-side, and a negative n flips the
        # remainder SIGN between engines (JVM % is non-negative here,
        # Python % is negative) — both corrupt downstream silently
        raise ValueError("hash_mod modulus must be >= 1")
    if n > (1 << 31) - 1:
        # the int output cast would WRAP buckets >= 2^31 negative
        # (ANSI off) — out of the documented [0, n) domain, silently
        raise ValueError("hash_mod modulus must fit int32")
    h = order_key(key, salt)
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n).cast("int")


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic sampling bucket in [0, 10000): hash_mod at the
    sampling granularity (see hash_mod for NULL-key semantics)."""
    return hash_mod(key, _BUCKETS, salt)


def hash_mod_py(key: str | None, n: int, salt: str = "") -> int:
    """Driver-side twin of :func:`hash_mod` — the same md5 recipe in pure
    Python, so a caller can name a key's bucket without a Spark job
    (e.g. fts maps query terms to index buckets for partition pruning).
    Tested value-equal to the Column version."""
    import hashlib

    if n < 1:
        raise ValueError("hash_mod modulus must be >= 1")
    if n > 0x7FFFFFFF:
        # SAME guard as the Column twin: its int-cast result would wrap
        # negative past int32, so the Python twin accepting such an n
        # would name buckets the engine side can never produce —
        # breaking the documented value-equality contract (review r14)
        raise ValueError("hash_mod modulus must fit int32")
    if key is None:
        s = "\x00null"
    elif isinstance(key, bool):
        # Spark casts booleans to 'true'/'false'; Python str() gives
        # 'True'/'False' — a silent different-bucket divergence
        s = "true" if key else "false"
    elif isinstance(key, float):
        # Spark renders doubles Java-style ('1.0E20') where Python says
        # '1e+20' — no cheap faithful twin exists, so refuse instead of
        # bucketing differently than the Column version
        raise TypeError(
            "hash_mod_py: float keys don't have a stable cross-engine "
            "string form; cast the key to string/int first"
        )
    else:
        s = str(key)
    return int(hashlib.md5(f"{salt}|{s}".encode()).hexdigest()[:8], 16) % n


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, keyed on ``key_col``.

    Exactly the rows whose bucket < fraction·10000 survive — the same
    rows in any engine, at any parallelism, on any run. Granularity is
    1/10000; fraction is clamped to [0, 1]."""
    return df.filter(hash_bucket(F.col(key_col), salt) < _cut(fraction))


def split_by_hash(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Tag every row with a deterministic split label ('train'/'val'/…).

    ``weights`` maps label → fraction (normalized if they don't sum to 1);
    labels partition the bucket space in the given insertion order, so a
    row's label is a pure function of (salt, key) — train/val membership
    never drifts between runs or engines, and a later re-shard cannot
    leak validation rows into training."""
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    for label, cut in split_cuts(weights):
        cond = bucket < cut
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(list(weights)[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def split_cuts(weights: dict[str, float]) -> list[tuple[str, int]]:
    """THE split-boundary arithmetic, single-sourced: cumulative half-up
    bucket cut per non-terminal label (the terminal label is the CASE
    else-arm). Shared by :func:`split_by_hash` and the SQL renderer
    (:func:`split_case_sql`) so the boundaries cannot desynchronize
    across engines."""
    if not weights:
        raise ValueError("at least one split label required")
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out: list[tuple[str, int]] = []
    hi = 0.0
    for label, w in list(weights.items())[:-1]:
        hi += w / total * _BUCKETS
        out.append((label, int(math.floor(hi + 0.5))))  # half-up, see _cut
    return out


def mix_domains(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    key_col: str,
    salt: str = "",
    default: float = 1.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic domain-mixture reweighting — the "sample Wikipedia
    3.4×, CommonCrawl 0.44×" step of assembling a training mix (the
    GPT-3/Pile recipe, public). A row of domain d with weight w is
    emitted ``floor(w) + Bernoulli(frac(w))`` times, the Bernoulli drawn
    from the (salt, key) hash: w < 1 downsamples, w > 1 upsamples by
    repeating rows. Domains absent from ``weights`` use ``default``.

    The per-row copy count is a pure function of (salt, key, w), so the
    mixed corpus is identical across runs, engines, and partitionings.
    Output rows carry ``copy_col`` (0-based repeat index) so downstream
    stages can distinguish copies — dedup stages in particular must run
    BEFORE mixing, or they will re-collapse the upsampled rows.

    Scale shape: one row-local projection plus an inline explode of a
    tiny integer sequence — no shuffle, no UDF, survives any corpus
    size. The fractional decision reuses the 10000-bucket hash domain,
    so mixes nest with hash_sample under the salt discipline in the
    module docstring (use a distinct salt per stage)."""
    if any(w < 0 for w in weights.values()) or default < 0:
        raise ValueError("mixture weights must be non-negative")
    bucket = hash_bucket(F.col(key_col), salt)

    def _copies(w: float) -> Column:
        base = int(math.floor(w))
        frac_cut = _cut(w - base)
        n = F.lit(base) + (bucket < frac_cut).cast("int")
        return n

    expr = None
    for d, w in weights.items():
        cond = F.col(domain_col) == d
        expr = (
            F.when(cond, _copies(w))
            if expr is None
            else expr.when(cond, _copies(w))
        )
    n = _copies(default) if expr is None else expr.otherwise(_copies(default))
    # sequence(0, n-1) with n=0 infers a NEGATIVE step (same trap as
    # shingles) — short-circuit to an empty array so the row vanishes
    seq = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(seq))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Keep (up to) ``n_per_group`` rows per group, chosen in md5(salt|key)
    order with the key as tiebreak — a deterministic per-stratum quota.
    The balanced-corpus counterpart of mix_domains' proportional
    reweighting: caps every stratum at the same absolute size no matter
    how skewed the input (the "take 1M docs per language" step).

    Membership is a pure function of (salt, the group's key multiset) —
    stable across runs, engines, and partitionings, though unlike
    hash_sample a row's survival can change when OTHER rows join its
    group (quota = rank, not an absolute cutoff; that is inherent to
    fixed-size quotas).

    Determinism contract: ``key_col`` values must be unique within a
    group. Two rows sharing a key tie on both order columns, and WHICH
    physical row survives a quota boundary is then partition-layout-
    dependent (their non-key columns may differ) — the same caveat as
    pack_sequences' duplicate-id note.

    Scale shape: one hash-partitioned window per group with map-side
    rank short-circuiting... rank needs the full group sorted, so the
    real cost is one shuffle on group_col; groups are assumed many and
    modest (strata like language or source). A group so hot it
    dominates a partition is the window's skew case — pre-filter with
    hash_sample to thin it before ranking."""
    if n_per_group < 1:
        raise ValueError("n_per_group must be >= 1")
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        order_key(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def order_key_sql(key_expr: str, salt: str = "") -> str:
    """The DuckDB-side twin of :func:`order_key`: md5('{salt}|' + key)
    with the NULL sentinel. Oracle SQL must derive every keyed
    order/bucket from this renderer (never hand-roll the recipe) so a
    change to the hash domain stays a single-sourced cross-engine
    contract change."""
    if any(ord(c) < 0x20 for c in salt):
        # control chars (NUL especially) can't ride a SQL string literal;
        # salts are builder-chosen constants — reject loudly
        raise ValueError("salt must not contain control characters")
    salt_sql = salt.replace("'", "''")  # the salt inlines as a SQL literal
    key = f"coalesce(CAST({key_expr} AS VARCHAR), chr(0) || 'null')"
    return f"md5('{salt_sql}|' || {key})"


def bucket_sql(key_expr: str, salt: str = "") -> str:
    """The DuckDB-side twin of :func:`hash_bucket`: sampling bucket in
    [0, 10000) from the 32-bit prefix of :func:`order_key_sql`."""
    return (
        f"('0x' || substr({order_key_sql(key_expr, salt)}, 1, 8))::BIGINT "
        f"% {_BUCKETS}"
    )


def hash_sample_sql(key_expr: str, fraction: float, salt: str = "") -> str:
    """The DuckDB-side predicate mirroring :func:`hash_sample` — used by
    oracle SQL so both engines keep the identical rows."""
    return f"{bucket_sql(key_expr, salt)} < {_cut(fraction)}"


def _label_sql(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def split_case_sql(bucket_expr: str, weights: dict[str, float]) -> str:
    """The DuckDB-side CASE mirroring :func:`split_by_hash`, with
    boundaries from the shared :func:`split_cuts` arithmetic.
    ``bucket_expr`` must be the :func:`bucket_sql` of the same key+salt
    the Spark side uses."""
    arms = " ".join(
        f"WHEN {bucket_expr} < {cut} THEN {_label_sql(label)}"
        for label, cut in split_cuts(weights)
    )
    last = _label_sql(list(weights)[-1])
    return f"CASE {arms} ELSE {last} END" if arms else last


def mix_copies_case_sql(
    bucket_expr: str,
    weights: dict[str, float],
    domain_col: str = "source",
    default: float = 1.0,
) -> str:
    """The DuckDB-side per-row copy count mirroring :func:`mix_domains`:
    floor(w) plus the fractional Bernoulli drawn from the shared bucket,
    with the same ``default`` for unlisted domains. Validates like its
    Spark twin so both engines fail in lockstep rather than one raising
    and the other rendering negative copy counts."""
    if any(w < 0 for w in weights.values()) or default < 0:
        raise ValueError("mixture weights must be non-negative")

    def _copies(w: float) -> str:
        return f"{int(math.floor(w))} + CASE WHEN {bucket_expr} < {_cut(w - math.floor(w))} THEN 1 ELSE 0 END"

    arms = " ".join(
        f"WHEN {domain_col} = {_label_sql(dom)} THEN {_copies(w)}"
        for dom, w in weights.items()
    )
    return f"CASE {arms} ELSE {_copies(default)} END" if arms else _copies(default)
