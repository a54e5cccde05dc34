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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000  # 0.01% sampling granularity


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from md5('{salt}|' + key).

    NULL keys hash as the sentinel '\\x00null' rather than propagating
    NULL — otherwise hash_sample would silently drop null-key rows while
    split_by_hash routed them to the fallback label (inconsistent, and
    both invisible). With the sentinel every row gets one deterministic
    bucket regardless of key nullability."""
    s = F.coalesce(key.cast("string"), F.lit("\x00null"))
    h = F.md5(F.concat(F.lit(f"{salt}|"), s))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS).cast("int")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, keyed on ``key_col``.

    Exactly the rows whose bucket < fraction·10000 survive — the same
    rows in any engine, at any parallelism, on any run. Granularity is
    1/10000; fraction is clamped to [0, 1]."""
    cut = int(round(max(0.0, min(1.0, fraction)) * _BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), salt) < cut)


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
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    hi = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        hi += w / total * _BUCKETS
        cond = bucket < int(round(hi))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def hash_sample_sql(key_expr: str, fraction: float, salt: str = "") -> str:
    """The DuckDB-side predicate mirroring :func:`hash_sample` — used by
    oracle SQL so both engines keep the identical rows."""
    cut = int(round(max(0.0, min(1.0, fraction)) * _BUCKETS))
    key = f"coalesce(CAST({key_expr} AS VARCHAR), chr(0) || 'null')"
    return (
        f"('0x' || substr(md5('{salt}|' || {key}), 1, 8))::BIGINT "
        f"% {_BUCKETS} < {cut}"
    )
