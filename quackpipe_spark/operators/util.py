"""Small shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> int | None:
    """Optimizer-estimated input size — file-size-based for scans, no
    execution. None when the private API is unavailable; callers must
    treat None as "assume large" so the scale path is the fallback."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # private-API guard
        return None


def eager_barrier(df: DataFrame) -> DataFrame:
    """Materialization barrier with lineage truncation: the RELIABLE
    ``checkpoint()`` when the session has a checkpoint directory set
    (``spark.sparkContext.setCheckpointDir(...)`` — the standard Spark
    switch, so callers on clusters with preemptible/flaky executors opt
    in without editing library code), else ``localCheckpoint()`` — the
    single-node default, whose blocks live only on executors with no
    lineage to recover from executor loss. Both truncate the logical
    plan to a leaf, which is the point (guide §3.3): consumers stop
    re-analyzing the full upstream lineage. Callers still count() the
    result to make the barrier blocking where consumers race a lazy
    materialization."""
    try:
        has_dir = df.sparkSession.sparkContext._jsc.sc().getCheckpointDir().isDefined()
    except Exception:  # private-API guard
        has_dir = False
    return df.checkpoint() if has_dir else df.localCheckpoint()


def sized_parts(df: DataFrame, bytes_per_task: int) -> int:
    """Partition count for a REQUIRED repartition (e.g. the id-hash
    exchange whose partitioning a downstream groupBy reuses), sized to
    the data instead of pinned to the core count (guide §2.2/§6):
    clamp(ceil(estimated_bytes / bytes_per_task), 1, parallelism).

    Unlike :func:`fan_out` this never *skips* the exchange — callers use
    it where the exchange itself establishes a clustering the rest of
    the pipeline relies on (skipping would push a bigger shuffle past an
    explode) — it only stops a kilobyte-scale input from being smeared
    over ``parallelism`` tasks per stage, each paying the fixed task
    cost for microseconds of work. Estimate unavailable → assume large
    (full parallelism)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    sz = plan_size_bytes(df)
    if sz is None:
        return par
    return min(par, max(1, -(-sz // bytes_per_task)))


def fan_out(
    df: DataFrame,
    cols=None,
    skip_under_bytes: int | None = None,
    bytes_per_task: int | None = None,
) -> DataFrame:
    """Repartition up to the cluster's parallelism — only when the input is
    under-split.

    The test parquet (and any compact single-file source) arrives as ONE
    scan split, which single-threads all downstream per-row work (md5,
    higher-order-function dot products, expand). At real scale the scan is
    already split to ≥ parallelism and this is a no-op — the gate keeps the
    extra shuffle from ever firing on a 100 TB input.

    ``skip_under_bytes``: for operators whose per-byte downstream work is
    LIGHT (one vectorized matmul per Arrow batch — not md5-per-shingle),
    a tiny input gains nothing from splitting: the round-robin exchange
    plus N-way Arrow/Python fan-out costs more than the serial work
    (measured 0.84s → 0.40s on a 2k-row assignment). When set, inputs
    whose optimizer-estimated size is under the bound keep their
    partitioning; large inputs repartition as usual, so the knob is inert
    at real scale.

    ``bytes_per_task``: size the fan-out to the DATA, not to the core
    count (guide §2.2/§6 — partition count follows input volume). The
    repartition target becomes clamp(ceil(estimated_bytes /
    bytes_per_task), 1, parallelism) instead of an unconditional
    ``parallelism``: a kilobyte-scale input stays on its existing splits
    (no exchange, no N-way per-task fan-out of a tiny relation — the
    measured per-task fixed cost at 32 tasks dwarfs the compute), while
    an input with ≥ parallelism × bytes_per_task estimated bytes fans
    out exactly as before. Callers pick the divisor by their per-byte
    downstream cost (smaller divisor = heavier work per byte). Estimate
    unavailable → assume large (full fan-out), so the knob can only ever
    suppress a useless exchange, never a needed one."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    target = par
    if bytes_per_task is not None:
        sz = plan_size_bytes(df)
        if sz is not None:
            target = min(par, max(1, -(-sz // bytes_per_task)))

    def _repartition():
        return df.repartition(target, *cols) if cols else df.repartition(target)

    try:
        qe = df._jdf.queryExecution()
        if skip_under_bytes is not None:
            # stats probe (plan_size_bytes inline — qe already in hand):
            # approximate is fine for a "too small to split" call
            if int(qe.optimizedPlan().stats().sizeInBytes()) < skip_under_bytes:
                return df
        # Under AQE (any plan with an exchange), building the RDD runs the
        # upstream query stages EAGERLY and then discards them — the probe
        # would execute half the pipeline at plan-build time and the real
        # action would run it again. Only scan-shaped plans (no adaptive
        # root) are safe/cheap to probe; anything else takes the
        # unconditional repartition, which is the pre-probe behavior.
        if "AdaptiveSparkPlanExec" in qe.executedPlan().getClass().getSimpleName():
            return _repartition()
        # JVM-internal RDD: same partition count as .rdd but skips the
        # Python RDD wrapper (serializer setup + toJavaRDD conversion).
        nparts = qe.toRdd().getNumPartitions()
    except Exception:  # private-API guard: fall back to repartitioning
        return _repartition()
    if nparts >= target:
        return df
    return _repartition()
