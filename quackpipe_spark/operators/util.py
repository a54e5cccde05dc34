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


def fan_out(df: DataFrame, cols=None, skip_under_bytes: int | None = None) -> DataFrame:
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
    at real scale."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism

    def _repartition():
        return df.repartition(par, *cols) if cols else df.repartition(par)

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
    if nparts >= par:
        return df
    return _repartition()
