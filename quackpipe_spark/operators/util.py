"""Small shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, cols=None) -> DataFrame:
    """Repartition up to the cluster's parallelism — only when the input is
    under-split.

    The test parquet (and any compact single-file source) arrives as ONE
    scan split, which single-threads all downstream per-row work (md5,
    higher-order-function dot products, expand). At real scale the scan is
    already split to ≥ parallelism and this is a no-op — the gate keeps the
    extra shuffle from ever firing on a 100 TB input.
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        # JVM-internal RDD: same partition count as .rdd but skips the
        # Python RDD wrapper (serializer setup + toJavaRDD conversion).
        nparts = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:  # private-API guard: fall back to the public path
        nparts = df.rdd.getNumPartitions()
    if nparts >= par:
        return df
    return df.repartition(par, *cols) if cols else df.repartition(par)
