"""SparkSession factory tuned for the quackpipe-parity engine.

Single place where every entry point (tests, bench, driver contract, HTTP
API) obtains a session, so the scale-oriented settings are uniform:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong for some stage; AQE re-plans.
- Arrow execution on — every pandas_udf / toPandas boundary is vectorized.
- UTC session timezone — parity with DuckDB's UTC-naive timestamps (the
  oracle comparison would silently drift otherwise).
- parquet filter pushdown + schema merging off by default (mergeSchema is
  opt-in per read: it forces footer reads of every file at planning time,
  which at 100k-file scale is a driver stall; our catalog tracks schema).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# non-digit values (e.g. SPARK_GRAFT_CPUS='*', idiomatic Spark for "all
# cores" and handled by get_spark's master construction) must not crash
# the package IMPORT — the default applies only to the shuffle count
_cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
DEFAULT_SHUFFLE_PARTITIONS = int(_cpus_env) if _cpus_env.isdigit() else 32


def get_spark(
    app_name: str = "quackpipe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    # read per call (not via the import-time DEFAULT): a harness that sets
    # SPARK_GRAFT_CPUS after import must get a consistent local[N] AND
    # shuffle-partition count, not local[4] with 32 shuffle tasks (r12)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else DEFAULT_SHUFFLE_PARTITIONS
    if shuffle_partitions < 1:
        raise ValueError(f"shuffle_partitions must be >= 1, got {shuffle_partitions}")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime shuffle-partition coalescing + skew-join handling.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every Python<->JVM batch boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Scan efficiency: pushdown + pruning are the point of parquet.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        # Broadcast threshold: TPC-H dims (region/nation/supplier/part at
        # our SFs) should always broadcast; AQE also converts at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Shuffle codec zstd (guide §9): markedly better ratio than lz4 at
        # similar speed — at 100 TB the shuffle is the network bill, and
        # locally the r16 interleaved A/B (tightest window of the round,
        # floors identical across processes) measured the zstd+SHJ pair
        # at −6.3% over 16 exchange/join-heavy gates with 14 of 16
        # improving. Parquet WRITE codec is a separate knob and stays
        # snappy (BENCH_INGEST/BENCH_COMPACT comparability).
        .config("spark.io.compression.codec", "zstd")
        # Allow shuffled-hash join when its size conditions fit (guide
        # §3.1/§9): skips the per-partition sorts a sort-merge pays; the
        # planner's size gates + AQE still pick SMJ when a build side
        # could not fit. Same r16 A/B evidence as above; jaccard_verify
        # already forced SHJ where it matters most.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.shuffle.partitions",
            # resolved above; a falsy 0 must fail loudly, not silently
            # rewrite to the import-time default (review r14)
            str(shuffle_partitions),
        )
        # Nanosecond time: the reference's time domain is int64 epoch ns
        # (lineproto_parser.go:156, registry.go:95). Spark has no ns
        # timestamp; read parquet TIMESTAMP(NANOS) as LongType ns — the
        # same representation the reference uses — and derive µs
        # TimestampType via from_epoch_ns() where humans need it.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Timestamps: keep parquet NTZ semantics aligned with DuckDB.
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        # ANSI off: reference semantics (DuckDB via quackpipe) tolerate
        # overflow/cast edge cases; Spark 4 defaults ANSI on.
        .config("spark.sql.ansi.enabled", "false")
        # Headless-engine defaults: the web UI's listener bus and the
        # console progress redraw cost ~45% of the per-job floor (measured
        # 0.146s → 0.081s per count() on this box) — real money across a
        # many-small-queries serving workload. SPARK_GRAFT_UI=1 re-enables
        # the UI for interactive debugging.
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
        .config("spark.ui.showConsoleProgress", "false")
        # No locality wait: table storage is parquet on a shared filesystem
        # / object store — there is no executor-local replica to wait 3s
        # for, in local mode or on a cloud cluster.
        .config("spark.locality.wait", "0s")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    if master:
        builder = builder.master(master)
    elif os.environ.get("SPARK_MASTER"):
        # use the supplied master URL — it previously only SUPPRESSED the
        # local default, so getOrCreate() died with 'A master URL must be
        # set' and the user's cluster address was silently ignored (r12)
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    # Generic conf passthrough: SPARK_GRAFT_CONF="k=v;k2=v2". Scale- or
    # deployment-dependent settings (shuffle codec, AQE coalescing mode,
    # split sizes) stay parameterized instead of hard-coded for the local
    # box — production values go in the environment, local defaults stay
    # comparable across rounds. Explicit extra_conf still wins (applied
    # after).
    for pair in os.environ.get("SPARK_GRAFT_CONF", "").split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark
