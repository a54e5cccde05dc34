"""Driver simulation: a session quackpipe_spark did NOT build must still
read every test table through table_df.

Round-1 regression: the correctness driver runs queries() under its own
plain SparkSession (no quackpipe_spark.session confs); events.parquet is
TIMESTAMP(NANOS) and the read died with PARQUET_TYPE_ILLEGAL because
``spark.sql.legacy.parquet.nanosAsLong`` was only set at session build.
table_df now sets the conf at the read boundary; this test strips the conf
from a fresh session (newSession isolates SQLConf) and proves the read
still works.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_events_read_under_plain_session(spark):
    plain = spark.newSession()
    # simulate the driver: the legacy-nanos conf is absent/off
    plain.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")

    from quackpipe_spark.sources.tables import table_df

    ev = table_df(plain, SF_DIR, "events")
    assert "ts" in ev.columns
    assert dict(ev.dtypes)["ts"] == "bigint"  # nanos arrive as epoch-ns longs
    assert ev.limit(5).count() > 0


def test_normalize_event_time_both_encodings(spark):
    """The testdata has shipped events.ts as TIMESTAMP(NANOS) (rounds 1-3)
    and TIMESTAMP(MICROS) (round 4+). _normalize_event_time must map both
    to the engine's int64 epoch-ns domain — and produce the same nanos for
    the same instant regardless of encoding."""
    from pyspark.sql import functions as F

    from quackpipe_spark.sources.tables import _normalize_event_time

    ns = 1_700_000_000_123_456_000  # µs-aligned so both encodings hold it
    as_long = spark.range(1).select(F.lit(ns).alias("ts"))
    as_tstamp = spark.range(1).select(
        F.timestamp_micros(F.lit(ns // 1000)).alias("ts")
    )
    as_ntz = as_tstamp.select(F.col("ts").cast("timestamp_ntz").alias("ts"))

    for df in (as_long, as_tstamp, as_ntz):
        out = _normalize_event_time(df)
        assert dict(out.dtypes)["ts"] == "bigint"
        assert out.collect()[0]["ts"] == ns


def test_gate_query_under_plain_session(spark):
    plain = spark.newSession()
    plain.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")

    from quackpipe_spark.workloads.sql_surface import time_bucket_events

    out = time_bucket_events(plain, SF_DIR)
    assert out.count() > 0
