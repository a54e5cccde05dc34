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


def test_gate_query_under_plain_session(spark):
    plain = spark.newSession()
    plain.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")

    from quackpipe_spark.workloads.sql_surface import time_bucket_events

    out = time_bucket_events(plain, SF_DIR)
    assert out.count() > 0
