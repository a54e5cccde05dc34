"""Time-series workloads: as-of join, gap-filled rollups, downsampling.

The reference is a time-series lakehouse (README.md:3-19); these are the
domain operators its users run on the delegated engine. The as-of oracle
uses DuckDB's native ASOF JOIN — our union+window formulation must
reproduce it exactly. Event times compare at µs resolution (ts DIV 1000)
because DuckDB reads the ns parquet column as a µs timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackpipe_spark.operators.asof import asof_join, gapfill


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackpipe_spark.sources.tables import table_df

    return table_df(spark, sf_dir, "events")


def asof_last_login(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the user's most recent login at-or-before the event.

    Self-as-of on the events table (left = non-login events, right =
    logins) — the canonical sessions/attribution query shape.
    """
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 100)
    us = F.expr("ts DIV 1000")
    left = ev.filter(F.col("event_type") != "login").select(
        "event_id", "user_id", us.alias("t_us"), "event_type"
    )
    # dedupe logins per (user, µs): ts is ns truncated to µs, so two
    # ns-distinct logins can collide on one as-of key — asof_join picks
    # the last payload per time and DuckDB's ASOF an arbitrary tie, so
    # the survivor must be pinned (max event_id) in BOTH engines or the
    # hash gate goes flaky the day the data grows a collision
    right = (
        ev.filter(F.col("event_type") == "login")
        .groupBy(F.col("user_id"), us.alias("login_us"))
        .agg(F.max("event_id").alias("login_event_id"))
    )
    out = asof_join(
        left,
        right,
        key="user_id",
        left_time="t_us",
        right_time="login_us",
        payload_cols=["login_event_id", "login_us"],
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        "login_event_id",
        (F.col("t_us") - F.col("login_us")).alias("us_since_login"),
    )


ASOF_SQL = """
WITH lefts AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type
  FROM events WHERE user_id < 100 AND event_type <> 'login'
), rights AS (
  -- max(event_id) per (user, µs): mirrors the Spark side's tie pin
  -- (ns→µs truncation can collide two logins on one as-of key)
  SELECT user_id, epoch_us(ts) AS login_us, max(event_id) AS login_event_id
  FROM events WHERE user_id < 100 AND event_type = 'login'
  GROUP BY user_id, epoch_us(ts)
)
SELECT l.event_id, l.user_id, l.event_type, r.login_event_id,
       l.t_us - r.login_us AS us_since_login
FROM lefts l ASOF LEFT JOIN rights r
  ON l.user_id = r.user_id AND l.t_us >= r.login_us
"""


def gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type rollup densified over the full time range: missing
    buckets appear with n=0 and the average carried forward (LOCF) — the
    hypertable/time_bucket_gapfill pattern."""
    ev = _events(spark, sf_dir)
    bucket = F.expr("unix_seconds(date_trunc('HOUR', timestamp_micros(ts DIV 1000)))")
    sparse = ev.groupBy(F.col("event_type"), bucket.alias("bucket_s")).agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value")
    )
    dense = gapfill(
        sparse,
        key_col="event_type",
        bucket_col="bucket_s",
        bucket_step=3600,
        fill={"n": 0},
        locf_cols=["avg_value"],
    )
    return dense.select("event_type", "bucket_s", F.col("n").cast("long").alias("n"), "avg_value")


GAPFILL_SQL = """
WITH sparse AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s,
         count(*) AS n, round(avg(value), 4) AS avg_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_s) AS lo, max(bucket_s) AS hi FROM sparse
), grid AS (
  SELECT k.event_type, g.bucket_s
  FROM (SELECT DISTINCT event_type FROM sparse) k,
       (SELECT unnest(range(lo, hi + 1, 3600)) AS bucket_s FROM bounds) g
), dense AS (
  -- null-safe series key: the Spark gapfill operator joins the grid
  -- back with eqNullSafe (a NULL event_type is a legitimate series);
  -- USING(...) would never match it, zero-filling a phantom NULL
  -- series while dropping its real aggregates
  SELECT g.event_type, g.bucket_s,
         coalesce(s.n, 0) AS n,
         s.avg_value
  FROM grid g LEFT JOIN sparse s
    ON g.event_type IS NOT DISTINCT FROM s.event_type
   AND g.bucket_s = s.bucket_s
)
SELECT event_type, bucket_s, n,
       last_value(avg_value IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket_s ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value
FROM dense
"""


def downsample_1m_to_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level downsampling: minute pre-aggregates re-aggregated into
    5-minute buckets — the rollup-cascade pattern (compute cheap fine
    buckets once, derive coarser tiers without rescanning raw data).
    Weighted by count so the re-aggregated mean is exact."""
    ev = _events(spark, sf_dir)
    minute = F.expr("unix_seconds(date_trunc('MINUTE', timestamp_micros(ts DIV 1000)))")
    m1 = ev.groupBy(F.col("event_type"), minute.alias("m_s")).agg(
        F.count("*").alias("n"), F.sum("value").alias("sv")
    )
    m5 = (
        m1.groupBy(
            "event_type", (F.floor(F.col("m_s") / 300) * 300).cast("long").alias("bucket_s")
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sv") / F.sum("n"), 4).alias("avg_value"),
        )
    )
    return m5


DOWNSAMPLE_SQL = """
WITH m1 AS (
  SELECT event_type,
         CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS m_s,
         count(*) AS n, sum(value) AS sv
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(floor(m_s / 300) * 300 AS BIGINT) AS bucket_s,
       CAST(sum(n) AS BIGINT) AS n,
       round(sum(sv) / sum(n), 4) AS avg_value
FROM m1 GROUP BY 1, 2
"""


QUERIES = {
    "asof_last_login": asof_last_login,
    "gapfill_hourly": gapfill_hourly,
    "downsample_1m_to_5m": downsample_1m_to_5m,
}
ORACLE = {
    "asof_last_login": ASOF_SQL,
    "gapfill_hourly": GAPFILL_SQL,
    "downsample_1m_to_5m": DOWNSAMPLE_SQL,
}
