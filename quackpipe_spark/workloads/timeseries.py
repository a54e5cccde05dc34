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
    """Per event: the user's most recent session-start at-or-before the
    event. Self-as-of on the events table — the canonical
    sessions/attribution query shape.

    The right side is 'signup' events: the synthetic corpus has no
    'login' event type (signup/error/click/view/purchase only), so a
    'login' filter made the right side EMPTY and the gate passed
    trivially with zero matches (r13 review find). The column aliases
    keep the original login_* names for gate continuity.
    """
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 100)
    us = F.expr("ts DIV 1000")
    left = ev.filter(F.col("event_type") != "signup").select(
        "event_id", "user_id", us.alias("t_us"), "event_type"
    )
    # dedupe session-starts per (user, µs): ts is ns truncated to µs, so
    # two ns-distinct rows can collide on one as-of key — asof_join picks
    # the last payload per time and DuckDB's ASOF an arbitrary tie, so
    # the survivor must be pinned (max event_id) in BOTH engines or the
    # hash gate goes flaky the day the data grows a collision
    right = (
        ev.filter(F.col("event_type") == "signup")
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
  FROM events WHERE user_id < 100 AND event_type <> 'signup'
), rights AS (
  -- max(event_id) per (user, µs): mirrors the Spark side's tie pin
  -- (ns→µs truncation can collide two rows on one as-of key)
  SELECT user_id, epoch_us(ts) AS login_us, max(event_id) AS login_event_id
  FROM events WHERE user_id < 100 AND event_type = 'signup'
  GROUP BY user_id, epoch_us(ts)
)
SELECT l.event_id, l.user_id, l.event_type, r.login_event_id,
       l.t_us - r.login_us AS us_since_login
FROM lefts l ASOF LEFT JOIN rights r
  ON l.user_id = r.user_id AND l.t_us >= r.login_us
"""


def asof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest gate for the FULL asof_join surface (VERDICT r12 #6) in ONE
    registry row (the driver verifies exactly 50 entries, so the former
    separate `asof_last_login` row is consolidated here, not evicted):

    - one row per direction (backward/forward/nearest) with (row count,
      match count, Σ|Δt|, Σ matched ids) — backward/forward verified
      against DuckDB's native ASOF JOIN ('>=' / '<='), nearest against a
      two-ASOF CASE picking the closer candidate with backward winning
      exact ties (the operator's documented rule);
    - one 'rowhash_backward' row digesting the original per-event
      last-session-start query (`asof_last_login`, still exported for
      library use) with a row-CONTENT checksum: Σ of a 60-bit md5 prefix
      of every output row mod 1e11, order-independent and overflow-safe
      to ~90M rows — so the per-row values stay hash-verified even
      though the registry row is a digest."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 100)
    us = F.expr("ts DIV 1000")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", us.alias("t_us")
    )
    right = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id"), us.alias("err_us"))
        .agg(F.max("event_id").alias("err_event_id"))
    )
    out = None
    for d in ("backward", "forward", "nearest"):
        j = asof_join(
            left,
            right,
            key="user_id",
            left_time="t_us",
            right_time="err_us",
            payload_cols=["err_event_id", "err_us"],
            direction=d,
        )
        digest = (
            j.withColumn("direction", F.lit(d))
            .groupBy("direction")
            .agg(
                F.count("*").alias("n_rows"),
                F.count("err_event_id").alias("n_matched"),
                F.sum(F.abs(F.col("t_us") - F.col("err_us"))).alias("sum_dt_us"),
                F.sum("err_event_id").alias("checksum"),
            )
        )
        out = digest if out is None else out.unionByName(digest)
    # per-event backward query, digested with a row-content checksum
    ll = asof_last_login(spark, sf_dir)
    row_str = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("~"))
            for c in ("event_id", "user_id", "event_type", "login_event_id",
                      "us_since_login")
        ],
    )
    row_h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("long") % F.lit(
        100_000_000_000
    )
    ll_digest = (
        ll.withColumn("direction", F.lit("rowhash_backward"))
        .groupBy("direction")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("login_event_id").alias("n_matched"),
            F.sum("us_since_login").alias("sum_dt_us"),
            F.sum(row_h).alias("checksum"),
        )
    )
    return out.unionByName(ll_digest).orderBy("direction")


ASOF_BATTERY_SQL = """
WITH lefts AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE user_id < 100 AND event_type = 'click'
), rights AS (
  SELECT user_id, epoch_us(ts) AS err_us, max(event_id) AS err_event_id
  FROM events WHERE user_id < 100 AND event_type = 'error'
  GROUP BY 1, 2
), bwd AS (
  SELECT l.event_id, l.t_us, r.err_event_id, r.err_us
  FROM lefts l ASOF LEFT JOIN rights r
    ON l.user_id = r.user_id AND l.t_us >= r.err_us
), fwd AS (
  SELECT l.event_id, l.t_us, r.err_event_id, r.err_us
  FROM lefts l ASOF LEFT JOIN rights r
    ON l.user_id = r.user_id AND l.t_us <= r.err_us
), nst AS (
  -- nearest = closer of the backward/forward candidates; backward wins
  -- exact ties (same rule as the Spark operator). event_id is unique in
  -- the synthetic events table, so the bwd-fwd self-join is 1:1.
  SELECT b.event_id, b.t_us,
         CASE WHEN b.err_us IS NULL THEN f.err_event_id
              WHEN f.err_us IS NULL THEN b.err_event_id
              WHEN (b.t_us - b.err_us) <= (f.err_us - b.t_us) THEN b.err_event_id
              ELSE f.err_event_id END AS err_event_id,
         CASE WHEN b.err_us IS NULL THEN f.err_us
              WHEN f.err_us IS NULL THEN b.err_us
              WHEN (b.t_us - b.err_us) <= (f.err_us - b.t_us) THEN b.err_us
              ELSE f.err_us END AS err_us
  FROM bwd b JOIN fwd f USING (event_id)
), directions AS (
  SELECT direction,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(err_event_id) AS BIGINT) AS n_matched,
         CAST(sum(abs(t_us - err_us)) AS BIGINT) AS sum_dt_us,
         CAST(sum(err_event_id) AS BIGINT) AS checksum
  FROM (
    SELECT 'backward' AS direction, t_us, err_us, err_event_id FROM bwd
    UNION ALL SELECT 'forward', t_us, err_us, err_event_id FROM fwd
    UNION ALL SELECT 'nearest', t_us, err_us, err_event_id FROM nst
  )
  GROUP BY direction
), ll_lefts AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type
  FROM events WHERE user_id < 100 AND event_type <> 'signup'
), ll_rights AS (
  SELECT user_id, epoch_us(ts) AS login_us, max(event_id) AS login_event_id
  FROM events WHERE user_id < 100 AND event_type = 'signup'
  GROUP BY 1, 2
), ll AS (
  -- the original per-event last-session-start query (asof_last_login),
  -- digested below with an order-independent row-CONTENT checksum so
  -- per-row values stay hash-verified inside this consolidated gate
  SELECT l.event_id, l.user_id, l.event_type, r.login_event_id,
         l.t_us - r.login_us AS us_since_login
  FROM ll_lefts l ASOF LEFT JOIN ll_rights r
    ON l.user_id = r.user_id AND l.t_us >= r.login_us
), ll_digest AS (
  SELECT 'rowhash_backward' AS direction,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(login_event_id) AS BIGINT) AS n_matched,
         CAST(sum(us_since_login) AS BIGINT) AS sum_dt_us,
         CAST(sum(
           ('0x' || substr(md5(concat_ws('|',
              coalesce(event_id::VARCHAR, '~'),
              coalesce(user_id::VARCHAR, '~'),
              coalesce(event_type, '~'),
              coalesce(login_event_id::VARCHAR, '~'),
              coalesce(us_since_login::VARCHAR, '~'))), 1, 15))::BIGINT
           % 100000000000
         ) AS BIGINT) AS checksum
  FROM ll
)
SELECT * FROM directions
UNION ALL SELECT * FROM ll_digest
ORDER BY direction
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


# asof_last_login (and ASOF_SQL) stay exported for library/test use; the
# registry row is the consolidated asof_battery — its 'rowhash_backward'
# branch digests asof_last_login's exact per-row output, so the former
# gate's coverage is preserved inside ONE of the driver's 50 slots.
QUERIES = {
    "asof_battery": asof_battery,
    "gapfill_hourly": gapfill_hourly,
    "downsample_1m_to_5m": downsample_1m_to_5m,
}
ORACLE = {
    "asof_battery": ASOF_BATTERY_SQL,
    "gapfill_hourly": GAPFILL_SQL,
    "downsample_1m_to_5m": DOWNSAMPLE_SQL,
}
