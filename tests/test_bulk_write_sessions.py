"""Bulk (Spark-path) writes + session_window cross-validation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

NS = 10**9
T0 = 1_700_000_000 * NS


def test_bulk_write_df_path(spark, tmp_path):
    """The distributed writer path (write_df) — used by bulk loads and
    compaction — must stay covered now that micro-batches take the Arrow
    fast path: hive layout, level naming, sorted runs, index upsert."""
    import pyarrow.parquet as pq

    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.plans.index import PartitionIndex
    from quackpipe_spark.writer import HiveWriter

    catalog = Catalog(str(tmp_path / "root"))
    t = catalog.get_or_create("d", "bulk", fields={"v": "BIGINT", "__timestamp": "BIGINT"})
    w = HiveWriter(spark, catalog)
    df = spark.range(1000).select(
        F.col("id").alias("v"),
        # spread over 2 hours, reversed so the writer must sort
        (F.lit(T0) + (999 - F.col("id")) * 7_000_000_000).alias("__timestamp"),
    )
    written = w.write_df(t, df, level=1)
    # 1000×7s ≈ 1.94h starting 22:13 → hour buckets 22, 23, 00
    assert len(written) == 3
    total = 0
    for pdir in t.partition_dirs():
        idx = PartitionIndex.load(pdir)
        for name, entry in idx.files.items():
            assert name.endswith(".1.parquet")
            total += entry.row_count
            ts = pq.read_table(f"{pdir}/{name}", columns=["__timestamp"])["__timestamp"].to_pylist()
            assert ts == sorted(ts)  # sorted run
            assert entry.min_time == ts[0] and entry.max_time == ts[-1]
    assert total == 1000


def test_session_window_agrees_with_manual_sessionization(spark, duck):
    """Spark's native session_window must produce the same session count
    per user as the lag+cumsum formulation (sessionize_events oracle)."""
    from quackpipe_spark.streaming import session_windows

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").filter(F.col("user_id") < 200)
    native = session_windows(ev, gap="30 minutes")
    n_native = {
        r["user_id"]: r["n"]
        for r in native.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    manual = duck.sql(
        """
        WITH gapped AS (
          SELECT user_id,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                      PARTITION BY user_id ORDER BY ts) > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events WHERE user_id < 200
        )
        SELECT user_id, CAST(sum(is_new) + 1 AS BIGINT) AS n
        FROM gapped GROUP BY user_id
        """
    ).fetchall()
    n_manual = {u: n for u, n in manual}
    assert n_native == n_manual
    # sessions are disjoint and ordered per user
    rows = native.orderBy("user_id", "session_start_us").collect()
    prev = {}
    for r in rows:
        if r["user_id"] in prev:
            assert r["session_start_us"] >= prev[r["user_id"]]
        prev[r["user_id"]] = r["session_end_us"]
