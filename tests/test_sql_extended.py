"""Contracts for queries that can't hash-match an oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_approx_count_distinct_error_bound(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
        .collect()
    }
    for k, n in exact.items():
        rel_err = abs(approx[k] - n) / max(n, 1)
        assert rel_err < 0.05, f"{k}: approx {approx[k]} vs exact {n} (err {rel_err:.3f})"
