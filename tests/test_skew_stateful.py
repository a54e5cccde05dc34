"""Salted-join equivalence + stateful streaming operator."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    from quackpipe_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    li2 = li.withColumnRenamed("l_suppkey", "s_suppkey")
    salted = (
        __import__("quackpipe_spark.operators.skew", fromlist=["salted_join"])
        .salted_join(li2, sup, key="s_suppkey", salt=8)
        .groupBy("s_name")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    from quackpipe_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k int, v string")
    small = spark.createDataFrame([(1, "one"), (2, "two")], "k int, name string")
    out = {tuple(r) for r in salted_join(big, small, key="k", salt=4, how="left").collect()}
    assert (99, "zz", None) in out
    assert (1, "a", "one") in out and len(out) == 3


def test_stateful_running_totals_across_batches(spark, tmp_path):
    from quackpipe_spark.streaming.stateful import running_totals

    src = tmp_path / "stream_src"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"user_id": 1, "value": 10.0}\n{"user_id": 1, "value": 5.0}\n{"user_id": 2, "value": 1.0}\n'
    )
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch arrives later → state must carry over
        (src / "b2.json").write_text(
            '{"user_id": 1, "value": 2.0}\n{"user_id": 3, "value": 7.0}\n'
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM running_totals_test").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:  # update mode appends per batch; keep the last per user
        latest[r["user_id"]] = (r["n"], r["total"])
    assert latest[1] == (3, 17.0)  # 10+5 in b1, +2 in b2 — state carried
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 7.0)
