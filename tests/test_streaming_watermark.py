"""Watermark late-data semantics: rows older than the watermark are
dropped, finalized windows never re-emit (append mode). The reference has
no such semantics (late rows silently land in old partitions, SURVEY §2B)
— this is the Spark extension contract, proven end-to-end."""

from __future__ import annotations

import json

from quackpipe_spark.streaming import windowed_counts

NS = 10**9
T0 = 1_704_067_200 * NS  # 2024-01-01 00:00:00 UTC


def _write_batch(path, rows):
    with open(path, "w") as f:
        for ts, et in rows:
            f.write(json.dumps({"ts": ts, "event_type": et, "value": 1.0}) + "\n")


def test_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "wm_src"
    src.mkdir()
    # batch 1: one event in the 00:00 window, one 1h later (advances the
    # watermark to ~00:50, finalizing the 00:00-00:05 window)
    _write_batch(src / "b1.json", [(T0 + 60 * NS, "click"), (T0 + 3600 * NS, "click")])

    stream = (
        spark.readStream.schema("ts long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = windowed_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")  # append = emit once, only after watermark passes
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE click back in the already-finalized 00:00 window
        _write_batch(src / "b2.json", [(T0 + 120 * NS, "click")])
        q.processAllAvailable()
        # batch 3: far-future event pushes the watermark past everything
        _write_batch(src / "b3.json", [(T0 + 7200 * NS, "view")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM wm_test ORDER BY window_start_s").collect()
    finally:
        q.stop()

    first_window = [r for r in rows if r["window_start_s"] == T0 // NS]
    assert len(first_window) == 1, rows  # finalized once, never re-emitted
    assert first_window[0]["n"] == 1  # the late row was DROPPED, not merged
    # the on-time 01:00 window did emit once the watermark passed it
    assert any(r["window_start_s"] == T0 // NS + 3600 and r["n"] == 1 for r in rows)
