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


def test_streaming_corpus_curation(spark, tmp_path):
    """The curation primitives are row-local, so they lift onto a stream
    unchanged: quality-score + PII-count + deterministic hash-sample a
    document stream, and the kept set is EXACTLY the batch pipeline's
    kept set (same md5 decisions) regardless of micro-batch boundaries."""
    import json as _json

    from pyspark.sql import functions as F

    from quackpipe_spark.operators import sampling as SM
    from quackpipe_spark.operators import text as T

    src = tmp_path / "doc_src"
    src.mkdir()
    docs = [(i, f"doc number {i} with some repeated words words {'x ' * (i % 7)}") for i in range(40)]
    # two micro-batches split mid-corpus: the sample decision must not care
    for name, chunk in (("b1.json", docs[:23]), ("b2.json", docs[23:])):
        with open(src / name, "w") as f:
            for i, text in chunk:
                f.write(_json.dumps({"doc_id": i, "text": text}) + "\n")

    def curate(df):
        sampled = SM.hash_sample(
            df.select(
                "doc_id",
                T.quality_score(F.col("text")).alias("quality"),
                T.dup_token_ratio(F.col("text")).alias("dup_ratio"),
                T.email_count(F.col("text")).alias("n_emails"),
                (F.col("doc_id") % 3 == 0).alias("is_wiki"),
            ),
            "doc_id",
            0.6,
            salt="cur",
        )
        # mix_domains is row-local too: upsample one stratum 2×, thin the
        # other — per-row copy counts must match the batch run exactly
        return SM.mix_domains(
            sampled.withColumn(
                "domain", F.when(F.col("is_wiki"), "wiki").otherwise("cc")
            ),
            "domain",
            {"wiki": 2.0, "cc": 0.7},
            "doc_id",
            salt="mix",
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        curate(stream)
        .writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cur_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM curated_stream").collect())
        )
    finally:
        q.stop()
    batch = curate(spark.createDataFrame(docs, "doc_id long, text string"))
    exp = sorted(map(tuple, batch.collect()))
    assert got == exp  # rows AND copy indices identical across modes
    kept_ids = {t[0] for t in exp}
    assert 10 < len(kept_ids) < 35  # the 60% sample actually sampled
    # the wiki stratum really upsampled: some doc appears twice
    from collections import Counter

    per_doc = Counter(t[0] for t in exp)
    assert max(per_doc.values()) == 2


def test_streaming_chunk_and_contamination_parity(spark, tmp_path):
    """Two more curation ops lift onto streams unchanged: context-window
    chunking is a row-local explode (append mode), and the benchmark-
    contamination scan is a stream-static broadcast join + lifetime
    aggregate (complete mode) — each equals its batch result row-for-row
    across micro-batch boundaries."""
    import json as _json

    from quackpipe_spark.operators import dedup as D
    from quackpipe_spark.operators import packing as P

    src = tmp_path / "chunk_src"
    src.mkdir()
    docs = [
        (i, " ".join(f"w{i}t{j}" for j in range(5 + (i * 7) % 40)))
        for i in range(30)
    ]
    # plant a verbatim benchmark leak in two docs
    leak = " ".join(f"leak{j}" for j in range(12))
    docs[4] = (4, docs[4][1] + " " + leak)
    docs[17] = (17, leak + " " + docs[17][1])
    for name, chunk in (("b1.json", docs[:11]), ("b2.json", docs[11:])):
        with open(src / name, "w") as f:
            for i, text in chunk:
                f.write(_json.dumps({"doc_id": i, "text": text}) + "\n")

    bench = spark.createDataFrame([(0, leak)], "doc_id long, text string")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    batch_df = spark.createDataFrame(docs, "doc_id long, text string")

    q1 = (
        P.chunk_documents(stream, max_tokens=8, overlap=2)
        .writeStream.format("memory")
        .queryName("chunk_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chunk_ckpt"))
        .start()
    )
    q2 = (
        D.contamination_check(stream, bench)
        .writeStream.format("memory")
        .queryName("contam_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "contam_ckpt"))
        .start()
    )
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        got_chunks = sorted(
            map(tuple, spark.sql("SELECT * FROM chunk_stream").collect())
        )
        got_contam = sorted(
            map(tuple, spark.sql("SELECT * FROM contam_stream").collect())
        )
    finally:
        q1.stop()
        q2.stop()
    exp_chunks = sorted(
        map(tuple, P.chunk_documents(batch_df, max_tokens=8, overlap=2).collect())
    )
    exp_contam = sorted(
        map(tuple, D.contamination_check(batch_df, bench).collect())
    )
    assert got_chunks == exp_chunks
    assert got_contam == exp_contam
    assert {t[0] for t in got_contam} == {4, 17}  # exactly the planted leaks
