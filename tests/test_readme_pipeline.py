"""Executes the README's end-to-end training-data pipeline example
(line dedup → quality/PII scoring → CC dedup clusters → contamination
→ domain mixing → sample/split → packing → partitioned shard write) on
the real sf0.001 documents table, and asserts the whole thing is
deterministic: a second run produces byte-identical shard membership."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from quackpipe_spark.operators import cluster as C
from quackpipe_spark.operators import dedup as D
from quackpipe_spark.operators import text as T
from quackpipe_spark.operators.packing import pack_sequences, packing_efficiency
from quackpipe_spark.operators.sampling import (
    hash_sample,
    mix_domains,
    split_by_hash,
)


def _run_pipeline(spark, out_dir: str):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = D.line_dedup(docs)
    scored = T.analyze(docs, repetition=False)
    kept = scored.filter(F.col("quality") >= 0.6)
    dups = (
        D.minhash_clusters(docs, threshold=0.8)
        .filter("NOT is_canonical")
        .select("doc_id")
    )
    bench = spark.createDataFrame(
        [(900001, "held out benchmark question nobody leaked")],
        "doc_id long, text string",
    )
    contaminated = D.contamination_check(docs, bench)
    clean = (
        kept.join(dups, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    clean = mix_domains(
        clean, "source", {"wiki": 2.0, "cc": 0.5}, "doc_id", salt="mix-v1"
    )
    shard = split_by_hash(
        hash_sample(clean, "doc_id", 0.9, salt="sample-v1"),
        "doc_id",
        {"train": 0.95, "val": 0.05},
        salt="split-v1",
    )
    shard = shard.withColumn("pack_key", F.concat_ws("#", "doc_id", "copy"))
    packed = pack_sequences(
        shard, id_col="pack_key", token_col="n_tokens", budget=4096
    )
    packed.write.mode("overwrite").partitionBy("split", "shard").parquet(out_dir)
    return packed


def test_readme_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "shards-v1")
    packed = _run_pipeline(spark, out)

    back = spark.read.parquet(out)
    n = back.count()
    assert n > 0
    # both splits materialized, train ≫ val
    splits = {
        r["split"]: r["n"]
        for r in back.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(splits) == {"train", "val"}
    assert splits["train"] > splits["val"] > 0
    # the survivor set excludes every non-canonical cluster member
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    labels = C.connected_components(
        D.minhash_dedup(D.line_dedup(docs), threshold=0.8).select("a", "b")
    )
    noncanon = {
        r["node"] for r in labels.filter("node != component").collect()
    }
    shipped = {r["doc_id"] for r in back.select("doc_id").distinct().collect()}
    assert not (shipped & noncanon)
    # packing respects the budget in the contiguous-fill sense
    eff = packing_efficiency(packed, budget=4096).first()["efficiency"]
    assert 0 < eff <= 1.0
    # determinism: an independent rerun ships the identical multiset
    out2 = str(tmp_path / "shards-v2")
    _run_pipeline(spark, out2)
    back2 = spark.read.parquet(out2)
    a = sorted(map(tuple, back.select("doc_id", "copy", "split").collect()))
    b = sorted(map(tuple, back2.select("doc_id", "copy", "split").collect()))
    assert a == b
