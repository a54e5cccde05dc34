"""stratified_sample (per-group deterministic quota, DuckDB differential)
and prototype_sample (embedding diversity selection) semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from quackpipe_spark.operators.sampling import stratified_sample
from quackpipe_spark.operators.similarity import prototype_sample


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_stratified_sample_matches_duckdb(spark, docs, duck):
    k = 25
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, "source", k, "doc_id", salt="s9")
        .select("doc_id")
        .collect()
    )
    exp = sorted(
        r[0]
        for r in duck.execute(
            f"""
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (
    PARTITION BY source
    ORDER BY md5('s9|' || coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null')),
             doc_id
  ) AS rk
  FROM documents
) WHERE rk <= {k}
"""
        ).fetchall()
    )
    assert got == exp
    # quota respected per group
    counts = (
        stratified_sample(docs, "source", k, "doc_id", salt="s9")
        .groupBy("source")
        .count()
        .collect()
    )
    assert all(r["count"] <= k for r in counts)
    # partition-invariant
    again = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(13), "source", k, "doc_id", salt="s9"
        )
        .select("doc_id")
        .collect()
    )
    assert again == got
    with pytest.raises(ValueError):
        stratified_sample(docs, "source", 0, "doc_id")


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_prototype_sample_keeps_far_and_near(spark):
    # one tight clump near [1,0] plus two deliberate outliers; with a
    # single cell, keep="far" must pick the outliers first, keep="near"
    # must pick clump members closest to the (seeded, first-vector) center
    rows = [(i, _unit([1.0, 0.001 * i])) for i in range(10)]
    rows += [(100, _unit([0.2, 1.0])), (101, _unit([-0.5, 1.0]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    far = prototype_sample(df, per_cell=2, n_cells=1, keep="far")
    assert sorted(r["vec_id"] for r in far.collect()) == [100, 101]
    near = prototype_sample(df, per_cell=3, n_cells=1, keep="near")
    got = sorted(r["vec_id"] for r in near.collect())
    assert set(got) <= set(range(10)) and len(got) == 3
    # deterministic under repartition
    again = prototype_sample(
        df.repartition(7), per_cell=2, n_cells=1, keep="far"
    )
    assert sorted(r["vec_id"] for r in again.collect()) == [100, 101]
    with pytest.raises(ValueError):
        prototype_sample(df, per_cell=0)
    with pytest.raises(ValueError):
        prototype_sample(df, per_cell=1, keep="middle")


def test_prototype_sample_on_real_embeddings(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = prototype_sample(emb, per_cell=5)
    picked = out.count()
    cells = out.select("cell").distinct().count()
    assert 0 < picked <= 5 * cells
    # every original column survives plus the selection metadata
    assert set(emb.columns) <= set(out.columns)
    assert {"cell", "cos_to_center"} <= set(out.columns)
