"""Domain-mixture reweighting: determinism, up/downsampling semantics,
and a DuckDB differential on the real sf0.001 documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from quackpipe_spark.operators.sampling import (
    _BUCKETS,
    _cut,
    hash_mod_py,
    mix_domains,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_mix_semantics_and_partition_invariance(spark):
    rows = [(i, "wiki" if i % 3 == 0 else "cc") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"wiki": 2.5, "cc": 0.4}
    out = mix_domains(df, "source", weights, "doc_id", salt="mix1")
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_wiki = sum(1 for _, s in rows if s == "wiki")
    n_cc = len(rows) - n_wiki
    # expected multiplicities within sampling noise at n≈1000-2000
    assert abs(counts["wiki"] / n_wiki - 2.5) < 0.15
    assert abs(counts["cc"] / n_cc - 0.4) < 0.1
    # every wiki row appears at least floor(2.5)=2 times, at most 3
    per = out.filter("source='wiki'").groupBy("doc_id").count().collect()
    assert {r["count"] for r in per} <= {2, 3}
    # copy index is a dense 0..n-1 per row
    copies = out.filter("source='wiki'").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy")).alias("cs"), F.count("*").alias("n")
    )
    assert all(r["cs"] == list(range(r["n"])) for r in copies.collect())
    # repartitioning never changes the emitted multiset
    again = mix_domains(
        df.repartition(17, "source"), "source", weights, "doc_id", salt="mix1"
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
    # python twin predicts each row's copy count exactly
    for doc_id, src in rows[:50]:
        w = weights[src]
        bucket = hash_mod_py(str(doc_id), _BUCKETS, "mix1")
        exp = int(w) + (1 if bucket < _cut(w - int(w)) else 0)
        got = sum(1 for t in a if t[0] == doc_id)
        assert got == exp


def test_mix_default_weight_and_zero(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, source string"
    )
    # unlisted domains pass through once by default
    out = mix_domains(df, "source", {"a": 0.0}, "doc_id")
    assert {r["source"] for r in out.collect()} == {"b", "c"}
    # default=0 turns the mix into a whitelist
    out2 = mix_domains(df, "source", {"a": 1.0}, "doc_id", default=0.0)
    assert {r["source"] for r in out2.collect()} == {"a"}
    with pytest.raises(ValueError):
        mix_domains(df, "source", {"a": -1.0}, "doc_id")


def test_mix_matches_duckdb(spark, docs, duck):
    weights = {"web": 0.3, "wiki": 1.7}
    out = mix_domains(docs, "source", weights, "doc_id", salt="m7")
    got = sorted(
        (r["doc_id"], r["copy"]) for r in out.select("doc_id", "copy").collect()
    )
    cases = " ".join(
        f"WHEN source = '{d}' THEN {int(w)} + CASE WHEN bucket < {_cut(w - int(w))} THEN 1 ELSE 0 END"
        for d, w in weights.items()
    )
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
WITH b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('m7|' || coalesce(CAST(doc_id AS VARCHAR),
                chr(0) || 'null')), 1, 8))::BIGINT % {_BUCKETS} AS bucket
  FROM documents
), n AS (
  SELECT doc_id, CASE {cases} ELSE 1 END AS n FROM b
)
SELECT doc_id, unnest(generate_series(0, n - 1)) AS copy FROM n WHERE n >= 1
"""
        ).fetchall()
    )
    assert got == exp
