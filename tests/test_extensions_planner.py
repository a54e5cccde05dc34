"""pandas-UDF extension point + compaction planner unit logic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_compression_ratio_udf(spark):
    from quackpipe_spark.functions.extensions import compression_ratio, register_example_udfs

    df = spark.createDataFrame(
        [(1, "abc " * 500), (2, "the quick brown fox jumps over a lazy dog and keeps going"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["cr"] for r in df.select("doc_id", compression_ratio("text").alias("cr")).collect()}
    assert rows[1] < 0.05  # highly repetitive compresses away
    assert rows[2] > 0.5  # natural text doesn't
    assert rows[3] == 1.0  # empty → neutral
    # and callable from SQL (the /query surface)
    register_example_udfs(spark)
    df.createOrReplaceTempView("_ext_docs")
    [r] = spark.sql(
        "SELECT count(*) AS n FROM _ext_docs WHERE compression_ratio(text) < 0.05"
    ).collect()
    assert r["n"] == 1


def test_levenshtein_udf_matches_jvm_builtin(spark):
    """The oracle-proven extension-point UDF must agree exactly with
    Spark's JVM levenshtein (and DuckDB's, via the gate oracle) on
    arbitrary ASCII pairs, including empties and NULLs."""
    from quackpipe_spark.functions.extensions import levenshtein_vec, register_example_udfs

    import random

    rng = random.Random(7)
    alpha = "ab cdE!0"  # tiny alphabet → dense match/mismatch structure
    cases = [
        ("kitten", "sitting"), ("", "abc"), ("abc", ""), ("", ""),
        ("same", "same"), (None, "x"), ("x", None), (None, None),
        ("Hello, World! 123", "hello world 123"),
        ("a" * 80, "b" * 80), ("abcdef", "badcfe"),
        ("héllo wörld", "hello world"),  # non-ASCII: char counting, not bytes
    ] + [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 45))),
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 45))),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)], "id long, a string, b string"
    )
    rows = df.select(
        "id",
        levenshtein_vec("a", "b").alias("py"),
        F.levenshtein("a", "b").alias("jvm"),
    ).collect()
    assert len(rows) == len(cases)
    for r in rows:
        a, b = cases[r["id"]]
        if a is None or b is None:
            assert r["py"] is None and r["jvm"] is None, r
        else:
            assert r["py"] == r["jvm"], (a, b, r["py"], r["jvm"])
    # SQL registration under the non-shadowing name
    register_example_udfs(spark)
    df.createOrReplaceTempView("_lev_pairs")
    [bad] = spark.sql(
        "SELECT count(*) AS n FROM _lev_pairs "
        "WHERE py_levenshtein(a, b) IS DISTINCT FROM levenshtein(a, b)"
    ).collect()
    assert bad["n"] == 0


def test_plan_merges_greedy_packing(tmp_path):
    """Pure planner logic: size-desc greedy bin packing under the level
    cap; a lone file too big to ever pack (> cap/2) rename-promotes to
    the next level, small singles stay; levels independent (PlanMerge
    parity, merge_service_fs.go:81-106)."""
    from quackpipe_spark.plans.compactor import MAX_SIZES, plan_merges
    from quackpipe_spark.plans.index import FileEntry, PartitionIndex

    pdir = str(tmp_path)
    idx = PartitionIndex(path=pdir)
    mb = 1 << 20
    # level 1: 60+50+40+30 MB with cap 100MB → bins [60,40]? greedy order
    # is size-desc: 60, 50(60+50>100→close [60] single→skipped... actually
    # [60,50>100] → bin closes at [60]+50 start) — assert exact packing
    for name, size in [("a.1.parquet", 60 * mb), ("b.1.parquet", 50 * mb),
                       ("c.1.parquet", 40 * mb), ("d.1.parquet", 30 * mb)]:
        idx.add(FileEntry(name=name, size_bytes=size, row_count=1))
    # level 3 pair under the 4GB cap merges; level-4 files never plan
    idx.add(FileEntry(name="x.3.parquet", size_bytes=1 << 30, row_count=1))
    idx.add(FileEntry(name="y.3.parquet", size_bytes=1 << 30, row_count=1))
    idx.add(FileEntry(name="z.4.parquet", size_bytes=1 << 30, row_count=1))
    idx.save()

    plans = plan_merges(pdir)
    merges, promotes = {}, {}
    for p in plans:
        (promotes if p.promote else merges).setdefault(p.level, []).append(
            sorted(p.files)
        )
    # walk (size-desc, cap 100): 60 → bin=[60]; +50 exceeds → close:
    # single AND 60 > cap/2 → PROMOTE to level 2; bin=[50]; +40 → 90 ok;
    # +30 → 120 exceeds → close [50,40] as a merge; bin=[30] single ≤
    # cap/2 → stays put (can still pack with future arrivals).
    assert merges[1] == [["b.1.parquet", "c.1.parquet"]]
    assert promotes[1] == [["a.1.parquet"]]
    assert merges[3] == [["x.3.parquet", "y.3.parquet"]]
    # MAX_LEVEL: lone files never promote (nowhere to go), only self-merge
    assert 4 not in merges and 4 not in promotes
    assert all(
        (len(p.files) == 1 if p.promote else len(p.files) > 1)
        and p.out_level == p.level + 1
        for p in plans
    )
    assert MAX_SIZES[1] == 100 * mb  # reference contract pinned
