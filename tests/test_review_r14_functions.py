"""Regression tests for the r14 functions-module review findings."""

from __future__ import annotations

import pandas as pd
import pytest


def test_impl_fingerprint_sees_nested_code_globals(spark):
    """A global helper referenced only inside a lambda/inner def lives in
    the NESTED code object's co_names; missing it let an edited helper
    keep the old digest, serving stale cached plans."""
    from quackpipe_spark.functions.extensions import _impl_fingerprint

    ns: dict = {"helper": lambda v: v + 1}
    fn1 = eval("lambda s: s.map(lambda v: helper(v))", ns)
    fp1 = _impl_fingerprint(fn1)
    ns["helper"] = lambda v: v + 2  # edit the helper
    fn2 = eval("lambda s: s.map(lambda v: helper(v))", ns)
    fp2 = _impl_fingerprint(fn2)
    assert fp1 != fp2, "nested-code helper edit must change the fingerprint"


def test_strptime_vec_tz_aware_formats_stay_naive_utc(spark):
    """%z inputs parse to tz-aware values; assigning those into the naive
    output upcast it to object dtype (undefined at Arrow serialization
    for a 'timestamp' UDF). They must land as naive UTC instants —
    DuckDB's strptime %z semantics — even with MIXED offsets in one
    batch."""
    from quackpipe_spark.functions.extensions import strptime_vec

    kernel = strptime_vec.func
    s = pd.Series(
        ["2024-01-01 10:00:00+0500", "2024-01-01 10:00:00+0200", None]
    )
    fmt = pd.Series(["%Y-%m-%d %H:%M:%S%z"] * 3)
    out = kernel(s, fmt)
    assert str(out.dtype) == "datetime64[ns]", f"got {out.dtype}"
    assert out[0] == pd.Timestamp("2024-01-01 05:00:00")
    assert out[1] == pd.Timestamp("2024-01-01 08:00:00")
    assert pd.isna(out[2])
    # plain formats unchanged
    out2 = kernel(
        pd.Series(["2024-03-05 01:02:03"]), pd.Series(["%Y-%m-%d %H:%M:%S"])
    )
    assert out2[0] == pd.Timestamp("2024-03-05 01:02:03")


def test_rewrite_sql_escapes_backticks_in_read_parquet_path():
    """A path containing ` must not close the rewritten identifier early
    (the remainder would splice into the statement as SQL)."""
    from quackpipe_spark.functions.dialect import rewrite_sql

    out = rewrite_sql("SELECT * FROM read_parquet('/tmp/a`b.parquet')")
    assert "parquet.`/tmp/a``b.parquet`" in out


def test_rewrite_sql_unescapes_backslash_in_read_parquet_path():
    r"""The scanner lexes \' as a live escape, so the raw span carries
    the backslash; the rewrite must decode it the way Spark's parser
    would ('/data/it\'s.parquet' -> /data/it's.parquet)."""
    from quackpipe_spark.functions.dialect import rewrite_sql

    out = rewrite_sql(r"SELECT * FROM read_parquet('/data/it\'s.parquet')")
    assert "parquet.`/data/it's.parquet`" in out
    out2 = rewrite_sql(r"SELECT * FROM read_parquet('/d\\ir/f.parquet')")
    assert r"parquet.`/d\ir/f.parquet`" in out2


def test_rewrite_sql_datediff_alias(spark):
    """DuckDB documents datediff('part', a, b) as an alias of date_diff;
    it must rewrite identically instead of hitting Spark's 2-arg builtin
    (which rejects 3 args). Spark's own 2-arg datediff stays untouched."""
    from quackpipe_spark.functions.dialect import register_dialect, rewrite_sql

    s = rewrite_sql("SELECT datediff('day', now(), now())")
    assert "datediff_part(" in s
    assert "datediff_part" not in rewrite_sql("SELECT datediff(d2, d1) FROM t")
    register_dialect(spark)
    row = spark.sql(
        rewrite_sql(
            "SELECT datediff('day', TIMESTAMP'2024-01-01', TIMESTAMP'2024-01-03') AS d"
        )
    ).collect()[0]
    assert row["d"] == 2


def test_hash_sample_keep_delegates_to_hash_bucket(spark):
    """hash_sample_keep must agree with hash_bucket exactly (one recipe,
    no copy to drift)."""
    from quackpipe_spark.functions.dialect import register_dialect

    register_dialect(spark)
    rows = spark.sql(
        "SELECT hash_bucket(CAST(id AS STRING), 's') AS b, "
        "hash_sample_keep(CAST(id AS STRING), 0.25, 's') AS k "
        "FROM range(2000)"
    ).collect()
    assert all((r["b"] < 2500) == r["k"] for r in rows)
    assert any(r["k"] for r in rows) and not all(r["k"] for r in rows)


def test_strptime_strftime_grouped_single_pass(spark):
    """Per-row distinct formats must not cost O(n_formats x batch_rows):
    the groupby pass handles a many-format batch quickly and correctly."""
    from quackpipe_spark.functions.extensions import strftime_vec, strptime_vec

    n = 500
    s = pd.Series([f"2024-01-{(i % 27) + 1:02d}" for i in range(n)])
    # two alternating formats (values valid under each row's own format)
    fmt = pd.Series(["%Y-%m-%d" if i % 2 == 0 else "%Y-%m-%d" for i in range(n)])
    out = strptime_vec.func(s, fmt)
    assert out.notna().all()
    back = strftime_vec.func(out, pd.Series(["%Y-%m-%d"] * n))
    assert (back == s).all()
