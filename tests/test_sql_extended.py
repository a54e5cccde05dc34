"""Contracts for queries that can't hash-match an oracle."""

from __future__ import annotations

import pytest
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


def test_sql_pipeline_functions_match_python_operators(spark):
    """The dialect layer's hash_bucket / hash_sample_keep / token_count /
    dup_token_ratio SQL functions must stay value-identical to the Python
    Column implementations they mirror (drift guard)."""
    from pyspark.sql import functions as F

    from quackpipe_spark.functions.dialect import register_dialect
    from quackpipe_spark.operators import sampling as SM
    from quackpipe_spark.operators import text as T

    register_dialect(spark)
    df = spark.createDataFrame(
        [(1, "The cat  sat on the mat"), (2, "a a a"), (None, None)],
        "k int, s string",
    )
    out = df.select(
        SM.hash_bucket(F.col("k"), "z").alias("py_hb"),
        F.expr("hash_bucket(CAST(k AS STRING), 'z')").alias("sql_hb"),
        (SM.hash_bucket(F.col("k"), "z") < F.lit(2500)).alias("py_keep"),
        F.expr("hash_sample_keep(CAST(k AS STRING), 0.25, 'z')").alias("sql_keep"),
        T.token_count(F.col("s")).alias("py_tc"),
        F.expr("token_count(s)").alias("sql_tc"),
        T.dup_token_ratio(F.col("s")).alias("py_dr"),
        F.expr("dup_token_ratio(s)").alias("sql_dr"),
    ).collect()
    for r in out:
        assert r["py_hb"] == r["sql_hb"]
        assert r["py_keep"] == r["sql_keep"]
        assert r["py_tc"] == r["sql_tc"]
        assert r["py_dr"] == r["sql_dr"]


def test_gapfill_null_key_is_a_real_series(spark):
    """A NULL key is a legitimate groupBy series: the grid must join back
    to it (null-safe equality) instead of fabricating a phantom
    zero-filled series beside the real null-key aggregates."""
    from quackpipe_spark.operators.asof import gapfill

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 2, 30), (None, 0, 5), (None, 2, 7)],
        "k string, b int, v int",
    )
    out = gapfill(df, "k", "b", 1, fill={"v": 0}).collect()
    rows = {(r["k"], r["b"]): r["v"] for r in out}
    assert len(out) == 6  # 2 series x 3 buckets, NO phantom extras
    assert rows[(None, 0)] == 5 and rows[(None, 2)] == 7
    assert rows[(None, 1)] == 0  # the genuine gap, filled
    assert rows[("a", 1)] == 0


def test_asof_join_payload_collision_raises(spark):
    from quackpipe_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 1.0)], "sym int, t int, px double")
    right = spark.createDataFrame([(1, 9, 2.0)], "sym int, t int, px double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="payload column"):
        asof_join(left, right, "sym", "t", "t", ["px"])


def test_hash_mod_py_matches_column_for_bool_and_rejects_float(spark):
    from pyspark.sql import functions as F

    from quackpipe_spark.operators.sampling import hash_mod, hash_mod_py

    df = spark.createDataFrame([(True,), (False,)], "k boolean")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", hash_mod(F.col("k"), 10_000).alias("b")).collect()
    }
    assert hash_mod_py(True, 10_000) == got[True]
    assert hash_mod_py(False, 10_000) == got[False]
    import pytest as _pytest

    with _pytest.raises(TypeError, match="float"):
        hash_mod_py(1e20, 10_000)


def test_set_operations_fused_matches_operator_chain(spark):
    """The battery's single-shuffle tagged-aggregate recipe must be
    row-identical to the literal Union/Intersect/ExceptAll operator chain
    (the degenerate-EXCEPT-ALL argument in set_operations_fused's
    docstring), and its plan must carry exactly ONE exchange where the
    operator chain needs several."""
    from quackpipe_spark.workloads.sql_surface import (
        set_operations,
        set_operations_fused,
    )

    chain = sorted(r[0] for r in set_operations(spark, SF_DIR).collect())
    fused_df = set_operations_fused(spark, SF_DIR)
    fused = sorted(r[0] for r in fused_df.collect())
    assert fused == chain and len(chain) > 0
    plan = fused_df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString may append an "Initial Plan" section repeating the
    # tree; count exchanges in the final (first) section only
    final = plan.split("Initial Plan")[0]
    assert sum("Exchange" in ln for ln in final.splitlines()) == 1


def test_intersect_all_fused_matches_operator(spark):
    """The battery's single-shuffle INTERSECT ALL recipe (tagged counts +
    min-count replicate) must be multiset-identical to the literal
    intersectAll operator, including duplicate multiplicities, and carry
    exactly one exchange."""
    from collections import Counter

    from quackpipe_spark.workloads.sql_surface import (
        intersect_all_fused,
        intersect_all_sets,
    )

    op = Counter(r[0] for r in intersect_all_sets(spark, SF_DIR).collect())
    fused_df = intersect_all_fused(spark, SF_DIR)
    fused = Counter(r[0] for r in fused_df.collect())
    assert fused == op and sum(op.values()) > 0
    assert max(op.values()) > 1  # the data must actually exercise dups
    plan = fused_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert sum("Exchange" in ln for ln in final.splitlines()) == 1


def test_gapfill_oracle_null_series_parity(spark):
    """A NULL event_type is a legitimate gapfill series: the Spark
    operator joins the dense grid back null-safely, and GAPFILL_SQL must
    match (its dense join is IS NOT DISTINCT FROM — a USING join would
    zero-fill a phantom NULL series while dropping its real aggregates).
    Regression for a reproduced divergence; the shipped testdata has no
    NULL event_type, so the driver gate can't catch this drift."""
    import duckdb

    from quackpipe_spark.workloads.timeseries import GAPFILL_SQL
    from tests.oracle_utils import assert_frames_match

    h = 3600 * 1_000_000_000
    rows = [
        (1, "click", 10.0, 1 * h),
        (2, None, 20.0, 1 * h),
        (3, "click", 30.0, 3 * h),
        (4, None, 40.0, 3 * h),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts long"
    )
    # gapfill_hourly reads the events table from sf_dir; drive the same
    # recipe directly over the synthetic frame instead
    from quackpipe_spark.operators.asof import gapfill

    bucket = F.expr("unix_seconds(date_trunc('HOUR', timestamp_micros(ts DIV 1000)))")
    sparse = ev.groupBy(F.col("event_type"), bucket.alias("bucket_s")).agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value")
    )
    dense = gapfill(
        sparse,
        key_col="event_type",
        bucket_col="bucket_s",
        bucket_step=3600,
        fill={"n": 0},
        locf_cols=["avg_value"],
    ).select(
        "event_type", "bucket_s", F.col("n").cast("long").alias("n"), "avg_value"
    )
    con = duckdb.connect()
    con.register("events_pd", ev.toPandas())
    con.execute(
        "CREATE VIEW events AS SELECT event_id, event_type, value, "
        "make_timestamp(ts // 1000) AS ts FROM events_pd"
    )
    assert_frames_match(dense, con.sql(GAPFILL_SQL), "gapfill_null_series")


def test_operator_parameter_guards(spark):
    """Plan-time rejection of parameter values that would otherwise fail
    mid-job (sequence step 0 / pmod 0) or silently corrupt output
    (salt=0 joins match nothing ANSI-off; a user '_salt' column would be
    clobbered then dropped)."""
    import pytest as _pytest

    from quackpipe_spark.operators.asof import gapfill
    from quackpipe_spark.operators.multimodal import sample_frames
    from quackpipe_spark.operators.skew import salted_join

    df = spark.createDataFrame([("a", 1, 2)], "k string, b int, v int")
    with _pytest.raises(ValueError, match="bucket_step"):
        gapfill(df, "k", "b", 0, fill={"v": 0})
    dec = spark.createDataFrame(
        [(1, "video", 3)], "media_id long, kind string, n_frames int"
    )
    with _pytest.raises(ValueError, match="every_n"):
        sample_frames(dec, every_n=0)
    big = spark.createDataFrame([(1, "x")], "k long, p string")
    small = spark.createDataFrame([(1, "y")], "k long, q string")
    with _pytest.raises(ValueError, match="salt"):
        salted_join(big, small, "k", salt=0)
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(big.withColumn("_salt", big.k), small, "k", salt=4)


def test_ngram_counts_no_phantom_empty_token(spark):
    """A blank/whitespace-only doc must not inject a '' unigram into the
    vocabulary table (tokenize('') yields [''])."""
    from quackpipe_spark.operators.text import ngram_counts

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   "), (4, "alpha")],
        "doc_id long, text string",
    )
    out = {r["ngram"]: r["count"] for r in ngram_counts(docs, n=1, min_count=1).collect()}
    assert "" not in out
    assert out == {"alpha": 2, "beta": 1}


def test_chsql_long_tail_functions(spark):
    """r11 chsql macro audit: reference typo spellings, toFloat family,
    arithmetic aliases, week/day-of-week CH semantics, JSON family, and
    the arrayJoin→explode rewrite."""
    from quackpipe_spark.functions.dialect import register_dialect, rewrite_sql

    register_dialect(spark)
    row = spark.sql(
        "SELECT toUInt16rZero('x') AS uz, toUInt16rNull('x') AS un,"
        " toUInt32rZero('7') AS u7,"
        " toFloat('2.5') AS f, toFloatOrZero('x') AS fz, toFloatOrNull('x') AS fn,"
        " plus(2.0, 3.0) AS p, minus(2.0, 3.0) AS m, modulo(10, 3) AS md,"
        " intDivOrZero(10.0, 0.0) AS d0, intDivOrZero(10.0, 4.0) AS d4,"
        # 2024-06-05 is a Wednesday: CH mode-0 week starts Sunday 06-02,
        # CH toDayOfWeek(Monday=1) gives 3
        " toStartOfWeek(TIMESTAMP '2024-06-05 10:00:00') AS ws,"
        " toDayOfWeek(TIMESTAMP '2024-06-05 10:00:00') AS dw,"
        " toStartOfWeek(TIMESTAMP '2024-06-02 00:00:00') AS ws_sun,"
        " toQuarter(TIMESTAMP '2024-06-05 10:00:00') AS q,"
        " toYYYYMMDDhhmmss(TIMESTAMP '2024-06-05 10:02:03') AS num,"
        " JSONExtractInt('{\"a\": 5}', 'a') AS ji,"
        " JSONExtractString('{\"a\": {\"b\": \"x\"}}', 'a.b') AS js,"
        " JSONHas('{\"a\": 5}', 'b') AS jh,"
        # CH JSONHas is key PRESENCE: a present key with JSON null is 1
        # (get_json_object can't see it; the variant path can)
        " JSONHas('{\"a\": null}', 'a') AS jh_null,"
        " JSONHas('{\"a\": 5}', 'a') AS jh_yes,"
        " JSONHas('{\"a\": {\"b\": null}}', 'a.b') AS jh_nested_null,"
        " JSONHas('not json', 'a') AS jh_bad,"
        " JSONHas(CAST(NULL AS STRING), 'a') AS jh_sqlnull"
    ).collect()[0]
    assert row["uz"] == 0 and row["un"] is None and row["u7"] == 7
    assert row["f"] == 2.5 and row["fz"] == 0.0 and row["fn"] is None
    assert row["p"] == 5.0 and row["m"] == -1.0 and row["md"] == 1
    assert row["d0"] == 0.0 and row["d4"] == 2.5  # plain /, reference quirk
    assert str(row["ws"]) == "2024-06-02" and row["dw"] == 3
    assert str(row["ws_sun"]) == "2024-06-02"  # Sunday is its own week start
    assert row["q"] == 2 and row["num"] == 20240605100203
    assert row["ji"] == 5 and row["js"] == "x" and row["jh"] is False
    assert row["jh_null"] is True and row["jh_yes"] is True
    assert row["jh_nested_null"] is True
    assert row["jh_bad"] is False and row["jh_sqlnull"] is False

    # arrayJoin explodes rows like CH; inside literals/comments untouched
    assert rewrite_sql("SELECT arrayJoin(array(1, 2)) AS x") == (
        "SELECT explode(array(1, 2)) AS x"
    )
    assert (
        rewrite_sql("SELECT 'arrayJoin(' AS s -- arrayJoin(")
        == "SELECT 'arrayJoin(' AS s -- arrayJoin("
    )
    vals = [
        r["x"]
        for r in spark.sql(rewrite_sql("SELECT arrayJoin(array(1, 2, 3)) AS x")).collect()
    ]
    assert vals == [1, 2, 3]


def test_duckdb_epoch_family_and_strftime(spark):
    """DuckDB dialect spellings a reference /query user would send:
    epoch()/epoch_ms()/epoch_us() (SQL-inline) and strftime /
    formatDateTime (Arrow-vectorized UDF — C directive set), checked
    against DuckDB's own output on the same instants."""
    import duckdb

    from quackpipe_spark.functions.dialect import register_dialect
    from quackpipe_spark.functions.extensions import register_example_udfs

    register_dialect(spark)
    register_example_udfs(spark)
    q = (
        "SELECT epoch(TIMESTAMP '2024-06-03 13:00:01') AS s,"
        " epoch(TIMESTAMP '2024-06-03 13:00:01.25') AS s_frac,"
        " epoch_ms(TIMESTAMP '2024-06-03 13:00:01.5') AS ms,"
        " epoch_us(TIMESTAMP '2024-06-03 13:00:01.000007') AS us,"
        " strftime(TIMESTAMP '2024-06-03 13:05:07', '%Y-%m-%d %H:%M:%S day %j') AS f1,"
        " formatDateTime(TIMESTAMP '2024-06-03 13:05:07', '%d/%m/%Y') AS f2,"
        " strftime(CAST(NULL AS TIMESTAMP), '%Y') AS fnull"
    )
    got = spark.sql(q).collect()[0]
    want = duckdb.sql(
        "SELECT epoch(TIMESTAMP '2024-06-03 13:00:01') AS s,"
        " epoch(TIMESTAMP '2024-06-03 13:00:01.25') AS s_frac,"
        " epoch_ms(TIMESTAMP '2024-06-03 13:00:01.5') AS ms,"
        " epoch_us(TIMESTAMP '2024-06-03 13:00:01.000007') AS us,"
        " strftime(TIMESTAMP '2024-06-03 13:05:07', '%Y-%m-%d %H:%M:%S day %j') AS f1,"
        " strftime(TIMESTAMP '2024-06-03 13:05:07', '%d/%m/%Y') AS f2"
    ).fetchone()
    assert (got["s"], got["s_frac"], got["ms"], got["us"]) == (
        want[0], want[1], want[2], want[3]
    )
    # DuckDB epoch() is DOUBLE with fractional seconds — pin the typing
    assert isinstance(got["s_frac"], float) and got["s_frac"] == want[1]
    assert got["f1"] == want[4] and got["f2"] == want[5]
    assert got["fnull"] is None


def test_chsql_minute_buckets_and_best_effort_parse(spark):
    from quackpipe_spark.functions.dialect import register_dialect

    register_dialect(spark)
    row = spark.sql(
        "SELECT toStartOfFiveMinutes(TIMESTAMP '2024-06-03 13:07:31') AS m5,"
        " toStartOfFifteenMinutes(TIMESTAMP '2024-06-03 13:07:31') AS m15,"
        " parseDateTimeBestEffort('2024-06-03 13:07:31') AS ok,"
        " parseDateTimeBestEffort('not a time') AS bad"
    ).collect()[0]
    assert str(row["m5"]) == "2024-06-03 13:05:00"
    assert str(row["m15"]) == "2024-06-03 13:00:00"
    assert str(row["ok"]).startswith("2024-06-03 13:07:31") and row["bad"] is None


def test_ch_dialect_datetime_json_vs_oracle(spark, duck):
    """Full differential for the r11 chsql long-tail audit query — same
    check the driver gate runs (rows / columns / values vs DuckDB), kept
    local because the 50-slot gate registry is full."""
    from tests.conftest import SF_DIR
    from tests.oracle_utils import assert_frames_match

    from quackpipe_spark.workloads.sql_surface import (
        CH_DATETIME_JSON_SQL,
        ch_dialect_datetime_json,
    )

    df = ch_dialect_datetime_json(spark, SF_DIR)
    assert_frames_match(df, duck.sql(CH_DATETIME_JSON_SQL), "ch_dialect_datetime_json")


def test_duckdb_strptime_and_regex_spellings(spark):
    """DuckDB dialect: strptime/try_strptime (C directives, NULL on
    failure = try_strptime semantics, documented deviation for plain
    strptime), regexp_matches (unanchored search), starts_with /
    ends_with — all checked against DuckDB's own output."""
    import duckdb

    from quackpipe_spark.functions.dialect import register_dialect
    from quackpipe_spark.functions.extensions import register_example_udfs

    register_dialect(spark)
    register_example_udfs(spark)
    got = spark.sql(
        "SELECT strptime('2024-06-03 13:05:07', '%Y-%m-%d %H:%M:%S') AS t,"
        " try_strptime('garbage', '%Y-%m-%d') AS bad,"
        " regexp_matches('hello world', 'o w') AS m1,"
        " regexp_matches('hello', '^world$') AS m2,"
        " starts_with('quackpipe', 'quack') AS sw,"
        " ends_with('quackpipe', 'pipe') AS ew"
    ).collect()[0]
    want = duckdb.sql(
        "SELECT strptime('2024-06-03 13:05:07', '%Y-%m-%d %H:%M:%S') AS t,"
        " try_strptime('garbage', '%Y-%m-%d') AS bad,"
        " regexp_matches('hello world', 'o w') AS m1,"
        " regexp_matches('hello', '^world$') AS m2,"
        " starts_with('quackpipe', 'quack') AS sw,"
        " ends_with('quackpipe', 'pipe') AS ew"
    ).fetchone()
    assert str(got["t"]) == str(want[0]) and got["bad"] is None and want[1] is None
    assert (got["m1"], got["m2"], got["sw"], got["ew"]) == want[2:]


def test_strftime_strptime_differential_sweep(spark):
    """Directive-sweep differential vs DuckDB for the two format UDFs:
    every common C directive over a grid of instants (epoch edge, leap
    day, year boundary, DST-irrelevant UTC times), plus the roundtrip
    strptime(strftime(t)) == t."""
    import duckdb

    from quackpipe_spark.functions.dialect import register_dialect
    from quackpipe_spark.functions.extensions import register_example_udfs

    register_dialect(spark)
    register_example_udfs(spark)
    instants = [
        "1970-01-01 00:00:00",
        "2000-02-29 23:59:59",
        "2023-12-31 23:00:01",
        "2024-06-03 04:05:06",
        "1999-01-09 09:08:07",
    ]
    fmts = ["%Y-%m-%d", "%H:%M:%S", "%j %U %w", "%d/%m/%y %I%p", "%Y%m%d%H%M%S"]
    con = duckdb.connect()
    for ts in instants:
        for f in fmts:
            got = spark.sql(
                f"SELECT strftime(TIMESTAMP '{ts}', '{f}') AS o"
            ).collect()[0]["o"]
            want = con.sql(
                f"SELECT strftime(TIMESTAMP '{ts}', '{f}') AS o"
            ).fetchone()[0]
            assert got == want, (ts, f, got, want)
        rt = spark.sql(
            f"SELECT strptime(strftime(TIMESTAMP '{ts}', '%Y-%m-%d %H:%M:%S'),"
            " '%Y-%m-%d %H:%M:%S') AS t"
        ).collect()[0]["t"]
        assert str(rt) == ts


def test_date_diff_matches_duckdb(spark):
    """DuckDB date_diff boundary-crossing semantics over every supported
    part and a grid of instants (midnight straddles, Sunday->Monday week
    boundary, month/quarter/year ends, pre-epoch), singular and plural
    spellings, checked value-for-value against DuckDB."""
    import duckdb

    from quackpipe_spark.functions.dialect import register_dialect, rewrite_sql

    register_dialect(spark)
    con = duckdb.connect()
    # /query routes through rewrite_sql: the DuckDB 3-arg spelling maps
    # to datediff_part (date_diff is an unreplaceable Spark built-in);
    # Spark's own 2-arg form and literals/comments stay untouched
    assert rewrite_sql("SELECT date_diff('day', a, b)") == "SELECT datediff_part('day', a, b)"
    assert rewrite_sql("SELECT date_diff(a, b) -- date_diff('x'") == "SELECT date_diff(a, b) -- date_diff('x'"
    instants = [
        ("2024-06-02 23:00:00", "2024-06-03 01:00:00"),   # Sun->Mon
        ("2024-06-02 23:59:59", "2024-06-03 00:00:01"),   # midnight straddle
        ("2024-01-31 12:00:00", "2024-02-01 00:00:00"),   # month boundary
        ("2023-12-31 23:59:59", "2024-01-01 00:00:00"),   # year boundary
        ("2024-03-31 10:30:00", "2024-04-01 09:00:00"),   # quarter boundary
        ("2024-06-03 01:00:00", "2024-06-02 23:00:00"),   # reversed (negative)
        ("1969-12-31 23:00:00", "1970-01-01 01:00:00"),   # pre-epoch floor
        ("2024-06-03 10:00:00.123456", "2024-06-03 10:00:00.987654"),
    ]
    parts = ["year", "quarter", "month", "week", "day", "hour", "minute",
             "second", "millisecond", "microsecond", "days", "weeks",
             # DuckDB abbreviations (ADVICE r11): note 'ms' must resolve
             # to millisecond, never plural-strip to 'm'
             "y", "yr", "yrs", "mon", "mons", "w", "d", "h", "hr", "hrs",
             "m", "min", "mins", "s", "sec", "secs", "ms", "msec", "msecs",
             "us", "usec"]
    for a, b in instants:
        for p in parts:
            got = spark.sql(rewrite_sql(
                f"SELECT date_diff('{p}', TIMESTAMP '{a}', TIMESTAMP '{b}') AS d"
            )).collect()[0]["d"]
            want = con.sql(
                f"SELECT date_diff('{p}', TIMESTAMP '{a}', TIMESTAMP '{b}')"
            ).fetchone()[0]
            assert got == want, (p, a, b, got, want)
    import pytest as _pytest

    with _pytest.raises(Exception, match="unsupported part"):
        spark.sql(rewrite_sql("SELECT date_diff('fortnight', now(), now())")).collect()


def test_gapfill_ten_million_bucket_span_chunked(spark):
    """VERDICT r13 #4: a fine-step long-span grid (>=10M buckets) must not
    materialize one giant per-key sequence() array — the chunked
    generator keeps every array <= 64Ki elements. Also pins the loud
    bound error for genuinely unboundable spans."""
    from quackpipe_spark.operators.asof import _GAPFILL_CHUNK, gapfill

    span = 10_000_000
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", span, 2.0)], "k string, b long, v double"
    )
    dense = gapfill(df, "k", "b", 1, fill={"v": 0.0})
    # the plan's arrays are bounded: two explodes, no span-sized sequence
    plan = dense._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("explode") >= 2 or plan.count("Generate") >= 2
    agg = dense.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.min("b").alias("lo"),
        F.max("b").alias("hi"),
    ).collect()[0]
    assert agg["n"] == span + 1  # dense grid, no duplicate chunk edges
    assert agg["s"] == 3.0  # the two real rows survive, rest zero-filled
    assert (agg["lo"], agg["hi"]) == (0, span)

    # small spans degenerate to one chunk — same values, still lazy
    small = gapfill(
        spark.createDataFrame([("a", 0, 1.0), ("a", 5, 2.0)], "k string, b long, v double"),
        "k", "b", 1, fill={"v": 0.0},
    )
    assert small.count() == 6

    # beyond the coarse bound: loud execution-time refusal (raise_error on
    # the 1-row bounds frame), not an executor OOM. Plan construction
    # itself stays lazy — no job, no error, until an action runs.
    too_wide = spark.createDataFrame(
        [("a", 0, 1.0), ("a", (_GAPFILL_CHUNK << 22) + 7, 2.0)],
        "k string, b long, v double",
    )
    lazy_plan = gapfill(too_wide, "k", "b", 1)  # must not raise here
    with pytest.raises(Exception, match="exceeds the supported bound"):
        lazy_plan.count()


def test_gapfill_bounds_are_lazy_not_collected(spark):
    """The grid bounds must be a lazy function of the input, not literals
    frozen by a collect() at plan-build time: stale literals would
    silently stop gap-filling new buckets when a re-executed plan's
    source grew, and merely BUILDING a gapfill plan would launch a job.
    Pins both: zero Spark jobs during construction, and the min/max
    aggregate present IN the optimized plan instead of literal bounds."""
    from quackpipe_spark.operators.asof import gapfill

    df = spark.createDataFrame(
        [("a", 17, 1.0), ("a", 23, 2.0)], "k string, b long, v double"
    )
    group = "gapfill-lazy-bounds-probe"
    spark.sparkContext.setJobGroup(group, "plan construction must be free")
    try:
        dense = gapfill(df, "k", "b", 1, fill={"v": 0.0})
    finally:
        spark.sparkContext.setJobGroup("", "")
    tracker = spark.sparkContext.statusTracker()
    assert tracker.getJobIdsForGroup(group) == [], "gapfill ran a job at plan-build time"
    plan = dense._jdf.queryExecution().optimizedPlan().toString()
    assert "min(" in plan and "max(" in plan  # bounds re-derived per execution
    assert dense.count() == 7  # [17..23]


def test_gapfill_rejects_fractional_step(spark):
    """A fractional bucket_step must refuse at plan time: the chunked
    generator works in int(step) units, so 1.5 would silently truncate
    to a step-1 grid with ~50% fabricated zero-filled rows."""
    from quackpipe_spark.operators.asof import gapfill

    df = spark.createDataFrame([("a", 0, 1.0)], "k string, b long, v double")
    with pytest.raises(ValueError, match="integer"):
        gapfill(df, "k", "b", 1.5)
    with pytest.raises(ValueError, match="integer"):
        gapfill(df, "k", "b", 0)


def test_gapfill_empty_and_allnull_buckets(spark):
    """Degenerate shapes need no special case with lazy bounds: NULL
    _lo/_hi make sequence() NULL and explode() yield no grid rows, so
    empty input yields an empty grid and all-null buckets keep their rows
    through the full outer join with no fabricated grid."""
    from quackpipe_spark.operators.asof import gapfill

    empty = spark.createDataFrame([], "k string, b long, v double")
    assert gapfill(empty, "k", "b", 3600).count() == 0
    allnull = spark.createDataFrame(
        [("a", None, 1.0), ("b", None, 2.0)], "k string, b long, v double"
    )
    rows = gapfill(allnull, "k", "b", 3600, fill={"v": 0.0}).collect()
    assert len(rows) == 2 and {r["v"] for r in rows} == {1.0, 2.0}
