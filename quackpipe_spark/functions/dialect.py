"""ClickHouse/quackpipe dialect compatibility layer.

The reference ships a macro file (/root/reference/aliases.sql:1-36) and the
chsql DuckDB extension to give ClickHouse users familiar function names, and
documents ``epoch_ns`` for time predicates (/root/reference/README.md:121).
Here those macros become Spark **SQL scalar functions** (Spark 4 ``CREATE
FUNCTION ... RETURN <expr>``): they inline into the Catalyst plan, stay
inside whole-stage codegen, and cost nothing at 100 TB — no Python UDFs.

A tiny string rewriter handles the two constructs that can't be functions:
zero-arg ``count()`` (ClickHouse style, /root/reference/BENCHMARK.md:11) and
the ``FROM read_parquet('path')`` table function.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

# Cast families mirror /root/reference/aliases.sql:1-34: plain → CAST,
# OrZero → coalesce(try_cast, 0), OrNull → try_cast (NULL on failure).
# INT128/256 → DECIMAL(38,0) best effort (Spark has no int128; SURVEY §7).
# Each entry: (name, spark SQL type).
_CAST_FAMILIES = [
    ("toString", "STRING"),
    ("toInt8", "TINYINT"),
    ("toInt16", "SMALLINT"),
    ("toInt32", "INT"),
    ("toInt64", "BIGINT"),
    ("toInt128", "DECIMAL(38,0)"),
    ("toInt256", "DECIMAL(38,0)"),
    ("toUInt8", "SMALLINT"),
    ("toUInt16", "INT"),
    ("toUInt32", "BIGINT"),
    ("toUInt64", "BIGINT"),  # unsigned caveat: SURVEY §7.2
    ("toFloat32", "FLOAT"),
    ("toFloat64", "DOUBLE"),
]

_SCALAR_FUNCTIONS: list[tuple[str, str, str, str]] = [
    # epoch_ns: README.md:121 — timestamp → int64 epoch nanoseconds.
    ("epoch_ns", "x TIMESTAMP", "BIGINT", "unix_micros(x) * 1000L"),
    # from_epoch_ns: inverse, ns long → timestamp (our extension).
    # Integer FLOOR division, not x/1000 (double loses sub-µs precision
    # at epoch-ns magnitudes, 1.7e18 > 2^53) and not x DIV 1000 (DIV
    # truncates toward zero, putting pre-1970 ns one µs late:
    # -1500 ns lies in [-2µs, -1µs) → floor -2, DIV gave -1).
    (
        "from_epoch_ns",
        "x BIGINT",
        "TIMESTAMP",
        "timestamp_micros((x - pmod(x, 1000)) DIV 1000)",
    ),
    # intDiv: aliases.sql:35 defines it as plain a/b (NOT floor div) —
    # replicated as-is for parity; documented quirk (SURVEY.md §7.5).
    ("intDiv", "a DOUBLE, b DOUBLE", "DOUBLE", "a / b"),
    # match: aliases.sql:36 defines LIKE semantics (not CH regex) — as-is.
    ("match", "s STRING, tok STRING", "BOOLEAN", "s LIKE tok"),
    # Common chsql date helpers (chsql extension surface, Dockerfile:11).
    ("toYear", "x TIMESTAMP", "INT", "year(x)"),
    ("toMonth", "x TIMESTAMP", "INT", "month(x)"),
    ("toDayOfMonth", "x TIMESTAMP", "INT", "day(x)"),
    ("toHour", "x TIMESTAMP", "INT", "hour(x)"),
    ("toMinute", "x TIMESTAMP", "INT", "minute(x)"),
    ("toSecond", "x TIMESTAMP", "INT", "second(x)"),
    ("toStartOfDay", "x TIMESTAMP", "TIMESTAMP", "date_trunc('DAY', x)"),
    ("toStartOfHour", "x TIMESTAMP", "TIMESTAMP", "date_trunc('HOUR', x)"),
    ("toStartOfMinute", "x TIMESTAMP", "TIMESTAMP", "date_trunc('MINUTE', x)"),
    ("toDate", "x TIMESTAMP", "DATE", "CAST(x AS DATE)"),
    ("toYYYYMM", "x TIMESTAMP", "INT", "year(x) * 100 + month(x)"),
    ("toYYYYMMDD", "x TIMESTAMP", "INT", "year(x) * 10000 + month(x) * 100 + day(x)"),
    ("today", "", "DATE", "current_date()"),
    ("yesterday", "", "DATE", "date_sub(current_date(), 1)"),
    ("toUnixTimestamp", "x TIMESTAMP", "BIGINT", "unix_seconds(x)"),
    ("toDateTime", "x BIGINT", "TIMESTAMP", "timestamp_seconds(x)"),
    # chsql string/url helpers.
    ("empty", "s STRING", "BOOLEAN", "s IS NULL OR length(s) = 0"),
    ("notEmpty", "s STRING", "BOOLEAN", "s IS NOT NULL AND length(s) > 0"),
    # (lcase/ucase are already Spark builtins with CH semantics — not shimmed)
    ("leftPad", "s STRING, n INT, p STRING", "STRING", "lpad(s, n, p)"),
    ("rightPad", "s STRING, n INT, p STRING", "STRING", "rpad(s, n, p)"),
    # \Q…\E quotes the separator — Spark's split() takes a regex, and CH
    # splitByChar semantics are literal (sep='.' must not match-any)
    ("splitByChar", "sep STRING, s STRING", "ARRAY<STRING>", r"split(s, concat('\\Q', sep, '\\E'))"),
    # chsql URL family (public chsql extension surface, Dockerfile:11) —
    # all inline to Hive parse_url / regexp, JVM-side. CH semantics:
    # missing query/fragment → NULL; missing port → 0; topLevelDomain of
    # a dotted host is its last label.
    ("protocol", "url STRING", "STRING", "parse_url(url, 'PROTOCOL')"),
    ("domain", "url STRING", "STRING", "parse_url(url, 'HOST')"),
    (
        "domainWithoutWWW",
        "url STRING",
        "STRING",
        r"regexp_replace(parse_url(url, 'HOST'), '^www\\.', '')",
    ),
    (
        "topLevelDomain",
        "url STRING",
        "STRING",
        r"regexp_extract(parse_url(url, 'HOST'), '\\.([^.]+)$', 1)",
    ),
    (
        "port",
        "url STRING",
        "INT",
        r"coalesce(try_cast(regexp_extract(parse_url(url, 'AUTHORITY'), ':(\\d+)$', 1) AS INT), 0)",
    ),
    ("path", "url STRING", "STRING", "parse_url(url, 'PATH')"),
    # FILE = path + '?' + query when a query is present (CH pathFull)
    ("pathFull", "url STRING", "STRING", "parse_url(url, 'FILE')"),
    ("queryString", "url STRING", "STRING", "parse_url(url, 'QUERY')"),
    ("fragment", "url STRING", "STRING", "parse_url(url, 'REF')"),
    # chsql IPv4 helpers: dotted-quad ↔ uint32, pure bit math.
    (
        "IPv4NumToString",
        "n BIGINT",
        "STRING",
        "concat_ws('.', CAST(shiftright(n, 24) & 255 AS STRING),"
        " CAST(shiftright(n, 16) & 255 AS STRING),"
        " CAST(shiftright(n, 8) & 255 AS STRING), CAST(n & 255 AS STRING))",
    ),
    (
        "IPv4StringToNum",
        "s STRING",
        "BIGINT",
        r"CAST(split(s, '\\.')[0] AS BIGINT) * 16777216"
        r" + CAST(split(s, '\\.')[1] AS BIGINT) * 65536"
        r" + CAST(split(s, '\\.')[2] AS BIGINT) * 256"
        r" + CAST(split(s, '\\.')[3] AS BIGINT)",
    ),
    # time_bucket (DuckDB/Timescale style): align ts to a bucket width.
    (
        "time_bucket_s",
        "width_s BIGINT, x TIMESTAMP",
        "TIMESTAMP",
        "timestamp_seconds(CAST(floor(unix_seconds(x) / width_s) * width_s AS BIGINT))",
    ),
    # Training-pipeline primitives (our extensions) — the SQL spellings of
    # operators/sampling.py and operators/text.py, so /query users can
    # hash-sample and quality-filter without the Python API. Bodies are
    # the EXACT same md5/tokenize recipes (tested equal in
    # test_sql_extended); NULL keys hash as the chr(0)||'null' sentinel,
    # matching sampling.hash_bucket.
    (
        "hash_bucket",
        "key STRING, salt STRING",
        "INT",
        "CAST(CAST(conv(substring(md5(concat(salt, '|',"
        " coalesce(key, concat(chr(0), 'null')))), 1, 8), 16, 10) AS BIGINT)"
        " % 10000 AS INT)",
    ),
    (
        "hash_sample_keep",
        "key STRING, fraction DOUBLE, salt STRING",
        "BOOLEAN",
        "CAST(CAST(conv(substring(md5(concat(salt, '|',"
        " coalesce(key, concat(chr(0), 'null')))), 1, 8), 16, 10) AS BIGINT)"
        " % 10000 AS INT)"
        " < CAST(round(least(greatest(fraction, 0.0D), 1.0D) * 10000) AS INT)",
    ),
    (
        "token_count",
        "s STRING",
        "INT",
        r"size(split(trim(lower(s)), '\\s+'))",
    ),
    (
        "dup_token_ratio",
        "s STRING",
        "DOUBLE",
        r"round(1 - size(array_distinct(split(trim(lower(s)), '\\s+')))"
        r" / greatest(size(split(trim(lower(s)), '\\s+')), 1), 4)",
    ),
]


def register_dialect(spark: SparkSession) -> None:
    """Register every dialect function on the session. Idempotent."""
    for name, sqltype in _CAST_FAMILIES:
        _create(spark, name, "x STRING", sqltype, f"CAST(x AS {sqltype})")
        _create(spark, name + "OrNull", "x STRING", sqltype, f"try_cast(x AS {sqltype})")
        if name != "toString":
            _create(
                spark, name + "OrZero", "x STRING", sqltype,
                f"coalesce(try_cast(x AS {sqltype}), CAST(0 AS {sqltype}))",
            )
    for name, args, rettype, body in _SCALAR_FUNCTIONS:
        _create(spark, name, args, rettype, body)


def _create(spark: SparkSession, name: str, args: str, rettype: str, body: str) -> None:
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) RETURNS {rettype} RETURN {body}"
    )


_COUNT_NOARG = re.compile(r"\bcount\s*\(\s*\)", re.IGNORECASE)
# literal-aware split capturing BOTH quote styles (odd parts = literals;
# ''/"" doubling stays inside one token) — Spark's default parses "…" as
# a string literal, not an identifier
# backslash escapes are live under Spark's default parser — a split that
# misses \' would treat literal content as code (rewriting user data and
# even fetching read_parquet URLs found inside strings)
_LITERAL_SPLIT = re.compile(
    r"('(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.|\"\")*\")"
)
# Single-path form, optionally with DuckDB-style options. Spark's
# path-table syntax can't carry reader options, so this engine-less
# rewrite keeps the path and drops the options — QueryEngine.sql (the
# /query path) intercepts the call first and honors union_by_name /
# hive_partitioning / filename through a configured reader view.
_READ_PARQUET = re.compile(
    r"\bread_parquet\s*\(\s*'([^']+)'(?:\s*,\s*\w+\s*=\s*(?:'[^']*'|\w+))*\s*\)",
    re.IGNORECASE,
)


def rewrite_sql(sql: str) -> str:
    """Rewrite dialect constructs Spark can't express as functions.

    - ``count()`` → ``count(*)`` (ClickHouse zero-arg count).
    - ``read_parquet('p')`` → ``parquet.`p``` (Spark path-table syntax);
      http(s) URLs fetch through the local cache and s3:// normalizes to
      s3a:// first (the reference's httpfs idiom, BENCHMARK.md:11).

    Rewrites are applied OUTSIDE string literals only — BOTH quote
    styles: Spark parses double quotes as string literals too (the
    doubleQuotedIdentifiers conf is off), so a predicate like
    ``msg = "count()"`` is user data; rewriting it would silently change
    which rows match (and a ``read_parquet('https://…')`` inside a
    double-quoted string would even trigger a driver-side fetch at
    rewrite time).
    """
    from quackpipe_spark.sources.remote import resolve_scan_path

    # count() lives entirely in code, so rewrite the CODE parts of a
    # literal-aware split (odd parts are quoted literals; ''/"" escapes
    # stay inside one token) — a 'count()' inside a literal is user data
    # and never touched
    parts = _LITERAL_SPLIT.split(sql)
    for i in range(0, len(parts), 2):
        parts[i] = _COUNT_NOARG.sub("count(*)", parts[i])
    sql = "".join(parts)

    # read_parquet('p') STARTS in code but its path argument is a
    # literal the regex must consume, so it can't run per-part; literal
    # spans are recomputed on the count()-rewritten string (each
    # count()→count(*) pass shifts offsets +1 — spans computed before
    # it would mark code as literal and skip real calls)
    parts = _LITERAL_SPLIT.split(sql)
    lit_spans = []
    pos = 0
    for i, p in enumerate(parts):
        if i % 2 == 1:
            lit_spans.append((pos, pos + len(p)))
        pos += len(p)

    def _in_literal(idx: int) -> bool:
        return any(a <= idx < b for a, b in lit_spans)

    sql = _READ_PARQUET.sub(
        lambda m: m.group(0)
        if _in_literal(m.start())
        else f"parquet.`{resolve_scan_path(m.group(1))}`",
        sql,
    )
    return sql
