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
import threading

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
    # plain toFloat: aliases.sql:33-35 (CAST AS DOUBLE + OrNull/OrZero)
    ("toFloat", "DOUBLE"),
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
        # delegates to hash_bucket (registered just above) so the ONE
        # deterministic hash recipe exists once — a drift between two
        # copies would silently keep a different row set than
        # hash_bucket reports (review r14)
        "hash_bucket(key, salt)"
        " < CAST(round(least(greatest(fraction, 0.0D), 1.0D) * 10000) AS INT)",
    ),
    # DuckDB-dialect epoch family: the reference's /query engine IS
    # DuckDB, so users write epoch()/epoch_ms()/epoch_us() in dashboards
    # (our own oracle SQL does too) — shim the spellings Spark lacks.
    # epoch() is DOUBLE with fractional seconds, exactly DuckDB's typing
    # (unix_seconds would silently truncate sub-second precision).
    ("epoch", "x TIMESTAMP", "DOUBLE", "unix_micros(x) / 1e6"),
    ("epoch_ms", "x TIMESTAMP", "BIGINT", "unix_millis(x)"),
    ("epoch_us", "x TIMESTAMP", "BIGINT", "unix_micros(x)"),
    # chsql arithmetic aliases (ClickHouse operator-function spellings).
    # intDivOrZero follows the reference's intDiv quirk (plain /, not
    # floor div) and returns 0 on a zero/NULL divisor.
    ("plus", "a DOUBLE, b DOUBLE", "DOUBLE", "a + b"),
    ("minus", "a DOUBLE, b DOUBLE", "DOUBLE", "a - b"),
    ("modulo", "a BIGINT, b BIGINT", "BIGINT", "a % b"),
    (
        "intDivOrZero",
        "a DOUBLE, b DOUBLE",
        "DOUBLE",
        "CASE WHEN b = 0 OR b IS NULL THEN 0 ELSE a / b END",
    ),
    # chsql date-helper long tail. CH toStartOfWeek default mode 0 =
    # Sunday start (Spark's WEEK trunc is Monday — hence the dayofweek
    # arithmetic); toDayOfWeek is CH Monday=1..Sunday=7 against Spark's
    # Sunday=1 dayofweek.
    ("toStartOfMonth", "x TIMESTAMP", "DATE", "CAST(date_trunc('MONTH', x) AS DATE)"),
    ("toStartOfQuarter", "x TIMESTAMP", "DATE", "CAST(date_trunc('QUARTER', x) AS DATE)"),
    ("toStartOfYear", "x TIMESTAMP", "DATE", "CAST(date_trunc('YEAR', x) AS DATE)"),
    ("toStartOfWeek", "x TIMESTAMP", "DATE", "date_sub(CAST(x AS DATE), dayofweek(x) - 1)"),
    ("toQuarter", "x TIMESTAMP", "INT", "quarter(x)"),
    (
        "toStartOfFiveMinutes",
        "x TIMESTAMP",
        "TIMESTAMP",
        "timestamp_seconds(unix_seconds(x) - pmod(unix_seconds(x), 300))",
    ),
    (
        "toStartOfFifteenMinutes",
        "x TIMESTAMP",
        "TIMESTAMP",
        "timestamp_seconds(unix_seconds(x) - pmod(unix_seconds(x), 900))",
    ),
    # CH parseDateTimeBestEffort: lenient string→timestamp (NULL on
    # failure in the OrNull spirit; CH proper throws — documented
    # deviation, matching chsql-on-DuckDB's try semantics)
    ("parseDateTimeBestEffort", "s STRING", "TIMESTAMP", "try_to_timestamp(s)"),
    ("toDayOfYear", "x TIMESTAMP", "INT", "dayofyear(x)"),
    ("toDayOfWeek", "x TIMESTAMP", "INT", "pmod(dayofweek(x) + 5, 7) + 1"),
    (
        "toYYYYMMDDhhmmss",
        "x TIMESTAMP",
        "BIGINT",
        "year(x) * 10000000000L + month(x) * 100000000L + day(x) * 1000000L"
        " + hour(x) * 10000L + minute(x) * 100L + second(x)",
    ),
    # chsql JSON family — one JVM get_json_object per call, no UDFs.
    # Key is a bare field name (the common chsql call shape); nested
    # paths can be passed as 'a.b' since $.a.b is exactly that.
    # JSONHas detects key PRESENCE independent of value, so {"k": null}
    # reports true exactly like ClickHouse: Spark's variant layer keeps
    # JSON null as a variant-null value (IS NOT NULL), while a missing
    # path yields SQL NULL. get_json_object can't make that distinction.
    # Malformed/NULL input → false.
    (
        "JSONHas",
        "j STRING, k STRING",
        "BOOLEAN",
        "try_variant_get(try_parse_json(j), concat('$.', k)) IS NOT NULL",
    ),
    ("JSONExtractString", "j STRING, k STRING", "STRING", "get_json_object(j, concat('$.', k))"),
    ("JSONExtractInt", "j STRING, k STRING", "BIGINT", "try_cast(get_json_object(j, concat('$.', k)) AS BIGINT)"),
    ("JSONExtractFloat", "j STRING, k STRING", "DOUBLE", "try_cast(get_json_object(j, concat('$.', k)) AS DOUBLE)"),
    ("JSONExtractBool", "j STRING, k STRING", "BOOLEAN", "try_cast(get_json_object(j, concat('$.', k)) AS BOOLEAN)"),
    # DuckDB date_diff('part', a, b): counts PART BOUNDARIES crossed
    # (date_diff('day', 23:59:59, 00:00:01) = 1), not elapsed units —
    # so every arm works in calendar/epoch floors, never subtraction of
    # raw intervals. Week boundaries are Mondays (1970-01-01 was a
    # Thursday, hence the +3 shift); sub-day arms floor the epoch with
    # pmod so pre-1970 instants stay exact (DIV alone truncates toward
    # zero). Unknown parts raise like DuckDB. Plural spellings accepted,
    # plus DuckDB's abbreviation set (y/yr, mon, w, d, h/hr, m/min, s/sec,
    # ms/msec, us/usec — enumerated empirically against DuckDB 1.x; the
    # aliases map BEFORE the plural strip so 'ms' never degrades to 'm').
    # Registered as datediff_part because date_diff is a Spark BUILT-IN
    # (the 2-arg datediff alias, which CREATE FUNCTION cannot replace);
    # rewrite_sql maps DuckDB's 3-arg spelling here — the leading string
    # literal distinguishes it from Spark's own form.
    (
        "datediff_part",
        "p STRING, a TIMESTAMP, b TIMESTAMP",
        "BIGINT",
        "CASE CASE lower(p)"
        "   WHEN 'y' THEN 'year' WHEN 'yr' THEN 'year' WHEN 'yrs' THEN 'year'"
        "   WHEN 'mon' THEN 'month' WHEN 'mons' THEN 'month'"
        "   WHEN 'w' THEN 'week'"
        "   WHEN 'd' THEN 'day'"
        "   WHEN 'h' THEN 'hour' WHEN 'hr' THEN 'hour' WHEN 'hrs' THEN 'hour'"
        "   WHEN 'm' THEN 'minute' WHEN 'min' THEN 'minute' WHEN 'mins' THEN 'minute'"
        "   WHEN 's' THEN 'second' WHEN 'sec' THEN 'second' WHEN 'secs' THEN 'second'"
        "   WHEN 'ms' THEN 'millisecond' WHEN 'msec' THEN 'millisecond' WHEN 'msecs' THEN 'millisecond'"
        "   WHEN 'us' THEN 'microsecond' WHEN 'usec' THEN 'microsecond' WHEN 'usecs' THEN 'microsecond'"
        "   ELSE CASE WHEN lower(p) LIKE '%s' THEN rtrim('s', lower(p)) ELSE lower(p) END"
        " END"
        " WHEN 'year' THEN CAST(year(b) - year(a) AS BIGINT)"
        " WHEN 'quarter' THEN CAST((year(b) - year(a)) * 4 + quarter(b) - quarter(a) AS BIGINT)"
        " WHEN 'month' THEN CAST((year(b) - year(a)) * 12 + month(b) - month(a) AS BIGINT)"
        " WHEN 'week' THEN CAST(FLOOR((datediff(CAST(b AS DATE), DATE '1970-01-01') + 3) / 7)"
        "   - FLOOR((datediff(CAST(a AS DATE), DATE '1970-01-01') + 3) / 7) AS BIGINT)"
        " WHEN 'day' THEN CAST(datediff(CAST(b AS DATE), CAST(a AS DATE)) AS BIGINT)"
        " WHEN 'hour' THEN ((unix_seconds(b) - pmod(unix_seconds(b), 3600)) DIV 3600)"
        "   - ((unix_seconds(a) - pmod(unix_seconds(a), 3600)) DIV 3600)"
        " WHEN 'minute' THEN ((unix_seconds(b) - pmod(unix_seconds(b), 60)) DIV 60)"
        "   - ((unix_seconds(a) - pmod(unix_seconds(a), 60)) DIV 60)"
        " WHEN 'second' THEN unix_seconds(b) - unix_seconds(a)"
        " WHEN 'millisecond' THEN (unix_micros(b) - pmod(unix_micros(b), 1000)) DIV 1000"
        "   - ((unix_micros(a) - pmod(unix_micros(a), 1000)) DIV 1000)"
        " WHEN 'microsecond' THEN unix_micros(b) - unix_micros(a)"
        " ELSE CAST(raise_error(concat('date_diff: unsupported part ', p)) AS BIGINT)"
        " END",
    ),
    # DuckDB spellings /query users reach for: regexp_matches is an
    # UNANCHORED search (exactly Spark's rlike), starts_with/ends_with
    # are the underscore forms of Spark's startswith/endswith.
    ("regexp_matches", "s STRING, r STRING", "BOOLEAN", "s RLIKE r"),
    ("starts_with", "s STRING, p STRING", "BOOLEAN", "startswith(s, p)"),
    ("ends_with", "s STRING, p STRING", "BOOLEAN", "endswith(s, p)"),
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
        if name.startswith("toUInt"):
            # the reference's aliases.sql:24-31 spells the unsigned
            # variants 'toUInt8rZero'/'toUInt8rNull' (no 'O') — register
            # those exact names too so queries that ran on the reference
            # run here verbatim
            _create(spark, name + "rNull", "x STRING", sqltype, f"try_cast(x AS {sqltype})")
            _create(
                spark, name + "rZero", "x STRING", sqltype,
                f"coalesce(try_cast(x AS {sqltype}), CAST(0 AS {sqltype}))",
            )
    for name, args, rettype, body in _SCALAR_FUNCTIONS:
        _create(spark, name, args, rettype, body)


# name(lower) → definition digest input for every function registered
# through this module. QueryEngine folds registry_fingerprint() into its
# plan-cache key: an analyzed plan binds the function DEFINITIONS live at
# analysis time, so hot-adding or changing one in-session (create_function)
# must invalidate cached plans — a same-SQL hit would silently serve the
# old binding (VERDICT r11 #5). The fingerprint is a content hash, not a
# counter, so idempotent re-registration keeps cached plans valid.
_REGISTERED: dict[str, str] = {}
# memoized registry_fingerprint() digest: the fingerprint is read on EVERY
# QueryEngine.sql() call (inside the serving lock) but changes only on a
# non-idempotent note_registration — rebuilding + re-hashing the whole
# registry per query would serialize all sessions on O(registry) work
_FINGERPRINT: str | None = None
# Statement ordering alone cannot close the read-side race (ADVICE r12):
# a reader that snapshots the registry, is preempted across a concurrent
# note_registration (which sets _FINGERPRINT=None), then assigns its
# stale digest would memoize the PRE-registration fingerprint
# permanently — and sorted(dict.items()) can RuntimeError under a
# concurrent insert. One lock covers both; the guarded section is a
# small-dict md5 on miss and a dict write on registration, so contention
# is negligible next to the plan work it protects.
_REG_LOCK = threading.Lock()


def registry_fingerprint() -> str:
    global _FINGERPRINT
    fp = _FINGERPRINT  # lock-free fast path: str assignment is atomic
    if fp is None:
        import hashlib

        with _REG_LOCK:
            if _FINGERPRINT is None:
                _FINGERPRINT = hashlib.md5(
                    "\n".join(
                        f"{k}={v}" for k, v in sorted(_REGISTERED.items())
                    ).encode()
                ).hexdigest()
            fp = _FINGERPRINT
    return fp


def note_registration(name: str, definition: str) -> None:
    """Record a function binding in the plan-cache fingerprint. Called by
    _create for SQL-body functions; UDF registrars (extensions.py) call it
    directly with a digest of their Python implementation."""
    global _FINGERPRINT
    key = name.lower()
    with _REG_LOCK:
        changed = _REGISTERED.get(key) != definition
        _REGISTERED[key] = definition
        if changed:
            # under the same lock as the memoization: a reader hashing a
            # pre-registration snapshot finishes (and memoizes) before
            # this invalidation lands, so the next read recomputes — no
            # permanently-stale fingerprint (ADVICE r12)
            _FINGERPRINT = None


def create_function(
    spark: SparkSession, name: str, args: str, rettype: str, body: str
) -> None:
    """Public hot-add seam: register (or redefine) a SQL scalar function
    in-session with plan-cache-safe bookkeeping."""
    _create(spark, name, args, rettype, body)


def _create(spark: SparkSession, name: str, args: str, rettype: str, body: str) -> None:
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) RETURNS {rettype} RETURN {body}"
    )
    note_registration(name, f"{args}->{rettype}:{body}")


_COUNT_NOARG = re.compile(r"\bcount\s*\(\s*\)", re.IGNORECASE)
# arrayJoin(arr) in a SELECT list explodes the row per element (CH's
# row-multiplying function); Spark's explode() has exactly those
# semantics in a select list, so a name rewrite suffices. (Case-pinned
# to CH spelling: 'arrayjoin' all-lower is not a CH name, and Spark's
# own array_join is a different, scalar function.)
_ARRAY_JOIN = re.compile(r"\barrayJoin\s*\(")
# DuckDB date_diff('part', a, b): the leading string literal (quote
# survives blanking) separates it from Spark's built-in 2-arg
# date_diff(end, start), which must stay untouched. DuckDB documents
# datediff (no underscore) as an alias of the same function — same
# leading-quote disambiguation vs Spark's 2-arg datediff (review r14)
_DATE_DIFF_PART = re.compile(r"\bdate_?diff\s*\(\s*(?=')", re.IGNORECASE)
# Single-path form, optionally with DuckDB-style options. Spark's
# path-table syntax can't carry reader options, so this engine-less
# rewrite keeps the path and drops the options — QueryEngine.sql (the
# /query path) intercepts the call first and honors union_by_name /
# hive_partitioning / filename through a configured reader view.
# Matched against BLANKED text (literal contents are spaces there), so
# the path group is [^']+ of spaces whose TRUE value is read from the
# original string at the same span.
_READ_PARQUET = re.compile(
    r"\bread_parquet\s*\(\s*'([^']+)'(?:\s*,\s*\w+\s*=\s*(?:'[^']*'|\w+))*\s*\)",
    re.IGNORECASE,
)


def _sub_on_blanked(sql: str, pattern: re.Pattern, repl) -> str:
    """Apply ``pattern`` → ``repl(match)`` where matches are FOUND in
    the comment+literal-blanked view of ``sql`` (so a ``count()`` or
    ``read_parquet('…')`` inside a string literal or a comment is
    invisible — it is user data / dead text, not code) but replacement
    spans are cut from the ORIGINAL string. ``repl`` receives the match
    (offsets valid in both views) and the original string."""
    from quackpipe_spark.sqltext import blank_noncode

    blanked = blank_noncode(sql)
    out, last = [], 0
    for m in pattern.finditer(blanked):
        out.append(sql[last : m.start()])
        out.append(repl(m, sql))
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def rewrite_sql(sql: str) -> str:
    """Rewrite dialect constructs Spark can't express as functions.

    - ``count()`` → ``count(*)`` (ClickHouse zero-arg count).
    - ``arrayJoin(expr)`` → ``explode(expr)`` (CH's row-multiplying
      function; Spark's explode has those semantics in a select list).
    - ``read_parquet('p')`` → ``parquet.`p``` (Spark path-table syntax);
      http(s) URLs fetch through the local cache and s3:// normalizes to
      s3a:// first (the reference's httpfs idiom, BENCHMARK.md:11).

    Rewrites apply to CODE only. Matches are located in the
    comment+literal-blanked view (:mod:`quackpipe_spark.sqltext` — the
    one scanner shared with the pruner and the stdin splitter), so a
    predicate like ``msg = "count()"`` is user data and never touched,
    a ``read_parquet('https://…')`` inside any literal never triggers a
    driver-side fetch, and — the round-10 advice finding — an
    apostrophe inside a ``--`` comment (``-- don't``) cannot flip quote
    parity and expose a real literal's contents as code.
    """
    from quackpipe_spark.sources.remote import resolve_scan_path

    # count() lives entirely in code; each count()→count(*) shifts
    # offsets +1, so the read_parquet pass re-blanks afterwards
    sql = _sub_on_blanked(sql, _COUNT_NOARG, lambda m, s: "count(*)")
    sql = _sub_on_blanked(sql, _ARRAY_JOIN, lambda m, s: "explode(")
    sql = _sub_on_blanked(sql, _DATE_DIFF_PART, lambda m, s: "datediff_part(")

    # read_parquet('p') STARTS in code but its path argument is a
    # literal: the shape matches on the blanked view and the true path
    # is re-read from the original at the group span (offsets are
    # preserved by blanking). The raw span decodes through the SAME
    # escape conventions the scanner lexes ('' doubling AND backslash
    # escapes — unescape_sql_string; review r12 + r14), and the resolved
    # path's backticks double on the way INTO the identifier: a path
    # containing ` would otherwise close the identifier early and splice
    # the remainder into the statement as SQL (review r14)
    from quackpipe_spark.sqltext import unescape_sql_string

    return _sub_on_blanked(
        sql,
        _READ_PARQUET,
        lambda m, s: "parquet.`{}`".format(
            resolve_scan_path(
                unescape_sql_string(s[m.start(1):m.end(1)])
            ).replace("`", "``")
        ),
    )
