"""Query path: SQL → pruned file list → Spark SQL → rows (SURVEY §3.2).

Parity with the gigapi-querier flow (ARCHITECTURE.md:2075-2083): resolve
the table's parquet files from the metadata catalog **and the query's time
range**, then execute the SQL against that file list. Two pruning layers:

1. **Index pruning (ours, driver-side)** — `__timestamp` bounds extracted
   from the SQL select only the files whose [min_time, max_time] overlap
   (the reference's "resolve data location based on database, table and
   timerange", README.md:115). At 100 TB this keeps the Spark file listing
   itself small — partition pruning can't help if the driver enumerates
   a million files first.
2. **Catalyst pruning (built-in)** — remaining predicates push into the
   parquet scan (footer stats, partition columns date/hour).

Reading via the index file list (not directory glob) is also what makes
compaction safe for readers: during the tombstone window both the merged
output and its inputs exist on disk; the index lists exactly one
generation (json_index.go drop-queue semantics).
"""

from __future__ import annotations

import hashlib
import os
import re

from pyspark.sql import DataFrame, SparkSession

from quackpipe_spark.catalog import Catalog, Table
from quackpipe_spark.functions.dialect import register_dialect, rewrite_sql
from quackpipe_spark.plans.index import PartitionIndex

_TS_VALUE = r"(\d+|epoch_ns\(\s*(?:TIMESTAMP\s*)?'[^']+'(?:\s*::\s*TIMESTAMP)?\s*\))"
# the column must be exactly __timestamp: no preceding word char (else
# event__timestamp matches). The UNQUALIFIED form (no table/alias
# prefix) is attributable only when the query references one table; the
# QUALIFIED form (alias.__timestamp) binds to one side of a join and is
# resolved through the FROM/JOIN alias map so multi-table queries can
# prune each side's file list independently.
_TS_COL = r"(?<![A-Za-z0-9_.])__timestamp"
_TS_BOUND = re.compile(
    rf"{_TS_COL}\s*(>=|<=|>|<)\s*{_TS_VALUE}", re.IGNORECASE
)
_TS_BETWEEN = re.compile(
    rf"{_TS_COL}\s+BETWEEN\s+{_TS_VALUE}\s+AND\s+{_TS_VALUE}", re.IGNORECASE
)
_TS_COL_Q = r"(?<![A-Za-z0-9_.])([A-Za-z_]\w*)\.__timestamp"
_TS_BOUND_Q = re.compile(
    rf"{_TS_COL_Q}\s*(>=|<=|>|<)\s*{_TS_VALUE}", re.IGNORECASE
)
_TS_BETWEEN_Q = re.compile(
    rf"{_TS_COL_Q}\s+BETWEEN\s+{_TS_VALUE}\s+AND\s+{_TS_VALUE}", re.IGNORECASE
)
_EPOCH_NS_LIT = re.compile(r"'([^']+)'")
# Constructs under which a textual __timestamp bound is NOT a conjunctive
# top-level WHERE constraint — each would make ANDed bounds wrong:
#   OR            — disjunctive ranges intersect to empty
#   UNION/INTERSECT/EXCEPT — bounds from independent SELECT scopes
#   NOT           — negation inverts the bound; NOT binds looser than a
#                   comparison, so paren-less "NOT __timestamp >= x" is
#                   just as inverting as "NOT (...)" — only the
#                   IS [NOT] NULL / IS NOT DISTINCT FROM forms are safe
#   CASE          — a bound inside an expression constrains nothing
# A second SELECT (subquery) likewise scopes its bounds away from the
# outer scan. Conservative: no pruning is slower, wrong pruning is
# silent missing rows.
_PRUNE_UNSAFE = re.compile(
    r"\bOR\b|\bUNION\b|\bINTERSECT\b|\bEXCEPT\b"
    r"|\bNOT\b(?!\s+(NULL|DISTINCT)\b)|\bCASE\b",
    re.IGNORECASE,
)
_SELECT_KW = re.compile(r"\bSELECT\b", re.IGNORECASE)
# Join flavors whose ON clause does NOT conjunctively filter the
# preserved side's rows: `t LEFT JOIN u ON t.__timestamp >= x` keeps
# every t row (null-extended), so pruning t's files from that bound
# would drop rows. With any of these present, bounds are read from the
# WHERE clause onward only — a WHERE predicate over one side's column
# filters that side's rows regardless of join flavor (null-extended
# rows fail the comparison too), so WHERE-scope bounds stay safe.
_OUTER_JOIN_KW = re.compile(r"\b(LEFT|RIGHT|FULL|OUTER|SEMI|ANTI)\b", re.IGNORECASE)
_WHERE_KW = re.compile(r"\bWHERE\b", re.IGNORECASE)
_ALIAS_STOPWORDS = frozenset(
    "on where group order limit having join left right full inner cross outer "
    "semi anti using union intersect except as qualify lateral window natural "
    "tablesample values select distinct".split()
)
# FROM/JOIN relation + optional alias. The relation may be db-qualified
# (dotted) — the LAST segment is the table name. The alias group must
# REFUSE keywords via lookahead (not post-filter): consuming the JOIN of
# `FROM a JOIN b` as a's "alias" would swallow the next clause and drop
# b from the map entirely.
_FROM_JOIN = re.compile(
    r"\b(?:FROM|JOIN)\s+([A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?!(?:" + "|".join(sorted(_ALIAS_STOPWORDS)) + r")\b)"
    r"([A-Za-z_]\w*))?",
    re.IGNORECASE,
)


def _ts_literal_ns(lit: str) -> int:
    """A bound literal: raw ns integer, or the reference's documented
    epoch_ns('…'::TIMESTAMP) idiom (README.md:121) → ns since epoch UTC."""
    if lit.isdigit():
        return int(lit)
    from datetime import datetime, timezone

    raw = _EPOCH_NS_LIT.search(lit).group(1)
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            dt = datetime.strptime(raw, fmt).replace(tzinfo=timezone.utc)
            return int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1000
        except ValueError:
            continue
    raise ValueError(f"unparseable timestamp literal: {raw!r}")


_FROM_KW = re.compile(r"\bFROM\b", re.IGNORECASE)
_FROM_SCOPE_END = re.compile(
    r"\b(WHERE|GROUP|HAVING|ORDER|LIMIT|WINDOW|QUALIFY)\b", re.IGNORECASE
)


def _comma_join_present(sql: str) -> bool:
    """True if any FROM clause contains a top-level comma — legacy
    comma-join syntax (``FROM events e, events e2``). _FROM_JOIN only
    counts relations introduced by a FROM/JOIN keyword, so a
    comma-introduced relation would evade both the alias map and the
    referenced-twice self-join guard: a qualified bound on one alias
    would prune files the comma alias still needs (silent missing
    rows). Rather than parse the comma list (and its mixed
    ``JOIN … ON cond, tbl`` forms), pruning is disabled outright when
    the syntax appears — no pruning is just slower.

    Scope: from each FROM keyword to the first depth-0 clause
    terminator (WHERE/GROUP/…), end of string, or an unbalanced ')'
    (covers ``EXTRACT(MONTH FROM ts)`` — the closing paren of the
    enclosing call ends that scan before any SELECT-list comma is
    seen). Commas inside parens (function args, row values,
    TABLESAMPLE) don't count; quoted strings are skipped."""
    for m in _FROM_KW.finditer(sql):
        depth = 0
        i = m.end()
        while i < len(sql):
            ch = sql[i]
            if ch == "'":
                j = sql.find("'", i + 1)
                if j < 0:
                    return True  # unterminated string: refuse to reason
                i = j + 1
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    break  # FROM belonged to an enclosing call (EXTRACT)
            elif depth == 0:
                if ch == ",":
                    return True
                if ch.isalpha():
                    t = _FROM_SCOPE_END.match(sql, i)
                    if t:
                        break
                    # skip the word to not re-test each letter
                    while i + 1 < len(sql) and (
                        sql[i + 1].isalnum() or sql[i + 1] in "_."
                    ):
                        i += 1
            i += 1
    return False


def _relations(sql: str) -> tuple[dict[str, str], dict[str, int]]:
    """One pass over the FROM/JOIN clauses: (alias→table map, table→
    relation-entry count), keys and values lowercased. An aliased
    relation is addressable ONLY by its alias (standard SQL); an
    unaliased one by its (last-segment) name. Map keys claimed by two
    different tables are dropped — attributing a bound through an
    ambiguous name could prune the wrong side. The counts feed the
    self-join guard: a table referenced twice is never pruned."""
    amap: dict[str, str] = {}
    counts: dict[str, int] = {}
    bad: set[str] = set()
    for m in _FROM_JOIN.finditer(sql):
        tbl = m.group(1).split(".")[-1].lower()
        counts[tbl] = counts.get(tbl, 0) + 1
        alias = (m.group(2) or "").lower()
        if alias in _ALIAS_STOPWORDS:
            alias = ""
        key = alias or tbl
        if key in amap and amap[key] != tbl:
            bad.add(key)
        amap[key] = tbl
    for key in bad:
        del amap[key]
    return amap, counts


def extract_time_bounds_per_table(
    sql: str, tables: list[str]
) -> dict[str, tuple[int | None, int | None]]:
    """Best-effort per-table [lo, hi] from literal __timestamp
    predicates. Bounds must be CONSERVATIVE in both directions:
    unparseable predicates skip pruning, an unresolvable qualifier skips
    that bound, and any construct that could make an ANDed bound wrong —
    OR, set operations, NOT(...), CASE, subqueries, legacy comma-joins
    — disables pruning entirely (see _PRUNE_UNSAFE and
    _comma_join_present). Wrong pruning is silent missing rows; no
    pruning is just slower.

    Unqualified bounds attribute only when exactly ONE table is
    referenced; qualified bounds (alias.__timestamp) resolve through the
    FROM/JOIN alias map, so a join over two big stores prunes each
    side's file list. With outer/semi/anti joins present, only the text
    from WHERE onward is scanned — an ON-clause bound on a preserved
    side does not filter its rows and must not prune (see
    _OUTER_JOIN_KW).

    A table referenced by MORE THAN ONE relation entry (a self-join:
    ``events a JOIN events b``) is never pruned: both aliases read the
    same registered view, so a bound on one alias would silently drop
    the other alias's rows — and conflicting per-alias bounds would
    intersect to an empty range that prunes everything."""
    if (
        _PRUNE_UNSAFE.search(sql)
        or len(_SELECT_KW.findall(sql)) > 1
        or _comma_join_present(sql)
    ):
        return {}
    scope = sql
    if _OUTER_JOIN_KW.search(sql):
        m = _WHERE_KW.search(sql)
        if m is None:
            return {}
        scope = sql[m.end() :]
    # relations are declared before WHERE: parse from the full text
    amap, ref_counts = _relations(sql)
    out: dict[str, tuple[int | None, int | None]] = {}

    def _apply(tname: str, op: str, lit: str) -> None:
        try:
            v = _ts_literal_ns(lit)
        except ValueError:
            return
        lo, hi = out.get(tname, (None, None))
        if op in (">=", ">"):
            lo = v if lo is None else max(lo, v)
        else:
            hi = v if hi is None else min(hi, v)
        out[tname] = (lo, hi)

    def _prunable(tbl_lower: str) -> bool:
        # missing from ref_counts (e.g. the "_" sentinel of the
        # single-table wrapper) counts as a single reference
        return ref_counts.get(tbl_lower, 1) == 1

    if len(tables) == 1 and _prunable(tables[0].lower()):
        for op, lit in _TS_BOUND.findall(scope):
            _apply(tables[0], op, lit)
        for m in _TS_BETWEEN.finditer(scope):
            _apply(tables[0], ">=", m.group(1))
            _apply(tables[0], "<=", m.group(2))
    canon = {t.lower(): t for t in tables}
    for qual, op, lit in _TS_BOUND_Q.findall(scope):
        tbl = amap.get(qual.lower())
        if tbl in canon and _prunable(tbl):
            _apply(canon[tbl], op, lit)
    for m in _TS_BETWEEN_Q.finditer(scope):
        tbl = amap.get(m.group(1).lower())
        if tbl in canon and _prunable(tbl):
            _apply(canon[tbl], ">=", m.group(2))
            _apply(canon[tbl], "<=", m.group(3))
    return out


def extract_time_bounds(sql: str) -> tuple[int | None, int | None]:
    """Single-table convenience wrapper over
    :func:`extract_time_bounds_per_table` (unqualified bounds only)."""
    return extract_time_bounds_per_table(sql, ["_"]).get("_", (None, None))


class QueryEngine:
    def __init__(self, spark: SparkSession, catalog: Catalog):
        import threading

        self.spark = spark
        self.catalog = catalog
        # sql() registers per-query pruned temp views under the BARE table
        # name; concurrent /query handler threads would otherwise swap each
        # other's file lists mid-flight (silent missing rows). The lock
        # covers registration + spark.sql() only — Spark analyzes eagerly,
        # so the view's file list is captured before the lock releases and
        # execution/collect proceeds unlocked.
        self._sql_lock = threading.Lock()
        register_dialect(spark)
        # epoch_ns('…') literals evaluate in the SESSION timezone inside
        # Catalyst while the pruner parses them as UTC — pin UTC (the
        # engine's time domain) so both agree; if the session rejects the
        # conf (locked-down) and sits non-UTC, disable index pruning
        # rather than prune with mismatched bounds.
        from quackpipe_spark.sources.tables import _ensure_read_confs

        _ensure_read_confs(spark)
        # (tz is re-checked per query — see _prune_ok(); a client can
        # mutate the session timezone at runtime, even via POST /query
        # itself, after which UTC-parsed bounds would mismatch Catalyst.)

    def _prune_ok(self) -> bool:
        """Time pruning is safe only under a UTC session — checked PER
        QUERY, not pinned at init: the session timezone is runtime-mutable
        (a client can SET it through /query), and epoch_ns bound literals
        evaluate in the session zone inside Catalyst while the pruner
        parses them as UTC. Mismatched zones would silently drop files."""
        try:
            tz = self.spark.conf.get("spark.sql.session.timeZone", "")
        except Exception:
            tz = ""
        return tz in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z")

    def table_files(
        self, table: Table, lo: int | None = None, hi: int | None = None
    ) -> list[str]:
        """Live files from the per-partition indexes, pruned by time range."""
        out = []
        for pdir in table.partition_dirs():
            idx = PartitionIndex.load(pdir)
            for entry in idx.files.values():
                if lo is not None and entry.max_time is not None and entry.max_time < lo:
                    continue
                if hi is not None and entry.min_time is not None and entry.min_time > hi:
                    continue
                out.append(os.path.join(pdir, entry.name))
        return out

    def table_df(self, table: Table, lo: int | None = None, hi: int | None = None) -> DataFrame:
        files = self.table_files(table, lo, hi)
        if not files:
            # empty relation with the table's known schema PLUS the hive
            # partition columns a non-empty read would discover (date
            # inferred DATE, hour inferred INT) — otherwise a query
            # touching `date`/`hour` works only while files match and
            # errors with UNRESOLVED_COLUMN once pruning empties the list
            from quackpipe_spark.types import CANONICAL

            from pyspark.sql.types import (
                DateType,
                IntegerType,
                StructField,
                StructType,
            )

            fields = [
                StructField(c, CANONICAL[t], True) for c, t in table.schema.items()
            ]
            have = set(table.schema)
            for pcol, ptype in zip(table.partition_by, (DateType(), IntegerType())):
                if pcol not in have:
                    fields.append(StructField(pcol, ptype, True))
            return self.spark.createDataFrame([], StructType(fields))
        return (
            self.spark.read.option("mergeSchema", "true")  # union_by_name parity
            .option("basePath", table.path)
            .parquet(*files)
        )

    # read_parquet(<ARRAY[...] | 'path'> [, key = value ...]) — the
    # reference's scan idiom in both forms (merge_service_fs.go:215:
    # read_parquet(ARRAY['…'], hive_partitioning = false,
    # union_by_name = true); README/BENCHMARK single-path form).
    _RP_CALL = re.compile(
        r"read_parquet\s*\(\s*(ARRAY\s*\[[^\]]+\]|'[^']+')"
        r"((?:\s*,\s*\w+\s*=\s*(?:'[^']*'|\w+))*)\s*\)",
        re.IGNORECASE,
    )
    _RP_OPT = re.compile(r"(\w+)\s*=\s*('[^']*'|\w+)")

    def sql(self, query: str, db: str = "default") -> DataFrame:
        """Execute dialect-rewritten SQL with tables resolved to pruned
        scans (POST /query handler semantics, README.md:117-133)."""
        # Spark's path-table syntax (parquet.`p`) is single-path and takes
        # no options, so every read_parquet() call becomes a registered
        # view over a reader configured from the DuckDB-style options:
        #   union_by_name  → mergeSchema (default true: the reference
        #                    always reads its stores union_by_name)
        #   hive_partitioning=false → recursiveFileLookup (disables
        #                    partition-column discovery, like DuckDB)
        #   filename       → input_file_name() projected as `filename`
        def _rp_view(m: re.Match) -> str:
            from quackpipe_spark.sources.remote import resolve_scan_path

            src = m.group(1).strip()
            opts = {
                k.lower(): v.strip("'").lower()
                for k, v in self._RP_OPT.findall(m.group(2) or "")
            }
            if src.upper().startswith("ARRAY"):
                inner = src[src.index("[") + 1 : src.rindex("]")]
                files = [f.strip().strip("'\"") for f in inner.split(",")]
            else:
                files = [src.strip("'")]
            files = [resolve_scan_path(f) for f in files]
            reader = self.spark.read.option(
                "mergeSchema", opts.get("union_by_name", "true")
            )
            if opts.get("hive_partitioning") == "false":
                reader = reader.option("recursiveFileLookup", "true")
            df = reader.parquet(*files)
            if opts.get("filename") == "true":
                from pyspark.sql import functions as F

                df = df.withColumn("filename", F.input_file_name())
            name = "_rp_" + hashlib.md5(
                ("|".join(files) + repr(sorted(opts.items()))).encode()
            ).hexdigest()[:12]
            df.createOrReplaceTempView(name)
            return name

        query = self._RP_CALL.sub(_rp_view, query)
        query = rewrite_sql(query)
        # case-INSENSITIVE reference scan: Spark resolves view names
        # case-insensitively, so "FROM Weather" hits the temp view
        # registered for table "weather" — the detection must agree or a
        # differently-cased query reuses a STALE pruned view from an
        # earlier query (silent missing rows) or misses registration
        refs = [
            t
            for t in self.catalog.tables(db)
            if re.search(rf"\b{re.escape(t.name)}\b", query, re.IGNORECASE)
        ]
        # Index pruning applies only when it is provably safe: UTC session
        # (bound literals parse as UTC), the bound is attributable to ONE
        # table (unqualified → single referenced table; qualified
        # alias.__timestamp → resolved per join side), and that table's
        # index min/max actually track __timestamp (a custom order_by
        # indexes a different column — comparing time bounds against it
        # would prune the wrong files).
        bounds: dict[str, tuple[int | None, int | None]] = {}
        if self._prune_ok() and refs:
            bounds = extract_time_bounds_per_table(query, [t.name for t in refs])
        with self._sql_lock:
            for t in refs:
                tracks_ts = (
                    t.order_by[0] if t.order_by else "__timestamp"
                ) == "__timestamp"
                lo, hi = bounds.get(t.name, (None, None)) if tracks_ts else (None, None)
                self.table_df(t, lo, hi).createOrReplaceTempView(t.name)
            return self.spark.sql(query)
