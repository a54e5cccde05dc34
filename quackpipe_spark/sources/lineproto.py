"""InfluxDB line-protocol source (SURVEY §2A A1-A3).

Behavior parity with /root/reference/merge/parsers/lineproto_parser.go:26-167:

- streaming parse of ``measurement[,tags] fields [timestamp]`` lines into
  **columnar** batches (dict of name → list),
- tags are strings; field types are inferred (float default, ``123i`` int,
  ``123u`` uint, quoted string, bool),
- a batch is split whenever the (tag-keys + field-name/type) fingerprint
  changes, so every emitted batch is schema-homogeneous
  (getSchemaId, lineproto_parser.go:40-64),
- the fingerprint is **order-invariant** (commutative sum/xor over per-key
  hashes) and moves a key between tags and fields changes it only via the
  type code — same invariants as lineproto_parser_test.go:8-54,
- timestamps normalize to int64 epoch **nanoseconds** honoring the
  ``precision`` query param (ns default; insert_into.go:34-37).

Two execution paths:

- ``parse_lines`` — driver-side, used by the HTTP ingest endpoint
  (micro-batches; the reference parses on one node too).
- ``parse_lines_df`` — distributed: a DataFrame of raw lines is parsed
  per-partition with mapInPandas for bulk backfills, producing one
  DataFrame per schema fingerprint.
"""

from __future__ import annotations

import hashlib
import re
import time
from dataclasses import dataclass, field

_PRECISION_NS = {"ns": 1, "us": 1_000, "u": 1_000, "ms": 1_000_000, "s": 1_000_000_000}

_MASK64 = (1 << 64) - 1


@dataclass
class ParsedBatch:
    """Mirror of ParserResponse (lineproto_parser.go:95-105): one
    schema-homogeneous columnar batch bound for (database, table)."""

    database: str
    table: str
    schema_id: int
    data: dict[str, list] = field(default_factory=dict)
    # explicit count for column-less batches (an ndjson line whose values
    # are ALL null yields a row with no typed columns — it must still
    # write one auto-timestamped row, not vanish behind a success ack)
    n_rows: int = 0

    def num_rows(self) -> int:
        return len(next(iter(self.data.values()))) if self.data else self.n_rows


def _hash64(s: str) -> int:
    # Any stable 64-bit hash works; the reference uses CityHash64 — only
    # the commutative-combination property matters, not the exact values.
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def schema_id(tag_keys: list[str], field_types: dict[str, str]) -> int:
    """Order-invariant schema fingerprint (parity: getSchemaId,
    lineproto_parser.go:40-64 — commutative sum over key+typecode hashes)."""
    acc = 0
    for k in tag_keys:
        acc = (acc + _hash64(f"{k}\x00VARCHAR")) & _MASK64
    for name, typ in field_types.items():
        acc = (acc + _hash64(f"{name}\x00{typ}")) & _MASK64
    return acc


def _split_escaped(s: str, sep: str) -> list[str]:
    """Split on unescaped sep, KEEPING backslash escapes in the pieces —
    stripping them here would make a later '=' partition unable to tell
    an escaped '\\=' inside a key from the real key/value separator
    (key 'host\\=1' parsed as key 'host', value '1=…'). Pieces are
    unescaped individually AFTER their own structural split."""
    out, cur, i = [], [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            cur.append(c)
            cur.append(s[i + 1])
            i += 2
            continue
        if c == sep:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur))
    return out


def _partition_unescaped(s: str, sep: str) -> tuple[str, str | None]:
    """(head, tail) around the first UNESCAPED sep; tail None if absent."""
    i = 0
    while i < len(s):
        if s[i] == "\\":
            i += 2
            continue
        if s[i] == sep:
            return s[:i], s[i + 1 :]
        i += 1
    return s, None


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _split_top(s: str) -> list[str]:
    """Split a line into measurement+tags / fields / timestamp on unescaped,
    unquoted spaces.

    Quotes are string delimiters ONLY in the field section (parts[1]) —
    the protocol gives '"' no meaning in the measurement/tag section, so
    a literal quote in a tag value ('host=web"1') must not swallow the
    section separator (the influx models parser accepts such lines)."""
    parts, cur, i, in_quote = [], [], 0, False
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            cur.append(c)
            cur.append(s[i + 1])
            i += 2
            continue
        if c == '"' and len(parts) == 1:  # inside the field section
            in_quote = not in_quote
            cur.append(c)
        elif c == " " and not in_quote:
            if cur:
                parts.append("".join(cur))
                cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        parts.append("".join(cur))
    return parts


def _split_fields(s: str) -> list[str]:
    """Split the field section on unquoted, unescaped commas."""
    out, cur, i, in_quote = [], [], 0, False
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            cur.append(c)
            cur.append(s[i + 1])
            i += 2
            continue
        if c == '"':
            in_quote = not in_quote
            cur.append(c)
        elif c == "," and not in_quote:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        out.append("".join(cur))
    return out


_INT_RE = re.compile(r"^-?\d+$")
_UINT_RE = re.compile(r"^\d+$")
# finite decimal/scientific only: python float() would also accept
# '1_5', '+5', 'inf', 'nan' — all malformed per the line-protocol spec,
# and silently ingesting 1_5 as 15.0 is data corruption, not leniency
_FLOAT_RE = re.compile(r"^[-+]?(\d+(\.\d*)?|\.\d+)([eE][-+]?\d+)?$")


def _parse_field_value(raw: str) -> tuple[str, object]:
    """→ (canonical type, python value). Float default; 123i int; 123u uint;
    quoted string; t/T/true/TRUE/f/... bool (line-protocol spec; parity with
    models.Point field parsing used at lineproto_parser.go:76-91). Numeric
    forms are validated with strict regexes — int()/float() leniency would
    accept protocol-invalid text ('1_5' → 15) and corrupt silently."""
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        body = raw[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        return "VARCHAR", body
    if raw.endswith("i"):
        if not _INT_RE.match(raw[:-1]):
            raise ValueError(f"malformed integer field value: {raw!r}")
        return "INT8", int(raw[:-1])
    if raw.endswith("u"):
        # uintegers are non-negative by spec; storing -5 in the
        # UBIGINT-typed column would read back as 2^64-5
        if not _UINT_RE.match(raw[:-1]):
            raise ValueError(f"malformed unsigned field value: {raw!r}")
        return "UBIGINT", int(raw[:-1])
    if raw in ("t", "T", "true", "True", "TRUE"):
        return "BOOLEAN", True
    if raw in ("f", "F", "false", "False", "FALSE"):
        return "BOOLEAN", False
    if not _FLOAT_RE.match(raw):
        raise ValueError(f"malformed float field value: {raw!r}")
    return "FLOAT8", float(raw)


def parse_line(line: str, precision: str = "ns") -> tuple[str, list[tuple[str, str]], list[tuple[str, str, object]], int | None]:
    """Parse one line → (measurement, tags, fields, ts_ns|None).

    Escape-free lines (no ``\\`` and no ``\"`` anywhere — the
    overwhelming majority of real telemetry) take a str.split fast path
    that is behaviorally IDENTICAL to the general scanner: with no
    escapes, _split_top degenerates to space-split-skip-empties,
    _split_escaped/_split_fields to a plain comma split,
    _partition_unescaped to str.partition, and _unescape to identity.
    A differential property test pins the equivalence
    (test_lineproto_property). ~4× per-line, which is the bulk ingest
    hot loop (both the driver HTTP path and the mapInPandas parse)."""
    mult = _PRECISION_NS.get(precision)
    if mult is None:
        raise ValueError(f"unknown precision {precision!r}")
    s = line.strip()
    if "\\" not in s and '"' not in s:
        parts = [p for p in s.split(" ") if p]
        if len(parts) < 2:
            raise ValueError(f"malformed line (need measurement and fields): {line!r}")
        head = parts[0].split(",")
        measurement = head[0]
        if not measurement:
            raise ValueError(f"empty measurement: {line!r}")
        tags = []
        for t in head[1:]:
            k, sep, v = t.partition("=")
            if not sep:
                raise ValueError(f"malformed tag {t!r} in {line!r}")
            tags.append((k, v))
        fields = []
        for f in parts[1].split(","):
            k, sep, v = f.partition("=")
            if not sep:
                raise ValueError(f"malformed field {f!r} in {line!r}")
            typ, val = _parse_field_value(v)
            fields.append((k, typ, val))
        return _finish_line(line, parts, tags, fields, mult, measurement)
    parts = _split_top(s)
    if len(parts) < 2:
        raise ValueError(f"malformed line (need measurement and fields): {line!r}")
    head = _split_escaped(parts[0], ",")
    measurement = _unescape(head[0])
    if not measurement:
        raise ValueError(f"empty measurement: {line!r}")
    tags = []
    for t in head[1:]:
        k, v = _partition_unescaped(t, "=")
        if v is None:
            raise ValueError(f"malformed tag {t!r} in {line!r}")
        tags.append((_unescape(k), _unescape(v)))
    fields = []
    for f in _split_fields(parts[1]):
        k, v = _partition_unescaped(f, "=")
        if v is None:
            raise ValueError(f"malformed field {f!r} in {line!r}")
        typ, val = _parse_field_value(v)
        fields.append((_unescape(k), typ, val))
    return _finish_line(line, parts, tags, fields, mult, measurement)


def _finish_line(line, parts, tags, fields, mult, measurement):
    """Shared tail of both parse paths: timestamp token, reserved-name and
    duplicate-name protocol checks."""
    ts_ns = None
    if len(parts) > 3:
        # an unescaped space produced a 4th token — silently dropping it
        # would ack a 204 while part of the payload vanished
        raise ValueError(f"unexpected tokens after timestamp: {line!r}")
    if len(parts) == 3:
        if not _INT_RE.match(parts[2]):
            # int() leniency would accept '1_0' as 10 — protocol error
            raise ValueError(f"malformed timestamp {parts[2]!r} in {line!r}")
        ts_ns = int(parts[2]) * mult
    # 'time' is the reserved timestamp column, and a name appearing twice
    # (two tags, two fields, or a tag shadowing a field) would misalign
    # the columnar batch append — both are protocol errors, rejected here
    # so every consumer (streaming parse included) fails loudly instead
    # of producing a ragged batch
    names = [k for k, _ in tags] + [n for n, _, _ in fields]
    if "time" in names:
        raise ValueError(f"'time' is the reserved timestamp column: {line!r}")
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate tag/field name(s) {dupes} in {line!r}")
    return measurement, tags, fields, ts_ns


def parse_lines(
    text_or_lines,
    database: str = "default",
    precision: str = "ns",
    time_column: str = "time",
    skip_malformed: bool = False,
) -> list[ParsedBatch]:
    """Parse many lines into schema-homogeneous columnar batches.

    Batches split on (table, schema_id) change, preserving arrival order
    within a batch — parity with the channel-streamed ParserResponse
    (lineproto_parser.go:142-146). Lines with no timestamp get server
    clock ns (merge_tree_service.go:268-290 AutoTimestamp semantics are
    applied later in ingest; here we stamp at parse time like the
    reference's ``time`` from line protocol).

    ``skip_malformed``: drop unparseable lines instead of raising —
    the streaming door's opt-in poison-pill policy (a raised ValueError
    there fails the micro-batch and Structured Streaming replays the
    same offsets forever). The HTTP door keeps the default: reject the
    whole request with 400 like the reference.
    """
    if isinstance(text_or_lines, str):
        lines = text_or_lines.splitlines()
    else:
        lines = text_or_lines
    batches: list[ParsedBatch] = []
    cur: ParsedBatch | None = None
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        try:
            table, tags, fields, ts_ns = parse_line(line, precision)
        except ValueError:
            if skip_malformed:
                continue
            raise
        if time_column != "time" and (
            any(k == time_column for k, _ in tags)
            or any(n == time_column for n, _, _ in fields)
        ):
            # parse_line only rejects the default 'time'; a CUSTOM time
            # column colliding with a tag/field would reset that column's
            # list and double-append into it — a silently ragged batch.
            # Under skip_malformed this line is exactly as malformed as a
            # parse failure: drop it, don't poison the stream.
            if skip_malformed:
                continue
            raise ValueError(
                f"{time_column!r} is the reserved timestamp column: {line!r}"
            )
        if ts_ns is None:
            ts_ns = time.time_ns()
        ftypes = {name: typ for name, typ, _ in fields}
        sid = schema_id([k for k, _ in tags], ftypes)
        if cur is None or cur.table != table or cur.schema_id != sid:
            cur = ParsedBatch(database=database, table=table, schema_id=sid)
            for k, _ in tags:
                cur.data[k] = []
            for name, _, _ in fields:
                cur.data[name] = []
            cur.data[time_column] = []
            batches.append(cur)
        for k, v in tags:
            cur.data[k].append(v)
        for name, _, v in fields:
            cur.data[name].append(v)
        cur.data[time_column].append(ts_ns)
    return batches


class ParsedFrames(list):
    """List of ``(table, schema_id, DataFrame)`` whose frames are all
    projections of ONE persisted parse of the input corpus. The caller
    that consumes the frames owns the cache: call :meth:`unpersist`
    (or use as a context manager) once the frames' actions have run —
    unpersisting earlier is still correct but recomputes the parse per
    consumed frame."""

    def __init__(self, items, inter):
        super().__init__(items)
        self._inter = inter

    def unpersist(self, blocking: bool = False) -> None:
        self._inter.unpersist(blocking)

    def __enter__(self) -> "ParsedFrames":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()


# generic single-parse intermediate: one typed value map per canonical
# type keeps every field JVM-representable without a lossy string
# round-trip; the per-fingerprint frames are pure map-lookup projections
_INTER_DDL = (
    "table string, schema_id decimal(20,0), schema_desc string, "
    "tags map<string,string>, svals map<string,string>, "
    "ivals map<string,bigint>, uvals map<string,bigint>, "
    "fvals map<string,double>, bvals map<string,boolean>, time bigint"
)
_INTER_COLS = [
    "table", "schema_id", "schema_desc",
    "tags", "svals", "ivals", "uvals", "fvals", "bvals", "time",
]


def parse_lines_df(
    spark,
    lines_df,
    database: str = "default",
    precision: str = "ns",
    parse_counter=None,
    skip_malformed: bool = False,
):
    """Distributed bulk parse: DataFrame[value: string] →
    :class:`ParsedFrames` of (table, schema_id, DataFrame) per
    fingerprint.

    SINGLE-PASS: one mapInPandas job parses every line exactly once into
    a persisted generic intermediate (fingerprint + one value map per
    canonical type); the fingerprint set is then read from that
    intermediate and each per-fingerprint frame is a JVM-side
    filter + map-lookup projection of the SAME cached parse. A corpus
    with S schema shapes costs ONE python parse pass, not S+1 (the
    prior design re-ran the full parse per fingerprint). Reference
    contract: one streaming parse per batch
    (lineproto_parser.go:26-167).

    ``parse_counter``: optional SparkContext accumulator incremented
    once per parsed line (diagnostic hook; the exactly-once test rides
    it). ``skip_malformed``: drop unparseable lines instead of failing
    the job (see parse_lines — the streaming poison-pill policy).
    """
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from quackpipe_spark.types import resolve

    def parse_once(it):
        for pdf in it:
            recs = []
            for line in pdf["value"]:
                line = (line or "").strip()
                if not line or line.startswith("#"):
                    continue
                try:
                    table, tags, fields, ts = parse_line(line, precision)
                except ValueError:
                    if skip_malformed:
                        continue
                    raise
                if parse_counter is not None:
                    parse_counter.add(1)
                ftypes = {n: t for n, t, _ in fields}
                sid = schema_id([k for k, _ in tags], ftypes)
                # unit-separator joined, name(:type) rsplit on the LAST
                # colon — tag/field names may legally contain ':' or ','
                desc = "\x1f".join(
                    sorted(
                        [f"{k}:VARCHAR" for k, _ in tags]
                        + [f"{n}:{t}" for n, t in ftypes.items()]
                    )
                )
                vals = {"VARCHAR": {}, "INT8": {}, "UBIGINT": {}, "FLOAT8": {}, "BOOLEAN": {}}
                for n, typ, v in fields:
                    # UBIGINT rides the int64 slot two's-complement-
                    # wrapped, same as the driver flush path
                    # (writer.py / uint64.go:13): an unwrapped value
                    # >= 2^63 would crash the Arrow conversion
                    if typ == "UBIGINT" and v >= (1 << 63):
                        v -= 1 << 64
                    vals[typ][n] = v
                recs.append(
                    (
                        table, sid, desc,
                        dict(tags), vals["VARCHAR"], vals["INT8"],
                        vals["UBIGINT"], vals["FLOAT8"], vals["BOOLEAN"],
                        ts if ts is not None else time.time_ns(),
                    )
                )
            yield pd.DataFrame(recs, columns=_INTER_COLS)

    inter = lines_df.mapInPandas(parse_once, _INTER_DDL).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # discovery materializes the cache; (table, schema_desc) determines
    # schema_id (the fingerprint is a pure function of the sorted
    # name:type multiset), so filtering on desc avoids pushing a
    # >int64-range decimal literal through the comparison
    try:
        shapes = inter.select("table", "schema_id", "schema_desc").distinct().collect()
    except Exception:
        # a malformed line fails discovery BEFORE the caller holds the
        # ParsedFrames handle — unpersist here or the cache entry leaks
        # for the session (one per failed backfill batch)
        inter.unpersist()
        raise

    out = []
    for row in shapes:
        table, sid, desc = row["table"], int(row["schema_id"]), row["schema_desc"]
        cols = [c.rsplit(":", 1) for c in desc.split("\x1f")] if desc else []
        sel = []
        for name, typ in cols:
            canon = resolve(typ)
            if canon == "VARCHAR":
                # names are unique across tags+fields (parse_line
                # rejects duplicates), so exactly one map has the key
                expr = F.coalesce(
                    F.col("tags").getItem(name), F.col("svals").getItem(name)
                )
            else:
                src = {"INT8": "ivals", "UBIGINT": "uvals",
                       "FLOAT8": "fvals", "BOOLEAN": "bvals"}[canon]
                expr = F.col(src).getItem(name)
            sel.append(expr.alias(name))
        sel.append(F.col("time").alias("time"))
        df = inter.filter(
            (F.col("table") == table) & (F.col("schema_desc") == desc)
        ).select(*sel)
        out.append((table, sid, df))
    return ParsedFrames(out, inter)


