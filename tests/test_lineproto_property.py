"""Property-based line-protocol tests (hypothesis): render→parse roundtrip
for arbitrary tag/field content, and fingerprint invariants under
permutation — the generative analogue of the reference's TestGetSchemaId."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from quackpipe_spark.sources.lineproto import parse_line, parse_lines, schema_id

# identifier-ish keys (no escaping needed) and value domains
keys = st.text(string.ascii_lowercase + string.digits + "_", min_size=1, max_size=12)
tag_values = st.text(
    st.characters(codec="ascii", exclude_characters=' ,=\\"\n\r\t'),
    min_size=1,
    max_size=16,
)
str_values = st.text(
    st.characters(codec="ascii", exclude_characters='"\\\n\r'), max_size=24
)


def render_field(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"{v}i"
    if isinstance(v, float):
        return repr(v)
    return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'


@settings(max_examples=200, deadline=None)
@given(
    tags=st.dictionaries(keys, tag_values, max_size=4),
    fields=st.dictionaries(
        keys,
        st.one_of(
            st.booleans(),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            str_values,
        ),
        min_size=1,
        max_size=5,
    ),
    ts=st.integers(min_value=0, max_value=2**62),
)
def test_render_parse_roundtrip(tags, fields, ts):
    # a name shared between a tag and a field (or named 'time') is now a
    # parse-time protocol error (ragged-batch guard) — keep the generated
    # line valid
    fields = {k: v for k, v in fields.items() if k not in tags and k != "time"}
    tags = {k: v for k, v in tags.items() if k != "time"}
    if not fields:
        fields = {("v" if "v" not in tags else "v__"): 1}
    line = "m"
    for k, v in tags.items():
        line += f",{k}={v}"
    line += " " + ",".join(f"{k}={render_field(v)}" for k, v in fields.items())
    line += f" {ts}"
    m, ptags, pfields, pts = parse_line(line)
    assert m == "m" and pts == ts
    assert dict(ptags) == tags
    parsed = {k: v for k, _, v in pfields}
    for k, v in fields.items():
        if isinstance(v, float) and not isinstance(v, bool):
            assert parsed[k] == v or (parsed[k] != parsed[k] and v != v)
        else:
            assert parsed[k] == v


@settings(max_examples=100, deadline=None)
@given(
    tag_keys=st.lists(keys, unique=True, max_size=5),
    field_items=st.lists(
        st.tuples(keys, st.sampled_from(["INT8", "FLOAT8", "VARCHAR", "BOOLEAN"])),
        unique_by=lambda t: t[0],
        min_size=1,
        max_size=5,
    ),
)
def test_schema_id_permutation_invariant(tag_keys, field_items):
    import random

    base = schema_id(tag_keys, dict(field_items))
    for _ in range(3):
        tk = list(tag_keys)
        fi = list(field_items)
        random.shuffle(tk)
        random.shuffle(fi)
        assert schema_id(tk, dict(fi)) == base


@settings(max_examples=100, deadline=None)
@given(
    lines=st.lists(
        st.sampled_from(
            ["m a=1 1", "m b=2 2", "m a=1,b=2 3", "n a=1 4", "m a=\"s\" 5"]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_batch_rows_conserved(lines):
    batches = parse_lines(lines)
    assert sum(b.num_rows() for b in batches) == len(lines)
    # batches are schema-homogeneous: every column same length
    for b in batches:
        lengths = {len(v) for v in b.data.values()}
        assert len(lengths) == 1


@settings(max_examples=300, deadline=None)
@given(
    tags=st.dictionaries(keys, tag_values, max_size=4),
    fields=st.dictionaries(
        keys,
        st.one_of(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.booleans(),
        ),
        min_size=1,
        max_size=4,
    ),
    ts=st.one_of(st.none(), st.integers(min_value=0, max_value=2**62)),
)
def test_fast_path_matches_general_scanner(tags, fields, ts):
    """parse_line's escape-free fast path must be byte-for-byte equivalent
    to the general scanner on every line it claims: force the general
    path by appending an escaped no-op tag to an otherwise identical
    line and compare the overlapping structure."""
    from quackpipe_spark.sources import lineproto as L

    tags = {k: v for k, v in tags.items() if k != "time"}
    fields = {k: v for k, v in fields.items() if k not in tags and k != "time"}
    if not fields:
        fields = {"f0": 1.5}
    head = "m" + "".join(f",{k}={v}" for k, v in tags.items())
    body = ",".join(f"{k}={render_field(v)}" for k, v in fields.items())
    line = f"{head} {body}" + (f" {ts}" if ts is not None else "")
    if "\\" in line or '"' in line:
        return  # string fields render quoted — not fast-path eligible
    fast = parse_line(line)
    # general scanner on the IDENTICAL line (bypass the dispatch)
    parts = L._split_top(line.strip())
    h = L._split_escaped(parts[0], ",")
    g_tags = []
    for t in h[1:]:
        k, v = L._partition_unescaped(t, "=")
        g_tags.append((L._unescape(k), L._unescape(v)))
    g_fields = []
    for f in L._split_fields(parts[1]):
        k, v = L._partition_unescaped(f, "=")
        typ, val = L._parse_field_value(v)
        g_fields.append((L._unescape(k), typ, val))
    general = L._finish_line(
        line, parts, g_tags, g_fields, 1, L._unescape(h[0])
    )
    assert fast == general
