"""Generative backstop for the shared SQL text scanner and the dialect
rewriter — round 9/10 proved the literal/comment lexing is the riskiest
code in the repo (three scanner-desync correctness bugs fixed in r9,
two comment-blindness bugs in r10). Properties:

1. scan_segments is a contiguous partition of ANY input, and
   blank_noncode preserves length (offset alignment is what the pruner's
   re-read-from-original depends on).
2. rewrite_sql keeps every string literal byte-identical and in order
   (user data never mutated, no in-literal read_parquet ever resolved).
3. rewrite_sql leaves no zero-arg count() in CODE, and is idempotent.
"""

from __future__ import annotations

import re

from hypothesis import example, given, settings
from hypothesis import strategies as st

from quackpipe_spark.sqltext import blank_noncode, scan_segments

_ARBITRARY = st.text(
    alphabet=st.sampled_from(list("abc'\"\\;-/* \n()=xyz0`")), max_size=80
)


@settings(max_examples=300, deadline=None)
@given(_ARBITRARY)
@example("SELECT 'a\\';b'; SELECT 2")
@example("x = 1 -- AND __timestamp >= 175\n")
@example("-- don't\nWHERE msg = 'x count() y'")
@example("'abc''")
@example('"a""b;c" /* o /* i */ ; */ end')
@example("SELECT `x'y` = 'p' OR q = ' AND ts >= 1 '")  # r12 parity repro
@example("`a``b;c` 'lit' `unterminated")
def test_scan_partition_and_blank_alignment(t):
    segs = scan_segments(t)
    assert "".join(t[a:b] for _, a, b in segs) == t
    assert all(b > a for _, a, b in segs)
    b2 = blank_noncode(t)
    assert len(b2) == len(t)
    # code spans are untouched by blanking
    for kind, a, b in segs:
        if kind == "code":
            assert b2[a:b] == t[a:b]


_CODE_SNIPPETS = [
    " SELECT count() FROM t WHERE x = ",
    " , y = ",
    " AND z = count( ) + ",
    " SELECT a FROM tbl WHERE b = ",
    " GROUP BY k HAVING count() > ",
]
_LIT_CONTENT = st.text(
    alphabet=st.sampled_from(list("ab c'\"\\;()-/*_")), max_size=14
)
_COMMENT_BODY = st.text(alphabet=st.sampled_from(list("abc'\";x y")), max_size=10)


def _quote(content: str, q: str, style: int) -> str:
    body = content.replace("\\", "\\\\")
    if style == 0:
        body = body.replace(q, q + q)
    else:
        body = body.replace(q, "\\" + q)
    return q + body + q


@st.composite
def _sql(draw):
    parts: list[str] = []
    lits: list[str] = []
    for _ in range(draw(st.integers(1, 6))):
        kind = draw(st.integers(0, 4))
        if kind == 0:
            parts.append(draw(st.sampled_from(_CODE_SNIPPETS)))
        elif kind == 1:
            tok = _quote(
                draw(_LIT_CONTENT), draw(st.sampled_from("'\"")), draw(st.integers(0, 1))
            )
            parts.append(tok)
            lits.append(tok)
        elif kind == 2:
            parts.append(" -- " + draw(_COMMENT_BODY) + "\n")
        elif kind == 3:
            parts.append(" /* " + draw(_COMMENT_BODY) + " */ ")
        else:
            # backtick identifier with arbitrary content (quotes included:
            # the r12 parity class) — `` escapes a literal backtick
            body = draw(_LIT_CONTENT).replace("`", "``")
            parts.append(" `" + body + "` ")
    return "".join(parts), lits


_COUNT_NOARG = re.compile(r"\bcount\s*\(\s*\)", re.IGNORECASE)


@settings(max_examples=300, deadline=None)
@given(_sql())
def test_rewrite_preserves_literals_and_rewrites_code(case):
    from quackpipe_spark.functions.dialect import rewrite_sql

    sql, lits = case
    out = rewrite_sql(sql)
    # every literal token survives byte-identical, in order
    pos = 0
    for tok in lits:
        idx = out.find(tok, pos)
        assert idx >= 0, (tok, out)
        pos = idx + len(tok)
    # no zero-arg count() remains in CODE (comments/literals excluded);
    # comment and literal spans themselves are untouched by the rewrite
    out_blanked = blank_noncode(out)
    assert not _COUNT_NOARG.search(out_blanked), out
    # idempotent: a second pass changes nothing
    assert rewrite_sql(out) == out
