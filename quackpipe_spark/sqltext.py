"""One SQL text scanner shared by every component that must tell code
apart from non-code before regex-level reasoning: the query pruner
(:mod:`quackpipe_spark.query`), the dialect rewriter
(:mod:`quackpipe_spark.functions.dialect`), and the stdin statement
splitter (:mod:`quackpipe_spark.__main__`).

Why ONE scanner: three hand-rolled scanners drifted three times in
round 9 (backslash-escape desync, double-quoted literals treated as
code) and the round-10 driver advice found the remaining gap — none of
them knew about comments, so ``-- don't`` flipped quote parity and a
bound commented out of a WHERE clause still fabricated a pruning range
(silent missing rows). The reference sidesteps all of this by handing
whole statements to DuckDB's real lexer (stdin/init.go:29-49,
ARCHITECTURE.md:1959-1975); on Spark we pre-process text ourselves, so
the lexing rules live here, once.

Token grammar (matching Spark's default parser):

- ``'…'`` and ``"…"`` are string literals (``doubleQuotedIdentifiers``
  is off), with BOTH escape conventions live: backslash escapes
  (``escapedStringLiterals`` is false) and ``''`` / ``""`` doubling.
- ``-- …`` comments to end-of-line (the newline is NOT part of the
  comment — it stays statement-internal whitespace).
- ``/* … */`` comments NEST, per Spark's bracketed-comment grammar.
- An unterminated literal or block comment extends to end-of-text
  (conservative: downstream consumers see no code there).
"""

from __future__ import annotations

__all__ = ["scan_segments", "blank_noncode"]


def scan_segments(text: str) -> list[tuple[str, int, int]]:
    """Tokenize into ``(kind, start, end)`` segments covering the whole
    text, ``kind`` in ``{'code', 'lit', 'comment'}``. Offsets are into
    ``text``; segments are contiguous and in order."""
    segs: list[tuple[str, int, int]] = []
    i, n = 0, len(text)
    code_start = 0

    def _flush_code(upto: int) -> None:
        if code_start < upto:
            segs.append(("code", code_start, upto))

    while i < n:
        c = text[i]
        if c == "-" and text[i : i + 2] == "--":
            _flush_code(i)
            j = text.find("\n", i)
            j = n if j < 0 else j
            segs.append(("comment", i, j))
            i = code_start = j
        elif c == "/" and text[i : i + 2] == "/*":
            _flush_code(i)
            depth, j = 1, i + 2
            while j < n and depth:
                if text[j : j + 2] == "/*":
                    depth += 1
                    j += 2
                elif text[j : j + 2] == "*/":
                    depth -= 1
                    j += 2
                else:
                    j += 1
            segs.append(("comment", i, j))
            i = code_start = j
        elif c in ("'", '"'):
            _flush_code(i)
            q, j = c, i + 1
            while j < n:
                if text[j] == "\\" and j + 1 < n:
                    j += 2
                elif text[j] == q:
                    if text[j : j + 2] == q + q:
                        j += 2
                    else:
                        j += 1
                        break
                else:
                    j += 1
            segs.append(("lit", i, j))
            i = code_start = j
        else:
            i += 1
    _flush_code(n)
    return segs


def blank_noncode(text: str) -> str:
    """Same length as ``text`` with every character a regex must not
    treat as code replaced by a space: string-literal CONTENTS (the
    enclosing quotes are kept, so a literal still reads as an empty
    token) and ENTIRE comment spans. Offsets are preserved, so a match
    found in the blanked text can read its true value from the original
    at the same span (the pruner's epoch_ns bound literals rely on
    this)."""
    buf = list(text)
    for kind, a, b in scan_segments(text):
        if kind == "comment":
            for k in range(a, b):
                buf[k] = " "
        elif kind == "lit":
            # keep the closing quote only if the literal is terminated
            # (scanner ran off end-of-text otherwise)
            keep_close = _terminated(text, a, b)
            lo, hi = a + 1, b - 1 if keep_close else b
            for k in range(lo, hi):
                buf[k] = " "
    return "".join(buf)


def _terminated(text: str, a: int, b: int) -> bool:
    """True if the literal text[a:b] ends with a REAL closing quote —
    re-walk the token (it is short) rather than guess from the last
    char, which is wrong for an at-EOF token ending in a doubled
    quote (``'abc''``: unterminated, content ``abc'``)."""
    q, j, n = text[a], a + 1, b
    while j < n:
        if text[j] == "\\" and j + 1 < n:
            j += 2
        elif text[j] == q:
            if text[j : j + 2] == q + q:
                j += 2
            else:
                return j == n - 1
        else:
            j += 1
    return False
