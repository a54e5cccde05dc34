"""Randomized pure-Python differentials for line_dedup and
chunk_documents — tiny alphabets force the edge cases (hot shared
lines, short-line protection, tail-chunk containment) and every
example rides one Spark job via per-example namespacing."""

from __future__ import annotations

import math
import random

from quackpipe_spark.operators.dedup import line_dedup
from quackpipe_spark.operators.packing import chunk_documents

MIN_DUP, MIN_CHARS = 2, 8


def _py_line_dedup(docs, min_dup, min_chars):
    from collections import defaultdict

    line_docs = defaultdict(set)
    for did, lines in docs:
        for ln in lines:
            if len(ln.strip()) >= min_chars:
                line_docs[ln.strip()].add(did)
    out = {}
    for did, lines in docs:
        kept = [
            ln
            for ln in lines
            if len(ln.strip()) < min_chars
            or len(line_docs[ln.strip()]) < min_dup
        ]
        out[did] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_line_dedup_random_matches_reference(spark):
    rng = random.Random(11)
    examples = []
    for ei in range(40):
        # small pool: repeats across docs are near-certain; includes a
        # short line (protected) and lines straddling the 8-char cutoff
        pool = [
            f"e{ei}--",  # 5 chars: always protected
            f"e{ei} shared boilerplate line",
            f"e{ei} another common one",
            f"e{ei} uniq",  # 7-9 chars depending on ei — cutoff edge
        ]
        docs = []
        for did in range(rng.randint(2, 4)):
            n_lines = rng.randint(0, 6)
            lines = [rng.choice(pool) for _ in range(n_lines)]
            lines += [f"e{ei} only in doc {did} line {j}" for j in range(2)]
            rng.shuffle(lines)
            docs.append((did, lines))
        examples.append((ei, docs))

    rows = [
        (ei * 100 + did, "\n".join(lines))
        for ei, docs in examples
        for did, lines in docs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in line_dedup(df, min_dup_docs=MIN_DUP, min_line_chars=MIN_CHARS).collect()
    }
    expect = {}
    for ei, docs in examples:
        for did, (txt, nl, nr) in _py_line_dedup(docs, MIN_DUP, MIN_CHARS).items():
            expect[ei * 100 + did] = (txt, nl, nr)
    assert got == expect
    assert sum(v[2] for v in expect.values()) > 10  # dedup actually fired


def _py_chunks(toks, mx, ov):
    if not toks:
        return []
    stride = mx - ov
    n = len(toks)
    n_chunks = max(1, math.ceil((n - ov) / stride))
    return [
        (i, " ".join(toks[i * stride : i * stride + mx]),
         min(n - i * stride, mx))
        for i in range(n_chunks)
    ]


def test_chunking_random_matches_reference(spark):
    rng = random.Random(13)
    cases = []
    for ci in range(80):
        mx = rng.randint(2, 7)
        ov = rng.randint(0, mx - 1)
        n = rng.randint(0, 20)
        cases.append((ci, mx, ov, [f"c{ci}t{j}" for j in range(n)]))
    # group by (mx, ov) since they are operator params, not row data
    by_param = {}
    for ci, mx, ov, toks in cases:
        by_param.setdefault((mx, ov), []).append((ci, toks))
    for (mx, ov), docs in by_param.items():
        df = spark.createDataFrame(
            [(ci, " ".join(toks)) for ci, toks in docs],
            "doc_id long, text string",
        )
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["chunk_text"], r["chunk_tokens"])
            for r in chunk_documents(df, max_tokens=mx, overlap=ov).collect()
        )
        expect = sorted(
            (ci, i, txt, nt)
            for ci, toks in docs
            for i, txt, nt in _py_chunks(toks, mx, ov)
        )
        assert got == expect, f"mx={mx} ov={ov}"
