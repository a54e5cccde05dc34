"""Differential-comparison helper: Spark result vs DuckDB oracle.

Mirrors the driver's check — row count, column-name set, and
order-insensitive value equality — but compares CANONICAL FORMS, so
equality and the row sort key are the same function (review r12: the
old helper sorted by str() while comparing with ==, so ==-equal
multisets could mispair into spurious mismatches, NaN-vs-NULL conflated
into a false PASS, and np.float32 NaN escaped the null check into a
false FAIL). Canonicalization rules:

- None / NaT → ("null",); float NaN (after numpy unwrap) → ("nan",) —
  DISTINCT from null: a Spark NaN against an oracle NULL is exactly the
  divergence a differential exists to catch.
- numerics (float, Decimal, int within 2^53, numpy scalars) → one "num"
  form via repr(float): collapses -0.0/0.0 and int-vs-float dtype noise
  without losing any double; bigger ints stay exact.
- dates and midnight-naive datetimes → one "date" form (DuckDB's .df()
  surfaces DATE as datetime64 midnight; Spark DateType yields
  datetime.date — same data, different carrier).
- arrays/lists recurse element-wise (ndarray .item() would raise).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import pandas as pd


def _canon(v):
    if v is None or v is pd.NaT:
        return ("null",)
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_canon(x) for x in v))
    if type(v).__name__ == "ndarray":
        return ("list", tuple(_canon(x) for x in v.tolist()))
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        v = v.item()  # numpy scalar → python (may yield float nan / bool)
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("num", repr(v + 0.0))  # +0.0 collapses -0.0
    if isinstance(v, Decimal):
        return ("num", repr(float(v) + 0.0))
    if isinstance(v, int):
        return ("num", repr(float(v))) if abs(v) < (1 << 53) else ("int", v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None and v.time() == _dt.time(0):
            return ("date", v.date().isoformat())
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    return (type(v).__name__, str(v))


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(_canon(v) for v in tup)
        for tup in df.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def assert_frames_match(spark_df, duck_rel, name: str = "query") -> None:
    sp = spark_df.toPandas()
    dk = duck_rel.df()
    assert sorted(sp.columns) == sorted(dk.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(dk.columns)}"
    )
    assert len(sp) == len(dk), f"{name}: row count spark={len(sp)} duck={len(dk)}"
    srows, drows = _normalize(sp), _normalize(dk)
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
