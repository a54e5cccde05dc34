"""Differential-comparison helper: Spark result vs DuckDB oracle.

Mirrors the driver's check: row count, column-name set, and
order-insensitive value equality (columns sorted by name, rows sorted by
all columns, exact values)."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        norm = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                norm.append(None)
            elif isinstance(v, float):
                # round-trip through repr to collapse -0.0/0.0 and dtype noise
                norm.append(float(v))
            elif hasattr(v, "item"):  # numpy scalar
                norm.append(v.item())
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


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
