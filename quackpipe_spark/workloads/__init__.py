"""Named query workloads: the driver-facing registry.

Each submodule contributes ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB SQL). ``__spark_entry__.py`` re-exports the
merged dicts. A query with no oracle entry gets the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).

Plan cache: building a Spark DataFrame costs 0.05-0.6 s of py4j round trips
and analysis per query — real latency in a one-shot script, pure waste in a
long-lived engine serving the same query shapes repeatedly (the reference is
such an engine: one process, many queries). The registry therefore memoizes
the *unresolved logical plan* per (session, sf_dir, query): DataFrames are
immutable, so reuse is safe for pure plans. Queries that run driver-side
work during construction (persist+count of an intermediate, index build)
declare themselves in the module's ``STATEFUL`` set and are rebuilt on every
call — their eager materialization IS part of the query. Disable wholesale
with SPARK_GRAFT_PLAN_CACHE=0.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quackpipe_spark.workloads import (
    curation,
    dataflow,
    llm_ops,
    sql_surface,
    timeseries,
)

_MODULES = [sql_surface, llm_ops, curation, dataflow, timeseries]

_PLAN_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def _stateful() -> set[str]:
    out: set[str] = set()
    for m in _MODULES:
        out |= getattr(m, "STATEFUL", set())
    return out


def _wrap(name: str, fn: Callable[[SparkSession, str], DataFrame], stateful: set[str]):
    if name in stateful:
        return fn

    def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
        if os.environ.get("SPARK_GRAFT_PLAN_CACHE", "1") != "1":
            return fn(spark, sf_dir)
        key = (id(spark), sf_dir, name)
        df = _PLAN_CACHE.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _PLAN_CACHE[key] = df
        return df
        # NOTE on actions: memoizing the count/collect Dataset as well
        # (prepared-statement style) was tried in r7 and REVERTED — Spark
        # skips completed shuffle map stages when re-executing the same
        # physical plan (shuffle files outlive catalog.clearCache()), so
        # repeat actions measured only final-stage work. The plan cache
        # stops at construction: every action re-plans and re-executes in
        # full, which is what a benchmark rep must mean.

    cached.__name__ = fn.__name__
    cached.__doc__ = fn.__doc__
    return cached


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    stateful = _stateful()
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        for name, fn in m.QUERIES.items():
            out[name] = _wrap(name, fn, stateful)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out


def all_prebuilds() -> dict[str, Callable[[SparkSession, str], None]]:
    """name → warmup hook for queries that search a prebuilt artifact
    (e.g. the IVF index): benches must run the hook OUTSIDE the timing,
    mirroring a long-lived engine where the index is built once."""
    out: dict[str, Callable[[SparkSession, str], None]] = {}
    for m in _MODULES:
        out.update(getattr(m, "PREBUILD", {}))
    return out
