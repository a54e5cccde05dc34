"""Named query workloads: the driver-facing registry.

Each submodule contributes ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB SQL). ``__spark_entry__.py`` re-exports the
merged dicts. A query with no oracle entry gets the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quackpipe_spark.workloads import dataflow, llm_ops, sql_surface, timeseries

_MODULES = [sql_surface, llm_ops, dataflow, timeseries]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
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
