"""Test-table loading: the driver's TPC-H-ish star schema + streams.

Mirrors the reference's read path — point the engine at parquet and
register a queryable name per table (reference: table-name→file-list
resolution, /root/reference ARCHITECTURE.md "GigAPI Metadata catalog";
registry at merge/repository/registry.go:67-85). In Spark the file
resolution, partition discovery, footer-stat pruning, and schema are all
native to the parquet source, so this is a thin view registry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every test table as a DataFrame keyed by name."""
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` resolves it.

    Idempotent; safe to call per query. Partition pruning / predicate
    pushdown still apply — the view is just a name for the scan.
    """
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
