"""Shared fixtures: one tuned SparkSession per test run + a DuckDB oracle
connection with the test tables registered as views (mirrors the driver's
CORRECTNESS harness at small scale)."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from quackpipe_spark.session import get_spark

    spark = get_spark(app_name="quackpipe_spark_tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()
