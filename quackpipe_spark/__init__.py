"""quackpipe_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of metrico/quackpipe (GigAPI).

The reference (/root/reference) is a Go time-series lakehouse that delegates
all relational operators to an embedded DuckDB. This package re-expresses
the same capability surface Spark-first:

- storage/ingest dataflow (line-protocol parsing, schema-on-write,
  hive-partitioned parquet, size-tiered compaction) as thin driver-side
  orchestration over DataFrame ops (``ingest``, ``writer``, ``plans``),
- the SQL query surface via Spark SQL / Catalyst (``query``, ``functions``),
- plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) under ``operators``.
"""

from quackpipe_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
