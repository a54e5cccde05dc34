"""LLM training-data pipeline operators as named workloads.

Dedup (exact / minhash-LSH / simhash / n-gram jaccard / embedding-cosine),
similarity search, text analysis, multimodal plumbing — over the
``documents`` and ``embeddings`` tables. Implementations live in
``quackpipe_spark.operators``; this module wires them to the driver
contract with DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
