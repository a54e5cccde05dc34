"""Ingest/storage dataflow operators as named workloads (SURVEY §2A).

Line-protocol parsing, schema-on-write union, auto-timestamp, hive
partitioning, compaction — exposed as queries where the result is
SQL-checkable; the stateful/filesystem paths are covered by tests/.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
