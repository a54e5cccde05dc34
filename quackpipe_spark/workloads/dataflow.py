"""Ingest/storage dataflow operators as named workloads (SURVEY §2A).

The parser operators are pure functions of their input, so they enter the
oracle gate directly: a fixed line-protocol corpus (the reference's own
README examples) parses to a typed table the oracle states as VALUES.
The stateful/filesystem paths (buffered flush, hive layout, compaction,
HTTP) are exercised in tests/test_ingest_dataflow.py instead — their
outputs depend on wall-clock and temp dirs, which the driver's hash
comparison can't pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# README.md:71-75 weather lines + a mixed-type batch exercising int/uint/
# string/bool fields, escaping, and precision handling (A1-A3).
_LINES = """\
weather,location=us-midwest,season=summer temperature=82 1465839830100400200
weather,location=us-east,season=summer temperature=75 1465839830100400201
weather,location=us-west,season=winter temperature=48,humidity=0.61 1465839830100400202
metrics,host=db-01 cpu=0.93,mem_bytes=1073741824i,uptime=86400u,status="healthy",alive=true 1700000000000000000
metrics,host=db-02 cpu=0.11,mem_bytes=536870912i,uptime=3600u,status="degraded \\"io\\"",alive=false 1700000001000000000
"""


def lineproto_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3: streaming parse → schema-split columnar batches → rows.

    Emits (table, schema_id ordinal, column rendering) so the oracle can
    state the expected parse exactly; the weather lines split into two
    batches (schema changes when humidity appears) and metrics into one.
    """
    from quackpipe_spark.sources.lineproto import parse_lines

    batches = parse_lines(_LINES, database="default")
    rows = []
    for bi, b in enumerate(batches):
        n = b.num_rows()
        for r in range(n):
            for col in sorted(b.data):
                v = b.data[col][r]
                rows.append(
                    (
                        b.table,
                        bi,
                        r,
                        col,
                        str(v).lower() if isinstance(v, bool) else str(v),
                        type(v).__name__,
                    )
                )
    # literal VALUES through the SQL parser: createDataFrame on a Python
    # list plans as Scan ExistingRDD — EVERY action then pays a
    # defaultParallelism-task python round (~0.4 s); a VALUES literal is
    # a JVM LocalTableScan (~0.08 s per action)
    def lit(v) -> str:
        if isinstance(v, int):
            return str(v)
        # Spark's parser unescapes backslashes inside string literals
        # (unlike standard SQL) — double them or embedded \" sequences
        # silently change the payload bytes
        return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"

    vals = ",".join("(" + ",".join(lit(c) for c in r) + ")" for r in rows)
    return spark.sql(
        f"SELECT * FROM (VALUES {vals}) AS t(`table`, batch, `row`, col, val, pytype)"
    )


LINEPROTO_PARSE_SQL = """
SELECT * FROM (VALUES
  ('weather', 0, 0, 'location', 'us-midwest', 'str'),
  ('weather', 0, 0, 'season', 'summer', 'str'),
  ('weather', 0, 0, 'temperature', '82.0', 'float'),
  ('weather', 0, 0, 'time', '1465839830100400200', 'int'),
  ('weather', 0, 1, 'location', 'us-east', 'str'),
  ('weather', 0, 1, 'season', 'summer', 'str'),
  ('weather', 0, 1, 'temperature', '75.0', 'float'),
  ('weather', 0, 1, 'time', '1465839830100400201', 'int'),
  ('weather', 1, 0, 'humidity', '0.61', 'float'),
  ('weather', 1, 0, 'location', 'us-west', 'str'),
  ('weather', 1, 0, 'season', 'winter', 'str'),
  ('weather', 1, 0, 'temperature', '48.0', 'float'),
  ('weather', 1, 0, 'time', '1465839830100400202', 'int'),
  ('metrics', 2, 0, 'alive', 'true', 'bool'),
  ('metrics', 2, 0, 'cpu', '0.93', 'float'),
  ('metrics', 2, 0, 'host', 'db-01', 'str'),
  ('metrics', 2, 0, 'mem_bytes', '1073741824', 'int'),
  ('metrics', 2, 0, 'status', 'healthy', 'str'),
  ('metrics', 2, 0, 'time', '1700000000000000000', 'int'),
  ('metrics', 2, 0, 'uptime', '86400', 'int'),
  ('metrics', 2, 1, 'alive', 'false', 'bool'),
  ('metrics', 2, 1, 'cpu', '0.11', 'float'),
  ('metrics', 2, 1, 'host', 'db-02', 'str'),
  ('metrics', 2, 1, 'mem_bytes', '536870912', 'int'),
  ('metrics', 2, 1, 'status', 'degraded "io"', 'str'),
  ('metrics', 2, 1, 'time', '1700000001000000000', 'int'),
  ('metrics', 2, 1, 'uptime', '3600', 'int')
) AS t(\"table\", batch, \"row\", col, val, pytype)
"""


def lineproto_parse_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 distributed path: the same corpus through mapInPandas bulk parse
    (parse_lines_df) — proves the executor-side parser produces the same
    typed rows as the driver-side streaming parser. Output: the weather
    table's union-by-name view of both schema generations."""
    from pyspark.sql import functions as F

    from quackpipe_spark.sources.lineproto import parse_lines_df

    # VALUES literal for the same reason as lineproto_parse: the input
    # scan stays JVM-local; the python cost of this query is exactly the
    # mapInPandas parse being demonstrated, nothing else
    lines_vals = ",".join(
        "('" + line.replace("\\", "\\\\").replace("'", "''") + "')"
        for line in _LINES.splitlines()
    )
    lines_df = spark.sql(
        f"SELECT * FROM (VALUES {lines_vals}) AS t(value)"
    ).repartition(4)
    # the returned union is collected by the CALLER, so this call's
    # single-parse cache must stay alive past return; the query is
    # STATEFUL (rebuilt per rep), so release the PREVIOUS rep's cache
    # here — the leak is bounded to one tiny cached frame
    global _last_parse_cache
    if _last_parse_cache is not None:
        _last_parse_cache.unpersist()
    all_frames = parse_lines_df(spark, lines_df)
    _last_parse_cache = all_frames
    frames = [df for (table, _sid, df) in all_frames if table == "weather"]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out.select("location", "season", "temperature", "humidity", "time")


_last_parse_cache = None


LINEPROTO_DISTRIBUTED_SQL = """
SELECT * FROM (VALUES
  ('us-midwest', 'summer', 82.0::DOUBLE, NULL::DOUBLE, 1465839830100400200),
  ('us-east', 'summer', 75.0, NULL::DOUBLE, 1465839830100400201),
  ('us-west', 'winter', 48.0, 0.61, 1465839830100400202)
) AS t(location, season, temperature, humidity, "time")
"""


QUERIES = {
    "lineproto_parse_distributed": lineproto_parse_distributed,
}
ORACLE = {
    "lineproto_parse_distributed": LINEPROTO_DISTRIBUTED_SQL,
}
# parse_lines_df runs the schema-fingerprint discovery pass (a
# distinct().collect() Spark job) during plan construction — that
# discovery IS part of the parse query, so the registry's plan cache
# must rebuild it per call (the llm_ops STATEFUL contract: a memoized
# plan would silently amortize a collect the timing is supposed to
# include).
STATEFUL = {"lineproto_parse_distributed"}
