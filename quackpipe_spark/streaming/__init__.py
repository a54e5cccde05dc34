from quackpipe_spark.streaming.ingest import stream_lines_to_table, windowed_counts  # noqa: F401
