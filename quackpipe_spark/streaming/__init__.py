from quackpipe_spark.streaming.ingest import (  # noqa: F401
    DEAD_LETTER_TABLE,
    session_windows,
    stream_lines_to_table,
    windowed_counts,
)
from quackpipe_spark.streaming.stateful import (  # noqa: F401
    index_probe_writer,
    postings_append_writer,
    running_totals,
    streaming_exact_dedup,
    streaming_near_dup_flags,
)
