"""Structured Streaming ingest path (SURVEY §2A A11 / §7 build step 7).

The reference's "streaming" is buffered micro-batch ingest flushed on a
1-second timer (hive_partition.go:116-177) — exactly Spark's micro-batch
trigger model. This module exposes the same flush cadence as a real
Structured Streaming job:

  readStream (file/socket source of line-protocol text)
    → foreachBatch(parse + hive write)     [trigger = SAVE_TIMEOUT_S]

plus genuinely-streaming extensions the reference lacks (SURVEY §2B
"streaming-only ops — not present in the reference"): watermarked tumbling
windows and session windows, offered as opt-in operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Table that receives rejected lines under ``malformed="dead_letter"``.
#: A regular engine table (auto-created, hive-partitioned, queryable
#: through /query like any other), so the dead letters inherit the same
#: retention/compaction story as the data they failed to join.
DEAD_LETTER_TABLE = "_dead_letter"


def _malformed_lines(batch_df: DataFrame, precision: str) -> DataFrame:
    """(line, error) rows for exactly the lines the engine parser
    rejects. The parser IS the validator — same code object the parse
    paths call — so a line can never be dead-lettered by one rule and
    ingested by another, and the recorded error text matches what
    ``malformed="fail"`` would have raised. One Arrow-batched pass;
    blank/comment lines are not errors (every parse path skips them)."""
    from quackpipe_spark.sources.lineproto import parse_line

    def check(it):
        import pandas as pd

        for pdf in it:
            bad_l: list[str] = []
            bad_e: list[str] = []
            for v in pdf["value"]:
                if v is None:
                    continue
                line = v.strip()
                if not line or line.startswith("#"):
                    continue
                try:
                    parse_line(line, precision)
                except ValueError as e:
                    bad_l.append(v)
                    bad_e.append(str(e))
            yield pd.DataFrame({"line": bad_l, "error": bad_e})

    return batch_df.select("value").mapInPandas(check, "line string, error string")


def stream_lines_to_table(
    spark,
    catalog,
    lines_stream: DataFrame,
    db: str = "default",
    precision: str = "ns",
    trigger_seconds: float = 1.0,
    checkpoint_dir: str | None = None,
    driver_path_max_rows: int = 50_000,
    malformed: str = "fail",
):
    """Attach a foreachBatch hive-writer to a streaming DataFrame of raw
    line-protocol text (column ``value``). Returns the StreamingQuery.

    Each micro-batch runs the exact same parse→partition→write path as the
    HTTP ingest, so the on-disk contract (levels, index, sorting) is
    identical whichever ingest door the data came through.

    Size gate: steady-state micro-batches (≤ ``driver_path_max_rows``)
    take the driver-side Arrow fast path — lowest latency, same as the
    reference's RecordBuilder flush. A larger batch (a backfill burst, a
    recovered source replaying hours of data) parses with mapInArrow and
    writes with the distributed sorted writer instead: collecting it would
    put the whole burst in driver memory at once.

    A record's ``value`` is a CHUNK of line-protocol text, possibly
    multi-line (an HTTP body, a Kafka payload): every batch is exploded
    on newlines up front, so the validator, the driver path, and the
    distributed path all see the same one-line rows — previously an
    embedded newline was one (malformed) line to the validator but two
    lines to the driver path's join+splitlines, so the same payload
    could be dead-lettered AND ingested (review r12).

    ``malformed``: the poison-pill policy. ``"fail"`` (default) raises —
    the micro-batch fails, the checkpoint does not commit, and the stream
    halts on the bad offsets (loud, like the HTTP door's 400, but the
    stream REPLAYS the same batch forever until the source is fixed).
    ``"skip"`` drops unparseable lines and ingests the rest — the policy
    for sources that can't be repaired in place; skipped lines are GONE,
    so choose it deliberately. ``"dead_letter"`` ingests the good lines
    like ``"skip"`` but lands every rejected line in the
    ``_dead_letter`` table of the same db (columns: line, error,
    batch_id, auto ``__timestamp``) — a regular queryable engine table,
    written BEFORE the good rows so a mid-batch crash replays into
    duplicate dead letters rather than silently losing any (dead-letter
    rows carry batch_id precisely so replays are dedupable).

    Under ``"skip"``/``"dead_letter"`` the policy also covers POST-PARSE
    validation failures (a type-flip line like ``m f="text"`` against an
    established FLOAT8 column, an invalid measurement name): the driver
    path retries line-by-line so only the poison lines reject (buffered
    validation — still ONE flush), and the distributed path isolates per
    (table, shape) frame. Previously such lines raised through the batch
    and the checkpoint replayed the same offsets forever — the exact
    loop the policy exists to prevent (review r12). Validation-failure
    dead letters are written AFTER the ingest attempt (they are only
    discoverable then); on the distributed path they carry the frame's
    rows re-serialized as JSON, not the original line text.

    Exactly-once caveat (same one index_probe_writer documents): regular
    table writes are per-table parquet appends with no batch_id column,
    so a crash AFTER some tables of a multi-table batch committed
    replays the batch and duplicates the committed tables' rows.
    Dead-letter rows carry batch_id and are replay-dedupable; main-table
    rows are not — deduplicate downstream (dedup_exact) or route
    critical feeds through the HTTP door's promise ack.
    """
    if malformed not in ("fail", "skip", "dead_letter"):
        raise ValueError(
            f"malformed must be 'fail', 'skip' or 'dead_letter', got {malformed!r}"
        )
    from quackpipe_spark.sources.lineproto import _PRECISION_NS

    if precision not in _PRECISION_NS:
        # an unknown precision raises per-LINE inside parse_line, which the
        # skip/dead_letter policies would treat as malformed DATA — every
        # line of the stream silently skipped or dead-lettered forever
        # instead of failing at stream start (review r14)
        raise ValueError(
            f"unknown precision {precision!r}; expected one of "
            f"{sorted(_PRECISION_NS)}"
        )
    skip = malformed in ("skip", "dead_letter")
    dead_letter = malformed == "dead_letter"
    from quackpipe_spark.ingest import IngestService, ingest_lines
    from quackpipe_spark.sources.lineproto import parse_lines_df

    service = IngestService(spark, catalog, save_timeout_s=3600)  # flush per batch

    def _dead_letter_rows(rows: list[tuple[str, str]], batch_id: int) -> None:
        """Land (line, error) pairs in the dead-letter table."""
        if not rows:
            return
        bad_df = spark.createDataFrame(
            [(ln, err, batch_id) for ln, err in rows],
            "line string, error string, batch_id long",
        )
        service.writer.write_parsed_df(db, DEAD_LETTER_TABLE, bad_df)

    def _ingest_lines_isolated(lines: list[str], batch_id: int) -> None:
        """Per-line validation fallback for a batch whose BULK ingest hit
        a post-parse validation error: each line validates and buffers
        independently (store() pre-validates before buffering), poison
        lines collect for the dead-letter table, and the batch still
        flushes ONCE — no per-line file explosion."""
        bad: list[tuple[str, str]] = []
        promises = []
        for ln in lines:
            s = ln.strip()
            if not s or s.startswith("#"):
                continue
            try:
                promises.extend(
                    ingest_lines(
                        service, s, db=db, precision=precision,
                        skip_malformed=skip,
                    )
                )
            except (TypeError, ValueError) as e:
                bad.append((s, f"{type(e).__name__}: {e}"))
        if dead_letter:
            _dead_letter_rows(bad, batch_id)
        service.flush()
        for p in promises:
            p.result(timeout=300)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            _handle_batch(batch_df, batch_id)
        except BaseException:
            # a failed micro-batch must NOT leave buffered rows in the
            # shared service: its checkpoint never commits, Structured
            # Streaming replays the batch, the same lines buffer again,
            # and the next flush would write every row twice (e.g. the
            # isolated fallback buffered 49k good lines and THEN the
            # dead-letter write died — review r14). Discard fails the
            # orphaned promises; the replay re-delivers everything.
            service.discard()
            raise

    def _handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        # normalize records to ONE LINE PER ROW first (see docstring),
        # then persist: the size probe (count) and whichever write path
        # follows both consume the batch — without a pin, a file source
        # re-reads the batch's files once per action
        batch_df = batch_df.select(
            F.explode(F.split(F.col("value"), "\r\n|\r|\n")).alias("value")
        ).persist()
        try:
            n = batch_df.count()
            if n == 0:
                return
            if dead_letter:
                # one validator pass over the pinned batch; written first
                # (see docstring) and only when non-empty, so the common
                # clean batch pays a scan but no write job
                bad = (
                    _malformed_lines(batch_df, precision)
                    .withColumn("batch_id", F.lit(batch_id).cast("long"))
                    .persist()
                )
                try:
                    if bad.count() > 0:
                        service.writer.write_parsed_df(db, DEAD_LETTER_TABLE, bad)
                finally:
                    bad.unpersist()
            if n <= driver_path_max_rows:
                rows = batch_df.collect()
                lines = [r["value"] for r in rows if r["value"]]
                text = "\n".join(lines)
                if text:
                    # the poison-isolation except covers ONLY the
                    # validate+buffer phase (ingest_lines pre-validates
                    # every batch before the first store, so an exception
                    # here buffered nothing). A WRITE-time error — which
                    # can also be a ValueError (ArrowInvalid is one) —
                    # must NOT route to the per-line fallback: tables that
                    # already flushed would be re-ingested and duplicated
                    # (review r12 follow-up).
                    try:
                        promises = ingest_lines(
                            service, text, db=db, precision=precision,
                            skip_malformed=skip,
                        )
                    except (TypeError, ValueError):
                        # post-parse validation poison (type flip, bad
                        # measurement name): parse errors were already
                        # handled by skip_malformed, so this is a
                        # validation failure — isolate per line instead
                        # of wedging the stream on these offsets forever
                        if not skip:
                            raise
                        _ingest_lines_isolated(lines, batch_id)
                    else:
                        service.flush()
                        # flush() routes write failures to the promises and
                        # swallows them otherwise — re-raise HERE so the
                        # micro-batch fails and the checkpoint does NOT
                        # commit a batch whose data never landed
                        for p in promises:
                            p.result(timeout=300)
                return
            # ParsedFrames context: the batch's frames all project ONE
            # persisted parse; release the cache once every table wrote
            with parse_lines_df(
                spark, batch_df, database=db, precision=precision,
                skip_malformed=skip,
            ) as frames:
                for table, _sid, df in frames:
                    try:
                        service.writer.write_parsed_df(db, table, df)
                    except (TypeError, ValueError) as e:
                        if not skip:
                            raise
                        if dead_letter:
                            # frame-granular isolation (per table+shape);
                            # original line text is gone by this point —
                            # rows re-serialize as JSON (see docstring)
                            bad_frame = df.select(
                                F.to_json(F.struct(*df.columns)).alias("line"),
                                F.lit(
                                    f"table {table!r}: {type(e).__name__}: {e}"
                                ).alias("error"),
                                F.lit(batch_id).cast("long").alias("batch_id"),
                            )
                            service.writer.write_parsed_df(
                                db, DEAD_LETTER_TABLE, bad_frame
                            )
        finally:
            batch_df.unpersist()

    writer = (
        lines_stream.writeStream.foreachBatch(handle_batch)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def _event_time(events: DataFrame, ts_col: str):
    """Event-time column tolerant of the two time encodings users feed us:
    int64 epoch-nanos (the engine's native domain) or a parquet/stream
    timestamp[_ntz] (truncated to µs, Spark's timestamp resolution).

    NTZ is mapped to an instant via the calendar-pure field-extraction
    expression (sources.tables.ntz_epoch_us_expr): naive wall time means
    UTC under ANY session timezone — a plain NTZ→timestamp cast (or even
    timestampdiff against an NTZ epoch literal) resolves through
    session-zone casts at analysis time and would shift event times and
    every tumbling window boundary on a non-UTC session."""
    dtype = dict(events.dtypes).get(ts_col)
    if dtype == "timestamp":
        return F.col(ts_col)
    if dtype == "timestamp_ntz":
        from quackpipe_spark.sources.tables import ntz_epoch_us_expr

        return F.timestamp_micros(F.expr(ntz_epoch_us_expr(ts_col)))
    # floor, not DIV: DIV truncates toward zero, lifting pre-1970 ns
    # ~1µs forward across window boundaries (the writer.py trap);
    # (x - pmod(x, 1000)) is an exact multiple, so its DIV is a floor
    return F.timestamp_micros(
        F.expr(f"(`{ts_col}` - pmod(`{ts_col}`, 1000)) DIV 1000")
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Native session windows (gap-merged) — works on batch and streaming
    DataFrames. STREAMING CALLERS MUST PASS ``watermark``: the event-time
    column is derived INSIDE this function (the engine's native int64-ns
    domain has no timestamp column to watermark upstream), so without the
    parameter a streaming plan has no watermark to attach and Spark
    rejects session-window aggregation at query start. Batch callers can
    omit it (a batch watermark is a no-op anyway). Equivalent to the
    lag+cumsum sessionization in the batch surface (cross-checked in
    tests), but expressed with Spark's built-in session_window so the
    streaming state store handles late-merge semantics."""
    ts = _event_time(events, ts_col)
    events = events.withColumn("_event_time", ts)
    if watermark is not None:
        events = events.withWatermark("_event_time", watermark)
    return (
        events
        .groupBy(F.session_window("_event_time", gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming extension the
    reference can't express (its late data just lands in old partitions).
    ``ts_col`` is int64 epoch ns (our time domain) or a native timestamp;
    works on both batch and streaming DataFrames.

    The output window bounds are whole SECONDS (``window_start_s`` /
    ``window_end_s``), so sub-second windows are refused: two windows
    inside one second would truncate to identical boundary rows with no
    way to tell them apart (review r14)."""
    import re as _re

    wl = window.strip().lower()
    if _re.search(r"\b(milli|micro)seconds?\b", wl) or _re.search(
        r"\d\.\d+\s*(second|sec)", wl
    ):
        raise ValueError(
            f"windowed_counts emits whole-second window bounds; sub-second "
            f"window {window!r} would produce colliding boundary rows — "
            "use >= 1 second windows"
        )
    ts = _event_time(events, ts_col)
    return (
        events.withColumn("_event_time", ts)
        .withWatermark("_event_time", watermark)
        .groupBy(F.window("_event_time", window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_seconds(F.col("w.start")).alias("window_start_s"),
            F.unix_seconds(F.col("w.end")).alias("window_end_s"),
            key_col,
            "n",
        )
    )
