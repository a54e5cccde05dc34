"""Micro-batch ingest buffer with timed flush (SURVEY §2A A8, A11, A24).

Parity with the reference's write path: batches append into an in-memory
columnar store per (db, table); a background loop flushes every
``save_timeout_s`` (default 1s, config/configuration.go:17) or when a
table's buffer exceeds ``max_buffered_rows`` (>1M,
hive_merge_tree_service.go:267-290,390-396). Writers get a promise that
resolves at flush time (utils/promise.go:8-98) — here a
``concurrent.futures.Future`` resolved by the flush thread.

Buffered batches union by name with null fill (normalizeSchema /
MergeColumns, data_store.go:79-141): a column absent from one batch is
null-filled for those rows. Type conflicts reject at append
(data_store.go:40-43) via Catalog.update_schema.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future

from quackpipe_spark.catalog import Catalog
from quackpipe_spark.writer import HiveWriter, infer_schema


class _TableBuffer:
    def __init__(self):
        self.columns: dict[str, list] = {}
        self.rows = 0
        self.promises: list[Future] = []

    def append(self, data: dict[str, list], n: int) -> None:
        """Union-by-name with two-way null fill (data_store.go:94-141)."""
        for col in data:
            if col not in self.columns:
                self.columns[col] = [None] * self.rows  # back-fill new column
        for col, buf in self.columns.items():
            vals = data.get(col)
            buf.extend(vals if vals is not None else [None] * n)  # fwd-fill
        self.rows += n


class IngestService:
    def __init__(
        self,
        spark,
        catalog: Catalog,
        save_timeout_s: float = 1.0,
        max_buffered_rows: int = 1_000_000,
    ):
        self.writer = HiveWriter(spark, catalog)
        self.catalog = catalog
        self.save_timeout_s = save_timeout_s
        self.max_buffered_rows = max_buffered_rows
        self._buffers: dict[tuple[str, str], _TableBuffer] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- write path ---------------------------------------------------------

    def store(
        self,
        db: str,
        table: str,
        data: dict[str, list],
        n_rows: int | None = None,
        pre_validated: bool = False,
    ) -> Future:
        """Append one schema-homogeneous batch; resolves at flush.

        ``n_rows`` carries the row count for column-less batches (all
        values null): those rows buffer with zero columns and flush as
        auto-timestamped rows — without it an all-null write would ack
        success while writing nothing. ``pre_validated`` skips the
        schema pass for callers that already ran validate_schema on every
        batch of the request (the multi-batch atomicity pattern) — the
        duplicate pass costs a catalog lock + schema inference per batch
        on the hot HTTP path."""
        if n_rows is not None and n_rows < 0:
            raise ValueError(f"n_rows must be >= 0, got {n_rows}")
        if not data:
            if not n_rows:
                f: Future = Future()
                f.set_result([])
                return f
            n = n_rows
        else:
            lengths = {len(v) for v in data.values()}
            if len(lengths) != 1:
                raise ValueError(
                    f"ragged batch: { {k: len(v) for k, v in data.items()} }"
                )
            n = lengths.pop()
            if n_rows is not None and n_rows != n:
                raise ValueError(f"n_rows={n_rows} disagrees with column length {n}")
        # Validate/evolve schema up front so a type conflict rejects the
        # write (not the flush) — reference semantics.
        if not pre_validated:
            self.validate_schema(db, table, data)
        promise: Future = Future()
        flush_now = False
        with self._lock:
            buf = self._buffers.setdefault((db, table), _TableBuffer())
            buf.append(data, n)
            buf.promises.append(promise)
            if buf.rows >= self.max_buffered_rows:
                flush_now = True
        if flush_now:
            # only THIS table's buffer: flushing every table inline on the
            # ingesting HTTP handler thread made a small request absorb
            # seconds of unrelated tables' write latency (and trip its own
            # 30 s promise timeout) purely because of neighbors' volume
            # (review r12); the timer still sweeps all tables on cadence
            self.flush((db, table))
        return promise

    def validate_schema(self, db: str, table: str, data: dict[str, list]) -> None:
        """Auto-create + evolve/validate the table schema for one batch
        (raises TypeError on conflict, buffering nothing). Exposed so a
        multi-batch request can pre-validate EVERY batch before the first
        store() — otherwise a conflict in batch k returns an error while
        batches 1..k-1 are already buffered and get written anyway."""
        from quackpipe_spark.writer import effective_schema

        # all-null columns with no existing type carry no evidence: leave
        # them OUT of the registered schema (write_columnar excludes them
        # from the files too; union-by-name null-fills identically) so the
        # first typed batch establishes the type instead of a VARCHAR
        # guess locking it forever
        known = self.catalog.get(db, table)
        evidized = {
            c: vals
            for c, vals in data.items()
            if not (
                all(v is None for v in vals)
                and (known is None or c not in known.schema)
            )
        }
        fields = infer_schema(evidized)  # one inference pass (review r14)
        t = self.catalog.get_or_create(db, table, fields=fields)
        self.catalog.update_schema(t, effective_schema(t, evidized, fields=fields))

    def flush(self, key: tuple[str, str] | None = None) -> int:
        """Flush buffers (all, or one (db, table) when ``key`` is given);
        returns rows written. Synchronous ack: the write return resolves
        every pending promise."""
        with self._lock:
            if key is None:
                todo = self._buffers
                self._buffers = {}
            else:
                buf = self._buffers.pop(key, None)
                todo = {key: buf} if buf is not None else {}
        written = 0
        for (db, table), buf in todo.items():
            try:
                self.writer.write_columnar(db, table, buf.columns, n_rows=buf.rows)
                written += buf.rows
                for p in buf.promises:
                    p.set_result(buf.rows)
            except Exception as e:
                for p in buf.promises:
                    p.set_exception(e)
        return written

    def discard(self, reason: Exception | None = None) -> int:
        """Drop every buffered-but-unflushed row and FAIL its promises;
        returns rows dropped.

        The streaming replay seam (review r14): a foreachBatch body that
        dies AFTER buffering (e.g. its dead-letter write failed mid-batch)
        must not leave the rows in the shared service — Structured
        Streaming replays the batch, the same lines buffer again, and the
        next flush would write every row twice. The failed batch's
        checkpoint never commits, so discarding loses nothing the replay
        won't re-deliver."""
        exc = reason if reason is not None else RuntimeError(
            "buffered batch discarded before flush"
        )
        with self._lock:
            todo = self._buffers
            self._buffers = {}
        dropped = 0
        for buf in todo.values():
            dropped += buf.rows
            for p in buf.promises:
                p.set_exception(exc)
        return dropped

    # -- background flush loop (A11) ---------------------------------------

    def start(self) -> None:
        if self._thread:
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True, name="ingest-flush")
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.wait(self.save_timeout_s):
            self.flush()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)
            self._thread = None
        self.flush()


def ingest_lines(
    service: IngestService,
    text: str,
    db: str = "default",
    precision: str = "ns",
    skip_malformed: bool = False,
):
    """HTTP /write body → parsed batches → buffered store. Returns the
    list of per-batch promises (handler awaits all, insert_into.go:58-80).

    Schema validation runs for EVERY batch before the first store(), so a
    request whose later batch carries a type conflict rejects atomically:
    no rows buffer, the client's retry cannot duplicate the early
    batches. (Schema EVOLUTION from validated batches may persist — new
    nullable columns with zero rows — which is harmless and matches the
    reference's schema-on-write monotonicity.)"""
    from quackpipe_spark.sources.lineproto import parse_lines

    batches = list(
        parse_lines(
            text, database=db, precision=precision, skip_malformed=skip_malformed
        )
    )
    for batch in batches:
        service.validate_schema(batch.database, batch.table, batch.data)
    return [
        service.store(batch.database, batch.table, batch.data, pre_validated=True)
        for batch in batches
    ]
