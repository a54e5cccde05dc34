"""Shared read helper for the reap-while-reading soaks.

The delayed-drop design (plans/index.py remove → drop_queue) gives
in-flight scans ``drop_delay_s`` (production default 30 s) to finish
before a compaction's tombstoned inputs are physically deleted. The
soaks deliberately compress that window to 2 s so tombstoned files ARE
reaped while the other reader is mid-flight — which makes the engine's
actual contract observable:

- a query can never return silently wrong rows from a stale plan (the
  plan cache is keyed on the file-list digest, so a post-compaction
  query re-lists and re-plans);
- a scan whose already-planned input file is reaped mid-flight fails
  LOUDLY (Spark's FAILED_READ_FILE / FileNotFoundException), never
  partially;
- an immediate client retry re-lists the store and observes a correct,
  newer snapshot.

The retry below is therefore the standard client half of that contract
(same as any snapshot-retention race: a reader that outlives the
retention window retries against the new snapshot). It matches ONLY the
reaped-input error class; assertion failures and every other engine
error propagate unchanged, so the soak invariants (exact flushed-batch
prefix, monotone counts) are still enforced on every result a retry
returns.
"""

from __future__ import annotations

import time

# Spark 4 wraps the executor-side java.io.FileNotFoundException in
# error class FAILED_READ_FILE.FILE_NOT_EXIST ("It is possible the
# underlying files have been updated ..."); older paths surface the
# raw exception text. Match narrowly on either.
_REAPED_SCAN_MARKERS = (
    "FAILED_READ_FILE",
    "FILE_NOT_EXIST",
    "FileNotFoundException",
)


def is_reaped_scan_error(exc: BaseException) -> bool:
    msg = str(exc)
    return any(m in msg for m in _REAPED_SCAN_MARKERS)


def collect_with_reap_retry(qe, sql: str, db: str, retries: int = 3, stats: dict | None = None):
    """qe.sql(sql, db).collect() with a bounded retry when the scan's
    input was reaped mid-flight. Each retry issues a FRESH query, which
    re-lists the table's files (metadata.json) and re-plans — the race
    cannot persist across attempts unless a new compaction lands inside
    every retry window. Returns (rows, n_retries).

    ``stats``: optional dict the retry loop records into —
    ``reap_retries`` (count) and ``last_reap_error`` (first line of the
    matched error, which carries the missing PATH) — so a soak that
    keeps hitting FileNotFound surfaces WHICH file and how often in its
    failure output instead of silently absorbing a persistent engine
    bug into the benign-race class (ADVICE r15): a genuinely corrupt
    plan that names a never-written file still fails after ``retries``
    attempts, now with the first occurrence's context preserved."""
    attempt = 0
    while True:
        try:
            return qe.sql(sql, db=db).collect(), attempt
        except Exception as e:
            if attempt >= retries or not is_reaped_scan_error(e):
                raise
            if stats is not None:
                stats["reap_retries"] = stats.get("reap_retries", 0) + 1
                stats.setdefault("last_reap_error", str(e).split("\n", 1)[0][:400])
            attempt += 1
            time.sleep(0.2)
