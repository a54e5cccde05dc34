"""Streaming-operator micro-bench (round 16): rows/s through the two
stateful dedup operators at two state sizes — the first perf baseline
for the streaming family (every other operator family has had a bench
hook since r07-r14; VERDICT r15 #10).

Method: a file-source stream (one JSON file per micro-batch, processed
with processAllAvailable → deterministic batch boundaries), memory sink.
For each operator the run feeds WARM_BATCHES batches to build state to
``state_small`` distinct keys, times the next TIMED_BATCHES batches,
then grows state to ``state_large`` and times again — the two timed
numbers separate per-batch fixed cost from state-size sensitivity (a
state-store lookup that degraded with key count would show a large/small
ratio ≫ 1; the expected shape is ≈ 1, state is O(1) per key).

Every batch contains a deterministic mix of new and repeated docs
(repeat ratio ~30%) so both the is_new and duplicate state paths run.

Usage: python bench_stream.py [batch_rows] [timed_batches]
Prints ONE JSON line:
  {"metric": "stream_dedup_rows_per_s", "ops": {op: {...}}, ...}
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time


def _docs_batch(start: int, n: int, repeat_every: int = 3) -> str:
    """n JSON rows; every repeat_every-th row repeats an earlier doc's
    text (stable duplicate stream), the rest are unique.

    Measurement-bug fix (r16, declared in OPTIMIZATION_r16.md): the
    original ``src = i - repeat_every`` pointed every repeat row at
    ANOTHER repeat row's index (i and i-3 are both ≡0 mod 3), whose own
    text was "body {i-6}" — so no emitted text ever actually recurred
    and the duplicate state path never ran. ``src = i - repeat_every - 1``
    lands on a unique row (i-4 ≢ 0 mod 3), giving the real ~1/3 repeat
    ratio the docstring always claimed. BENCH_STREAM_r16.json (recorded
    with the all-unique stream) is kept for comparison; post-fix numbers
    live in BENCH_STREAM_r16b.json."""
    lines = []
    for i in range(start, start + n):
        if i % repeat_every == 0 and i > repeat_every:
            src = i - repeat_every - 1  # repeat a recent UNIQUE doc's content
        else:
            src = i
        text = (
            f"document body {src} with enough tokens to shingle "
            f"alpha beta gamma delta epsilon zeta eta theta iota kappa"
        )
        lines.append(json.dumps({"doc_id": i, "text": text}))
    return "\n".join(lines)


def _run_op(spark, make_out, name: str, tmp: str, batch_rows: int,
            warm_batches: int, timed_batches: int, grow_batches: int) -> dict:
    import os

    src = os.path.join(tmp, f"{name}_src")
    os.makedirs(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        make_out(stream)
        .writeStream.format("memory")
        .queryName(f"bench_{name}")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp, f"{name}_ckpt"))
        .start()
    )
    bi = 0

    def feed(n_batches: int) -> float:
        nonlocal bi
        t0 = time.perf_counter()
        for _ in range(n_batches):
            with open(os.path.join(src, f"b{bi:05d}.json"), "w") as f:
                f.write(_docs_batch(bi * batch_rows, batch_rows))
            bi += 1
            q.processAllAvailable()
        return time.perf_counter() - t0

    try:
        feed(warm_batches)                       # state -> small
        t_small = feed(timed_batches)            # timed at small state
        feed(grow_batches)                       # state -> large
        t_large = feed(timed_batches)            # timed at large state
    finally:
        q.stop()
    rows = timed_batches * batch_rows
    return {
        "batch_rows": batch_rows,
        "timed_batches": timed_batches,
        "state_small_keys": warm_batches * batch_rows,
        "state_large_keys": (warm_batches + timed_batches + grow_batches) * batch_rows,
        "rows_per_s_small_state": round(rows / t_small, 1),
        "rows_per_s_large_state": round(rows / t_large, 1),
        "sec_per_batch_small": round(t_small / timed_batches, 4),
        "sec_per_batch_large": round(t_large / timed_batches, 4),
        "large_over_small": round(t_large / t_small, 3),
    }


def main() -> None:
    batch_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    timed_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from quackpipe_spark.session import get_spark
    from quackpipe_spark.streaming.stateful import (
        streaming_exact_dedup,
        streaming_near_dup_flags,
    )

    spark = get_spark(app_name="bench_stream")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        ops = {
            "exact_dedup": lambda s: streaming_exact_dedup(s),
            "near_dup_flags": lambda s: streaming_near_dup_flags(s),
        }
        out = {}
        for name, make in ops.items():
            out[name] = _run_op(
                spark, make, name, tmp, batch_rows,
                warm_batches=3, timed_batches=timed_batches, grow_batches=12,
            )
        print(json.dumps({
            "metric": "stream_dedup_rows_per_s",
            "unit": "rows/s",
            "ops": out,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
