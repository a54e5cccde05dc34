"""Custom stateful streaming operator: per-key running aggregates via
applyInPandasWithState (SURVEY §2B streaming extensions; north-star
"applyInPandasWithState for custom stateful operators").

The reference has no stateful streaming at all (its "streaming" is a
buffered micro-batch flush); this is the Spark-native extension point a
time-series engine needs for alerting/monotonic counters: arbitrary
Python state per key, checkpointed by the engine, with timeout-driven
eviction available for sessionization-style logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, total DOUBLE"


def running_totals(events: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Streaming per-key running (count, sum): each micro-batch emits the
    key's lifetime totals so far. State = one (n, total) tuple per key —
    constant size, safe at any key cardinality the state store can hold.
    The output key column keeps the input's name AND type (a hardcoded
    schema would crash at Arrow conversion for any non-long key).
    """
    key_type = dict(events.dtypes)[key_col]
    output_schema = f"{key_col} {key_type}, n LONG, total DOUBLE, batch_rows LONG"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            [(key[0], n, round(total, 4), batch_rows)],
            columns=[key_col, "n", "total", "batch_rows"],
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming exact dedup: first-seen-wins per content fingerprint,
    ACROSS micro-batches — the incremental form of
    ``operators.dedup.exact_dedup`` for a continuously-ingesting corpus.

    Keyed by md5(text); state per fingerprint = (keep_id, n_copies) —
    constant size, so the state store scales with DISTINCT content, not
    stream volume. Each batch emits one row per touched fingerprint with
    ``is_new`` marking first sightings (the survivors a downstream
    training-shard writer appends) and the updated lifetime copy count
    (the same (fingerprint, keep_id, n_copies) triple the batch operator
    produces). Survivor choice matches the batch semantics: the smallest
    id seen so far — so replaying the same corpus through either path
    keeps identical survivors (determinism contract, dedup.py module
    docstring).

    Scale: the groupBy shuffles one short row per incoming doc (id +
    fingerprint — the text is dropped before the shuffle), and Spark's
    HDFS-backed state store handles fingerprint-cardinality state the
    same way streaming dropDuplicates does; for bounded-retention
    pipelines add a watermark upstream and an EventTimeTimeout eviction.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    id_type = dict(docs.dtypes)[id_col]
    if id_type in ("tinyint", "smallint", "int", "bigint"):
        # NULL ids are coalesced to int64-max SPARK-side: one None in a
        # chunk makes pandas store _id as float64, where ids above 2^53
        # round and the recorded survivor could be an id that exists in no
        # document — the sentinel keeps the column exact int64 end to end.
        # (An id legitimately equal to 2^63-1 would be indistinguishable
        # from NULL; accepted — it is not a plausible doc id.)
        _NULL_ID = (1 << 63) - 1
        id_expr = F.coalesce(F.col(id_col).cast("long"), F.lit(_NULL_ID))
        keep_type = "LONG"

        def batch_min_of(pdf):
            m = int(pdf["_id"].min())
            return None if m == _NULL_ID else m

    elif id_type == "string":
        # string ids compare lexicographically in BOTH the batch operator
        # (Spark min) and here (python str min) — pandas object columns
        # hold None natively, so no sentinel is needed
        id_expr = F.col(id_col)
        keep_type = "STRING"

        def batch_min_of(pdf):
            s = pdf["_id"].dropna()
            return None if s.empty else str(s.min())

    else:
        raise TypeError(
            f"streaming_exact_dedup supports integral or string ids, got {id_type}"
            " — a silent cast would NULL every survivor"
        )

    keyed = docs.select(
        F.md5(F.col(text_col)).alias("fingerprint"), id_expr.alias("_id")
    )
    state_schema = f"keep_id {keep_type}, n_copies LONG"
    output_schema = (
        f"fingerprint STRING, keep_id {keep_type}, n_copies LONG, is_new BOOLEAN"
    )

    def update(key, pdfs, state: GroupState):
        keep_id, n_copies = state.get if state.exists else (None, 0)
        is_new = not state.exists
        for pdf in pdfs:
            n_copies += len(pdf)
            batch_min = batch_min_of(pdf)
            if batch_min is not None:
                keep_id = batch_min if keep_id is None else min(keep_id, batch_min)
        state.update((keep_id, n_copies))
        yield pd.DataFrame(
            [(key[0], keep_id, n_copies, is_new)],
            columns=["fingerprint", "keep_id", "n_copies", "is_new"],
        )

    return keyed.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
