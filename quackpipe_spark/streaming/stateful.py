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
OUTPUT_SCHEMA = "user_id LONG, n LONG, total DOUBLE, batch_rows LONG"


def running_totals(events: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Streaming per-key running (count, sum): each micro-batch emits the
    key's lifetime totals so far. State = one (n, total) tuple per key —
    constant size, safe at any key cardinality the state store can hold.
    """

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
            columns=["user_id", "n", "total", "batch_rows"],
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
