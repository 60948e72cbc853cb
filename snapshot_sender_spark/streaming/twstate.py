"""transformWithStateInPandas processors (Spark 4 arbitrary-state API).

The state-v2 API replaces applyInPandasWithState's single opaque state tuple
with named, typed state primitives (ValueState / ListState / MapState) plus
timers — the natural home for the reference's control-plane counters
(DynamoDBExportStatusService.kt:38-44 increments FilesSent per delivered
file; here the same incremental pattern keeps a composite running aggregate
per key). State lives in the state store (RocksDB-capable), one store per
shuffle partition — at 100 TB the key space shards across executors and
survives restarts via the checkpoint, which is exactly the DynamoDB table's
job in the reference.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running (count, integer-cent sum, max) over an input with
    columns (key..., value double, cents long); emits the updated aggregate
    for each key seen in the micro-batch (update semantics).

    The cent sum is integer state — order- and batch-boundary-independent, so
    the emitted total is bit-deterministic however the input is partitioned
    into micro-batches.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState(
            "agg", "n_events bigint, total_cents bigint, max_value double"
        )

    def handleInputRows(self, key, rows, timer_values):
        if self._agg.exists():
            n, cents, mx = self._agg.get()
        else:
            n, cents, mx = 0, 0, float("-inf")
        for pdf in rows:
            if len(pdf):
                n += len(pdf)
                cents += int(pdf["cents"].sum())
                mx = max(mx, float(pdf["value"].max()))
        self._agg.update((n, cents, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def state_v2_available() -> bool:
    """transformWithStateInPandas's Python worker speaks protobuf to the JVM
    state server; without google.protobuf the worker crashes at init."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_stats_transform(events):
    """Per-user running stats on the best available arbitrary-state API:
    transformWithStateInPandas (state v2) when its protobuf dependency is
    importable, else the applyInPandasWithState form of the *same* fold —
    identical output contract (user_id, n_events, total_value, max_value),
    update semantics, integer-cent state either way."""
    out_schema = "user_id bigint, n_events bigint, total_value double, max_value double"
    if state_v2_available():
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        n, cents, mx = state.get if state.exists else (0, 0, float("-inf"))
        for pdf in pdfs:
            if len(pdf):
                n += len(pdf)
                cents += int(pdf["cents"].sum())
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, cents, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "max_value": [mx],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="n_events bigint, total_cents bigint, max_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
