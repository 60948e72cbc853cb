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


class RecentEventsProcessor(StatefulProcessor):
    """Per-key last-3 events by (ts desc, event_id desc), held in typed
    ListState — the bounded-recency buffer shape (e.g. "most recent deliveries
    per collection" over the reference's manifest). The list is truncated to
    k=3 on every update, so state size is O(k) per key however long the
    stream runs."""

    K = 3

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._recent = handle.getListState("recent", "tsu bigint, event_id bigint")

    def handleInputRows(self, key, rows, timer_values):
        pairs = [tuple(t) for t in self._recent.get()]
        for pdf in rows:
            pairs.extend(zip(pdf["tsu"].astype(int), pdf["event_id"].astype(int)))
        pairs.sort(reverse=True)
        pairs = pairs[: self.K]
        self._recent.put([tuple(p) for p in pairs])
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(pairs),
                "rn": list(range(1, len(pairs) + 1)),
                "event_id": [p[1] for p in pairs],
            }
        )

    def close(self) -> None:
        pass


class TypeCountsProcessor(StatefulProcessor):
    """Per-key MapState of event_type → running count — the reference's
    per-label metric counters (MetricsConfiguration.kt:20-93) as keyed state:
    a sub-key space per stream key, updated incrementally, emitted as the
    full current map after each batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("counts", "event_type string", "n bigint")

    def handleInputRows(self, key, rows, timer_values):
        current = {k[0]: v[0] for k, v in self._counts.iterator()}
        for pdf in rows:
            for et, n in pdf["event_type"].value_counts().items():
                current[et] = current.get(et, 0) + int(n)
        for et, n in current.items():
            self._counts.updateValue((et,), (n,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(current),
                "event_type": list(current.keys()),
                "n": list(current.values()),
            }
        )

    def close(self) -> None:
        pass


class InactivityFlushProcessor(StatefulProcessor):
    """Per-key inactivity flush via state-v2 *timers*: every batch with input
    re-arms a processing-time timer `timeout_ms` ahead; if the key then sees
    no input before the timer fires, handleExpiredTimer emits a final
    (user_id, n_events, flushed=true) row and clears state — the reference's
    end-of-run flush (JobCompletionNotificationListener.kt:31-58 finalizes
    each collection's status when file flow stops) as an operator. Rows seen
    while active are emitted with flushed=false update semantics."""

    def __init__(self, timeout_ms: int = 1):
        self._timeout_ms = timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._n = handle.getValueState("n", "n_events bigint")

    def handleInputRows(self, key, rows, timer_values):
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._n.update((n,))
        # re-arm: drop any prior timer, register a fresh inactivity deadline
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timer_values.getCurrentProcessingTimeInMs() + self._timeout_ms
        )
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "flushed": [False]})

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        n = self._n.get()[0] if self._n.exists() else 0
        self._n.clear()
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "flushed": [True]})

    def close(self) -> None:
        pass


def inactivity_flush_transform(events, timeout_ms: int = 1):
    """Inactivity flush on the best available arbitrary-state API: state-v2
    timers (registerTimer/handleExpiredTimer, timeMode ProcessingTime) when
    protobuf is importable, else applyInPandasWithState with
    ProcessingTimeTimeout — the identical contract: while a key receives
    input it emits (user_id, n_events, flushed=false); once `timeout_ms` of
    processing time passes with no input for that key, one final
    (user_id, n_events, flushed=true) row is emitted and the key's state is
    dropped. Input needs a user_id column; output
    (user_id, n_events, flushed)."""
    out_schema = "user_id bigint, n_events bigint, flushed boolean"
    if state_v2_available():
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=InactivityFlushProcessor(timeout_ms),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="ProcessingTime",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n,) = state.get if state.exists else (0,)
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "flushed": [True]}
            )
            return
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "flushed": [False]})

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="n_events bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


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


def recent_events_transform(events):
    """Per-user last-3 events (ts desc, event_id desc): ListState on state v2
    when available, else the same bounded buffer as an array-typed
    applyInPandasWithState tuple. Input needs columns (user_id, tsu, event_id);
    output (user_id, rn int, event_id)."""
    out_schema = "user_id bigint, rn int, event_id bigint"
    if state_v2_available():
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RecentEventsProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        pairs = []
        if state.exists:
            tsus, ids = state.get
            pairs = list(zip(tsus, ids))
        for pdf in pdfs:
            pairs.extend(zip(pdf["tsu"].astype(int), pdf["event_id"].astype(int)))
        pairs.sort(reverse=True)
        pairs = pairs[: RecentEventsProcessor.K]
        state.update(([int(p[0]) for p in pairs], [int(p[1]) for p in pairs]))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(pairs),
                "rn": list(range(1, len(pairs) + 1)),
                "event_id": [int(p[1]) for p in pairs],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="tsus array<bigint>, ids array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def type_counts_transform(events):
    """Per-user event_type → count map: MapState on state v2 when available,
    else parallel key/value arrays in the applyInPandasWithState tuple. Input
    needs (user_id, event_type); output (user_id, event_type, n)."""
    out_schema = "user_id bigint, event_type string, n bigint"
    if state_v2_available():
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=TypeCountsProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        current = {}
        if state.exists:
            types, ns = state.get
            current = dict(zip(types, ns))
        for pdf in pdfs:
            for et, n in pdf["event_type"].value_counts().items():
                current[et] = current.get(et, 0) + int(n)
        state.update((list(current.keys()), [int(v) for v in current.values()]))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(current),
                "event_type": list(current.keys()),
                "n": list(current.values()),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="types array<string>, ns array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
