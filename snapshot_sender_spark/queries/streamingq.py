"""Streaming queries (SURVEY.md §2B "Streaming"), driven to completion with
Trigger.AvailableNow so the oracle can check the final state.

Tumbling/sliding run as real readStream plans in complete mode; the session
window runs the same operator in batch (identical semantics, deterministic
output — streaming-mode session windows with watermarks are exercised in
tests/test_streaming.py where expected emissions are controlled)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import windows as sw
from ..tables import load
from . import query
from .goldens import golden_oracle


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    category="streaming",
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6h windows per event_type via readStream → window() →
    complete-mode memory sink."""
    events = sw.read_events_stream(spark, sf_dir)
    return sw.run_to_memory(sw.tumbling_counts(events, "6 hours"), "complete")


@query(
    "stream_rocksdb_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    category="streaming",
)
def stream_rocksdb_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window aggregate on the RocksDB state store provider —
    identical results to the default HDFS-backed store (same oracle), with
    state held off-heap: the configuration for 100 TB key cardinality."""
    events = sw.read_events_stream(spark, sf_dir)
    return sw.run_to_memory(
        sw.tumbling_counts(events, "6 hours"), "complete", state_store="rocksdb"
    )


@query(
    "stream_sliding_counts",
    oracle="""
    SELECT window_start, COUNT(*) AS n FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL (o.off) HOUR AS window_start, ts
      FROM events, (SELECT UNNEST([0, 1]) AS off) o
      WHERE ts < time_bucket(INTERVAL '1 hour', ts) - INTERVAL (o.off) HOUR + INTERVAL '2 hours'
    )
    GROUP BY window_start
    """,
    category="streaming",
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h windows every 1h (each event lands in two windows)."""
    events = sw.read_events_stream(spark, sf_dir)
    return sw.run_to_memory(sw.sliding_counts(events, "2 hours", "1 hour"), "complete")


@query(
    "stream_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
    category="streaming",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) per user — session_window() operator
    (streaming semantics tested with watermarks in tests/test_streaming.py)."""
    return sw.session_counts(load(spark, sf_dir, "events"), "30 minutes")


@query(
    "stream_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    """,
    category="streaming",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates over a doubled stream (every event arrives
    twice; exactly-once survives) — idempotent-delivery semantics, the
    streaming analog of the reference's .finished anti-join
    (FinishedFilterProcessor.kt:17-27)."""
    return sw.streaming_dedup_counts(spark, sf_dir)


@query(
    "stream_stateful_running_max",
    oracle="""
    SELECT user_id, MAX(value) AS max_value, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
    category="streaming",
)
def stream_stateful_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    max value + event count, emitted per micro-batch. The testdata replays as
    one micro-batch, so the update-mode emissions equal the final state — a
    plain grouped aggregate, hence oracle-checkable (multi-batch state carry
    is exercised in tests/test_streaming.py)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = sw.read_events_stream(spark, sf_dir)

    def running_max(key, pdfs, state: GroupState):
        mx, cnt = state.get if state.exists else (float("-inf"), 0)
        for pdf in pdfs:
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
                cnt += len(pdf)
        state.update((mx, cnt))
        yield pd.DataFrame({"user_id": [key[0]], "max_value": [mx], "n_events": [cnt]})

    out = events.groupBy("user_id").applyInPandasWithState(
        running_max,
        outputStructType="user_id long, max_value double, n_events long",
        stateStructType="max_value double, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return sw.run_to_memory(out, "update")


@query(
    "stream_incremental_rollup",
    oracle="""
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    category="streaming",
)
def stream_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained time-bucket rollup (hypertable-style continuous
    aggregate): foreachBatch MERGEs mergeable partials (count, integer-cent
    sum) into a persistent rollup table; the derived avg comes from partials
    at read time. Final state equals the batch aggregate — the oracle.
    Multi-batch merge + restart are exercised in tests/test_streaming.py."""
    import os
    import tempfile

    from ..streaming import rollup as ru

    events = sw.read_events_stream(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="rollup_q_")
    return ru.run_incremental_rollup(
        events, os.path.join(work, "rollup"), os.path.join(work, "ckpt"), "6 hours"
    )


@query(
    "agg_hll_sketch_merge",
    # GOLDEN-PINNED (goldens.py): Datasketches HLL union is a per-register
    # max — the final estimate depends only on the data SET, never on
    # partitioning or merge order (verified bit-stable across repartitionings
    # at all three tiers before pinning).
    oracle=golden_oracle("agg_hll_sketch_merge"),
    category="aggregation",
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches): per-group sketches built in
    parallel, unioned to a global estimate — the re-aggregatable distinct-count
    pattern (store sketches, not counts). Oracle: committed golden of the
    order-independent estimate per tier; accuracy vs exact is additionally
    asserted in tests/test_operators.py."""
    o = load(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg(F.col("o_custkey")).alias("sk"),
        F.count("*").alias("n_rows"),
    )
    return per_status.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("approx_custkeys"),
        F.sum("n_rows").alias("total_rows"),
    )


@query(
    "stream_stream_full_outer",
    oracle="""
    SELECT p.purchase_id, c.click_id,
           COALESCE(p.user_id, c.user_id) AS user_id
    FROM (SELECT event_id AS purchase_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    FULL JOIN (SELECT event_id AS click_id, user_id, ts FROM events
               WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL '30 minutes' AND p.ts
    WHERE (p.ts IS NULL OR p.ts < TIMESTAMP '2024-01-25 00:00:00')
      AND (c.ts IS NULL OR c.ts < TIMESTAMP '2024-01-25 00:00:00')
    """,
    category="streaming",
)
def stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join: unmatched rows on *either* side emit
    with NULLs once the opposite side's watermark passes — purchases with no
    prior click AND clicks that led to no purchase within 30 minutes, from one
    stateful operator.

    As in stream_stream_left_join, the comparison excludes rows near the
    stream tail (their null-emission depends on the final state-watermark
    position); both sides are bounded 6 days before end-of-stream, far past
    the 1h delay + 30min join interval, where emission is guaranteed."""
    cutoff = F.lit("2024-01-25").cast("timestamp")
    purchases = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 30 MINUTES"))
        & (clicks.c_ts <= purchases.p_ts),
        "full_outer",
    ).select(
        "purchase_id",
        "click_id",
        F.coalesce(F.col("user_id"), F.col("c_user")).alias("user_id"),
        "p_ts",
        "c_ts",
    )
    out = sw.run_to_memory(joined, "append")
    return out.filter(
        (F.col("p_ts").isNull() | (F.col("p_ts") < cutoff))
        & (F.col("c_ts").isNull() | (F.col("c_ts") < cutoff))
    ).select("purchase_id", "click_id", "user_id")


@query(
    "stream_join_then_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', p.ts) AS window_start,
           COUNT(*) AS n_attributed
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL '1 hour' AND p.ts
    WHERE p.ts < TIMESTAMP '2024-01-25 00:00:00'
    GROUP BY 1
    """,
    category="streaming",
)
def stream_join_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained stateful operators in one streaming query (Spark 4's multiple-
    stateful-operator support): stream-stream join → tumbling daily window
    aggregation, both in append mode with a single pair of watermarks —
    click-attributed purchases per day as a live pipeline.

    Windows strictly before the cutoff are closed by end-of-stream (watermark
    = max_ts − 1h on Jan 30; windows end Jan 25), so the aggregate is exact
    and oracle-checkable; the open tail window is excluded on both engines."""
    purchases = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.c_ts <= purchases.p_ts),
        "inner",
    )
    agg = (
        joined.groupBy(F.window("p_ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n_attributed"))
        .select(F.col("w.start").alias("window_start"), "n_attributed")
    )
    out = sw.run_to_memory(agg, "append")
    return out.filter(F.col("window_start") < F.lit("2024-01-25").cast("timestamp"))


@query(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_id, ts, user_id, event_type FROM events
    """,
    category="streaming",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark``: exactly-once emission under an
    at-least-once source, keyed by event_id with state retained only inside
    the watermark delay. The duplicated input is the same event stream read
    twice and unioned — every row arrives (at least) twice; the dedup state
    must suppress the second copy.

    The delay (40 days) exceeds the fixture's 30-day span so no state evicts
    mid-run and the output is exactly the distinct set — deterministic
    regardless of how AvailableNow slices micro-batches. At scale the delay is
    sized to the real duplicate-arrival skew (hours), keeping state bounded —
    the point of the WithinWatermark variant vs plain dropDuplicates."""
    cols = ["event_id", "ts", "user_id", "event_type"]
    s1 = sw.read_events_stream(spark, sf_dir).select(*cols)
    s2 = sw.read_events_stream(spark, sf_dir).select(*cols)
    dedup = (
        s1.union(s2)
        .withWatermark("ts", "40 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    return sw.run_to_memory(dedup, "append")


@query(
    "stream_stream_semi_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id
    FROM events p
    WHERE p.event_type = 'purchase'
      AND EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = p.user_id
          AND c.ts BETWEEN p.ts - INTERVAL '1 hour' AND p.ts
      )
    """,
    category="streaming",
)
def stream_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT SEMI join: purchases that had at least one click in
    the preceding hour, emitted ONCE regardless of click count (the streaming
    EXISTS). Completes the stream-stream join family (inner / left outer /
    full outer / semi); state bounded by both watermarks like the others."""
    purchases = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
        )
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.c_ts <= purchases.p_ts),
        "left_semi",
    ).select("purchase_id", "user_id")
    return sw.run_to_memory(joined, "append")
