"""Observability: per-operator counters mirroring the reference's metric
families (MetricsConfiguration.kt:16-126 — 17 counters, 1 gauge, 10 timers),
re-expressed Spark-first.

Mechanism: ``pyspark.sql.Observation`` + ``df.observe(...)`` attaches named
aggregates to a plan; they are computed *inside* the job that materializes the
sink (no extra pass over data) — the Spark analog of the reference's
@PrometheusTimeMethod + counter beans. Values surface as a plain dict and are
optionally pushed to a Prometheus pushgateway when ``prometheus_client`` is
importable (gated — not present in this container).

Reference counter names preserved where an engine-side event maps 1:1:
    snapshot_sender_files_sent_success   ← HttpWriter 200s (HttpWriter.kt:90-96)
    snapshot_sender_files_rejected       ← grammar rejects (HttpWriter.kt:121-127)
    snapshot_sender_blocked_topic_file_count ← FilterBlockedTopicsUtils.kt:24
    snapshot_sender_bytes_sent           ← payload volume
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame, observation_name: str, **named_conditions
) -> tuple[DataFrame, Observation]:
    """Attach counters to a plan: each kwarg is ``name=condition`` counted where
    the condition Column is true (None → count all rows). Returns the
    instrumented DataFrame and the Observation; read ``obs.get`` after the
    first action on the DataFrame."""
    obs = Observation(observation_name)
    aggs = [
        F.count(F.lit(1)).alias(name) if cond is None else F.count(F.when(cond, 1)).alias(name)
        for name, cond in named_conditions.items()
    ]
    return df.observe(obs, *aggs), obs


def observe_delivery(decrypted: DataFrame) -> tuple[DataFrame, Observation]:
    """The reference's delivery counter family, computed in-flight by the same
    job that runs the sink."""
    obs = Observation("delivery_metrics")
    instrumented = decrypted.observe(
        obs,
        F.count(F.lit(1)).alias("snapshot_sender_files_sent_success"),
        F.sum(F.length("decrypted")).alias("snapshot_sender_bytes_sent"),
        F.approx_count_distinct("topic").alias("snapshot_sender_topics_seen"),
    )
    return instrumented, obs


def push_to_gateway(
    counters: dict[str, float],
    job: str,
    grouping: dict[str, str],
    gateway: str = "localhost:9091",
) -> bool:
    """Pushgateway emission (PushGatewayServiceImpl.kt:22-53), gated on
    prometheus_client availability; returns False when the lib is absent."""
    try:
        from prometheus_client import CollectorRegistry, Gauge
        from prometheus_client import push_to_gateway as _push
    except ImportError:
        return False
    registry = CollectorRegistry()
    for name, value in counters.items():
        g = Gauge(name.replace(".", "_"), name, registry=registry)
        g.set(float(value))
    _push(gateway, job=job, registry=registry, grouping_key=grouping)
    return True
