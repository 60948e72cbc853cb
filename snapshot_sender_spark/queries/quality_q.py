"""Data-quality expectation queries (operators/quality.py): declarative
table-level checks — completeness, compliance, value ranges, key uniqueness,
referential integrity — evaluated single-pass and reported as exact integers,
so the whole report is DuckDB-verifiable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import (
    ForeignKey,
    completeness,
    compliance,
    primary_key,
    run_expectations,
    value_in_range,
)
from ..tables import load
from . import query


@query(
    "quality_expectations_report",
    oracle="""
    SELECT 'completeness_returnflag' AS check_name,
           CAST(COUNT(l_returnflag) AS BIGINT) AS observed,
           CAST(COUNT(*) AS BIGINT) AS total,
           COUNT(l_returnflag) >= COUNT(*) AS passed
    FROM lineitem
    UNION ALL
    SELECT 'compliance_qty_1_50',
           CAST(COUNT(*) FILTER (WHERE CAST(l_quantity AS BIGINT) BETWEEN 1 AND 50) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) FILTER (WHERE CAST(l_quantity AS BIGINT) BETWEEN 1 AND 50) >= COUNT(*)
    FROM lineitem
    UNION ALL
    SELECT 'min_qty_ge_1',
           CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT),
           CAST(NULL AS BIGINT),
           MIN(CAST(l_quantity AS BIGINT)) >= 1
    FROM lineitem
    UNION ALL
    SELECT 'max_qty_le_50',
           CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT),
           CAST(NULL AS BIGINT),
           MAX(CAST(l_quantity AS BIGINT)) <= 50
    FROM lineitem
    UNION ALL
    SELECT 'distinct_flags_eq_3',
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
           CAST(NULL AS BIGINT),
           COUNT(DISTINCT l_returnflag) = 3
    FROM lineitem
    UNION ALL
    SELECT 'pk_orderkey_linenumber',
           CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           COUNT(DISTINCT (l_orderkey, l_linenumber)) = COUNT(*)
    FROM lineitem
    UNION ALL
    SELECT 'fk_orderkey_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE l.l_orderkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey IS NOT NULL) AS BIGINT),
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) = 0
    """,
    category="data-quality",
)
def quality_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Deequ-style expectation suite over lineitem: six single-table
    checks computed in ONE aggregate pass (completeness, range compliance,
    bigint extrema bounds, distinct-cardinality, composite-key uniqueness)
    plus one referential-integrity check against orders (a single left-join
    aggregate). Every metric is an exact integer, so the full report —
    numerators, denominators, verdicts — cross-engine matches."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return run_expectations(
        spark,
        li,
        checks=[
            completeness("completeness_returnflag", "l_returnflag"),
            compliance("compliance_qty_1_50", "CAST(l_quantity AS BIGINT) BETWEEN 1 AND 50"),
            value_in_range("min_qty_ge_1", "MIN(CAST(l_quantity AS BIGINT))", lo=1),
            value_in_range("max_qty_le_50", "MAX(CAST(l_quantity AS BIGINT))", hi=50),
            value_in_range(
                "distinct_flags_eq_3", "COUNT(DISTINCT l_returnflag)", lo=3, hi=3
            ),
            primary_key("pk_orderkey_linenumber", "l_orderkey", "l_linenumber"),
        ],
        foreign_keys=[
            ForeignKey("fk_orderkey_orders", ("l_orderkey",), orders, ("o_orderkey",))
        ],
    )


@query(
    "quality_metrics_anomaly",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    ), t AS (
      SELECT COUNT(*) AS n_days, CAST(SUM(n) AS BIGINT) AS total FROM d
    )
    SELECT d.day, CAST(d.n AS BIGINT) AS n_events,
           (5 * d.n * t.n_days > 6 * t.total)
             OR (6 * d.n * t.n_days < 5 * t.total) AS is_anomaly
    FROM d, t
    """,
    category="data-quality",
)
def quality_metrics_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric anomaly detection over time (the other half of the Deequ
    design): the per-day row-count metric series is computed in one pass and
    each day is flagged when it deviates more than ±20% from the all-days
    mean — expressed as pure integer cross-multiplication
    (5·n·days > 6·total), so the verdicts are bit-deterministic cross-engine.
    At scale this runs per ingest batch against a persisted metric history;
    here the history is derived in the same plan."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count("*").alias("n")
    )
    t = d.agg(
        F.count("*").alias("n_days"), F.sum("n").cast("bigint").alias("total")
    )
    return d.crossJoin(F.broadcast(t)).select(
        "day",
        F.col("n").cast("bigint").alias("n_events"),
        (
            (F.lit(5) * F.col("n") * F.col("n_days") > F.lit(6) * F.col("total"))
            | (F.lit(6) * F.col("n") * F.col("n_days") < F.lit(5) * F.col("total"))
        ).alias("is_anomaly"),
    )


@query(
    "quality_gate_on_txlog_ingest",
    oracle="""
    WITH uniq AS (
      SELECT event_id FROM events GROUP BY event_id HAVING COUNT(*) = 1
    )
    SELECT e.event_type, COUNT(*) AS n_events,
           CAST(SUM(e.event_id) AS BIGINT) AS sum_event_id
    FROM events e JOIN uniq u ON u.event_id = e.event_id
    WHERE e.user_id IS NOT NULL
    GROUP BY e.event_type
    """,
    category="data-quality",
)
def quality_gate_on_txlog_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate composed with the transactional ingest: a batch is
    admitted to the txlog table only after its expectation suite passes —
    here the dirty slice (rows failing completeness or event_id uniqueness)
    is quarantined first, the CLEANED batch passes the gate and commits, and
    the admitted table equals the declarative filter the oracle expresses.
    The gate is the gatekeeper pattern Deequ documents: metrics first,
    commit second, so a bad producer can never poison the standing corpus."""
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import Window as W

    from ..operators.txlog import TxTable

    work = tempfile.mkdtemp(prefix="quality_gate_q_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    # the cleaned batch: drop null user_ids and any duplicated event_id
    cleaned = (
        ev.withColumn("__n", F.count("*").over(W.partitionBy("event_id")))
        .where(F.col("user_id").isNotNull() & (F.col("__n") == 1))
        .drop("__n")
    )
    report = run_expectations(
        spark,
        cleaned,
        checks=[
            completeness("user_id_complete", "user_id"),
            primary_key("event_id_unique", "event_id"),
        ],
    )
    if report.where(~F.col("passed")).take(1):
        raise AssertionError("quality gate rejected the cleaned batch")
    t = TxTable(spark, f"{work}/events_tx")
    t.append(cleaned.repartition(4), ts=1.0)
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
        )
    )
