"""Spark 4.1 SQL-surface queries: pipe syntax, approx_top_k, SQL UDFs
(scalar + table), lateral correlated subqueries, parameterized SQL.

These widen the declared engine surface (SURVEY §2B "Modern SQL") with the
remaining Spark 4.x SQL features a reference user migrating query workloads
would expect. Each is oracle-checked against DuckDB on the same tables; where
the feature is Spark-only syntax (pipe operators, SQL UDF definitions) the
oracle states the equivalent ANSI form, proving the sugar changes nothing
semantically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load, register_views
from . import query
from .relational import SQL_DSUM


@query(
    "sql_pipe_syntax",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {SQL_DSUM('l_extendedprice')} AS sum_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    category="sql",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, SPIP SPARK-41631): the Q1-shaped scan →
    filter → extend → aggregate → project chain written as |> stages. Pipe
    operators compile to the identical logical plan as the nested-SELECT form
    (the oracle) — pure syntax, so every Catalyst optimization (pushdown,
    partial agg) applies unchanged. The integer-cents pattern keeps the money
    sum bit-deterministic across engines."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
        |> EXTEND CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  AS price_cents
        |> AGGREGATE COUNT(*) AS n, SUM(price_cents) AS cents
                  GROUP BY l_returnflag, l_linestatus
        |> EXTEND CAST(CAST(cents AS DECIMAL(38,6)) / 100 AS DOUBLE) AS sum_price
        |> DROP cents
        """
    )


@query(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type ORDER BY cnt DESC LIMIT 3
    """,
    category="agg",
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k (Spark 4.1): heavy-hitters sketch over event_type. With
    cardinality far below maxItemsTracked (default 10k) the sketch degenerates
    to exact counts, so the top-3 hash-matches the exact GROUP BY/LIMIT oracle
    (count gaps in the fixture ensure no tie straddles the k boundary). At
    100 TB the sketch is the point: a bounded-memory map-side combine instead
    of a full shuffle of every distinct key."""
    register_views(spark, sf_dir)
    return (
        spark.sql("SELECT approx_top_k(event_type, 3) AS tk FROM events")
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
    )


@query(
    "sql_scalar_udf",
    oracle=f"""
    SELECT CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'big' END AS band,
           COUNT(*) AS n,
           {SQL_DSUM('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY 1
    """,
    category="sql",
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (Spark 4.1 CREATE FUNCTION ... RETURN expr): reusable
    catalog-level expressions that inline into the plan at analysis time —
    still whole-stage-codegen'd JVM expressions, unlike Python UDFs (no
    serialization boundary). The oracle states the hand-inlined form; equality
    proves the UDF indirection is free."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_cents(p DOUBLE)
        RETURNS BIGINT RETURN CAST(CAST(p AS DECIMAL(12,2)) * 100 AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE)
        RETURNS STRING RETURN CASE WHEN q < 10 THEN 'small'
                                   WHEN q < 30 THEN 'mid'
                                   ELSE 'big' END
        """
    )
    return spark.sql(
        """
        SELECT qty_band(l_quantity) AS band,
               COUNT(*) AS n,
               CAST(CAST(SUM(price_cents(l_extendedprice)) AS DECIMAL(38,6)) / 100
                    AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY 1
        """
    )


@query(
    "sql_table_udf",
    oracle="""
    SELECT r.r_name, g.x AS slot, r.r_regionkey * 10 + g.x AS slot_id
    FROM region r
    JOIN (SELECT * FROM (VALUES (1),(2),(3),(4),(5)) t(x)) g
      ON g.x <= r.r_regionkey + 1
    """,
    category="sql",
)
def sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table functions (CREATE FUNCTION ... RETURNS TABLE): a correlated
    lateral table-function call — each region row invokes small_seq(k) and
    cross-joins its output, the SQL-native UDTF shape (generator semantics
    like the reference's one-file→many-outputs fan-out, HttpWriter.kt:96
    marker-per-delivery). DuckDB lacks SQL table UDFs, so the oracle inlines
    the VALUES body with the correlation as a join predicate."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION small_seq(n INT) RETURNS TABLE(x INT)
        RETURN SELECT x FROM VALUES (1),(2),(3),(4),(5) t(x) WHERE x <= n
        """
    )
    return spark.sql(
        """
        SELECT r.r_name, s.x AS slot, r.r_regionkey * 10 + s.x AS slot_id
        FROM region r, LATERAL small_seq(CAST(r.r_regionkey AS INT) + 1) s
        """
    )


@query(
    "join_lateral_topk",
    oracle="""
    SELECT n_name, o_orderkey, o_totalprice FROM (
      SELECT n.n_name, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY n.n_nationkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM nation n
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
    category="join",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY/LIMIT: top-3 orders per
    nation written as a lateral per-row subquery (the "for each outer row,
    run this parameterized query" shape — the reference's per-topic status
    lookup, DynamoDBExportStatusService.kt:134-141, is this pattern). Spark
    decorrelates it into a join + per-group limit; the oracle is the
    equivalent window-function rewrite, proving the decorrelation exact.
    Deterministic tie-break on o_orderkey."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, t.o_totalprice
        FROM nation n JOIN LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 3
        ) t ON TRUE
        """
    )


@query(
    "stream_list_state_recent",
    oracle="""
    SELECT user_id, CAST(rn AS INT) AS rn, event_id FROM (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
    category="streaming",
)
def stream_list_state_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed ListState (state v2): a bounded last-3-events buffer per user,
    truncated on every update so per-key state stays O(k) forever — the
    recency-window shape that a full window-function rewrite would need
    unbounded state for on a stream. Single-batch replay makes the final
    emission equal the batch window-function oracle. Runs on
    transformWithStateInPandas when protobuf is present, else the identical
    fold on applyInPandasWithState (array-typed state tuple)."""
    from ..streaming import windows as sw
    from ..streaming.twstate import recent_events_transform

    events = sw.read_events_stream(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("tsu"), "event_id"
    )
    return sw.run_to_memory(recent_events_transform(events), "update")


@query(
    "stream_map_state_counts",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
    """,
    category="streaming",
)
def stream_map_state_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed MapState (state v2): per-user map of event_type → running count —
    a keyed sub-map per stream key, the reference's per-label metric counters
    (MetricsConfiguration.kt:20-93) held as incremental state instead of a
    re-aggregation. Emits the full current map each batch; single-batch
    replay makes that the grouped-count oracle."""
    from ..streaming import windows as sw
    from ..streaming.twstate import type_counts_transform

    events = sw.read_events_stream(spark, sf_dir).select("user_id", "event_type")
    return sw.run_to_memory(type_counts_transform(events), "update")


@query(
    "sql_params_bound",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n, {SQL_DSUM('o_totalprice')} AS total
    FROM orders
    WHERE o_totalprice >= 150000.0 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    category="sql",
)
def sql_params_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (spark.sql(query, args=...)): named :placeholders
    bound server-side as literals — injection-safe plan templates (the
    reference's correlation_id/topic run parameters, PropertyUtility.kt:5-11,
    are exactly this kind of run-scoped binding). Constant-folded into the
    plan, so partition pruning and pushdown see the literal values."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS n, {SQL_DSUM('o_totalprice')} AS total
        FROM orders
        WHERE o_totalprice >= :minp AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"minp": 150000.0, "status": "F"},
    )
