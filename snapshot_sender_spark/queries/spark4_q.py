"""Spark 4 native-surface queries: VARIANT semi-structured type, the Python
DataSource API, and transformWithStateInPandas arbitrary state.

These generalize reference behaviors onto Spark 4's first-class APIs:
* the payload's schema-on-read JSON documents (s3_files.py:40-75, parsed
  nowhere in the reference — SURVEY §1.2) → VARIANT parse + typed path
  extraction instead of per-query from_json schemas;
* the S3 snapshot listing source (S3DirectoryReader.kt:31-98) → a pluggable
  ``DataSource`` with per-topic partitions and topic-filter pushdown;
* the incremental FilesSent counter (DynamoDBExportStatusService.kt:38-44) →
  a transformWithStateInPandas processor holding typed ValueState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query
from .relational import SQL_DSUM, _cents, _from_cents


@query(
    "json_variant_extract",
    oracle=f"""
    SELECT o_orderpriority AS pri,
           COUNT(*) AS n,
           {SQL_DSUM('o_totalprice')} AS total_price,
           MAX(o_orderkey) AS max_id,
           SUM(o_orderkey % 7) AS sum_mod
    FROM orders
    GROUP BY o_orderpriority
    """,
    category="json",
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip orders rows through VARIANT: serialize each row to a nested
    JSON document (the payload shape of s3_files.py:40-75 — nested structs +
    arrays), parse with parse_json into a VARIANT column, then extract typed
    values back out with variant_get paths (nested field, array index) and
    aggregate. The oracle computes the same aggregate on the raw columns —
    equality proves the VARIANT round-trip is lossless and the typed path
    extraction is exact. VARIANT keeps one binary-encoded column scan at
    100 TB instead of N per-query from_json re-parses of the JSON text."""
    o = load(spark, sf_dir, "orders")
    doc = o.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("id"),
                F.struct(
                    F.col("o_orderpriority").alias("pri"),
                    F.col("o_totalprice").alias("price"),
                ).alias("meta"),
                F.array("o_custkey", F.col("o_orderkey") % 7).alias("arr"),
            )
        ).alias("js")
    )
    v = doc.select(F.parse_json("js").alias("v"))
    typed = v.select(
        F.variant_get("v", "$.meta.pri", "string").alias("pri"),
        F.variant_get("v", "$.meta.price", "double").alias("price"),
        F.variant_get("v", "$.id", "long").alias("id"),
        F.variant_get("v", "$.arr[1]", "long").alias("mod7"),
    )
    return typed.groupBy("pri").agg(
        F.count("*").alias("n"),
        _from_cents(F.sum(_cents(F.col("price"))), 2).alias("total_price"),
        F.max("id").alias("max_id"),
        F.sum("mod7").alias("sum_mod"),
    )


@query(
    "json_variant_try_parse",
    oracle="""
    SELECT CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           SUM(CASE WHEN ok THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                    ELSE 0 END) AS sum_k
    FROM (
      SELECT event_id % 10 <> 0 AS ok, props FROM events
    )
    """,
    category="json",
)
def json_variant_try_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_parse_json over a corrupted JSON column (every 10th event's props is
    truncated — same deterministic injection as json_corrupt_handling): bad
    rows become NULL VARIANT instead of failing the query; good rows extract
    typed fields. The malformed-payload policy of the reference's parse path
    (Gson validation, SnapshotSenderIntegrationTest.kt:96-100) without a
    Python round-trip."""
    e = load(spark, sf_dir, "events")
    maybe_bad = F.when(
        F.col("event_id") % 10 == 0,
        F.expr("substring(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    v = e.select(F.try_parse_json(maybe_bad).alias("v"))
    return v.select(
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_valid"),
        F.sum(F.coalesce(F.try_variant_get("v", "$.k", "long"), F.lit(0))).alias(
            "sum_k"
        ),
    )


@query(
    "source_python_datasource",
    oracle=None,  # set below — needs the generator's SQL, see _set_pyds_oracle
    category="source",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the ``snapshot_listing`` Python DataSource (sources/pyds.py — the
    reference's S3 listing as a pluggable DSv2 source with per-topic input
    partitions and topic-filter pushdown) and aggregate per topic. The oracle
    reproduces the deterministic listing with generate_series, so the hash
    match verifies the source's full row universe, not just counts."""
    from ..sources import pyds

    pyds.register(spark)
    listing = (
        spark.read.format("snapshot_listing").option("files_per_topic", "40").load()
    )
    return listing.groupBy("topic", "database", "collection").agg(
        F.count("*").alias("n_files"),
        F.sum("size_bytes").alias("total_bytes"),
        F.max("fileName").alias("last_file"),
    )


def _set_pyds_oracle() -> None:
    """Attach the generator-equivalent oracle (built from the same TOPICS
    constant the source uses, so they cannot drift apart)."""
    from . import REGISTRY, QueryDef
    from ..sources import pyds

    inner = pyds.oracle_listing_sql(files_per_topic=40)
    sql = f"""
    SELECT topic, database, collection,
           COUNT(*) AS n_files,
           SUM(size_bytes) AS total_bytes,
           MAX(fileName) AS last_file
    FROM ({inner})
    GROUP BY topic, database, collection
    """
    qd = REGISTRY["source_python_datasource"]
    REGISTRY["source_python_datasource"] = QueryDef(
        name=qd.name, fn=qd.fn, oracle=sql, category=qd.category
    )


_set_pyds_oracle()


@query(
    "stream_transform_with_state",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
    category="streaming",
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing on the transformWithStateInPandas API
    (the successor to applyInPandasWithState): a StatefulProcessor holding a
    typed ValueState row (count, integer-cent sum, max) per user_id — the
    reference's incremental per-collection FilesSent counter
    (DynamoDBExportStatusService.kt:38-44) generalized to composite running
    aggregates. The testdata replays as one micro-batch, so update-mode
    emissions equal the final state — the grouped-aggregate oracle.
    Multi-batch state carry-over is exercised in tests/test_spark4.py.

    The state-v2 Python worker needs google.protobuf (not in this container);
    without it the same processor semantics run on applyInPandasWithState —
    one code path per API, one output contract, chosen at runtime."""
    from ..streaming import windows as sw
    from ..streaming.twstate import running_stats_transform

    events = sw.read_events_stream(spark, sf_dir).withColumn(
        "cents", F.floor(F.col("value") * 100).cast("long")
    )
    return sw.run_to_memory(running_stats_transform(events), "update")
