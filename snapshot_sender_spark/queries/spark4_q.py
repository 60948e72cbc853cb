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
           CAST(SUM(o_orderkey % 7) AS BIGINT) AS sum_mod
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
           CAST(SUM(CASE WHEN ok THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS sum_k
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
           CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
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


@query(
    "xml_from_xml_roundtrip",
    oracle=f"""
    SELECT c_nationkey AS nk,
           COUNT(*) AS n,
           {SQL_DSUM('c_acctbal')} AS total_bal,
           MAX(c_custkey) AS max_key
    FROM customer
    GROUP BY c_nationkey
    """,
    category="xml",
)
def xml_from_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion (Spark 4 native XML): serialize customer rows to XML with
    to_xml, parse back with from_xml against an explicit schema, aggregate the
    extracted typed fields. The raw-column oracle proves the XML round-trip is
    lossless — the schema-on-read contract for XML feeds, same shape as the
    VARIANT round-trip above."""
    c = load(spark, sf_dir, "customer")
    xml = c.select(
        F.to_xml(F.struct("c_custkey", "c_nationkey", "c_acctbal")).alias("x")
    )
    parsed = xml.select(
        F.from_xml("x", "c_custkey bigint, c_nationkey int, c_acctbal double").alias("r")
    ).select("r.*")
    return parsed.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n"),
        _from_cents(F.sum(_cents(F.col("c_acctbal"))), 2).alias("total_bal"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "xml_xpath_extract",
    oracle="""
    SELECT o_orderstatus AS status, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY o_orderstatus
    """,
    category="xml",
)
def xml_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction over XML text (xpath_string / xpath_long): the
    navigation API for XML payloads that arrive as strings — no schema pass,
    the XML analog of get_json_object."""
    o = load(spark, sf_dir, "orders")
    xml = o.select(
        F.concat(
            F.lit("<order><status>"),
            F.col("o_orderstatus"),
            F.lit("</status><key>"),
            F.col("o_orderkey").cast("string"),
            F.lit("</key></order>"),
        ).alias("x")
    )
    return (
        xml.select(
            F.xpath_string("x", F.lit("/order/status")).alias("status"),
            F.expr("xpath_long(x, '/order/key')").alias("key"),
        )
        .groupBy("status")
        .agg(F.count("*").alias("n"), F.sum("key").alias("key_sum"))
    )


@query(
    "string_collation_ci",
    oracle="""
    SELECT COUNT(CASE WHEN lower(pri_mixed) = '1-urgent' THEN 1 END) AS n_urgent_ci,
           COUNT(CASE WHEN pri_mixed = '1-URGENT' THEN 1 END) AS n_urgent_cs,
           COUNT(DISTINCT lower(pri_mixed)) AS n_distinct_ci,
           COUNT(DISTINCT pri_mixed) AS n_distinct_cs
    FROM (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                  ELSE lower(o_orderpriority) END AS pri_mixed
      FROM orders
    )
    """,
    category="string",
)
def string_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 collations): equality and DISTINCT
    under UTF8_LCASE vs the default binary collation, over a deterministically
    case-mangled column. Collation pushes case policy into the engine's
    comparators (joins, aggregates, sorts all honor it) instead of wrapping
    every predicate in lower() — at scale that keeps codegen'd comparisons
    and avoids materializing a second folded column. Oracle folds with
    lower(), the portable equivalent."""
    o = load(spark, sf_dir, "orders")
    mixed = o.select(
        F.when(F.col("o_orderkey") % 2 == 0, F.upper("o_orderpriority"))
        .otherwise(F.lower("o_orderpriority"))
        .alias("pri_mixed")
    )
    ci = F.collate(F.col("pri_mixed"), "UTF8_LCASE")
    return mixed.select(
        F.count(F.when(ci == "1-urgent", 1)).alias("n_urgent_ci"),
        F.count(F.when(F.col("pri_mixed") == "1-URGENT", 1)).alias("n_urgent_cs"),
        F.count_distinct(ci).alias("n_distinct_ci"),
        F.count_distinct(F.col("pri_mixed")).alias("n_distinct_cs"),
    )


@query(
    "sql_group_by_all",
    oracle="""
    SELECT n_regionkey, substring(n_name, 1, 1) AS initial,
           COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    GROUP BY ALL
    """,
    category="sql",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — every non-aggregate select item becomes a grouping key
    (identical syntax on both engines)."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_regionkey, substring(n_name, 1, 1) AS initial,
               COUNT(*) AS n, SUM(n_nationkey) AS key_sum
        FROM nation
        GROUP BY ALL
        """
    )


@query(
    "join_null_safe_eq",
    oracle="""
    SELECT COALESCE(CAST(a.k AS VARCHAR), 'NULL') AS k,
           COUNT(*) AS n_pairs,
           CAST(SUM(a.c_custkey + b.c_custkey) AS BIGINT) AS key_sum
    FROM (SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS k FROM customer WHERE c_custkey <= 300) a
    JOIN (SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS k FROM customer WHERE c_custkey <= 300) b
      ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY 1
    """,
    category="join",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=>): NULL keys match each other instead of
    dropping out — Spark plans this as a real equi-join (hash/sort-merge on
    the null-safe key), not a cross product with a filter. DuckDB spells it
    IS NOT DISTINCT FROM."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    keyed = c.select(
        "c_custkey",
        F.nullif((F.col("c_nationkey") % 5).cast("int"), F.lit(0)).alias("k"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    joined = a.join(b, F.col("a.k").eqNullSafe(F.col("b.k")))
    return joined.groupBy(
        F.coalesce(F.col("a.k").cast("string"), F.lit("NULL")).alias("k")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("a.c_custkey") + F.col("b.c_custkey")).alias("key_sum"),
    )


@query(
    "array_posexplode_ordinal",
    oracle="""
    SELECT pos, COUNT(*) AS n, COUNT(DISTINCT word) AS n_words
    FROM (
      SELECT unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      FROM documents
    )
    WHERE pos < 5
    GROUP BY pos
    """,
    category="array",
)
def array_posexplode_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — UNNEST WITH ORDINALITY: token position survives the
    flatten, here profiling the first five token positions across the corpus
    (position-dependent stats are the basis of positional n-gram models).
    DuckDB's generate_subscripts is 1-based; normalized to 0-based."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .filter(F.col("pos") < 5)
        .groupBy("pos")
        .agg(F.count("*").alias("n"), F.count_distinct("word").alias("n_words"))
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    SELECT vec_id AS id,
           127.0 / NULLIF(maxabs, 0.0) AS scale,
           CAST(CASE WHEN maxabs = 0 THEN 0 ELSE
             list_sum(list_transform(emb, x -> floor(x * (127.0 / maxabs)))) END AS BIGINT) AS qsum,
           CAST(CASE WHEN maxabs = 0 THEN 0 ELSE
             list_min(list_transform(emb, x -> floor(x * (127.0 / maxabs)))) END AS BIGINT) AS qmin,
           CAST(CASE WHEN maxabs = 0 THEN 0 ELSE
             list_max(list_transform(emb, x -> floor(x * (127.0 / maxabs)))) END AS BIGINT) AS qmax
    FROM (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      FROM embeddings
    )
    """,
    category="llm-multimodal",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native int8 embedding quantization (operators/similarity.py::
    quantize_int8_arrow, mapInArrow + vectorized numpy): per-vector symmetric
    scale 127/max|x|, floor-quantized — the compression step before ANN
    indexing / storage in a training-data pipeline. The per-vector digest
    (scale, sum, min, max of the quantized values) hash-matches DuckDB's
    list-lambda computation of the same grid, proving the Arrow kernel's
    arithmetic is bit-portable IEEE float64."""
    from ..operators.similarity import quantize_int8_arrow

    emb = load(spark, sf_dir, "embeddings")
    return quantize_int8_arrow(emb, "embedding", "vec_id")
