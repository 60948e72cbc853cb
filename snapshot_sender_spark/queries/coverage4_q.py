"""Query batch 11: masking/formatting string functions, TRY_* null-safe
conversions, calendar-name date extracts, roaring-bitmap set intersection,
and hidden file-metadata provenance.

mask() is the built-in counterpart of text_pii_redact (NiFi-side payloads in
the reference carry PII-bearing Mongo documents, s3_files.py:40-75 — masking
is the delivery-time scrub); the TRY_ family is the engine-wide version of the
reference's permanent-vs-retryable error split (HttpKeyService.kt:61-70:
unparseable input is a permanent failure routed aside, not a crash)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "string_mask_format",
    oracle="""
    SELECT p_partkey,
           regexp_replace(regexp_replace(regexp_replace(
             p_name || '#' || CAST(p_partkey AS VARCHAR),
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
           format('{:,}', CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 100)
             || '.' ||
             lpad(CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) % 100
                  AS VARCHAR), 2, '0') AS price_fmt,
           printf('%s|%05d', p_brand, p_partkey) AS tagged,
           translate(p_type, 'aeiou', '#####') AS devoweled,
           left(p_name, 4) AS head4,
           right(p_name, 4) AS tail4
    FROM part WHERE p_partkey < 200
    """,
    category="scalar-string",
)
def string_mask_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masking + formatting family: mask() (upper→X / lower→x / digit→n,
    punctuation kept — the built-in PII scrub), format_number with thousands
    separators (exact on DECIMAL cents), format_string/printf, translate,
    left/right. The oracle rebuilds mask() from its regexp definition and
    format_number from integer cents — both engine-exact."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.expr("mask(p_name || '#' || CAST(p_partkey AS STRING))").alias("masked"),
        F.format_number(F.col("p_retailprice").cast("decimal(12,2)"), 2).alias("price_fmt"),
        F.format_string("%s|%05d", "p_brand", "p_partkey").alias("tagged"),
        F.translate("p_type", "aeiou", "#####").alias("devoweled"),
        F.expr("left(p_name, 4)").alias("head4"),
        F.expr("right(p_name, 4)").alias("tail4"),
    )


@query(
    "try_conversion_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(try_strptime('2024-' || lpad(CAST(1 + o_orderkey % 14 AS VARCHAR), 2, '0')
                             || '-15', '%Y-%m-%d') AS TIMESTAMP) AS maybe_date,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                     / (o_orderkey % 5) END AS per_unit,
           string_split(o_orderpriority, '-')[3] AS third_token,
           CAST(NULL AS BIGINT) AS overflowed,
           try_cast(CASE WHEN o_orderkey % 3 = 0 THEN 'x12' ELSE '123' END AS BIGINT)
             AS parsed_num
    FROM orders WHERE o_orderkey < 500
    """,
    category="scalar-try",
)
def try_conversion_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRY_ conversion family — malformed input yields NULL instead of a
    failed job (the engine-wide form of the reference's permanent-error
    routing): try_to_date on impossible months, try_divide by zero,
    try_element_at out of bounds, try_add on guaranteed BIGINT overflow,
    try_to_number on non-numeric text."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    mo = F.lpad((F.lit(1) + F.col("o_orderkey") % 14).cast("string"), 2, "0")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    return o.select(
        "o_orderkey",
        F.try_to_date(F.concat(F.lit("2024-"), mo, F.lit("-15")), "yyyy-MM-dd")
        .cast("timestamp")
        .alias("maybe_date"),
        F.try_divide(cents, F.col("o_orderkey") % 5).alias("per_unit"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3)).alias("third_token"),
        F.try_add(
            F.lit(9223372036854775807).cast("bigint"), F.col("o_orderkey") + 1
        ).alias("overflowed"),
        F.try_to_number(
            F.when(F.col("o_orderkey") % 3 == 0, "x12").otherwise("123"), F.lit("999")
        )
        .cast("bigint")
        .alias("parsed_num"),
    )


@query(
    "date_calendar_extracts",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%a') AS day_abbrev,
           strftime(o_orderdate, '%b') AS month_abbrev,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sunday1,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy
    FROM orders WHERE o_orderkey < 1000
    """,
    category="scalar-date",
)
def date_calendar_extracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-name/position extracts: dayname/monthname (locale-stable
    3-letter English), ISO week, day-of-week (aligned to Spark's 1=Sunday
    convention), quarter, day-of-year."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.expr("dayname(o_orderdate)").alias("day_abbrev"),
        F.expr("monthname(o_orderdate)").alias("month_abbrev"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.dayofweek("o_orderdate").cast("int").alias("dow_sunday1"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
    )


@query(
    "agg_bitmap_intersection",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_both_halves FROM (
      SELECT user_id FROM events WHERE day(ts) <= 15
      INTERSECT
      SELECT user_id FROM events WHERE day(ts) > 15
    )
    """,
    category="aggregation",
)
def agg_bitmap_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roaring-bitmap SET INTERSECTION via bitmap_and_agg: users active in
    BOTH halves of the month, computed as per-bucket bitmap AND — the partials
    are tiny OR/AND-mergeable bitmaps, so at 100 TB the shuffle carries
    kilobytes per bucket instead of one row per (user, half). Buckets seen in
    only one half contribute zero (AND over a single operand is that operand —
    guarded explicitly, matching true intersection semantics)."""
    e = load(spark, sf_dir, "events").select(
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
        F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("half"),
    )
    per_half = e.groupBy("bucket", "half").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    per_bucket = per_half.groupBy("bucket").agg(
        F.count("*").alias("n_halves"),
        F.expr("bitmap_count(bitmap_and_agg(bm))").alias("n_and"),
    )
    return per_bucket.select(
        F.sum(F.when(F.col("n_halves") == 2, F.col("n_and")).otherwise(0)).alias(
            "n_both_halves"
        )
    )


@query(
    "source_file_metadata",
    oracle="""
    SELECT 'nation.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM nation
    """,
    category="source",
)
def source_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hidden _metadata column on file sources: per-row provenance
    (file name) surfaced without any extra scan — the lineage hook a 100 TB
    pipeline uses to trace a bad record back to its input object (the
    reference carries the same provenance as fullPath on every item,
    DomainClasses.kt:10-32)."""
    n = load(spark, sf_dir, "nation")
    return n.select(F.col("_metadata.file_name").alias("file_name")).groupBy(
        "file_name"
    ).agg(F.count("*").alias("n_rows"))
