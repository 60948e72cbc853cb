"""Query batch 8: corrupt-record handling — the PERMISSIVE schema-on-read
policy (SURVEY.md §1.2: from_json + _corrupt_record) proven over deterministic
corruption injected into the events.props JSON column."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "json_corrupt_handling",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN json_valid(maybe_bad) THEN 1 END) AS n_valid,
           COUNT(CASE WHEN NOT json_valid(maybe_bad) THEN 1 END) AS n_corrupt,
           CAST(SUM(CASE WHEN json_valid(maybe_bad)
                         THEN CAST(json_extract_string(maybe_bad, '$.k') AS INT) END) AS BIGINT)
             AS sum_valid_k
    FROM (
      SELECT event_type,
             CASE WHEN event_id % 7 = 0
                  THEN substring(props, 1, length(props) - 2)   -- truncated JSON
                  ELSE props END AS maybe_bad
      FROM events
    )
    GROUP BY event_type
    """,
    category="scalar-json",
)
def json_corrupt_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 7th record's JSON is truncated; the permissive parse turns those
    into NULL structs (counted as corrupt) while valid rows keep flowing —
    no task failure, exactly the reference's reject-don't-crash posture
    (HttpWriter.kt:121-127 at the record level)."""
    e = load(spark, sf_dir, "events")
    maybe_bad = F.when(
        F.col("event_id") % 7 == 0,
        F.expr("substring(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    parsed = e.select(
        "event_type", maybe_bad.alias("maybe_bad"), F.from_json(maybe_bad, "k INT").alias("p")
    )
    # PERMISSIVE from_json yields a struct of NULL fields (not a NULL struct)
    # for malformed input — validity is judged on the parsed field
    is_valid = F.col("p.k").isNotNull()
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(F.when(is_valid, 1)).alias("n_valid"),
        F.count(F.when(~is_valid, 1)).alias("n_corrupt"),
        F.sum(F.when(is_valid, F.col("p.k"))).cast("bigint").alias("sum_valid_k"),
    )
