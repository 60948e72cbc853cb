"""Skew-mitigation operators.

AQE's skew-join split handles joins automatically; for heavily skewed
*aggregations* (few hot keys, e.g. per-topic counters where one topic carries
most of the traffic — the reference's integration workload is exactly one hot
topic, s3_files.py:25), the standard remedy is salting: explode the hot key
across N salt buckets, aggregate per (key, salt), then reduce per key. Two
shuffles of small data instead of one shuffle funnelled into a single task.

Result-identical to the plain aggregation (sums/counts are commutative), so a
salted query shares its plain-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name → (reduce_fn_name, partial_expr) where
    reduce_fn_name ∈ {"sum", "min", "max"} re-combines the per-salt partials
    (count partials re-combine with sum)."""
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    reducers = {"sum": F.sum, "min": F.min, "max": F.max}
    final = partial.groupBy(*key_cols).agg(
        *[reducers[fn](f"__p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )
    return final
