"""Scalable pure-range (interval ⋈ point) join via bucket binning.

A range predicate with NO equi key plans as BroadcastNestedLoopJoin in Spark —
O(|A|·|B|) compared pairs, which does not survive scale-up. The standard fix
(what Databricks' RANGE_JOIN hint does internally) is to bin the range domain:
explode each interval into the fixed-width buckets it covers, bucket each
point, and join on bucket equality + the exact range refinement. The join
becomes an equi shuffle/hash join; each (point, interval) candidate pair meets
exactly once (in the point's bucket), so no post-join dedup is needed.

Bucket width is the recall/cost dial: ≈ the median interval length keeps the
explode factor ~2× while making candidate lists short.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join_binned(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_width_s: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` whose ``ts_col`` falls in [start, end] of
    ``intervals`` rows, with an equi-keyed physical plan.

    Returns the joined DataFrame (all columns from both sides minus the
    internal bucket key). Timestamps compare at microsecond precision.
    """
    width_us = int(bucket_width_s) * 1_000_000
    b_iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / width_us).cast("long"),
                F.floor(F.unix_micros(F.col(end_col)) / width_us).cast("long"),
            )
        ),
    )
    b_pt = points.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(ts_col)) / width_us).cast("long")
    )
    joined = b_iv.join(
        b_pt,
        (b_iv["_bucket"] == b_pt["_bucket"])
        & (b_pt[ts_col] >= b_iv[start_col])
        & (b_pt[ts_col] <= b_iv[end_col]),
        how,
    )
    return joined.drop("_bucket")
