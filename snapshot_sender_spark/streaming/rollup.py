"""Incremental time-bucket rollup — a continuously-maintained aggregate table
(the "hypertable rollup" / continuous-aggregate pattern).

Each micro-batch computes *mergeable partials* (count, sum) for its rows'
time buckets and MERGEs them into a persistent rollup table keyed on
(bucket, event_type): existing partials for touched keys are summed with the
batch's, untouched keys pass through. Derived metrics (avg) come from the
partials at read time, so merges stay associative/commutative — the property
that makes the rollup restartable and backfillable.

Local storage is a parquet rewrite via atomic rename (the dependency-free
analog of Delta MERGE INTO); at scale the same foreachBatch body targets a
Delta/Iceberg table and the MERGE is keyed on the same bucket columns, with
the table partitioned by bucket date so each batch touches only recent
partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_SCHEMA = (
    "window_start timestamp, event_type string, n long, sum_value_cents long"
)


def load_rollup(spark: SparkSession, path: str) -> DataFrame:
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], ROLLUP_SCHEMA)


def batch_partials(batch_df: DataFrame, width: str) -> DataFrame:
    """Mergeable partial aggregates for one batch: count + integer-cent sum
    (exact, order-free — the package float policy)."""
    return (
        batch_df.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value_cents")
    )


def merge_rollup(spark: SparkSession, path: str, partials: DataFrame) -> None:
    """MERGE partials into the rollup: sum with existing rows per key, keep
    untouched keys. Atomic swap makes a crashed merge invisible."""
    merged = (
        load_rollup(spark, path)
        .unionByName(partials)
        .groupBy("window_start", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_value_cents").alias("sum_value_cents"))
    )
    rows = merged.collect()  # rollup is O(buckets × types): small by design
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(rows, ROLLUP_SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    old = f"{path}.old.{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def run_incremental_rollup(
    stream_df: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    width: str = "6 hours",
) -> DataFrame:
    """Drive the stream to completion (AvailableNow), merging each batch's
    partials into the rollup table; returns the final rollup with the derived
    average (exact partials → exact derived metric)."""
    spark = stream_df.sparkSession

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        merge_rollup(spark, rollup_path, batch_partials(batch_df, width))

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = load_rollup(spark, rollup_path)
    return out.select(
        "window_start",
        "event_type",
        "n",
        (F.col("sum_value_cents").cast("double") / 100.0).alias("sum_value"),
        (F.col("sum_value_cents").cast("double") / 100.0 / F.col("n").cast("double")).alias(
            "avg_value"
        ),
    )
