"""Control-plane semantics: export-status table, collection status decision,
run-completion aggregate, success indicators, monitoring payload.

Reference: DynamoDB table UCExportToCrownStatus (environment.sh:37-52) driven by
DynamoDBExportStatusService.kt; completion branches in
JobCompletionNotificationListener.kt:31-58; success indicator
SuccessServiceImpl.kt:39-104; SNS payload SnsServiceImpl.kt:41-51.

Re-expression: the status table is a plain keyed DataFrame (parquet-backed
upsert via anti-join + union — the CDC/SCD pattern); FilesSent is *derived* by
aggregating the delivery manifest instead of incremented per file, which makes
it deterministic under retries (the reference's increment-then-marker ordering
at HttpWriter.kt:95-96 can double-count on crash — SURVEY.md §7 risk 3).
"""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATUS_SCHEMA = (
    "CorrelationId string, CollectionName string, CollectionStatus string, "
    "FilesExported int, FilesSent int"
)

# status sets (DynamoDBExportStatusService.kt:185-186)
SUCCESSFUL_STATUSES = ["Sent", "Received", "Success", "Table_Unavailable", "Blocked_Topic"]
FAILED_STATUSES = ["Export_Failed"]


def load_status(spark: SparkSession, path: str) -> DataFrame:
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], STATUS_SCHEMA)


def upsert_status(spark: SparkSession, path: str, updates: DataFrame) -> None:
    """MERGE-style upsert on (CorrelationId, CollectionName): anti-join existing
    against updates, union, rewrite. (Delta MERGE INTO is the cluster-scale
    version; parquet rewrite is the dependency-free local form.)"""
    existing = load_status(spark, path)
    keys = ["CorrelationId", "CollectionName"]
    merged = existing.join(updates.select(*keys), keys, "left_anti").unionByName(updates)
    merged_rows = merged.collect()  # control-plane table: O(collections), tiny
    spark.createDataFrame(merged_rows, STATUS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def sent_counts(manifest: DataFrame, correlation_id: str) -> DataFrame:
    """FilesSent per collection, derived from the delivery manifest
    (≡ DynamoDBExportStatusService.kt:38-44's increment, but as an aggregate)."""
    return manifest.groupBy("topic").agg(F.count("*").alias("FilesSent")).select(
        F.lit(correlation_id).alias("CorrelationId"),
        F.col("topic").alias("CollectionName"),
        F.col("FilesSent").cast("int"),
    )


def collection_status(status: DataFrame) -> DataFrame:
    """The reference's collection-status decision
    (DynamoDBExportStatusService.kt:113-141):
      Exported ∧ exported==sent ∧ sent>0 → Sent
      Exported ∧ exported==0 ∧ sent==0   → Received  (NO_FILES_EXPORTED, :121-131,:154)
      else                               → unchanged (IN_PROGRESS / Export_Failed)."""
    return status.withColumn(
        "CollectionStatus",
        F.when(
            (F.col("CollectionStatus") == "Exported")
            & (F.col("FilesExported") == F.col("FilesSent"))
            & (F.col("FilesSent") > 0),
            F.lit("Sent"),
        )
        .when(
            (F.col("CollectionStatus") == "Exported")
            & (F.col("FilesExported") == 0)
            & (F.col("FilesSent") == 0),
            F.lit("Received"),
        )
        .otherwise(F.col("CollectionStatus")),
    )


def completion_status(status: DataFrame) -> DataFrame:
    """Run-completion ALL/ANY aggregate (DynamoDBExportStatusService.kt:79-102):
    all successful → COMPLETED_SUCCESSFULLY; any Export_Failed →
    COMPLETED_UNSUCCESSFULLY; else NOT_COMPLETED."""
    agg = status.groupBy("CorrelationId").agg(
        F.bool_and(F.col("CollectionStatus").isin(SUCCESSFUL_STATUSES)).alias("all_ok"),
        F.bool_or(F.col("CollectionStatus").isin(FAILED_STATUSES)).alias("any_failed"),
    )
    return agg.select(
        "CorrelationId",
        F.when(F.col("all_ok"), "COMPLETED_SUCCESSFULLY")
        .when(F.col("any_failed"), "COMPLETED_UNSUCCESSFULLY")
        .otherwise("NOT_COMPLETED")
        .alias("completion_status"),
    )


def write_success_indicator(output_dir: str, topic: str) -> str:
    """Zero-byte gzip `_<database>_<collection>_successful.gz`
    (SuccessServiceImpl.kt:95-104; topic parse :97-98 strips optional db. prefix)."""
    parts = topic.split(".")
    if parts[0] == "db" and len(parts) >= 3:
        database, collection = parts[1], ".".join(parts[2:])
    else:
        database, collection = parts[0], ".".join(parts[1:])
    name = f"_{database}_{collection}_successful.gz"
    path = os.path.join(output_dir, name)
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0):
        pass
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())
    return path


# SendingCompletionStatus.kt:3-7 — enum constant → description string
COMPLETION_DESCRIPTIONS = {
    "COMPLETED_SUCCESSFULLY": "success",
    "COMPLETED_UNSUCCESSFULLY": "failed",
    "NOT_COMPLETED": "in progress",
}


def monitoring_severity(completion_status: str) -> str:
    """SnsServiceImpl.kt:53-61: COMPLETED_SUCCESSFULLY → Critical, else High."""
    return "Critical" if completion_status == "COMPLETED_SUCCESSFULLY" else "High"


def monitoring_notification_type(completion_status: str) -> str:
    """SnsServiceImpl.kt:63-71: COMPLETED_UNSUCCESSFULLY → Error, else Information."""
    return "Error" if completion_status == "COMPLETED_UNSUCCESSFULLY" else "Information"


def monitoring_message(
    correlation_id: str,
    export_date: str,
    snapshot_type: str,
    status: str,
) -> str:
    """SNS monitoring JSON payload, field-for-field the reference's
    (SnsServiceImpl.kt:41-51): severity/notification_type derived from the
    completion status (:53-70), slack_username "Snapshot Sender", title
    "{SnapshotType} - All files sent - {status description}", and exactly two
    custom elements (Export date, Correlation Id). Skipped upstream when
    export_date == 'NIFI_HEARTBEAT' (JobCompletionNotificationListener.kt:60-75).

    Kotlin's String.capitalize() uppercases only the first char and leaves the
    rest intact ("full"→"Full", "fullExport"→"FullExport"); Python's
    str.capitalize() would lowercase the tail, so slice explicitly."""
    snapshot_cap = snapshot_type[:1].upper() + snapshot_type[1:]
    description = COMPLETION_DESCRIPTIONS[status]
    return json.dumps(
        {
            "severity": monitoring_severity(status),
            "notification_type": monitoring_notification_type(status),
            "slack_username": "Snapshot Sender",
            "title_text": f"{snapshot_cap} - All files sent - {description}",
            "custom_elements": [
                {"key": "Export date", "value": export_date},
                {"key": "Correlation Id", "value": correlation_id},
            ],
        }
    )
