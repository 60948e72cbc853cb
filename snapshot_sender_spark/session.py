"""SparkSession factory.

Defaults are chosen for correctness-vs-oracle (UTC session timezone, ANSI off to
match the reference's permissive parsing) and for scale (AQE on, shuffle
partitions sized to cores locally — on a real cluster this is set to 2-3× total
executor cores; AQE coalescing then right-sizes each stage at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "snapshot_sender_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Match shuffle width to cores locally; AQE coalesces small stages.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Oracle comparison: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for all pandas-UDF / toPandas crossings.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch cap: the default 10k rows/batch is an OOM hazard for
        # binary-heavy rows (10k × 1 MB payloads = 10 GB per in-flight batch
        # in the decrypt UDF). 1024 keeps scalar-UDF vectorization efficiency
        # while bounding batch memory at file-payload widths.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # Local testdata files are ≤ ~10 MB: the 128 MB default split puts an
        # entire table in ONE scan task. 1 MB splits fan the scan across cores
        # while staying well above row-group size. On a real cluster this is
        # left at the 128 MB default (set SPARK_GRAFT_MAX_PARTITION_BYTES).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"),
        )
        .config("spark.sql.files.openCostInBytes", "64k")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
