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
        # Split sizing stays at the Spark defaults (128 MB / 4 MB), overridable
        # via env for other deployments. Round 13 measurement: the previous
        # local tuning (1 MB splits / 64 KB open cost) gave NO parallelism on
        # the single-row-group testdata parquet (a task only reads row groups
        # whose midpoint lands in its split → 1 real + ~30 empty tasks per
        # scan) and it fragmented the binaryFile source into under-packed
        # splits; at the defaults a lineitem scan-agg dropped 0.34s → 0.17s
        # and the delivery binaryFile scan 0.42s → 0.22s (min-of-4, local[32]).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "4m"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
