"""Storage-layout maintenance: small-file compaction.

The reference's output is one object per input file (HttpWriter.kt:72-81 —
100k exports → 100k objects); at 100 TB a downstream reader of such a prefix
pays per-file open/list costs that dwarf the scan. Compaction rewrites a
directory of small parquet files into ~target-sized files (optionally
sort-clustered so min/max row-group stats stay selective — the same motivation
as the z-order query in queries/scale_q.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def plan_target_files(total_bytes: int, target_file_bytes: int) -> int:
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def _input_bytes(spark: SparkSession, path: str) -> int:
    """Sum the byte size of the .parquet files under ``path`` through the
    Hadoop FileSystem API, so sizing works for any supported URI scheme
    (file://, s3a://, hdfs://) — not just the local filesystem. A silent 0
    here would compact the whole dataset into one file (see plan_target_files),
    so an empty/missing input raises instead."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(".parquet"):
            total += status.getLen()
    if total == 0:
        raise ValueError(f"no parquet bytes found under {path!r}")
    return total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``in_path`` (many small parquet files) into ``out_path`` with
    ~``target_file_bytes`` files. File count is planned from the INPUT byte
    size (compression ratio carries over within a rewrite of the same data);
    with ``sort_cols`` the rewrite range-partitions + sorts within files so
    per-file min/max stats prune point/range scans afterwards. Returns the
    compacted DataFrame (lazy — the write has already happened)."""
    df = spark.read.parquet(in_path)
    total = _input_bytes(spark, in_path)
    n_files = plan_target_files(total, target_file_bytes)
    if sort_cols:
        shaped = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        shaped = df.repartition(n_files)
    shaped.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
