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


def _morton_key(df: DataFrame, xcol: str, ycol: str):
    """32-bit Morton (Z-order) key over two columns, min/max-normalized to
    16 bits each — pure JVM bitwise expressions (the same interleave as the
    oracle-checked ``layout_zorder_cluster`` query, plus range scaling so
    arbitrary integer domains fill the key space)."""
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(xcol).alias("xmin"), F.max(xcol).alias("xmax"),
        F.min(ycol).alias("ymin"), F.max(ycol).alias("ymax"),
    ).first()

    def scaled(col, lo, hi):
        span = max(1, int(hi) - int(lo))
        return (
            (F.col(col).cast("long") - F.lit(int(lo))) * F.lit(65535) / F.lit(span)
        ).cast("long")

    x = scaled(xcol, stats["xmin"], stats["xmax"])
    y = scaled(ycol, stats["ymin"], stats["ymax"])
    key = F.lit(0).cast("long")
    for i in range(16):
        key = key + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return key


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    zorder_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """Rewrite ``in_path`` (many small parquet files) into ``out_path`` with
    ~``target_file_bytes`` files. File count is planned from the INPUT byte
    size (compression ratio carries over within a rewrite of the same data);
    with ``sort_cols`` the rewrite range-partitions + sorts within files so
    per-file min/max stats prune point/range scans afterwards; with
    ``zorder_cols`` (two columns) it clusters on the Morton key instead, so
    min/max stats stay selective on BOTH columns at once — a linear sort is
    selective only on its leading column (asserted by test on footer stats).
    Returns the compacted DataFrame (lazy — the write has already happened)."""
    df = spark.read.parquet(in_path)
    total = _input_bytes(spark, in_path)
    n_files = plan_target_files(total, target_file_bytes)
    if zorder_cols:
        xcol, ycol = zorder_cols
        shaped = (
            df.withColumn("__zkey", _morton_key(df, xcol, ycol))
            .repartitionByRange(n_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    elif sort_cols:
        shaped = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        shaped = df.repartition(n_files)
    shaped.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
