"""Streaming reads FROM the txlog table (sources/txlog_stream.py): version
offsets, restart-delta semantics, NULL backfill, non-append handling."""

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import TxTable
from snapshot_sender_spark.sources.txlog_stream import register


@pytest.fixture()
def table(spark, tmp_path):
    register(spark)
    t = TxTable(spark, str(tmp_path / "tab"))
    t.append(spark.range(0, 10).withColumn("g", F.col("id") % 3).coalesce(2), ts=1.0)
    t.append(spark.range(10, 25).withColumn("g", F.col("id") % 3).coalesce(1), ts=2.0)
    return t


def _run(spark, t, out, ckpt, **opts):
    r = spark.readStream.format("txlog_stream").option("path", t.path)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.awaitTermination()


def test_streams_full_history_then_only_deltas(spark, tmp_path, table):
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _run(spark, table, out, ckpt)
    assert spark.read.parquet(str(out)).count() == 25
    # restart after one more commit: ONLY the delta is emitted
    table.append(spark.range(25, 28).withColumn("g", F.lit(0).cast("long")).coalesce(1), ts=3.0)
    _run(spark, table, out, ckpt)
    got = spark.read.parquet(str(out))
    assert got.count() == 28
    assert got.select(F.sum("id")).collect()[0][0] == sum(range(28))
    # nothing new: an empty run, not a re-emission
    _run(spark, table, out, ckpt)
    assert spark.read.parquet(str(out)).count() == 28


def test_schema_evolution_backfills_null_for_old_files(spark, tmp_path, table):
    table.append(
        spark.range(25, 30)
        .withColumn("g", F.col("id") % 3)
        .withColumn("tag", F.lit("x"))
        .coalesce(1),
        ts=3.0,
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _run(spark, table, out, ckpt)
    got = spark.read.parquet(str(out))
    assert got.columns == ["id", "g", "tag"]
    assert got.where("tag IS NULL").count() == 25
    assert got.where("tag = 'x'").count() == 5


def test_non_append_commit_fails_unless_ignored(spark, tmp_path, table):
    table.delete_where("id = 0", ts=3.0)
    with pytest.raises(Exception, match="delete"):
        _run(spark, table, tmp_path / "out", tmp_path / "ckpt")
    # ignore_changes=true skips the rewrite commit entirely: the stream is an
    # append-only projection (both the deleted row and the rewrite invisible)
    _run(spark, table, tmp_path / "out2", tmp_path / "ckpt2", ignore_changes="true")
    assert spark.read.parquet(str(tmp_path / "out2")).count() == 25


def test_vacuumed_history_fails_loudly_at_planning(spark, tmp_path, table):
    table.overwrite(spark.range(0, 3).withColumn("g", F.lit(1).cast("long")).coalesce(1), ts=3.0)
    table.vacuum(retain_versions=1, min_age_s=0)
    with pytest.raises(Exception, match="vacuum"):
        _run(spark, table, tmp_path / "out", tmp_path / "ckpt", ignore_changes="true")


def test_starting_version_skips_history(spark, tmp_path, table):
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _run(spark, table, out, ckpt, starting_version="1")
    got = spark.read.parquet(str(out))
    assert got.count() == 15  # only v2's rows
    assert got.select(F.min("id")).collect()[0][0] == 10
