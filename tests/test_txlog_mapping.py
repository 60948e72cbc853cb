"""Non-additive schema evolution via column mapping (operators/txlog.py):
metadata-only rename/drop — physical parquet names never change, so no
rewrite; dropped data never resurrects; pruning, lifecycle ops, CDF and the
stream source all speak logical names."""

import os

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import TxError, TxTable


def _mk(spark, tmp_path, name, **kw):
    return TxTable(spark, str(tmp_path / name), **kw)


def test_rename_is_metadata_only_and_reads_old_data(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_ren")
    t.append(spark.range(0, 10).withColumn("amount", F.col("id") * 2).coalesce(1), ts=1.0)
    files_before = set(t.snapshot().live_paths())
    v = t.rename_column("amount", "value_cents", ts=2.0)
    assert v == 2
    assert set(t.snapshot().live_paths()) == files_before  # zero rewrites
    got = t.read()
    assert got.columns == ["id", "value_cents"]
    assert {r["id"]: r["value_cents"] for r in got.collect()} == {i: 2 * i for i in range(10)}
    # time travel still shows the OLD logical name
    assert t.read(version=1).columns == ["id", "amount"]
    # appends under the new name land in the same physical column
    t.append(spark.range(10, 13).withColumn("value_cents", F.col("id") * 2).coalesce(1), ts=3.0)
    assert t.read().where("value_cents = 24").count() == 1
    # the parquet files carry the PHYSICAL name
    import pyarrow.parquet as pq

    newest = max(t.snapshot().live_paths())
    assert "amount" in pq.ParquetFile(os.path.join(t.path, newest)).schema_arrow.names


def test_rename_back_restores_identity_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_ren_back")
    t.append(spark.range(0, 5).withColumn("a", F.col("id")).coalesce(1), ts=1.0)
    t.rename_column("a", "b", ts=2.0)
    assert t.snapshot().mapping == {"b": "a"}
    t.rename_column("b", "a", ts=3.0)
    assert t.snapshot().mapping == {}  # identity again: no mapping entry
    assert t.read().columns == ["id", "a"]


def test_rename_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_ren_no", partition_by=("g",))
    t.append(
        spark.range(0, 6).withColumn("g", (F.col("id") % 2).cast("int")).coalesce(1),
        ts=1.0,
    )
    t.set_constraint("pos", "id >= 0", ts=2.0)
    with pytest.raises(TxError, match="partition column"):
        t.rename_column("g", "grp")
    with pytest.raises(TxError, match="constraint"):
        t.rename_column("id", "ident")
    with pytest.raises(TxError, match="already exists"):
        t.rename_column("g", "id")
    with pytest.raises(TxError, match="no column"):
        t.rename_column("zzz", "yyy")


def test_drop_column_and_no_resurrection_on_readd(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_drop")
    t.append(
        spark.range(0, 6).withColumn("secret", F.lit("s").cast("string")).coalesce(1),
        ts=1.0,
    )
    files_before = set(t.snapshot().live_paths())
    t.drop_column("secret", ts=2.0)
    assert set(t.snapshot().live_paths()) == files_before  # metadata-only
    assert t.read().columns == ["id"]
    assert t.snapshot().retired == ("secret",)
    # re-adding a column with the SAME logical name maps to a fresh physical:
    # the old files' values must NOT come back
    t.append(
        spark.range(6, 9).withColumn("secret", F.lit("new").cast("string")).coalesce(1),
        ts=3.0,
    )
    got = {r["id"]: r["secret"] for r in t.read().collect()}
    assert all(got[i] is None for i in range(6))      # old rows: NULL, not 's'
    assert all(got[i] == "new" for i in range(6, 9))  # new rows: new values
    snap = t.snapshot()
    assert snap.mapping["secret"].startswith("secret#")  # fresh physical
    # time travel to v1 still shows the original values
    assert t.read(version=1).where("secret = 's'").count() == 6
    with pytest.raises(TxError, match="last column"):
        t2 = _mk(spark, tmp_path, "t_drop_last")
        t2.append(spark.range(0, 3).coalesce(1), ts=1.0)
        t2.drop_column("id")


def test_lifecycle_ops_after_rename(spark, tmp_path):
    """COW/MOR delete, merge, compact, CDF and history all work on the
    renamed logical schema, and pruning uses the physical stats."""
    t = _mk(spark, tmp_path, "t_ren_life")
    t.append(
        spark.range(0, 40).withColumn("amt", F.col("id") * 10).repartitionByRange(4, "id"),
        ts=1.0,
    )
    t.rename_column("amt", "cents", ts=2.0)
    # stats pruning on the RENAMED column (footer stats key on the physical)
    kept = t.candidate_files(prune=[("cents", 0, 95)])
    assert 0 < len(kept) < len(t.snapshot().live_paths())
    a = sorted(r["id"] for r in t.read(prune=[("cents", 0, 95)]).where("cents <= 95").collect())
    assert a == list(range(10))
    t.delete_where("cents >= 350", ts=3.0, mode="cow")
    t.delete_where("cents < 20", ts=4.0, mode="mor")
    assert t.read().count() == 33
    t.merge(
        spark.createDataFrame([(5, 999), (100, 1)], "id long, cents bigint").coalesce(1),
        keys=["id"], ts=5.0, mode="mor",
    )
    got = {r["id"]: r["cents"] for r in t.read().collect()}
    assert got[5] == 999 and got[100] == 1 and len(got) == 34
    t.compact(target_files=1, ts=6.0)
    assert {r["id"]: r["cents"] for r in t.read().collect()} == got
    # CDF under the target (renamed) schema
    dels = t.row_changes(2, 4).where("_change_type = 'delete'")
    assert sorted(r["cents"] for r in dels.collect()) == [0, 10, 350, 360, 370, 380, 390]
    # history nets to live rows
    net = 0
    for r in sorted(t.history().collect(), key=lambda r: r["version"]):
        net += r["rows_added"] - r["rows_removed"]
        assert net == t.read(version=r["version"]).count()


def test_constraint_on_renamed_column_and_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_ren_cons")
    t.append(spark.range(0, 5).withColumn("x", F.col("id")).coalesce(1), ts=1.0)
    t.rename_column("x", "y", ts=2.0)
    t.set_constraint("y_cap", "y < 100", ts=3.0)
    with pytest.raises(TxError, match="constraint violation"):
        t.append(
            spark.range(0, 1).withColumn("y", F.lit(500).cast("bigint")).coalesce(1),
            ts=4.0,
        )
    t.append(spark.range(5, 8).withColumn("y", F.col("id")).coalesce(1), ts=5.0)
    assert t.read().count() == 8
    # mapping survives a checkpoint replay
    t._write_checkpoint(t.snapshot())
    t.append(spark.range(8, 10).withColumn("y", F.col("id")).coalesce(1), ts=6.0)
    snap = t.snapshot()
    assert snap.mapping == {"y": "x"}
    assert t.read().count() == 10


def test_stream_source_after_rename_and_drop(spark, tmp_path):
    from snapshot_sender_spark.sources.txlog_stream import register

    register(spark)
    t = _mk(spark, tmp_path, "t_ren_stream")
    t.append(spark.range(0, 6).withColumn("a", F.col("id") * 3).coalesce(1), ts=1.0)
    t.rename_column("a", "b", ts=2.0)
    t.append(spark.range(6, 9).withColumn("b", F.col("id") * 3).coalesce(1), ts=3.0)
    out, ckpt = tmp_path / "rs_out", tmp_path / "rs_ckpt"
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(out))
    assert set(got.columns) == {"id", "b"}
    assert {r["id"]: r["b"] for r in got.collect()} == {i: 3 * i for i in range(9)}
    # CDF mode decodes renamed physicals too
    out2, ckpt2 = tmp_path / "rs_out2", tmp_path / "rs_ckpt2"
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", t.path)
        .option("read_changes", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", str(out2))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt2))
        .start()
    )
    q.awaitTermination()
    cdf = spark.read.parquet(str(out2))
    assert cdf.where("_change_type = 'insert'").count() == 9
    assert cdf.where("b IS NULL").count() == 0


def test_restore_reverts_column_mapping(spark, tmp_path):
    """RESTORE across a drop + re-add must bring back the TARGET's mapping:
    the restored logical column reads the ORIGINAL physical values, not the
    re-add's fresh physical (which would surface NULLs)."""
    t = _mk(spark, tmp_path, "t_restore_map")
    t.append(
        spark.range(0, 4).withColumn("secret", F.lit("orig").cast("string")).coalesce(1),
        ts=1.0,
    )                                   # v1: physical 'secret'
    t.drop_column("secret", ts=2.0)     # v2: retired
    t.append(
        spark.range(4, 6).withColumn("secret", F.lit("new").cast("string")).coalesce(1),
        ts=3.0,
    )                                   # v3: fresh physical secret#xxxx
    t.restore(1, ts=4.0)                # back to the original mapping
    got = {r["id"]: r["secret"] for r in t.read().collect()}
    assert got == {i: "orig" for i in range(4)}
    snap = t.snapshot()
    assert snap.mapping == {} and snap.retired == ()
    # and restoring FORWARD to v3 brings the fresh-physical mapping back
    t.restore(3, ts=5.0)
    got = {r["id"]: r["secret"] for r in t.read().collect()}
    assert all(got[i] is None for i in range(4)) and got[4] == "new"
