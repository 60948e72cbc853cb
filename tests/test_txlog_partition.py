"""Hive-style partition columns for the txlog table (operators/txlog.py):
spec fixed at first commit, directory layout, exact partition pruning
composed with footer stats, full lifecycle (MOR/COW delete, merge, compact,
restore, CDF), vacuum of partition dirs, and the stream source's partition
value injection."""

import os

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import TxError, TxTable


def _mk(spark, tmp_path, name, **kw):
    return TxTable(spark, str(tmp_path / name), **kw)


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumn("day", (F.col("id") % 3).cast("int"))
        .withColumn("v", F.col("id") * 10)
    )


def test_partitioned_append_layout_and_read_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path, "tp", partition_by=("day",))
    t.append(_df(spark, 0, 30).repartition(2, "day"), ts=1.0)
    # hive directory layout on disk; data files do NOT carry the column
    dirs = {d for d in os.listdir(t.path) if d.startswith("day=")}
    assert dirs == {"day=0", "day=1", "day=2"}
    snap = t.snapshot()
    assert snap.partition_by == ("day",)
    for p, add in snap.files.items():
        assert p.startswith("day=") and add["part"]["day"] in {"0", "1", "2"}
        assert "day" not in add["stats"]  # not in the footer
    # read restores the partition column, typed per the stored schema
    got = {(r["id"], r["day"], r["v"]) for r in t.read().collect()}
    want = {(i, i % 3, i * 10) for i in range(30)}
    assert got == want
    assert dict(t.read().dtypes)["day"] == "int"


def test_partition_spec_is_sticky_and_validated(spark, tmp_path):
    t = _mk(spark, tmp_path, "tp2", partition_by=("day",))
    t.append(_df(spark, 0, 9).coalesce(1), ts=1.0)
    # a handle WITHOUT the spec adopts the table's
    t2 = _mk(spark, tmp_path, "tp2")
    t2.append(_df(spark, 9, 12).coalesce(1), ts=2.0)
    assert all(p.startswith("day=") for p in t2.snapshot().live_paths())
    # a CONFLICTING spec is refused
    t3 = _mk(spark, tmp_path, "tp2", partition_by=("v",))
    with pytest.raises(TxError, match="fixed at the first commit"):
        t3.append(_df(spark, 12, 15).coalesce(1), ts=3.0)
    # a missing partition column is refused at stage time
    with pytest.raises(TxError, match="partition columns"):
        t.append(spark.range(0, 3), ts=4.0)


def test_partition_pruning_exact_and_composes_with_stats(spark, tmp_path):
    t = _mk(spark, tmp_path, "tp3", partition_by=("day",))
    # 2 files per day value (range-clustered on id within each day)
    t.append(_df(spark, 0, 600).repartitionByRange(2, "id"), ts=1.0)
    snap = t.snapshot()
    n_files = len(snap.live_paths())
    assert n_files == 6  # 3 day values x 2 id ranges
    # partition prune alone: exactly the day=1 directory's files survive
    kept = t.candidate_files(prune=[("day", 1, 1)], snap=snap)
    assert len(kept) == 2
    assert all("day=1" in p for p in kept)
    # composed with a footer-stats prune on id: one file survives
    kept2 = t.candidate_files(prune=[("day", 1, 1), ("id", 0, 100)], snap=snap)
    assert len(kept2) == 1
    # pruned read == unpruned filter (pruning never changes the answer)
    a = sorted(
        r["id"]
        for r in t.read(prune=[("day", 1, 1), ("id", 0, 100)])
        .where("day = 1 AND id BETWEEN 0 AND 100")
        .collect()
    )
    b = sorted(
        r["id"] for r in t.read().where("day = 1 AND id BETWEEN 0 AND 100").collect()
    )
    assert a == b and len(a) > 0


def test_null_partition_value_roundtrip_and_pruned(spark, tmp_path):
    t = _mk(spark, tmp_path, "tpnull", partition_by=("day",))
    df = spark.range(0, 10).withColumn(
        "day", F.when(F.col("id") < 5, F.col("id") % 2).cast("int")
    )
    t.append(df.coalesce(1), ts=1.0)
    snap = t.snapshot()
    assert any(a["part"]["day"] is None for a in snap.files.values())
    got = {(r["id"], r["day"]) for r in t.read().collect()}
    assert got == {(i, i % 2 if i < 5 else None) for i in range(10)}
    # a range predicate can never match NULL: the null dir is pruned exactly
    kept = t.candidate_files(prune=[("day", 0, 5)], snap=snap)
    assert all("__HIVE_DEFAULT_PARTITION__" not in p for p in kept)


def test_partitioned_lifecycle_mor_cow_merge_compact_restore(spark, tmp_path):
    t = _mk(spark, tmp_path, "tplife", partition_by=("day",))
    t.append(_df(spark, 0, 60).repartition(2, "day"), ts=1.0)
    # MOR delete: no file rewritten, reads exclude
    before = set(t.snapshot().live_paths())
    t.delete_where("id % 10 = 0", ts=2.0, mode="mor")
    assert set(t.snapshot().live_paths()) == before
    assert t.read().count() == 54
    # COW delete rewrites only hit files, stays hive-partitioned
    t.delete_where("id >= 50", ts=3.0, mode="cow")
    assert t.read().count() == 45
    assert all(p.startswith("day=") for p in t.snapshot().live_paths())
    # merge: update + insert, partition layout preserved
    src = (
        spark.range(0, 3)
        .withColumn("day", (F.col("id") % 3).cast("int"))
        .withColumn("v", F.lit(-1).cast("bigint"))
    )
    t.merge(src, keys=["id"], ts=4.0)
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[1] == -1 and got[2] == -1 and len(got) == 46  # id=0 was deleted, re-inserted
    # compact materializes the vectors and keeps the layout
    t.compact(target_files=1, ts=5.0)
    assert not t.snapshot().dv_map()
    assert all(p.startswith("day=") for p in t.snapshot().live_paths())
    n_after_compact = t.read().count()
    assert n_after_compact == 46
    # restore back before the merge
    t.restore(3, ts=6.0)
    assert t.read().count() == 45
    # history nets to live rows throughout
    net = 0
    for r in sorted(t.history().collect(), key=lambda r: r["version"]):
        net += r["rows_added"] - r["rows_removed"]
        assert net == t.read(version=r["version"]).count()
    # CDF across the partitioned lifecycle is row-exact for the MOR commit
    dels = t.row_changes(1, 2).where("_change_type = 'delete'")
    assert sorted(r["id"] for r in dels.collect()) == [0, 10, 20, 30, 40, 50]


def test_partitioned_vacuum_removes_files_and_empty_dirs(spark, tmp_path):
    t = _mk(spark, tmp_path, "tpvac", partition_by=("day",))
    t.append(_df(spark, 0, 30).coalesce(1), ts=1.0)
    t.overwrite(
        _df(spark, 0, 30).where("day < 2").coalesce(1), ts=2.0
    )  # day=2 becomes garbage
    removed = t.vacuum(retain_versions=1, min_age_s=0)
    assert removed and all(r.startswith("day=") for r in removed)
    assert not os.path.isdir(os.path.join(t.path, "day=2"))  # empty dir pruned
    assert t.read().count() == 20  # live data intact


def test_partition_by_survives_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path, "tpckpt", partition_by=("day",))
    t.append(_df(spark, 0, 9).coalesce(1), ts=1.0)
    t._write_checkpoint(t.snapshot())
    t.append(_df(spark, 9, 12).coalesce(1), ts=2.0)  # replays from the ckpt
    snap = t.snapshot()
    assert snap.partition_by == ("day",)
    assert t.read().count() == 12


def test_stream_source_injects_partition_values(spark, tmp_path):
    from snapshot_sender_spark.sources.txlog_stream import register

    register(spark)
    t = _mk(spark, tmp_path, "tpstream", partition_by=("day",))
    t.append(_df(spark, 0, 12).coalesce(1), ts=1.0)
    t.append(_df(spark, 12, 21).coalesce(1), ts=2.0)
    out = str(tmp_path / "tpstream_out")
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "tpstream_ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {(r["id"], r["day"], r["v"]) for r in spark.read.parquet(out).collect()}
    assert got == {(i, i % 3, i * 10) for i in range(21)}


def test_partition_spec_cannot_retrofit_nonempty_flat_table(spark, tmp_path):
    """Attaching a spec to an existing unpartitioned table with live files
    would mix flat and hive layouts under one basePath — refused at write
    time, not discovered at read time."""
    t = _mk(spark, tmp_path, "t_retrofit")
    t.append(_df(spark, 0, 6).coalesce(1), ts=1.0)
    t2 = _mk(spark, tmp_path, "t_retrofit", partition_by=("day",))
    with pytest.raises(TxError, match="existing unpartitioned"):
        t2.append(_df(spark, 6, 9).coalesce(1), ts=2.0)
    # a table whose live set is EMPTY (everything deleted) may adopt a spec:
    # no flat file can mix with the new hive layout
    t3 = _mk(spark, tmp_path, "t_retrofit_empty")
    t3.append(_df(spark, 0, 6).coalesce(1), ts=1.0)
    t3.delete_where("id >= 0", ts=2.0)
    assert not t3.snapshot().files
    t4 = _mk(spark, tmp_path, "t_retrofit_empty", partition_by=("day",))
    t4.append(_df(spark, 0, 6).coalesce(1), ts=3.0)
    assert t4.read().count() == 6
    assert all(p.startswith("day=") for p in t4.snapshot().live_paths())


# -- round 12: partition-spec evolution (repartition_table)


def test_repartition_flat_to_partitioned_and_back(spark, tmp_path):
    from snapshot_sender_spark.operators.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "respec"))
    df = spark.range(0, 40).withColumn("g", (F.col("id") % 4).cast("int"))
    t.append(df.coalesce(2), ts=1.0)
    assert t.snapshot().partition_by == ()
    v_flat = t.latest_version()
    # flat -> by g
    t.repartition_table(("g",), target_files=1, ts=2.0)
    snap = t.snapshot()
    assert snap.partition_by == ("g",)
    assert all(p.startswith("g=") for p in snap.live_paths())
    assert t.read().count() == 40
    # pruning is directory-exact on the new spec
    assert len(t.candidate_files(prune=[("g", 2, 2)])) == 1
    # the old snapshot still reads under the OLD layout
    assert t.read(version=v_flat).count() == 40
    # partitioned -> flat again ([] recorded explicitly)
    t.repartition_table((), target_files=2, ts=3.0)
    snap2 = t.snapshot()
    assert snap2.partition_by == ()
    assert all("=" not in p for p in snap2.live_paths())
    assert t.read().groupBy().sum("id").collect()[0][0] == sum(range(40))
    # appends after the respec follow the CURRENT spec
    t.append(df.limit(0).coalesce(1), ts=4.0)
    assert t.snapshot().partition_by == ()


def test_repartition_materializes_dvs_and_respec_spec_change(spark, tmp_path):
    """MOR deletion vectors materialize away in the rewrite, and a
    partitioned table can move to a DIFFERENT spec."""
    from snapshot_sender_spark.operators.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "respec2"), partition_by=("a",))
    df = (
        spark.range(0, 30)
        .withColumn("a", (F.col("id") % 2).cast("int"))
        .withColumn("b", (F.col("id") % 3).cast("int"))
    )
    t.append(df.coalesce(1), ts=1.0)
    t.delete_where("id < 6", ts=2.0, mode="mor")
    t.repartition_table(("b",), target_files=1, ts=3.0)
    snap = t.snapshot()
    assert snap.partition_by == ("b",)
    assert not snap.dv_map() and not snap.dvf_map()  # vectors materialized
    assert t.read().count() == 24
    assert len(t.candidate_files(prune=[("b", 1, 1)])) == 1
    # row_changes across the respec reports NOTHING (data-equivalent rewrite)
    assert t.row_changes(2, 3).count() == 0


def test_repartition_refusals_and_conflict(spark, tmp_path):
    from snapshot_sender_spark.operators.txlog import TxConflict, TxError, TxTable

    t = TxTable(spark, str(tmp_path / "respec3"))
    df = spark.range(0, 10).withColumn("g", (F.col("id") % 2).cast("int"))
    t.append(df.coalesce(1), ts=1.0)
    with pytest.raises(TxError, match="not in schema"):
        t.repartition_table(("nope",), ts=2.0)
    t.rename_column("g", "grp", ts=2.0)
    with pytest.raises(TxError, match="identity-mapped"):
        t.repartition_table(("grp",), ts=3.0)
    # same-spec respec is a version-less no-op
    v = t.latest_version()
    assert t.repartition_table((), ts=4.0) == v
    # any concurrent commit aborts the respec
    orig_stage = TxTable._stage
    raced = []

    def racing_stage(self, dfx, partition_by=(), mapping=None):
        adds = orig_stage(self, dfx, partition_by, mapping=mapping)
        if not raced:
            raced.append(1)
            TxTable(spark, t.path).append(
                spark.range(10, 12).withColumn("grp", F.lit(0).cast("int")).coalesce(1),
                ts=5.0,
            )
        return adds

    t._stage = racing_stage.__get__(t, TxTable)
    with pytest.raises(TxConflict, match="repartition"):
        t.repartition_table(("id",), ts=6.0)
    assert TxTable(spark, t.path).read().count() == 12  # racer's rows intact


def test_cdf_stream_across_repartition_is_silent(spark, tmp_path):
    """The CDF stream treats a respec like compaction: a data-equivalent
    rewrite streams zero changes; rows deleted IN the same interval still
    stream exactly."""
    from snapshot_sender_spark.operators.txlog import TxTable
    from snapshot_sender_spark.sources.txlog_stream import register

    register(spark)
    t = TxTable(spark, str(tmp_path / "respec_cdf"))
    df = spark.range(0, 20).withColumn("g", (F.col("id") % 2).cast("int"))
    t.append(df.coalesce(1), ts=1.0)
    t.delete_where("id = 7", ts=2.0, mode="mor")
    t.repartition_table(("g",), target_files=1, ts=3.0)
    out, ckpt = tmp_path / "rs_out", tmp_path / "rs_ckpt"
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", t.path).option("read_changes", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(out))
    assert got.where("_commit_version = 3").count() == 0  # respec: silent
    assert got.count() == 21  # 20 inserts + 1 delete


def test_row_changes_column_order_with_mid_schema_partition_col(spark, tmp_path):
    """Regression (found by the round-12 respec work): the file source
    returns hive partition columns LAST regardless of the declared schema
    order, so positional consumers (exceptAll inside row_changes) silently
    mis-aligned whenever the partition column wasn't the final schema field.
    read_files/_lineage_read now pin schema order explicitly."""
    from snapshot_sender_spark.operators.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "order_tab"), partition_by=("p",))
    df = (
        spark.range(0, 12)
        .select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("p"),   # partition col MID-schema
            (F.col("id") % 3).cast("int").alias("q"),
        )
    )
    t.append(df.coalesce(1), ts=1.0)
    assert [c for c, _t in t.read().dtypes] == ["id", "p", "q"]
    t.compact(target_files=1, ts=2.0)  # pure rewrite: must report NOTHING
    assert t.row_changes(1, 2).count() == 0
    t.delete_where("id = 4", ts=3.0, mode="cow")
    rc = t.row_changes(2, 3).collect()
    assert [(r["id"], r["p"], r["q"], r["_change_type"]) for r in rc] == [
        (4, 0, 1, "delete")
    ]


def test_restore_across_repartition_restores_the_spec(spark, tmp_path):
    """Round-12 fix: RESTORE carries the target's partition SPEC (and
    force-records [] for a flat target) — without it, latest-wins replay
    would keep the post-respec spec while the live files revert to the old
    layout, and the next append would mix flat and hive files."""
    from snapshot_sender_spark.operators.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "respec_restore"))
    df = spark.range(0, 12).withColumn("g", (F.col("id") % 3).cast("int"))
    t.append(df.coalesce(1), ts=1.0)          # v1: flat
    t.repartition_table(("g",), target_files=1, ts=2.0)  # v2: by g
    t.restore(1, ts=3.0)                      # v3: back to the flat layout
    snap = t.snapshot()
    assert snap.partition_by == ()
    assert all("=" not in p for p in snap.live_paths())
    # the next append follows the RESTORED spec — no mixed layout
    t.append(df.limit(2).coalesce(1), ts=4.0)
    assert t.read().count() == 14
    assert all("=" not in p for p in t.snapshot().live_paths())
    # and restoring forward to the partitioned version restores THAT spec
    t2 = TxTable(spark, str(tmp_path / "respec_restore2"), partition_by=("g",))
    t2.append(df.coalesce(1), ts=1.0)
    t2.repartition_table((), target_files=1, ts=2.0)
    t2.restore(1, ts=3.0)
    assert t2.snapshot().partition_by == ("g",)
    t2.append(df.limit(3).coalesce(1), ts=4.0)
    assert all(p.startswith("g=") for p in t2.snapshot().live_paths())
    assert t2.read().count() == 15
