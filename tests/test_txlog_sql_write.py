"""SQL write path for txlog tables (sources/txlog_write.py): INSERT INTO /
INSERT OVERWRITE / df.write.format("txlog"), with TxTable commit parity."""

import os

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import TxError, TxTable
from snapshot_sender_spark.sources.txlog_batch import register_sql_views


def test_insert_into_appends_atomically(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "w_tab"))
    t.append(spark.range(0, 10).withColumn("v", F.col("id") * 2).coalesce(1), ts=1.0)
    register_sql_views(spark, "w_tt", t.path)
    spark.sql("INSERT INTO w_tt SELECT id, id * 2 AS v FROM range(10, 25)")
    assert t.latest_version() == 2
    got = spark.sql("SELECT count(*) n, sum(v) s FROM w_tt").collect()[0]
    assert got["n"] == 25 and got["s"] == sum(2 * i for i in range(25))
    # history records a plain append; stats were harvested executor-side
    snap = t.snapshot()
    assert all(a["stats"] for a in snap.files.values())
    assert len(t.candidate_files(prune=[("id", 0, 5)])) < len(snap.files)


def test_insert_overwrite_replaces_table(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "w_ovr"))
    t.append(spark.range(0, 10).withColumn("v", F.col("id")).coalesce(1), ts=1.0)
    register_sql_views(spark, "w_ovr_tt", t.path)
    spark.sql("INSERT OVERWRITE TABLE w_ovr_tt SELECT id, id AS v FROM range(100, 105)")
    assert spark.sql("SELECT count(*) n, min(id) m FROM w_ovr_tt").collect()[0][0:2] == (5, 100)
    # the old snapshot still time-travels
    assert t.read(version=1).count() == 10


def test_dataframe_write_format_txlog(spark, tmp_path):
    from snapshot_sender_spark.sources.txlog_batch import register

    register(spark)
    path = str(tmp_path / "w_df")
    TxTable(spark, path).append(
        spark.range(0, 3).withColumn("v", F.lit(1).cast("long")).coalesce(1), ts=1.0
    )
    (
        spark.range(3, 8).withColumn("v", F.lit(2).cast("long"))
        .write.format("txlog").option("path", path)
        .option("write_ts", "2.0").mode("append").save()
    )
    t = TxTable(spark, path)
    assert t.read().count() == 8
    assert t.read(timestamp=1.5).count() == 3  # write_ts drove the commit ts


def test_sql_write_partitioned_hive_layout(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "w_part"), partition_by=("g",))
    t.append(
        spark.range(0, 8).withColumn("g", (F.col("id") % 2).cast("int")).coalesce(1),
        ts=1.0,
    )
    register_sql_views(spark, "w_part_tt", t.path)
    spark.sql(
        "INSERT INTO w_part_tt SELECT id, CAST(id % 4 AS INT) AS g FROM range(8, 24)"
    )
    snap = t.snapshot()
    assert snap.partition_by == ("g",)
    assert all(p.startswith("g=") for p in snap.live_paths())
    got = spark.sql("SELECT g, count(*) n FROM w_part_tt GROUP BY g ORDER BY g").collect()
    assert [(r["g"], r["n"]) for r in got] == [(0, 8), (1, 8), (2, 4), (3, 4)]
    # read parity with the Python API
    assert t.read().count() == 24
    # partition pruning works on the SQL-written files too (dedicated
    # opt-in view LAST — see the filter_pushdown caveat in txlog_batch.py)
    register_sql_views(
        spark, "w_part_push", t.path, options={"filter_pushdown": "true"}
    )
    q = spark.sql("SELECT * FROM w_part_push WHERE g = 3")
    assert q.rdd.getNumPartitions() < len(snap.live_paths())
    assert q.count() == 4


def test_sql_write_schema_evolution_and_refusals(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "w_evo"))
    t.append(spark.range(0, 4).coalesce(1), ts=1.0)
    register_sql_views(spark, "w_evo_tt", t.path)
    # additive evolution through the SQL path
    (
        spark.range(4, 6).withColumn("tag", F.lit("x"))
        .write.format("txlog").option("path", t.path).mode("append").save()
    )
    got = t.read()
    assert got.columns == ["id", "tag"] and got.where("tag IS NULL").count() == 4
    # a view resolves its schema at CREATE time: re-register to INSERT the
    # evolved shape (CREATE OR REPLACE — one call)
    register_sql_views(spark, "w_evo_tt", t.path)
    spark.sql("INSERT INTO w_evo_tt SELECT id, 'z' AS tag FROM range(6, 8)")
    assert t.read().count() == 8
    # a pinned view refuses writes
    with pytest.raises(Exception, match="pinned"):
        (
            spark.range(0, 1)
            .write.format("txlog").option("path", t.path)
            .option("version", "1").mode("append").save()
        )
    # constrained tables refuse the SQL sink (no session to enforce CHECKs)
    t.set_constraint("pos", "id >= 0", ts=3.0)
    with pytest.raises(Exception, match="constraint"):
        spark.sql("INSERT INTO w_evo_tt SELECT id, 'y' AS tag FROM range(8, 10)")
    assert t.read().count() == 8  # nothing leaked


def test_pushed_filters_never_leak_across_queries(spark, tmp_path):
    """Regression: Spark reuses one reader instance across queries on a
    registered view — a WHERE-pruned query must not leave its prune ranges
    behind for the next (filterless or differently-filtered) query."""
    t = TxTable(spark, str(tmp_path / "leak_tab"), partition_by=("g",))
    t.append(
        spark.range(0, 40).withColumn("g", (F.col("id") % 4).cast("int")).coalesce(1),
        ts=1.0,
    )
    register_sql_views(spark, "leak_tt", t.path)
    assert spark.sql("SELECT * FROM leak_tt WHERE g = 3").count() == 10
    # the very next UNFILTERED query must see the whole table again
    assert spark.sql("SELECT count(*) n FROM leak_tt").collect()[0]["n"] == 40
    assert spark.sql("SELECT * FROM leak_tt WHERE g = 0").count() == 10
    assert spark.sql("SELECT * FROM leak_tt").rdd.getNumPartitions() == 4


def test_sql_write_then_cdf_stream_sees_the_append(spark, tmp_path):
    """The SQL-written commit is a first-class append: the CDF stream and
    the change feed report its rows as inserts."""
    from snapshot_sender_spark.sources.txlog_stream import register as reg_stream

    reg_stream(spark)
    t = TxTable(spark, str(tmp_path / "w_cdf"))
    t.append(spark.range(0, 5).coalesce(1), ts=1.0)
    register_sql_views(spark, "w_cdf_tt", t.path)
    spark.sql("INSERT INTO w_cdf_tt SELECT id FROM range(5, 9)")
    rc = t.row_changes(1, 2)
    assert sorted(r["id"] for r in rc.collect()) == [5, 6, 7, 8]
    out, ckpt = tmp_path / "w_out", tmp_path / "w_ckpt"
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", t.path).option("read_changes", "true")
        .load()
        .writeStream.format("parquet").option("path", str(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(str(out)).count() == 9


def test_writestream_format_txlog_exactly_once(spark, tmp_path):
    """Native streaming sink: writeStream.format('txlog') commits one
    atomic log version per micro-batch under txn identity (app_id,
    batchId) — a re-run against the SAME table with a FRESH engine
    checkpoint replays batch 0 and must be a no-op (bytes dropped, no new
    version): end-to-end exactly-once without foreachBatch."""
    from snapshot_sender_spark.sources.txlog_batch import register

    register(spark)
    path = str(tmp_path / "ws_tab")
    src = str(tmp_path / "ws_src")
    spark.range(0, 20).withColumn("v", F.col("id") * 2).coalesce(2).write.parquet(src)

    def run(ckpt: str) -> None:
        q = (
            spark.readStream.schema("id long, v long").parquet(src)
            .writeStream.format("txlog")
            .option("path", path)
            .option("app_id", "ws_test")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ck1")
    t = TxTable(spark, path)
    v1 = t.latest_version()
    assert t.read().count() == 20
    assert t.read().columns == ["id", "v"]
    # FRESH engine checkpoint replays batch 0: the (app, batch) txn makes
    # it a no-op — same version, same rows, no duplicates
    run("ck2")
    assert t.latest_version() == v1
    assert t.read().count() == 20
    # stats landed (executor-side harvest) and prune
    assert all(a["stats"] for a in t.snapshot().files.values())
    # a new micro-batch of new data appends exactly once
    spark.range(20, 25).withColumn("v", F.col("id") * 2).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run("ck1")  # resumes from the original checkpoint: only the delta
    assert t.read().count() == 25
    assert t.read().where("id >= 20").count() == 5


def test_writestream_txlog_partitioned_and_readable_as_stream(spark, tmp_path):
    """The streaming sink writes hive-partitioned tables, and the result is
    itself a valid txlog STREAM SOURCE — a full streaming hop
    (parquet stream -> txlog sink -> txlog stream source)."""
    from snapshot_sender_spark.sources.txlog_batch import register
    from snapshot_sender_spark.sources.txlog_stream import register as reg_stream

    register(spark)
    reg_stream(spark)
    path = str(tmp_path / "wsp_tab")
    TxTable(spark, path, partition_by=("g",)).append(
        spark.range(0, 4).withColumn("g", (F.col("id") % 2).cast("int")).coalesce(1),
        ts=1.0,
    )
    src = str(tmp_path / "wsp_src")
    spark.range(4, 16).withColumn("g", (F.col("id") % 2).cast("int")).coalesce(
        1
    ).write.parquet(src)
    q = (
        spark.readStream.schema("id long, g int").parquet(src)
        .writeStream.format("txlog")
        .option("path", path)
        .option("checkpointLocation", str(tmp_path / "wsp_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = TxTable(spark, path)
    snap = t.snapshot()
    assert all(p.startswith("g=") for p in snap.live_paths())
    assert t.read().count() == 16
    assert len(t.candidate_files(prune=[("g", 1, 1)])) < len(snap.live_paths())
    # downstream: the sink's commits stream back out as appends
    out, ckpt = tmp_path / "wsp_out", tmp_path / "wsp_ck2"
    q2 = (
        spark.readStream.format("txlog_stream").option("path", path).load()
        .writeStream.format("parquet").option("path", str(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(str(out)).count() == 16


def test_sql_writer_commit_races_follow_txtable_rules(spark, tmp_path):
    """The Arrow writer's driver-side commit obeys TxTable's conflict
    ladder: a blind append retries past a racing commit; a constraint added
    concurrently (which the SQL sink cannot enforce) aborts with TxConflict
    instead of committing unchecked rows."""
    import pyarrow as pa

    from snapshot_sender_spark.operators.txlog import TxConflict
    from snapshot_sender_spark.sources.txlog_write import TxlogArrowWriter

    t = TxTable(spark, str(tmp_path / "race_tab"))
    t.append(spark.range(0, 5).coalesce(1), ts=1.0)
    schema = t.snapshot().schema()

    def staged_writer():
        w = TxlogArrowWriter({"path": t.path, "write_ts": "9.0"}, schema, False)
        msg = w.write(iter([pa.RecordBatch.from_pylist([{"id": 100}, {"id": 101}])]))
        return w, msg

    # race 1: a competing append lands between stage and commit — the blind
    # append revalidates and retries, both commits survive
    w, msg = staged_writer()
    t.append(spark.range(5, 8).coalesce(1), ts=2.0)
    w.commit([msg])
    assert t.read().count() == 10  # 5 + 3 + 2
    assert sorted(r["id"] for r in t.read().where("id >= 100").collect()) == [100, 101]

    # race 2: a constraint lands between stage and commit — refuse, clean
    w2, msg2 = staged_writer()
    t.set_constraint("small", "id < 1000", ts=3.0)
    with pytest.raises(TxConflict, match="constraint"):
        w2.commit([msg2])
    assert t.read().count() == 10  # nothing leaked
    # and no staged orphans survive a later vacuum
    t.vacuum(retain_versions=1, min_age_s=0)
    staging = os.path.join(t.path, "_staging")
    assert not os.path.isdir(staging) or not os.listdir(staging)


def test_sql_writer_conflicts_on_concurrent_rename_without_collision(spark, tmp_path):
    """A rename landing between stage and a collision-free commit would
    leave the staged files under STALE physical names — the commit-time
    mapping check conflicts instead."""
    import pyarrow as pa

    from snapshot_sender_spark.operators.txlog import TxConflict
    from snapshot_sender_spark.sources.txlog_write import TxlogArrowWriter

    t = TxTable(spark, str(tmp_path / "race_map"))
    t.append(spark.range(0, 4).withColumn("v", F.col("id")).coalesce(1), ts=1.0)
    schema = t.snapshot().schema()
    w = TxlogArrowWriter({"path": t.path}, schema, False)
    msg = w.write(iter([pa.RecordBatch.from_pylist([{"id": 9, "v": 9}])]))
    t.rename_column("v", "val", ts=2.0)
    t.rename_column("val", "v", ts=3.0)  # round trip: mapping back to identity...
    t.rename_column("v", "w", ts=4.0)    # ...then genuinely changed
    with pytest.raises(TxConflict, match="column mapping"):
        w.commit([msg])
    assert t.read().count() == 4


def test_sql_write_partition_values_with_special_chars(spark, tmp_path):
    """Partition VALUES containing spaces and slashes survive the SQL write
    path: pyarrow's hive dirs are parsed back to raw values, and the commit
    rebuilds Spark-compatible percent-quoted directories — reads through
    both the SQL view and the Python API see the original strings."""
    t = TxTable(spark, str(tmp_path / "w_chars"), partition_by=("cat",))
    t.append(
        spark.createDataFrame([(0, "plain")], "id long, cat string").coalesce(1),
        ts=1.0,
    )
    register_sql_views(spark, "w_chars_tt", t.path)
    spark.createDataFrame(
        [(1, "has space"), (2, "a/b"), (3, "eq=val")], "id long, cat string"
    ).coalesce(1).write.format("txlog").option("path", t.path).mode("append").save()
    got = sorted((r["id"], r["cat"]) for r in t.read().collect())
    assert got == [(0, "plain"), (1, "has space"), (2, "a/b"), (3, "eq=val")]
    register_sql_views(spark, "w_chars_tt", t.path)
    got_sql = sorted(
        (r["id"], r["cat"]) for r in spark.sql("SELECT * FROM w_chars_tt").collect()
    )
    assert got_sql == got
