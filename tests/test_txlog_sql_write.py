"""SQL write path for txlog tables (sources/txlog_write.py): INSERT INTO /
INSERT OVERWRITE / df.write.format("txlog"), with TxTable commit parity."""

import os

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import TxConflict, TxError, TxTable
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
    # constrained tables ENFORCE on the SQL sink (driver-side commit has the
    # active session — round-13): clean rows commit, dirty rows refuse
    # atomically with the staged bytes unlinked
    t.set_constraint("pos", "id >= 0", ts=3.0)
    spark.sql("INSERT INTO w_evo_tt SELECT id, 'y' AS tag FROM range(8, 10)")
    assert t.read().count() == 10
    with pytest.raises(Exception, match="constraint"):
        spark.sql("INSERT INTO w_evo_tt SELECT id, 'y' AS tag FROM range(-2, 0)")
    assert t.read().count() == 10  # nothing leaked
    assert t.read().where("id < 0").count() == 0
    # no orphan bytes: everything on disk is referenced by the snapshot
    t.vacuum(retain_versions=1, min_age_s=0)
    live = {os.path.basename(p) for p in t.snapshot().live_paths()}
    on_disk = {f for f in os.listdir(t.path) if f.endswith(".parquet")}
    assert on_disk == live


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

    # race 2: a constraint lands between stage and commit — the commit now
    # ENFORCES it driver-side (round-13): the staged rows (100, 101) satisfy
    # id < 1000, so they commit; a SECOND staged write violating a stricter
    # concurrent constraint refuses with the renamed bytes unlinked
    w2, msg2 = staged_writer()
    t.set_constraint("small", "id < 1000", ts=3.0)
    w2.commit([msg2])
    assert t.read().count() == 12
    w3 = TxlogArrowWriter({"path": t.path}, schema, False)
    # 500/501 PASS the frozen set ("small": id < 1000) so write() admits them...
    msg3 = w3.write(iter([pa.RecordBatch.from_pylist([{"id": 500}, {"id": 501}])]))
    # ...then a STRICTER constraint lands before commit: existing rows (max
    # 101) pass it, the staged rows violate — the commit-time re-gate (via
    # the active session here) refuses and unlinks
    t.set_constraint("mid", "id < 200", ts=4.0)
    with pytest.raises(TxError, match="constraint violation"):
        w3.commit([msg3])
    assert t.read().count() == 12  # nothing leaked
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


def test_sql_write_enforces_constraints_with_txtable_parity(spark, tmp_path):
    """Round-13 verdict #2: the SQL write path enforces CHECK constraints
    exactly like TxTable.append — clean batch commits, dirty batch refuses
    atomically with staged bytes unlinked, on BOTH paths."""
    t = TxTable(spark, str(tmp_path / "w_cons"))
    t.append(spark.range(0, 5).withColumn("v", F.col("id")).coalesce(1), ts=1.0)
    t.set_constraint("v_small", "v < 100", ts=2.0)
    register_sql_views(spark, "w_cons_tt", t.path)

    # clean INSERT INTO commits (the r12 build refused it outright)
    spark.sql("INSERT INTO w_cons_tt SELECT id, id AS v FROM range(5, 10)")
    assert t.read().count() == 10

    # dirty via SQL and dirty via Python refuse with the SAME behavior
    with pytest.raises(Exception, match="constraint violation"):
        spark.sql("INSERT INTO w_cons_tt SELECT id, id * 50 AS v FROM range(10, 14)")
    with pytest.raises(TxError, match="constraint violation"):
        t.append(
            spark.range(10, 14).withColumn("v", F.col("id") * 50).coalesce(1), ts=3.0
        )
    assert t.read().count() == 10
    assert t.read().where("v >= 100").count() == 0
    # both refusals left zero orphan bytes
    t.vacuum(retain_versions=1, min_age_s=0)
    live = {os.path.basename(p) for p in t.snapshot().live_paths()}
    assert {f for f in os.listdir(t.path) if f.endswith(".parquet")} == live


def test_sql_write_constraint_enforced_on_partitioned_column(spark, tmp_path):
    """The CHECK may reference a hive PARTITION column (its value lives in
    the directory name, restored by basePath at validation time)."""
    t = TxTable(spark, str(tmp_path / "w_cons_p"), partition_by=("g",))
    t.append(
        spark.range(0, 4).withColumn("g", (F.col("id") % 2).cast("int")).coalesce(1),
        ts=1.0,
    )
    t.set_constraint("g_ok", "g IN (0, 1, 2)", ts=2.0)
    register_sql_views(spark, "w_cons_p_tt", t.path)
    spark.sql("INSERT INTO w_cons_p_tt SELECT id, CAST(2 AS INT) AS g FROM range(4, 6)")
    assert t.read().count() == 6
    with pytest.raises(Exception, match="constraint violation"):
        spark.sql(
            "INSERT INTO w_cons_p_tt SELECT id, CAST(7 AS INT) AS g FROM range(6, 8)"
        )
    assert t.read().count() == 6


def test_stats_exclude_is_a_table_property_honored_by_sql_writes(spark, tmp_path):
    """Round-12 ADVICE: a table configured with stats_exclude persists the
    exclusion in commit meta, and the SQL/stream write paths pop those
    columns from harvested footer stats — no min/max of the sensitive column
    ever enters the log, whichever path wrote it."""
    t = TxTable(spark, str(tmp_path / "w_sx"), stats_exclude=("body",))
    df = spark.range(0, 6).withColumn("body", F.concat(F.lit("secret-"), F.col("id")))
    t.append(df.coalesce(1), ts=1.0)
    register_sql_views(spark, "w_sx_tt", t.path)
    # SQL write through a FRESH TxTable-free path: no constructor argument
    spark.sql(
        "INSERT INTO w_sx_tt SELECT id, concat('classified-', id) AS body "
        "FROM range(6, 12)"
    )
    # streaming sink too
    src = str(tmp_path / "sx_src")
    spark.range(12, 15).withColumn(
        "body", F.concat(F.lit("hush-"), F.col("id"))
    ).coalesce(1).write.parquet(src)
    q = (
        spark.readStream.schema("id long, body string").parquet(src)
        .writeStream.format("txlog")
        .option("path", t.path)
        .option("checkpointLocation", str(tmp_path / "sx_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = TxTable(spark, t.path).snapshot()
    assert snap.stats_exclude == ("body",)
    assert snap.total_rows() == 15
    for a in snap.files.values():
        assert "body" not in a["stats"], a
        assert "id" in a["stats"]  # key columns keep stats: pruning works
    # the raw log never saw a 'secret'/'classified'/'hush' byte in stats
    import glob as _glob

    for vf in _glob.glob(os.path.join(t.path, "_txlog", "v*.json")):
        with open(vf) as fh:
            txt = fh.read()
        for needle in ("secret-", "classified-", "hush-"):
            assert needle not in txt
    # a writer OPTION can extend the exclusion, and it persists
    (
        spark.range(15, 17).withColumn("body", F.lit("x"))
        .withColumn("note", F.lit("internal"))
        .write.format("txlog").option("path", t.path)
        .option("stats_exclude", "note").mode("append").save()
    )
    snap2 = TxTable(spark, t.path).snapshot()
    assert snap2.stats_exclude == ("body", "note")


def test_conflicting_sql_write_leaves_no_orphan_bytes(spark, tmp_path):
    """Round-12 ADVICE: a TxConflict raised by _commit AFTER the staged
    files were renamed into the table root must unlink them — not leave
    orphans for vacuum's age-gated sweep."""
    import pyarrow as pa

    from snapshot_sender_spark.sources.txlog_write import TxlogArrowWriter

    t = TxTable(spark, str(tmp_path / "w_orph"))
    t.append(spark.range(0, 4).withColumn("v", F.col("id")).coalesce(1), ts=1.0)
    schema = t.snapshot().schema()
    w = TxlogArrowWriter({"path": t.path}, schema, False)
    msg = w.write(iter([pa.RecordBatch.from_pylist([{"id": 9, "v": 9}])]))
    t.rename_column("v", "w", ts=2.0)  # mapping changed: commit must conflict
    with pytest.raises(TxConflict, match="column mapping"):
        w.commit([msg])
    # the renamed add was unlinked immediately — zero unreferenced parquet
    live = {os.path.basename(p) for p in t.snapshot().live_paths()}
    on_disk = {f for f in os.listdir(t.path) if f.endswith(".parquet")}
    assert on_disk == live


def test_partitioned_task_write_streams_many_batches(spark, tmp_path):
    """Round-12 verdict #5: the partitioned task write streams its Arrow
    batches through a RecordBatchReader (memory bounded by ONE batch) and
    still produces the exact hive layout + rows of the Python write path."""
    import pyarrow as pa

    from snapshot_sender_spark.sources.txlog_write import TxlogArrowWriter

    t = TxTable(spark, str(tmp_path / "w_streamed"), partition_by=("g",))
    t.append(
        spark.range(0, 2).withColumn("g", (F.col("id") % 2).cast("int")).coalesce(1),
        ts=1.0,
    )
    schema = t.snapshot().schema()
    w = TxlogArrowWriter({"path": t.path}, schema, False)

    def batches():  # a generator, NOT a list: the writer must not need len()
        for lo in range(2, 42, 5):
            yield pa.RecordBatch.from_pylist(
                [{"id": i, "g": i % 3} for i in range(lo, lo + 5)]
            )

    msg = w.write(batches())
    w.commit([msg])
    t2 = TxTable(spark, t.path)
    assert sorted(r["id"] for r in t2.read().collect()) == list(range(42))
    snap = t2.snapshot()
    assert all(p.startswith("g=") for p in snap.live_paths())
    assert all(a["stats"] and a["part"] for a in snap.files.values())
    got = sorted(
        (r["g"], r["n"])
        for r in t2.read().groupBy("g").agg(F.count("*").alias("n")).collect()
    )
    assert got == [(0, 14), (1, 14), (2, 14)]


def test_stream_sink_commit_ts_is_wall_clock(spark, tmp_path):
    """Round-12 ADVICE: the streaming sink's commit ts must be wall clock
    (or write_ts), NOT float(batchId) — mixed with other writers a 0.0/1.0
    sequence breaks timestamp time travel."""
    import time as _time

    from snapshot_sender_spark.sources.txlog_batch import register

    register(spark)
    path = str(tmp_path / "ws_ts_tab")
    TxTable(spark, path).append(spark.range(0, 3).coalesce(1), ts=_time.time())
    src = str(tmp_path / "ws_ts_src")
    spark.range(3, 7).coalesce(1).write.parquet(src)
    t0 = _time.time()
    q = (
        spark.readStream.schema("id long").parquet(src)
        .writeStream.format("txlog")
        .option("path", path)
        .option("checkpointLocation", str(tmp_path / "ws_ts_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = TxTable(spark, path)
    metas = [t._read_version_actions(v)[0]["meta"] for v in t._list_versions()]
    sink_ts = metas[-1]["ts"]
    assert sink_ts >= t0  # wall clock, not batchId=0.0
    # timestamp travel picks the expected versions
    assert t.read(timestamp=t0).count() == 3
    assert t.read(timestamp=_time.time() + 5).count() == 7
