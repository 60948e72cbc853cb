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


def test_cdf_stream_matches_batch_row_changes(spark, tmp_path):
    """read_changes=true streams EXACTLY the batch row_changes feed across
    appends, MOR deletes, COW rewrites, compaction (nothing), and MOR merge."""
    register(spark)
    t = TxTable(spark, str(tmp_path / "cdf_tab"))
    t.append(spark.range(0, 30).coalesce(1), ts=1.0)
    t.delete_where("id % 10 = 0", ts=2.0, mode="mor")
    t.delete_where("id >= 25", ts=3.0, mode="cow")
    t.compact(target_files=1, ts=4.0)
    t.merge(
        spark.createDataFrame([(3,), (100,)], "id long").coalesce(1),
        keys=["id"], ts=5.0, mode="mor",
    )
    out, ckpt = tmp_path / "cdf_out", tmp_path / "cdf_ckpt"
    _run(spark, t, out, ckpt, read_changes="true")
    got = spark.read.parquet(str(out))
    assert set(got.columns) == {"id", "_change_type", "_commit_version"}
    batch = t.row_changes(0, t.latest_version()).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    # compaction (v4) must contribute nothing
    assert got.where("_commit_version = 4").count() == 0


def test_cdf_stream_restart_streams_only_new_commits(spark, tmp_path):
    register(spark)
    t = TxTable(spark, str(tmp_path / "cdf_restart"))
    t.append(spark.range(0, 12).coalesce(1), ts=1.0)
    t.delete_where("id < 3", ts=2.0, mode="mor")
    out, ckpt = tmp_path / "r_out", tmp_path / "r_ckpt"
    _run(spark, t, out, ckpt, read_changes="true")
    n_first = spark.read.parquet(str(out)).count()
    assert n_first == 15  # 12 inserts + 3 deletes
    # new commits while the stream is down: a COW delete and an append
    t.delete_where("id >= 10", ts=3.0, mode="cow")
    t.append(spark.range(20, 23).coalesce(1), ts=4.0)
    _run(spark, t, out, ckpt, read_changes="true")  # SAME checkpoint: resume
    got = spark.read.parquet(str(out))
    assert got.count() == n_first + 2 + 3  # only the delta: 2 deletes + 3 inserts
    delta = got.where("_commit_version >= 3")
    dels = sorted(r["id"] for r in delta.where("_change_type='delete'").collect())
    ins = sorted(r["id"] for r in delta.where("_change_type='insert'").collect())
    assert dels == [10, 11] and ins == [20, 21, 22]


def test_cdf_stream_partitioned_table_and_restore(spark, tmp_path):
    """Partition values are injected into CDF rows, and a DV-resetting
    restore streams the resurrected rows as inserts."""
    register(spark)
    t = TxTable(spark, str(tmp_path / "cdf_part"), partition_by=("g",))
    t.append(
        spark.range(0, 12).withColumn("g", (F.col("id") % 2).cast("int")).coalesce(1),
        ts=1.0,
    )
    t.delete_where("id IN (4, 5)", ts=2.0, mode="mor")
    t.restore(1, ts=3.0)  # resurrect 4 and 5
    out, ckpt = tmp_path / "p_out", tmp_path / "p_ckpt"
    _run(spark, t, out, ckpt, read_changes="true")
    got = spark.read.parquet(str(out))
    # every row carries its hive partition value, typed
    assert got.where("g IS NULL").count() == 0
    assert dict(got.dtypes)["g"] == "int"
    batch = t.row_changes(0, t.latest_version()).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    v3 = got.where("_commit_version = 3")
    assert sorted((r["id"], r["_change_type"]) for r in v3.collect()) == [
        (4, "insert"), (5, "insert"),
    ]


def test_cdf_stream_vacuumed_file_raises(spark, tmp_path):
    register(spark)
    t = TxTable(spark, str(tmp_path / "cdf_vac"))
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)
    t.overwrite(spark.range(50, 55).coalesce(1), ts=2.0)
    t.vacuum(retain_versions=1, min_age_s=0)
    out, ckpt = tmp_path / "v_out", tmp_path / "v_ckpt"
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        _run(spark, t, out, ckpt, read_changes="true")
    assert "vacuumed" in str(ei.value) or "retention" in str(ei.value)


def test_stream_fails_on_mid_stream_mapping_change(spark, tmp_path):
    """A rename (or drop + re-add) committed while a reader is RUNNING would
    make its frozen mapping decode NULLs for real data — partitions() fails
    loudly instead (a restarted query re-freezes and works; the restart path
    is exercised by the fresh-stream half below)."""
    from snapshot_sender_spark.sources.txlog_stream import (
        _TxlogCdfStreamReader,
        _TxlogStreamReader,
    )

    register(spark)
    t = TxTable(spark, str(tmp_path / "map_race_tab"))
    t.append(spark.range(0, 6).withColumn("a", F.col("id")).coalesce(1), ts=1.0)
    reader = _TxlogStreamReader({"path": t.path})       # freezes mapping at v1
    cdf_reader = _TxlogCdfStreamReader({"path": t.path})
    t.rename_column("a", "b", ts=2.0)                   # lands mid-stream
    t.append(spark.range(6, 9).withColumn("b", F.col("id")).coalesce(1), ts=3.0)
    with pytest.raises(ValueError, match="column mapping"):
        reader.partitions({"version": 1}, {"version": 3})
    with pytest.raises(ValueError, match="column mapping"):
        cdf_reader.partitions({"version": 1}, {"version": 3})
    # a FRESH stream (new reader: mapping re-frozen) works and sees all rows
    out2, ckpt2 = tmp_path / "mr_out2", tmp_path / "mr_ckpt2"
    _run(spark, t, out2, ckpt2)
    got = spark.read.parquet(str(out2))
    assert got.count() == 9 and got.where("b IS NULL").count() == 0


def test_cdf_stream_nan_rows_not_phantom_changed(spark, tmp_path):
    """NaN-bearing rows copied by a rewrite must NOT stream as phantom
    delete+insert pairs: the Counter diff canonicalizes NaN, matching
    Spark exceptAll's NaN-equality in batch row_changes."""
    register(spark)
    t = TxTable(spark, str(tmp_path / "nan_tab"))
    df = spark.range(0, 10).withColumn(
        "v",
        F.when(F.col("id") % 2 == 0, F.lit(float("nan"))).otherwise(
            F.col("id").cast("double")
        ),
    )
    t.append(df.coalesce(1), ts=1.0)
    t.compact(target_files=1, ts=2.0)          # pure rewrite: no change
    t.delete_where("id = 3", ts=3.0, mode="cow")  # rewrites the NaN rows too
    out, ckpt = tmp_path / "nan_out", tmp_path / "nan_ckpt"
    _run(spark, t, out, ckpt, read_changes="true")
    got = spark.read.parquet(str(out))
    assert got.where("_commit_version = 2").count() == 0      # compact: silent
    v3 = got.where("_commit_version = 3").collect()
    assert [(r["id"], r["_change_type"]) for r in v3] == [(3, "delete")]
    assert got.count() == 11  # 10 inserts + 1 delete, zero phantoms


def test_cdf_stream_sidecar_vectors_match_batch(spark, tmp_path):
    """Sidecar deletion vectors (above the inline cap) stream exactly:
    sidecar MOR delete, inline MOR merge, then a COW rewrite of a
    sidecar'd file — the feed equals batch row_changes row for row."""
    register(spark)
    t = TxTable(spark, str(tmp_path / "dvf_tab"))
    t.MOR_MAX_INLINE_DV = 20
    t.append(spark.range(0, 200).repartitionByRange(2, "id"), ts=1.0)
    t.delete_where("id % 3 = 0", ts=2.0, mode="mor")  # 67 rows -> sidecar
    t.merge(
        spark.createDataFrame([(5,), (500,)], "id long").coalesce(1),
        keys=["id"], ts=3.0, mode="mor",
    )
    t.delete_where("id > 150", ts=4.0, mode="cow")  # rewrites sidecar'd files
    out, ckpt = tmp_path / "dvf_out", tmp_path / "dvf_ckpt"
    _run(spark, t, out, ckpt, read_changes="true")
    got = spark.read.parquet(str(out))
    batch = t.row_changes(0, t.latest_version()).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    assert got.where("_commit_version = 2 AND _change_type = 'delete'").count() == 67


# -- round 12: vectorized CDF decode, bounded diff, checkpoint-seeded planning


def test_cdf_stream_struct_array_columns_exact(spark, tmp_path):
    """Complex-typed columns (struct, array) survive the CDF stream exactly —
    the round-12 ADVICE fix: emission now goes through Arrow take/filter
    (no Python thaw), so nested values can never come back as [k, v] lists.
    Covers the insert path, the DV path AND the rewrite-diff path."""
    register(spark)
    t = TxTable(spark, str(tmp_path / "cplx_tab"))
    df = (
        spark.range(0, 20)
        .withColumn("s", F.struct(F.col("id").alias("a"), (F.col("id") * 2).alias("b")))
        .withColumn("arr", F.array(F.col("id"), F.col("id") + 1))
    )
    t.append(df.coalesce(1), ts=1.0)
    t.delete_where("id IN (2, 3)", ts=2.0, mode="mor")   # DV partition
    t.delete_where("id >= 15", ts=3.0, mode="cow")       # diff partition
    t.compact(target_files=1, ts=4.0)                    # silent
    out, ckpt = tmp_path / "cplx_out", tmp_path / "cplx_ckpt"
    _run(spark, t, out, ckpt, read_changes="true")
    got = spark.read.parquet(str(out))
    batch = t.row_changes(0, t.latest_version()).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    # struct fields survive with real values, not corrupted shapes
    row = got.where("id = 2 AND _change_type = 'delete'").collect()[0]
    assert row["s"]["a"] == 2 and row["s"]["b"] == 4 and row["arr"] == [2, 3]
    assert got.where("_commit_version = 4").count() == 0


def test_cdf_stream_map_column_exact(spark, tmp_path):
    """Map-typed columns stream exactly through all three CDF partition
    kinds (maps decode as pair-lists in Arrow; the digest freeze must treat
    them consistently on both diff sides). NOTE: the batch row_changes API
    cannot even express this table (Spark refuses set operations on MAP
    columns) — the digest-based stream diff is strictly more capable, so
    the expectation is derived by hand."""
    register(spark)
    t = TxTable(spark, str(tmp_path / "map_tab"))
    df = spark.range(0, 12).withColumn(
        "m", F.create_map(F.lit("k"), F.col("id"), F.lit("j"), F.col("id") * 10)
    )
    t.append(df.coalesce(1), ts=1.0)
    t.delete_where("id = 1", ts=2.0, mode="mor")    # DV partition
    t.delete_where("id >= 10", ts=3.0, mode="cow")  # diff partition
    out, ckpt = tmp_path / "map_out", tmp_path / "map_ckpt"
    _run(spark, t, out, ckpt, read_changes="true")
    got = spark.read.parquet(str(out))
    expected = sorted(
        [(i, "insert", 1) for i in range(12)]
        + [(1, "delete", 2)]
        + [(i, "delete", 3) for i in (10, 11)]
    )
    assert (
        sorted((r["id"], r["_change_type"], r["_commit_version"]) for r in got.collect())
        == expected
    )
    # map VALUES survive intact on every partition kind, keys included
    for r in got.collect():
        assert r["m"] == {"k": r["id"], "j": r["id"] * 10}


def test_cdf_diff_bucket_split_exact(spark, tmp_path):
    """A rewrite diff forced into multiple hash buckets (diff_bucket_rows
    option) plans >1 partition for the version and still equals the batch
    row_changes feed exactly — the round-12 bounded-memory/parallel diff."""
    from snapshot_sender_spark.sources.txlog_stream import (
        _CdfDiffPartition,
        _TxlogCdfStreamReader,
    )

    register(spark)
    t = TxTable(spark, str(tmp_path / "bucket_tab"))
    t.append(spark.range(0, 100).withColumn("v", F.col("id") % 7).coalesce(2), ts=1.0)
    t.overwrite(
        spark.range(50, 140).withColumn("v", F.col("id") % 7).coalesce(2), ts=2.0
    )
    reader = _TxlogCdfStreamReader({"path": t.path, "diff_bucket_rows": "25"})
    parts = reader.partitions({"version": 1}, {"version": 2})
    diff_parts = [p for p in parts if isinstance(p, _CdfDiffPartition)]
    assert len(diff_parts) > 1  # the overwrite split into hash buckets
    assert {p.bucket for p in diff_parts} == set(range(diff_parts[0].n_buckets))
    out, ckpt = tmp_path / "b_out", tmp_path / "b_ckpt"
    _run(spark, t, out, ckpt, read_changes="true", diff_bucket_rows="25")
    got = spark.read.parquet(str(out))
    batch = t.row_changes(0, t.latest_version()).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    # the overwrite's net effect: inserts 100..139, deletes 0..49
    v2 = got.where("_commit_version = 2")
    assert v2.where("_change_type = 'insert'").count() == 40
    assert v2.where("_change_type = 'delete'").count() == 50


def test_cdf_planning_seeds_from_log_checkpoint(spark, tmp_path):
    """Micro-batch planning replays only the log TAIL: per-file DV state,
    schema and mapping seed from the newest checkpoint at or below the batch
    start (round-12 verdict #3). Pinned by counting version-file opens AND
    by a diff that needs pre-checkpoint DV state."""
    from snapshot_sender_spark.sources.txlog_stream import _TxlogCdfStreamReader

    register(spark)
    t = TxTable(spark, str(tmp_path / "ckpt_tab"))
    t.CHECKPOINT_INTERVAL = 5
    one = spark.range(0, 8).coalesce(1)
    for i in range(1, 5):
        t.append(one, ts=float(i))            # v1..v4
    t.delete_where("id = 0", ts=5.0, mode="mor")  # v5 -> checkpoint at 5 (with DVs)
    assert 5 in t._list_checkpoints()
    t.delete_where("id >= 6", ts=6.0, mode="cow")  # v6: diff needs v5 DV state
    t.append(one, ts=7.0)                          # v7

    reader = _TxlogCdfStreamReader({"path": t.path})
    reader._log_opens = 0
    parts = reader.partitions({"version": 5}, {"version": 7})
    # only the tail (v6, v7) may be parsed — the ckpt at 5 seeds everything
    assert reader._log_opens == 2
    assert parts  # and it planned real work
    # stream from the checkpointed offset: the diff must read removed files
    # through the CHECKPOINT-seeded DV state (id=0 rows already deleted at
    # v5 must not re-report as deletes of v6)
    out, ckpt = tmp_path / "ck_out", tmp_path / "ck_ckpt"
    _run(spark, t, out, ckpt, read_changes="true", starting_version="5")
    got = spark.read.parquet(str(out))
    batch = t.row_changes(5, t.latest_version()).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    dels6 = sorted(r["id"] for r in got.where(
        "_commit_version = 6 AND _change_type = 'delete'").collect())
    assert dels6 == sorted([6, 7] * 4)  # four files' id>=6 rows; id=0 NOT re-reported


def test_base_stream_reader_opens_only_tail(spark, tmp_path):
    """The non-CDF reader's construction + planning cost is O(tail) on a
    checkpointed log, never O(all versions)."""
    from snapshot_sender_spark.sources.txlog_stream import _TxlogStreamReader

    register(spark)
    t = TxTable(spark, str(tmp_path / "tail_tab"))
    t.CHECKPOINT_INTERVAL = 5
    one = spark.range(0, 3).coalesce(1)
    for i in range(1, 13):
        t.append(one, ts=float(i))  # v1..v12, ckpts at 5 and 10
    reader = _TxlogStreamReader({"path": t.path})
    # construction seeded from ckpt-10: opened only v11, v12
    assert reader._log_opens == 2
    reader._log_opens = 0
    parts = reader.partitions({"version": 10}, {"version": 12})
    assert reader._log_opens == 2 and len(parts) == 2


def test_cdf_insert_path_never_crosses_per_row_python(spark, tmp_path, monkeypatch):
    """Throughput contract (round-12 verdict #1): insert and DV partitions
    decode pure-Arrow — the per-row freeze/digest loop may run ONLY inside
    rewrite-diff partitions. Pinned by poisoning the digest kernel and
    reading insert + DV partitions directly."""
    from snapshot_sender_spark.sources.txlog_stream import (
        _CdfAddPartition,
        _CdfDvPartition,
        _TxlogCdfStreamReader,
    )

    register(spark)
    t = TxTable(spark, str(tmp_path / "contract_tab"))
    t.append(spark.range(0, 50).withColumn("v", F.col("id") * 3).coalesce(1), ts=1.0)
    t.delete_where("id IN (1, 2)", ts=2.0, mode="mor")
    reader = _TxlogCdfStreamReader({"path": t.path})

    def boom(*a, **k):  # pragma: no cover - must never fire
        raise AssertionError("insert/DV partition crossed per-row Python")

    monkeypatch.setattr(_TxlogCdfStreamReader, "_batch_digests", boom)
    parts = reader.partitions({"version": 0}, {"version": 2})
    kinds = {type(p) for p in parts}
    assert kinds == {_CdfAddPartition, _CdfDvPartition}
    rows = 0
    for p in parts:
        for batch in reader.read(p):
            rows += batch.num_rows
    assert rows == 50 + 2  # 50 inserts + 2 deletes, all Arrow-side


def test_max_versions_per_trigger_rate_limits_batches(spark, tmp_path):
    """Admission control (maxFilesPerTrigger's version analog): a stream
    resuming against a commit backlog advances at most N versions per
    trigger instead of planning one giant batch. availableNow snapshots one
    capped offer per RUN (engine behavior for Python sources) — repeated
    runs against one checkpoint drain the backlog in N-version steps;
    without the option, one run drains everything (pre-existing tests)."""
    from snapshot_sender_spark.sources.txlog_stream import _TxlogStreamReader

    register(spark)
    t = TxTable(spark, str(tmp_path / "rate_tab"))
    for i in range(8):
        t.append(spark.range(i * 10, (i + 1) * 10).coalesce(1), ts=float(i + 1))

    seen = []

    def sink(df, bid):
        seen.append(df.count())

    def drain_once():
        q = (
            spark.readStream.format("txlog_stream")
            .option("path", t.path)
            .option("max_versions_per_trigger", "3")
            .load()
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "rate_ckpt"))
            .start()
        )
        q.awaitTermination()

    drain_once()
    drain_once()
    drain_once()
    assert seen == [30, 30, 20]  # 3 + 3 + 2 versions, exactly once each

    # reader-level: offers advance by at most N and resync on commit
    r = _TxlogStreamReader({"path": t.path, "max_versions_per_trigger": "3"})
    assert r.latestOffset() == {"version": 3}
    assert r.latestOffset() == {"version": 6}  # floor advanced by the offer
    r.commit({"version": 6})
    assert r.latestOffset() == {"version": 8}  # capped at the real latest


def test_starting_timestamp_skips_history(spark, tmp_path, table):
    """starting_timestamp: stream every commit whose ts >= T (the Delta
    startingTimestamp shape); ts-less commits never match; mutually
    exclusive with starting_version."""
    out, ckpt = tmp_path / "ts_out", tmp_path / "ts_ckpt"
    # table fixture commits at ts 1.0 (v1: 10 rows) and 2.0 (v2: 15 rows)
    _run(spark, table, out, ckpt, starting_timestamp="1.5")
    got = spark.read.parquet(str(out))
    assert got.count() == 15 and got.select(F.min("id")).collect()[0][0] == 10
    # T before everything -> full history
    _run(spark, table, tmp_path / "ts_out2", tmp_path / "ts_ckpt2",
         starting_timestamp="0.5")
    assert spark.read.parquet(str(tmp_path / "ts_out2")).count() == 25
    # both options together refuse
    import pytest as _pytest

    from snapshot_sender_spark.sources.txlog_stream import _TxlogStreamReader

    with _pytest.raises(ValueError, match="not both"):
        _TxlogStreamReader(
            {"path": table.path, "starting_version": "1", "starting_timestamp": "1.5"}
        )


def test_starting_timestamp_opens_only_tail(spark, tmp_path):
    """Round-12 verdict #4: starting_timestamp resolution was the last
    O(full log) walk — it now scans BACKWARD and stops at the first commit
    older than the target, so a stream starting near the log head opens
    only the newer versions' meta."""
    from snapshot_sender_spark.sources.txlog_stream import _TxlogStreamReader

    register(spark)
    t = TxTable(spark, str(tmp_path / "ts_tail_tab"))
    one = spark.range(0, 3).coalesce(1)
    for i in range(1, 21):
        t.append(one, ts=float(i))  # v1..v20, ts 1..20
    reader = _TxlogStreamReader({"path": t.path, "starting_timestamp": "18.5"})
    assert reader.start_version == 18  # last commit strictly before 18.5
    # backward scan opened v20, v19, v18 (hit) — plus the schema/mapping
    # seed, which is checkpoint-bounded (ckpt at 20 → zero tail opens)
    assert reader._log_opens <= 4
    # semantics unchanged: everything committed at ts >= 18.5 streams
    out, ckpt = tmp_path / "ts_out", tmp_path / "ts_ckpt"
    _run(spark, t, out, ckpt, starting_timestamp="18.5")
    assert spark.read.parquet(str(out)).count() == 6  # v19, v20


def test_snapshot_timestamp_backward_scan_open_count(spark, tmp_path):
    """TxTable.snapshot(timestamp=...) stops its meta scan at the answer:
    a recent timestamp opens O(tail) version files, not the full log."""
    t = TxTable(spark, str(tmp_path / "ts_snap_tab"))
    t.CHECKPOINT_INTERVAL = 5  # ckpts at 5/10/15: replay itself is O(tail)
    one = spark.range(0, 2).coalesce(1)
    for i in range(1, 16):
        t.append(one, ts=float(i))  # v1..v15
    opens = {"n": 0}
    orig = TxTable._read_version_actions

    def counting(self, version):
        opens["n"] += 1
        return orig(self, version)

    TxTable._read_version_actions = counting
    try:
        opens["n"] = 0
        assert t.read(timestamp=14.5).count() == 28  # answer = v14
        meta_opens = opens["n"]
    finally:
        TxTable._read_version_actions = orig
    # v15 (miss) + v14 (hit) + the replay tail from the ckpt — never all 15
    assert meta_opens <= 8, meta_opens
    # exactness preserved, including the no-match refusal
    assert t.read(timestamp=1.0).count() == 2
    with pytest.raises(Exception, match="no commit at or before"):
        t.snapshot(timestamp=0.5)


def test_max_bytes_per_trigger_bounds_micro_batches(spark, tmp_path):
    """Round-12 verdict #7: a backlog drains as byte-bounded micro-batches —
    each trigger admits whole versions until the budget is spent (always at
    least one), and the drained union equals the table exactly."""
    register(spark)
    t = TxTable(spark, str(tmp_path / "mb_tab"))
    for i in range(4):  # 4 commits of ~equal size
        t.append(
            spark.range(i * 100, (i + 1) * 100).withColumn(
                "v", F.col("id") * 2
            ).coalesce(1),
            ts=float(i + 1),
        )
    snap = t.snapshot()
    per_commit = max(a["bytes"] for a in snap.files.values())
    out, ckpt = tmp_path / "mb_out", tmp_path / "mb_ckpt"
    runs = 0
    while runs < 8:
        _run(spark, t, out, ckpt, max_bytes_per_trigger=str(per_commit))
        runs += 1
        if spark.read.parquet(str(out)).count() >= 400:
            break
    # budget ≈ one commit's bytes → one version per availableNow run
    assert runs == 4, runs
    got = spark.read.parquet(str(out))
    assert got.count() == 400
    assert sorted(r["id"] for r in got.collect()) == list(range(400))

    # a single FAT commit exceeding the budget still drains (progress floor)
    t2 = TxTable(spark, str(tmp_path / "mb_fat"))
    t2.append(spark.range(0, 1000).coalesce(2), ts=1.0)
    out2, ckpt2 = tmp_path / "mb_out2", tmp_path / "mb_ckpt2"
    _run(spark, t2, out2, ckpt2, max_bytes_per_trigger="1")
    assert spark.read.parquet(str(out2)).count() == 1000

    # both caps compose: versions tighten first, bytes tighten further
    out3, ckpt3 = tmp_path / "mb_out3", tmp_path / "mb_ckpt3"
    runs = 0
    while runs < 8:
        _run(
            spark, t, out3, ckpt3,
            max_versions_per_trigger="2",
            max_bytes_per_trigger=str(per_commit),
        )
        runs += 1
        if spark.read.parquet(str(out3)).count() >= 400:
            break
    assert runs == 4, runs  # bytes (1 version) is the binding cap
    assert spark.read.parquet(str(out3)).count() == 400


def test_stale_preproto_checkpoint_is_untrusted(spark, tmp_path):
    """Round-12 ADVICE: a checkpoint written before the 'proto' key existed
    must NOT seed replay with an implicit (1,1) — the reader protocol gate
    would be bypassed. Such payloads are skipped (full log replay) by BOTH
    the batch snapshot and the stream reader."""
    import json
    import os

    from snapshot_sender_spark.sources.txlog_stream import _TxlogStreamReader

    register(spark)
    t = TxTable(spark, str(tmp_path / "preproto_tab"))
    t.CHECKPOINT_INTERVAL = 2
    t.append(spark.range(0, 4).coalesce(1), ts=1.0)
    t.append(spark.range(4, 8).coalesce(1), ts=2.0)  # ckpt at v2
    ckpt_file = t._checkpoint_file(2)
    with open(ckpt_file) as fh:
        payload = json.load(fh)
    assert payload["proto"] == [1, 1]
    # simulate a pre-upgrade checkpoint: drop the proto key
    del payload["proto"]
    os.unlink(ckpt_file)
    with open(ckpt_file, "w") as fh:
        json.dump(payload, fh)
    # hand-write a FUTURE-protocol commit the stale checkpoint would mask
    v3 = os.path.join(t.path, "_txlog", "v00000000003.json")
    with open(v3, "w") as fh:
        fh.write(json.dumps({"meta": {
            "version": 3, "op": "append", "ts": 3.0, "schema": None,
            "proto": [99, 99],
        }}) + "\n")
    # the gate MUST fire: replay fell back to the raw log (which carries the
    # floor) instead of trusting the stale checkpoint's implicit (1,1)...
    with pytest.raises(Exception, match="reader protocol 99"):
        TxTable(spark, t.path).snapshot()
    with pytest.raises(Exception, match="reader protocol 99"):
        _TxlogStreamReader({"path": t.path})
    # ...wait — the stale ckpt is at v2, BELOW the v3 proto bump, so even a
    # trusted ckpt would catch v3 in the tail. The real hazard: ckpt AT OR
    # ABOVE the bump. Re-point the stale payload at v3's state.
    payload["version"] = 3
    ckpt3 = t._checkpoint_file(3)
    with open(ckpt3, "w") as fh:
        json.dump(payload, fh)
    with pytest.raises(Exception, match="reader protocol 99"):
        TxTable(spark, t.path).snapshot()
    with pytest.raises(Exception, match="reader protocol 99"):
        _TxlogStreamReader({"path": t.path})
