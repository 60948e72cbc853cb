"""Transactional table format (operators/txlog.py): commit atomicity,
optimistic concurrency, snapshot isolation, copy-on-write delete, stats
pruning, schema evolution, retention."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import (
    TxConflict,
    TxError,
    TxNotFound,
    TxTable,
)


def _mk(spark, tmp_path, name):
    return TxTable(spark, str(tmp_path / name))


def test_append_read_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, "t1")
    t.append(spark.range(0, 10).coalesce(1), ts=10.0)
    t.append(spark.range(10, 25).coalesce(1), ts=20.0)
    assert t.read().count() == 25
    assert t.read(version=1).count() == 10
    assert t.read(timestamp=15.0).count() == 10  # last commit at/before ts
    assert t.read(timestamp=20.0).count() == 25
    with pytest.raises(TxNotFound):
        t.read(timestamp=5.0)
    with pytest.raises(TxNotFound):
        t.read(version=99)


def test_empty_append_reads_back_empty_with_schema(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_empty")
    t.append(spark.range(0, 0).withColumn("x", F.lit("a")).coalesce(1), ts=1.0)
    got = t.read()
    assert got.count() == 0
    assert got.columns == ["id", "x"]


def test_schema_evolution_nulls_and_type_change_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_schema")
    t.append(spark.range(0, 5).coalesce(1), ts=1.0)
    t.append(
        spark.range(5, 8).withColumn("tag", F.lit("new")).coalesce(1), ts=2.0
    )
    got = t.read()
    assert got.columns == ["id", "tag"]
    assert got.where("tag IS NULL").count() == 5  # pre-evolution files backfill NULL
    # appending with a MISSING column is fine (files simply lack it)
    t.append(spark.range(8, 9).coalesce(1), ts=3.0)
    assert t.read().where("tag IS NULL").count() == 6
    with pytest.raises(TxError):
        t.append(spark.range(0, 1).withColumn("tag", F.lit(7)).coalesce(1), ts=4.0)


def test_delete_cow_rewrites_only_hit_files(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_del")
    # two files with disjoint id ranges: the predicate hits only one
    t.append(spark.range(0, 100).repartitionByRange(2, "id"), ts=1.0)
    before = set(t.snapshot().live_paths())
    assert len(before) == 2
    t.delete_where("id < 10", ts=2.0)
    after = set(t.snapshot().live_paths())
    # exactly one original file survives untouched; one was rewritten
    assert len(before & after) == 1
    assert t.read().count() == 90
    assert t.read().where("id < 10").count() == 0
    # a predicate matching nothing commits no new version
    v = t.latest_version()
    assert t.delete_where("id > 10000", ts=3.0) == v
    assert t.latest_version() == v


def test_concurrent_appends_both_land(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_race")
    t.append(spark.range(0, 1).coalesce(1), ts=1.0)
    errs, done = [], []

    def worker(lo, hi):
        try:
            done.append(t.append(spark.range(lo, hi).coalesce(1), ts=2.0))
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(10 * i, 10 * i + 10)) for i in range(1, 5)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert sorted(done) == [2, 3, 4, 5]  # every append claimed a distinct version
    assert t.read().count() == 41


def test_overwrite_race_recomputes_removes(spark, tmp_path):
    """An append that lands between overwrite's snapshot and its commit must
    NOT leak rows past the overwrite (the remove-set is recomputed)."""
    t = _mk(spark, tmp_path, "t_ow")
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)
    # replay overwrite's internals with a commit injected in the window
    base, snap = t._current_base()
    adds = t._stage(spark.range(100, 105).coalesce(1))
    t.append(spark.range(50, 60).coalesce(1), ts=2.0)  # concurrent append wins v2
    schema_json = json.dumps(json.loads(spark.range(0, 1).schema.json()))

    def revalidate(new_snap):
        return new_snap.live_paths(), schema_json

    v = t._commit(
        "overwrite", adds, snap.live_paths(), schema_json, 3.0, base, revalidate
    )
    assert v == 3
    got = [r["id"] for r in t.read().collect()]
    assert sorted(got) == [100, 101, 102, 103, 104]  # appended rows did not survive


def test_delete_conflict_raises(spark, tmp_path):
    """delete_where's predicate scan never saw a concurrent commit → conflict."""
    t = _mk(spark, tmp_path, "t_delrace")
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)
    snap = t.snapshot()
    adds = t._stage(spark.range(5, 10).coalesce(1))

    def revalidate(new_snap):
        raise TxConflict("concurrent commit during delete_where")

    t.append(spark.range(20, 30).coalesce(1), ts=2.0)  # wins the version
    with pytest.raises(TxConflict):
        t._commit(
            "delete",
            adds,
            snap.live_paths(),
            snap.schema_json,
            3.0,
            snap.version,
            revalidate,
        )


def test_compact_conflict_when_input_removed(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_cmp")
    t.append(spark.range(0, 50).repartitionByRange(2, "id"), ts=1.0)
    snap = t.snapshot()
    inputs = snap.live_paths()
    adds = t._stage(t.read_files(inputs, snap.schema()).coalesce(1))
    t.delete_where("id < 10", ts=2.0)  # removes one of compaction's inputs

    def revalidate(new_snap):
        gone = [p for p in inputs if p not in new_snap.files]
        if gone:
            raise TxConflict("inputs removed")
        return inputs, snap.schema_json

    with pytest.raises(TxConflict):
        t._commit("compact", adds, inputs, snap.schema_json, 3.0, snap.version, revalidate)


def test_compact_is_data_equivalent_and_history_preserving(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_hist")
    t.append(spark.range(0, 40).repartitionByRange(4, "id"), ts=1.0)
    t.append(spark.range(40, 60).repartitionByRange(2, "id"), ts=2.0)
    pre = {r["id"] for r in t.read().collect()}
    v = t.compact(target_files=1, ts=3.0)
    snap = t.snapshot()
    assert len(snap.live_paths()) == 1
    assert {r["id"] for r in t.read().collect()} == pre
    # pre-compaction versions still readable (files retained until vacuum)
    assert t.read(version=v - 1).count() == 60
    assert t.read(version=1).count() == 40


def test_snapshot_isolation_reader_survives_overwrite(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_iso")
    t.append(spark.range(0, 30).coalesce(1), ts=1.0)
    pinned = t.read()  # file list fixed at plan time
    t.overwrite(spark.range(100, 105).coalesce(1), ts=2.0)
    assert pinned.count() == 30  # old files still on disk until vacuum
    assert t.read().count() == 5


def test_crash_orphans_invisible_and_vacuumed(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_crash")
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)
    # a crashed commit: files staged+moved, but no log entry ever written
    t._stage(spark.range(99, 120).coalesce(1))
    assert t.read().count() == 10  # orphan invisible: only the log makes files live
    on_disk = [f for f in os.listdir(t.path) if f.endswith(".parquet")]
    assert len(on_disk) == 2
    removed = t.vacuum(retain_versions=1, min_age_s=0)
    assert len(removed) == 1  # exactly the orphan
    assert t.read().count() == 10


def test_vacuum_respects_retention(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_vac")
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)
    t.overwrite(spark.range(10, 15).coalesce(1), ts=2.0)
    t.overwrite(spark.range(20, 22).coalesce(1), ts=3.0)
    assert t.vacuum(retain_versions=2, min_age_s=0) != []  # v1's file goes
    assert t.read(version=2).count() == 5  # retained snapshot intact
    assert t.read(version=3).count() == 2
    with pytest.raises(ValueError):
        t.vacuum(retain_versions=0, min_age_s=0)


def test_no_torn_or_tmp_log_files(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_tmp")
    t.append(spark.range(0, 5).coalesce(1), ts=1.0)
    t.append(spark.range(5, 9).coalesce(1), ts=2.0)
    names = os.listdir(t._log_dir)
    assert sorted(names) == ["v00000000001.json", "v00000000002.json"]
    # every log file parses completely (link publishes whole content)
    for n in names:
        lines = open(os.path.join(t._log_dir, n)).read().splitlines()
        assert all(json.loads(ln) for ln in lines)


def test_stats_pruning_boundaries_and_conservatism(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_prune")
    t.append(
        spark.range(0, 1000)
        .withColumn("s", F.concat(F.lit("k"), F.col("id")))
        .repartitionByRange(4, "id"),
        ts=1.0,
    )
    allf = t.candidate_files()
    assert len(allf) == 4
    # inclusive boundaries: a predicate equal to a file's max keeps that file
    snap = t.snapshot()
    first = snap.files[os.path.basename(sorted(allf)[0])]
    fmax = first["stats"]["id"]["max"]
    kept = t.candidate_files(prune=[("id", fmax, fmax)])
    assert os.path.join(t.path, first["path"]) in kept
    # a tight range prunes to one file, and the pruned read equals the filter
    kept = t.candidate_files(prune=[("id", 10, 20)])
    assert len(kept) == 1
    assert t.read(prune=[("id", 10, 20)]).where("id between 10 and 20").count() == 11
    # unknown column → no pruning; incomparable bound type → conservative keep
    assert len(t.candidate_files(prune=[("nope", 0, 1)])) == 4
    assert len(t.candidate_files(prune=[("id", "a", "b")])) == 4
    # half-open ranges
    assert len(t.candidate_files(prune=[("id", 900, None)])) == 1
    assert len(t.candidate_files(prune=[("id", None, 10)])) == 1


def test_all_null_file_pruned_for_range_predicate(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_null")
    t.append(
        spark.range(0, 10).withColumn("v", F.lit(None).cast("long")).coalesce(1),
        ts=1.0,
    )
    t.append(spark.range(0, 10).withColumn("v", F.col("id")).coalesce(1), ts=2.0)
    kept = t.candidate_files(prune=[("v", 0, 100)])
    assert len(kept) == 1  # the all-NULL file can never satisfy a range predicate
    assert t.read(prune=[("v", 0, 100)]).where("v between 0 and 100").count() == 10


def test_merge_upsert_replaces_and_inserts_cow_scoped(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_merge")
    base = spark.range(0, 100).withColumn("v", F.lit(1))
    t.append(base.repartitionByRange(4, "id"), ts=1.0)
    before = set(t.snapshot().live_paths())
    # update ids 0..9 (all inside the first range file) and insert 200..204
    src = (
        spark.range(0, 10).withColumn("v", F.lit(2))
        .union(spark.range(200, 205).withColumn("v", F.lit(3)))
    )
    t.merge(src, keys=["id"], ts=2.0)
    after = set(t.snapshot().live_paths())
    assert len(before & after) == 3  # three range files untouched
    got = t.read()
    assert got.count() == 105
    assert got.where("v = 2").count() == 10  # replaced, not duplicated
    assert got.where("v = 3").count() == 5
    assert got.where("id < 10 AND v = 1").count() == 0


def test_merge_into_empty_table_is_insert(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_merge_empty")
    t.append(spark.range(0, 0).withColumn("v", F.lit(0)).coalesce(1), ts=1.0)
    t.merge(spark.range(5, 8).withColumn("v", F.lit(9)).coalesce(1), keys=["id"], ts=2.0)
    assert sorted(r["id"] for r in t.read().collect()) == [5, 6, 7]


def test_txn_append_is_idempotent_and_race_safe(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_txn")
    df = spark.range(0, 10).coalesce(1)
    txn = {"app": "ingest", "batch": 0}
    v1 = t.append(df, ts=1.0, txn=txn)
    v2 = t.append(df, ts=1.0, txn=txn)  # replay: must be a no-op
    assert v1 == v2 == 1
    assert t.read().count() == 10
    # a DIFFERENT batch id commits normally
    assert t.append(df, ts=2.0, txn={"app": "ingest", "batch": 1}) == 2
    assert t.read().count() == 20
    # replay race: the txn already landed when the commit claim fails — the
    # loser must return the winner's version and leave no orphan live
    base, snap = t._current_base()
    adds = t._stage(df)
    t.append(df, ts=3.0, txn={"app": "ingest", "batch": 2})  # winner
    # simulate the loser's full append path for the same txn
    v = t.append(df, ts=3.0, txn={"app": "ingest", "batch": 2})
    assert v == 3
    assert t.read().count() == 30


def test_stream_sink_exactly_once(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_sink")
    sink = t.stream_sink("appA")
    b0 = spark.range(0, 7).coalesce(1)
    sink(b0, 0)
    sink(b0, 0)  # replayed micro-batch after a simulated restart
    sink(spark.range(7, 12).coalesce(1), 1)
    assert t.read().count() == 12
    assert t.latest_version() == 2


def test_restore_is_metadata_only_rollback(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_restore")
    t.append(spark.range(0, 20).coalesce(1), ts=1.0)
    t.overwrite(spark.range(100, 103).coalesce(1), ts=2.0)  # the bad deploy
    n_files_before = len(
        [f for f in os.listdir(t.path) if f.endswith(".parquet")]
    )
    v = t.restore(1, ts=3.0)
    assert v == 3
    assert sorted(r["id"] for r in t.read().collect()) == list(range(20))
    # no data moved: the restore only wrote a log entry
    n_files_after = len([f for f in os.listdir(t.path) if f.endswith(".parquet")])
    assert n_files_after == n_files_before
    # the bad interval stays auditable
    assert t.read(version=2).count() == 3
    # restoring to a vacuumed version refuses loudly
    t.overwrite(spark.range(0, 1).coalesce(1), ts=4.0)
    t.vacuum(retain_versions=1, min_age_s=0)
    with pytest.raises(TxNotFound):
        t.restore(1, ts=5.0)


def test_row_changes_reports_only_real_changes(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_cdf")
    t.append(spark.range(0, 30).coalesce(1), ts=1.0)
    t.delete_where("id % 10 = 0", ts=2.0)  # COW rewrite: copies 27, deletes 3
    t.compact(target_files=1, ts=3.0)  # copies everything, changes nothing
    cdf = t.row_changes(1, 3)
    rows = [(r["_commit_version"], r["_change_type"], r["id"]) for r in cdf.collect()]
    assert sorted(rows) == [(2, "delete", 0), (2, "delete", 10), (2, "delete", 20)]
    # the full feed from zero includes the initial inserts
    feed0 = t.row_changes(0, 3)
    assert feed0.where("_change_type = 'insert'").count() == 30
    assert feed0.where("_change_type = 'delete'").count() == 3


def test_row_changes_duplicate_rows_multiset_semantics(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_cdf_dup")
    dup = spark.range(0, 3).union(spark.range(0, 3)).coalesce(1)
    t.append(dup, ts=1.0)  # each id twice
    t.delete_where("id = 1", ts=2.0)  # removes BOTH copies
    cdf = t.row_changes(1, 2)
    assert sorted(r["id"] for r in cdf.where("_change_type='delete'").collect()) == [1, 1]


def test_constraints_enforced_on_append_and_merge(spark, tmp_path):
    from snapshot_sender_spark.operators.txlog import TxError

    t = _mk(spark, tmp_path, "t_cons")
    t.append(spark.range(1, 10).withColumn("v", F.lit(5)).coalesce(1), ts=1.0)
    t.set_constraint("positive_id", "id > 0", ts=2.0)
    t.set_constraint("v_not_null", "v IS NOT NULL", ts=2.5)
    assert set(t.constraints()) == {"positive_id", "v_not_null"}
    # violating append refused, no partial state, no orphan data files
    live_before = set(t.snapshot().live_paths())
    with pytest.raises(TxError, match="constraint violation"):
        t.append(spark.range(-2, 2).withColumn("v", F.lit(1)).coalesce(1), ts=3.0)
    assert set(t.snapshot().live_paths()) == live_before
    on_disk = {f for f in os.listdir(t.path) if f.endswith(".parquet")}
    assert on_disk == live_before
    # an append MISSING column v reads v as NULL under the merged schema → refused
    with pytest.raises(TxError, match="constraint violation"):
        t.append(spark.range(20, 22).coalesce(1), ts=3.5)
    # clean append passes; merge enforces too
    t.append(spark.range(10, 12).withColumn("v", F.lit(7)).coalesce(1), ts=4.0)
    with pytest.raises(TxError, match="constraint violation"):
        t.merge(
            spark.range(5, 6).withColumn("v", F.lit(None).cast("int")).coalesce(1),
            keys=["id"],
            ts=5.0,
        )
    assert t.read().where("v IS NULL").count() == 0
    # registering a constraint the CURRENT data violates is refused
    with pytest.raises(TxError, match="existing rows violate"):
        t.set_constraint("impossible", "id > 100", ts=6.0)


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL stay
    (a plain ~expr rewrite would silently drop them — review finding)."""
    t = _mk(spark, tmp_path, "t_delnull")
    df = spark.createDataFrame([(1, 10), (2, None), (3, 3)], "id int, x int").coalesce(1)
    t.append(df, ts=1.0)
    t.delete_where("x > 5", ts=2.0)
    got = {(r["id"], r["x"]) for r in t.read().collect()}
    assert got == {(2, None), (3, 3)}  # the NULL-x row survived


def test_timestamp_travel_with_tsless_commits(spark, tmp_path):
    """Commits default ts to wall-clock, and an explicitly ts-less log entry
    never breaks timestamp travel."""
    t = _mk(spark, tmp_path, "t_tsless")
    t.append(spark.range(0, 3).coalesce(1))  # wall-clock ts recorded
    t.append(spark.range(3, 5).coalesce(1), ts=9e12)
    import time as _time

    assert t.read(timestamp=_time.time() + 60).count() == 3
    assert t.read(timestamp=9e12).count() == 5
    # a hand-written ts-null entry (legacy table) is skipped, not a crash
    actions = t._read_version_actions(2)
    actions[0]["meta"]["ts"] = None
    with open(t._version_file(2), "w", encoding="utf-8") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    assert t.read(timestamp=9e12).count() == 3  # v2 invisible to ts travel
    assert t.read(version=2).count() == 5  # still reachable by version


def test_vacuum_min_age_protects_inflight_commit(spark, tmp_path):
    """A moved-but-not-yet-committed file inside the grace window must
    survive vacuum (it is indistinguishable from an in-flight commit)."""
    t = _mk(spark, tmp_path, "t_vacage")
    t.append(spark.range(0, 5).coalesce(1), ts=1.0)
    adds = t._stage(spark.range(5, 9).coalesce(1))  # in-flight: staged, no log yet
    assert t.vacuum(retain_versions=1) == []  # default 1h grace: nothing deleted
    # the in-flight commit can still complete and read back
    v = t._commit(
        "append", adds, [], t.snapshot().schema_json, 2.0, 1, lambda s: ([], s.schema_json)
    )
    assert v == 2 and t.read().count() == 9


def test_constraint_null_semantics_match_sql_check(spark, tmp_path):
    """UNKNOWN passes a CHECK on both the registration scan and the staged
    scan, so a row admissible when written can never block a later rewrite
    of its file (review finding: the two paths previously disagreed)."""
    t = _mk(spark, tmp_path, "t_consnull")
    df = spark.createDataFrame([(1, None), (2, 7)], "id int, x int").coalesce(1)
    t.append(df, ts=1.0)
    t.set_constraint("pos_x", "x > 0", ts=2.0)  # NULL x passes (UNKNOWN)
    # merge on an unrelated key rewrites the file containing the NULL row:
    # must succeed under the same NULL convention
    t.merge(
        spark.createDataFrame([(2, 9)], "id int, x int").coalesce(1),
        keys=["id"],
        ts=3.0,
    )
    got = {(r["id"], r["x"]) for r in t.read().collect()}
    assert got == {(1, None), (2, 9)}
    # a genuinely FALSE row is still refused
    from snapshot_sender_spark.operators.txlog import TxError

    with pytest.raises(TxError, match="constraint violation"):
        t.append(spark.createDataFrame([(3, -1)], "id int, x int").coalesce(1), ts=4.0)


def test_row_changes_guards_vacuum_and_schema_reset(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_cdf_guard")
    t.append(spark.range(0, 5).coalesce(1), ts=1.0)
    t.overwrite(
        spark.range(0, 3).select(F.col("id").cast("string").alias("id")).coalesce(1),
        ts=2.0,
    )
    with pytest.raises(TxError, match="schema reset"):
        t.row_changes(0, 2)
    # also when the pre-reset commit sits BEFORE the interval: the removed
    # files were written under the base schema, which must be type-checked too
    with pytest.raises(TxError, match="schema reset"):
        t.row_changes(1, 2)
    t2 = _mk(spark, tmp_path, "t_cdf_guard2")
    t2.append(spark.range(0, 5).coalesce(1), ts=1.0)
    t2.overwrite(spark.range(5, 7).coalesce(1), ts=2.0)
    t2.vacuum(retain_versions=1, min_age_s=0)
    with pytest.raises(TxNotFound, match="vacuum"):
        t2.row_changes(0, 2)


def test_log_checkpointing_equivalence_and_gc(spark, tmp_path):
    """Snapshots replayed through a checkpoint equal a full log walk; old
    checkpoints are GC'd by vacuum; history below the oldest checkpoint
    still replays from the raw log."""
    t = _mk(spark, tmp_path, "t_ckpt")
    one = spark.range(0, 4).coalesce(1)
    for i in range(1, 45):
        if i == 10:
            t.delete_where("id = 0", ts=float(i))
        else:
            t.append(one, ts=float(i))
    assert t._list_checkpoints() == [20, 40]
    snap = t.snapshot()
    # ground truth: replay with checkpoints hidden
    for c in list(t._list_checkpoints()):
        os.rename(t._checkpoint_file(c), t._checkpoint_file(c) + ".hidden")
    raw = t.snapshot()
    assert raw.files == snap.files
    assert raw.txns == snap.txns and raw.constraints == snap.constraints
    for c in (20, 40):
        os.rename(t._checkpoint_file(c) + ".hidden", t._checkpoint_file(c))
    # mid-history snapshot (below newest ckpt) uses the older one, equal too
    assert t.snapshot(version=25).total_rows() == raw.total_rows() - 19 * 4
    # vacuum keeps the newest two checkpoints (both here), historical reads OK
    t.vacuum(retain_versions=44, min_age_s=0)
    assert t._list_checkpoints() == [20, 40]
    assert t.snapshot(version=5).total_rows() == 5 * 4  # below oldest ckpt
    # no torn tmp files linger in the log dir
    assert not [n for n in os.listdir(t._log_dir) if n.startswith(".tmp")]


def test_checkpointed_snapshot_drives_reads_and_txns(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_ckpt2")
    for i in range(1, 22):
        t.append(spark.range(i, i + 1).coalesce(1), ts=float(i), txn={"b": i})
    assert t._list_checkpoints() == [20]
    # txn idempotence must see txns THROUGH the checkpoint
    assert t.append(spark.range(0, 1).coalesce(1), ts=5.0, txn={"b": 5}) == 5
    assert t.read().count() == 21


def test_zorder_clustering_prunes_both_dimensions(spark, tmp_path):
    """On a 64×64 grid in 16 files: linear clustering on x prunes x-predicates
    only (every file spans all of y); Morton clustering prunes BOTH
    dimensions. Layout never changes results."""
    from snapshot_sender_spark.queries.scale_q import _morton16

    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )
    lin = _mk(spark, tmp_path, "t_linear")
    lin.append(grid.repartitionByRange(16, "x").sortWithinPartitions("x"), ts=1.0)
    zt = _mk(spark, tmp_path, "t_z")
    zkey = _morton16("x", "y")
    zt.append(
        grid.withColumn("zk", F.expr(zkey))
        .repartitionByRange(16, "zk")
        .sortWithinPartitions("zk")
        .drop("zk"),
        ts=1.0,
    )
    y_pred = [("y", 0, 7)]
    assert len(lin.candidate_files(prune=y_pred)) == 16  # no help at all
    assert len(zt.candidate_files(prune=y_pred)) <= 8  # half the curve or less
    x_pred = [("x", 0, 7)]
    assert len(lin.candidate_files(prune=x_pred)) <= 4
    assert len(zt.candidate_files(prune=x_pred)) <= 8
    box = [("x", 10, 13), ("y", 10, 13)]
    assert len(zt.candidate_files(prune=box)) <= 2
    # layout and pruning never change the answer
    for t in (lin, zt):
        got = (
            t.read(prune=box)
            .where("x BETWEEN 10 AND 13 AND y BETWEEN 10 AND 13")
            .count()
        )
        assert got == 16


def test_compact_with_clustering_tightens_stats(spark, tmp_path):
    """OPTIMIZE-with-clustering: scattered appends give useless per-file
    stats; a clustered compaction makes a box predicate prunable — data
    equivalence throughout."""
    from snapshot_sender_spark.queries.scale_q import _morton16

    t = _mk(spark, tmp_path, "t_opt")
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    # scattered ingest: hash-partitioned appends → every file spans everything
    t.append(grid.repartition(8), ts=1.0)
    box = [("x", 10, 13), ("y", 10, 13)]
    assert len(t.candidate_files(prune=box)) == 8  # nothing prunable
    pre = t.read().count()
    t.compact(target_files=16, ts=2.0, cluster_expr=_morton16("x", "y"))
    assert len(t.snapshot().live_paths()) == 16
    assert len(t.candidate_files(prune=box)) <= 2  # clustered: box prunes
    got = t.read(prune=box).where("x BETWEEN 10 AND 13 AND y BETWEEN 10 AND 13")
    assert got.count() == 16 and t.read().count() == pre


def test_history_accounts_overwrite_and_restore(spark, tmp_path):
    """history()'s rows_removed resolves removes against the add payloads —
    verified for the overwrite (removes all prior live) and restore (re-adds
    old payloads, removes current) paths the query lifecycle doesn't hit."""
    t = _mk(spark, tmp_path, "t_hist_or")
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)  # v1: +10
    t.overwrite(spark.range(0, 3).coalesce(1), ts=2.0)  # v2: +3 / -10
    t.restore(1, ts=3.0)  # v3: +10 (re-add v1's payloads) / -3
    t.delete_where("id < 2", ts=4.0)  # v4: +8 / -10 (the restored file)
    h = {r["version"]: r for r in t.history().collect()}
    assert (h[1]["rows_added"], h[1]["rows_removed"]) == (10, 0)
    assert (h[2]["op"], h[2]["rows_added"], h[2]["rows_removed"]) == ("overwrite", 3, 10)
    assert (h[3]["op"], h[3]["rows_added"], h[3]["rows_removed"]) == ("restore", 10, 3)
    assert (h[4]["op"], h[4]["rows_added"], h[4]["rows_removed"]) == ("delete", 8, 10)
    assert h[2]["n_files_removed"] == 1 and h[3]["n_files_added"] == 1


def test_legacy_constraint_log_entries_still_enforced(spark, tmp_path):
    """Log entries from the pre-dedicated-key format (constraints stored
    under meta.txn) replay into the constraints table and never pollute the
    txn-identity map."""
    t = _mk(spark, tmp_path, "t_legacy")
    t.append(spark.range(1, 5).coalesce(1), ts=1.0)
    # hand-write a legacy-format set_constraint entry as v2
    legacy = {
        "meta": {
            "version": 2, "op": "set_constraint", "ts": 2.0,
            "schema": t.snapshot().schema_json,
            "txn": {"constraints": {"pos": "id > 0"}},
        }
    }
    with open(t._version_file(2), "w", encoding="utf-8") as fh:
        fh.write(json.dumps(legacy) + "\n")
    assert t.constraints() == {"pos": "id > 0"}
    assert t.snapshot().txns == {}  # not misread as a txn identity
    with pytest.raises(TxError, match="constraint violation"):
        t.append(spark.range(-1, 0).coalesce(1), ts=3.0)


def test_checkpoint_write_failure_never_fails_the_commit(spark, tmp_path, monkeypatch):
    t = _mk(spark, tmp_path, "t_ckptfail")
    one = spark.range(0, 2).coalesce(1)
    for i in range(1, 20):
        t.append(one, ts=float(i))
    monkeypatch.setattr(
        type(t), "_write_checkpoint", lambda self, snap: (_ for _ in ()).throw(OSError("disk full"))
    )
    assert t.append(one, ts=20.0) == 20  # the 20th commit succeeds anyway
    monkeypatch.undo()
    assert t._list_checkpoints() == []  # no checkpoint, but no failure either
    assert t.read().count() == 40


def test_mor_delete_writes_no_files_and_reads_exclude(spark, tmp_path):
    """Merge-on-read delete: one log entry, zero rewrites; reads anti-join
    the vector away; a second MOR delete on the same file merges; total_rows
    accounts for vectors; history counts the rows."""
    t = _mk(spark, tmp_path, "t_mor")
    t.append(spark.range(0, 100).repartitionByRange(2, "id"), ts=1.0)
    before = set(t.snapshot().live_paths())
    t.delete_where("id % 10 = 3", ts=2.0, mode="mor")
    snap = t.snapshot()
    assert set(snap.live_paths()) == before  # NO file rewritten
    assert snap.total_rows() == 90
    assert t.read().count() == 90
    assert t.read().where("id % 10 = 3").count() == 0
    # second vector on the same files merges; already-deleted rows not re-counted
    t.delete_where("id % 10 IN (3, 7)", ts=3.0, mode="mor")
    assert t.read().count() == 80
    h = {r["version"]: r for r in t.history().collect()}
    assert (h[2]["rows_removed"], h[2]["n_files_removed"]) == (10, 0)
    assert h[3]["rows_removed"] == 10  # only the NEW matches
    # time travel reads the PRE-vector state
    assert t.read(version=1).count() == 100
    assert t.read(version=2).count() == 90
    # a no-match MOR delete commits nothing
    v = t.latest_version()
    assert t.delete_where("id > 1000000000", ts=4.0, mode="mor") == v


def test_mor_then_cow_and_compact_materialize_vectors(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_mor_mat")
    t.append(spark.range(0, 50).coalesce(1), ts=1.0)
    t.delete_where("id < 5", ts=2.0, mode="mor")
    # COW delete on the same file must not resurrect the MOR-deleted rows
    t.delete_where("id >= 45", ts=3.0, mode="cow")
    got = sorted(r["id"] for r in t.read().collect())
    assert got == list(range(5, 45))
    assert not t.snapshot().dv_map()  # the rewrite materialized the vector
    # and compaction does the same
    t2 = _mk(spark, tmp_path, "t_mor_cmp")
    t2.append(spark.range(0, 30).coalesce(1), ts=1.0)
    t2.delete_where("id % 3 = 0", ts=2.0, mode="mor")
    t2.compact(target_files=1, ts=3.0)
    assert not t2.snapshot().dv_map()
    assert t2.read().count() == 20
    assert t2.snapshot().total_rows() == 20


def test_mor_merge_does_not_resurrect_deleted_keys(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_mor_merge")
    t.append(spark.range(0, 20).withColumn("v", F.lit(1)).coalesce(1), ts=1.0)
    t.delete_where("id = 7", ts=2.0, mode="mor")
    # merge updating id=3: rewrites the hit file; id=7 must STAY deleted
    t.merge(
        spark.createDataFrame([(3, 9)], "id long, v int").coalesce(1),
        keys=["id"],
        ts=3.0,
    )
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert 7 not in got and got[3] == 9 and len(got) == 19


def test_mor_row_changes_exact_and_no_double_report(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_mor_cdf")
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)
    t.delete_where("id IN (2, 4)", ts=2.0, mode="mor")
    t.delete_where("id = 8", ts=3.0, mode="cow")  # rewrites the DV'd file
    cdf = t.row_changes(1, 3)
    dels = sorted(
        (r["_commit_version"], r["id"])
        for r in cdf.where("_change_type = 'delete'").collect()
    )
    # v2 reports exactly the vector rows; v3 reports ONLY id=8 (the rows the
    # MOR delete already reported are not re-reported by the rewrite)
    assert dels == [(2, 2), (2, 4), (3, 8)]


def test_mor_cap_routes_to_sidecar_vector(spark, tmp_path):
    """Above MOR_MAX_INLINE_DV the vector goes to a SIDECAR parquet written
    distributed (never through the driver) instead of failing: the commit
    stays merge-on-read, bumps the reader protocol, and reads stay exact."""
    t = _mk(spark, tmp_path, "t_mor_cap")
    t.MOR_MAX_INLINE_DV = 5
    t.append(spark.range(0, 20).coalesce(1), ts=1.0)
    before = set(t.snapshot().live_paths())
    t.delete_where("id >= 8", ts=2.0, mode="mor")  # 12 rows > cap -> sidecar
    snap = t.snapshot()
    assert set(snap.live_paths()) == before       # still zero rewrites
    assert snap.dvf_map() and not snap.dv_map()   # sidecar, not inline
    assert snap.proto == (2, 2)                   # protocol recorded
    assert sorted(r["id"] for r in t.read().collect()) == list(range(8))
    assert snap.total_rows() == 8
    # a second sidecar delete excludes the already-deleted rows exactly
    t.delete_where("id >= 2", ts=3.0, mode="mor")
    assert t.read().count() == 2
    h = {r["version"]: r for r in t.history().collect()}
    assert h[2]["rows_removed"] == 12 and h[3]["rows_removed"] == 6
    # compaction materializes sidecar vectors away like inline ones
    t.compact(target_files=1, ts=4.0)
    assert not t.snapshot().dvf_map()
    assert t.read().count() == 2
    # vacuum sweeps the now-unreferenced sidecar files
    removed = t.vacuum(retain_versions=1, min_age_s=0)
    assert any(r.startswith("dvf-") for r in removed)
    assert t.read().count() == 2


def test_takedown_destroys_bytes_after_vacuum(spark, tmp_path):
    """The full GDPR contract: delete_where removes the rows from every
    subsequent read, history records what was removed, and once retention
    ages the old version out, vacuum physically destroys the bytes — the
    sentinel string must not survive in ANY file under the table dir."""
    sentinel = "GDPR-SENTINEL-7f3a9c"
    t = _mk(spark, tmp_path, "t_gdpr")
    df = spark.createDataFrame(
        [(1, "ordinary text"), (2, sentinel + " payload"), (3, "more text")],
        "id int, body string",
    ).coalesce(1)
    t.append(df, ts=1.0)
    t.delete_where(f"body LIKE '%{sentinel}%'", ts=2.0)
    assert t.read().where(F.col("body").contains(sentinel)).count() == 0
    h = {r["version"]: r for r in t.history().collect()}
    assert h[2]["op"] == "delete" and h[2]["rows_removed"] == 3  # COW file had 3
    # pre-vacuum the bytes still exist (time travel still serves v1)...
    def _sentinel_on_disk() -> bool:
        for root, _dirs, files in os.walk(t.path):
            for name in files:
                with open(os.path.join(root, name), "rb") as fh:
                    if sentinel.encode() in fh.read():
                        return True
        return False

    assert _sentinel_on_disk()
    t.vacuum(retain_versions=1, min_age_s=0)
    # ...post-vacuum they are GONE from every byte under the table — string
    # stats are prefix-truncated, so the log never memorized the full value
    assert not _sentinel_on_disk()
    assert t.read().count() == 2
    # with stats_exclude, not even a prefix of the content column is logged
    t2 = TxTable(spark, str(tmp_path / "t_gdpr2"), stats_exclude=("body",))
    t2.append(df, ts=1.0)
    for add in t2.snapshot().files.values():
        assert "body" not in add["stats"]
        assert "id" in add["stats"]  # key columns keep stats for pruning


def test_string_stat_truncation_bounds_stay_sound(spark, tmp_path):
    """Truncated string stats must remain valid bounds: pruning with them
    can never skip a file that contains a matching row."""
    from snapshot_sender_spark.operators.txlog import _truncate_stat_bounds

    cases = [
        ("aaaaaaaaaaaaaaaaaaaaZ", "zzzzzzzzzzzzzzzzzzzzB"),
        ("short", "also-short"),
        ("prefix-equal-prefix-equal-A", "prefix-equal-prefix-equal-B"),
        ("\U0010ffff" * 20, "\U0010ffff" * 21),  # max-side bump overflows
    ]
    for vmin, vmax in cases:
        vmin, vmax = min(vmin, vmax), max(vmin, vmax)
        tmin, tmax = _truncate_stat_bounds(vmin, vmax)
        if tmin is None:
            continue  # dropped entirely: conservative
        assert tmin <= vmin and tmax >= vmax, (vmin, vmax, tmin, tmax)
    # end-to-end: a long-string column still prunes correctly at boundaries
    t = _mk(spark, tmp_path, "t_trunc")
    long_a = "a" * 40
    long_z = "z" * 40
    t.append(spark.createDataFrame([(long_a,)], "s string").coalesce(1), ts=1.0)
    t.append(spark.createDataFrame([(long_z,)], "s string").coalesce(1), ts=2.0)
    kept = t.candidate_files(prune=[("s", long_z, long_z)])
    assert len(kept) == 1  # the all-a file is prunable even with truncation
    assert t.read(prune=[("s", long_z, long_z)]).where(F.col("s") == long_z).count() == 1


def test_mixed_writer_stress_invariants(spark, tmp_path):
    """Concurrent appends, deletes, and compactions with conflict retries:
    whatever interleaving happens, (a) every appended row not explicitly
    deleted is present exactly once, (b) every live file exists on disk,
    (c) the log replays cleanly at every version."""
    t = _mk(spark, tmp_path, "t_stress")
    t.append(spark.range(0, 100).coalesce(1), ts=0.0)
    errs = []

    def appender(lo):
        try:
            t.append(spark.range(lo, lo + 50).coalesce(2), ts=1.0)
        except Exception as e:  # pragma: no cover
            errs.append(("append", e))

    def deleter():
        for _ in range(5):
            try:
                t.delete_where("id % 100 = 7", ts=2.0)
                return
            except TxConflict:
                continue
        errs.append(("delete", "never converged"))  # pragma: no cover

    def compactor():
        for _ in range(5):
            try:
                t.compact(target_files=2, ts=3.0)
                return
            except TxConflict:
                continue
        # compaction may legitimately stay contended; that's not an error

    threads = [
        threading.Thread(target=appender, args=(1000,)),
        threading.Thread(target=appender, args=(2000,)),
        threading.Thread(target=deleter),
        threading.Thread(target=compactor),
        threading.Thread(target=appender, args=(3000,)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    snap = t.snapshot()
    # (b) every live file exists
    for rel in snap.live_paths():
        assert os.path.exists(os.path.join(t.path, rel))
    # (a) all appended ids present exactly once, modulo the delete
    got = [r["id"] for r in t.read().collect()]
    assert len(got) == len(set(got))  # no duplicates from any interleaving
    expected = set(range(0, 100)) | set(range(1000, 1050)) | set(range(2000, 2050)) | set(range(3000, 3050))
    deleted = {i for i in expected if i % 100 == 7}
    missing = (expected - deleted) - set(got)
    extra = set(got) - expected
    assert not extra, sorted(extra)[:5]
    # the delete may have landed before some appends; rows it never saw stay
    assert missing <= deleted or not missing, sorted(missing)[:5]
    # (c) every historical version replays and its live files are consistent
    for v in range(1, snap.version + 1):
        s = t.snapshot(version=v)
        assert all(isinstance(a["rows"], int) for a in s.files.values())


def test_changes_feed_supports_incremental_aggregation(spark, tmp_path):
    """new_state = old_state + agg(added) − agg(removed), folded over the
    change feed, equals a full recompute after append/append/delete/compact."""
    t = _mk(spark, tmp_path, "t_inc")
    t.append(
        spark.range(0, 60).withColumn("g", F.col("id") % 3).coalesce(1), ts=1.0
    )
    t.append(
        spark.range(60, 100).withColumn("g", F.col("id") % 3).coalesce(1), ts=2.0
    )
    t.delete_where("id % 7 = 0", ts=3.0)
    t.compact(target_files=1, ts=4.0)

    snap = t.snapshot()
    schema = snap.schema()
    state: dict[int, list] = {}  # g -> [count, sum]
    for _v, _op, added, removed in t.changes(0, snap.version):
        for rels, sign in ((added, 1), (removed, -1)):
            rows = (
                t.read_files(rels, schema)
                .groupBy("g")
                .agg(F.count("*").alias("c"), F.sum("id").alias("s"))
                .collect()
            )
            for r in rows:
                cur = state.setdefault(r["g"], [0, 0])
                cur[0] += sign * r["c"]
                cur[1] += sign * r["s"]
    full = {
        r["g"]: [r["c"], r["s"]]
        for r in t.read()
        .groupBy("g")
        .agg(F.count("*").alias("c"), F.sum("id").alias("s"))
        .collect()
    }
    assert {g: v for g, v in state.items() if v[0] != 0} == full


def test_restore_resets_deletion_vectors(spark, tmp_path):
    """Restoring across a merge-on-read delete must resurrect the DV'd rows:
    the live set after RESTORE is exactly the target snapshot's, including
    files whose deletion-vector state changed after the restore point."""
    t = _mk(spark, tmp_path, "t_restore_dv")
    t.append(spark.range(0, 30).coalesce(1), ts=1.0)       # v1
    t.delete_where("id % 10 = 0", ts=2.0, mode="mor")      # v2: DV {0,10,20}
    assert t.read().count() == 27
    v = t.restore(1, ts=3.0)                               # back before the DV
    assert v == 3
    assert sorted(r["id"] for r in t.read().collect()) == list(range(30))
    assert not t.snapshot().dv_map()
    # restore FORWARD to the DV'd version: the vector comes back
    t.restore(2, ts=4.0)
    assert t.read().count() == 27
    assert t.read().where("id % 10 = 0").count() == 0
    # CDF across the rollback reports the resurrected rows as inserts only
    cdf = t.row_changes(2, 3)
    ins = sorted(r["id"] for r in cdf.where("_change_type = 'insert'").collect())
    assert ins == [0, 10, 20]
    assert cdf.where("_change_type = 'delete'").count() == 0
    # and across the forward restore, as deletes only
    cdf2 = t.row_changes(3, 4)
    dels = sorted(r["id"] for r in cdf2.where("_change_type = 'delete'").collect())
    assert dels == [0, 10, 20]
    assert cdf2.where("_change_type = 'insert'").count() == 0


def test_history_nets_to_live_rows_across_mor_and_rewrites(spark, tmp_path):
    """Cumulative rows_added - rows_removed == live rows at every version,
    including MOR deletes followed by COW rewrites/compactions of the same
    files (the double-count ADVICE case) and DV-resetting restores."""
    t = _mk(spark, tmp_path, "t_hist_net")
    t.append(spark.range(0, 40).coalesce(1), ts=1.0)
    t.delete_where("id < 4", ts=2.0, mode="mor")
    t.delete_where("id >= 36", ts=3.0, mode="cow")  # rewrites the DV'd file
    t.compact(target_files=1, ts=4.0)
    t.append(spark.range(100, 110).coalesce(1), ts=5.0)
    t.delete_where("id >= 100", ts=6.0, mode="mor")
    t.restore(5, ts=7.0)  # resurrect the 10 MOR-deleted rows
    hist = sorted(
        (r["version"], r["rows_added"], r["rows_removed"])
        for r in t.history().collect()
    )
    net = 0
    for v, ra, rr in hist:
        net += ra - rr
        assert net == t.snapshot(version=v).total_rows(), f"v{v}: {net}"
        assert net == t.read(version=v).count()


def test_concurrent_set_constraint_gates_racing_append(spark, tmp_path):
    """An append that races with set_constraint must enforce the NEW
    constraint on its staged batch at revalidate time — the batch cannot
    sneak rows past a check registered before its commit landed."""
    t = _mk(spark, tmp_path, "t_cons_race")
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)

    real_commit = t._commit
    state = {"injected": False}

    def racing_commit(op, adds, removes, schema_json, ts, base_version, revalidate, **kw):
        # inject a set_constraint AFTER the append staged+validated but
        # BEFORE its version claim, stealing its version number
        if op == "append" and not state["injected"]:
            state["injected"] = True
            other = TxTable(spark, t.path)
            other.set_constraint("small", "id < 50", ts=1.5)
        return real_commit(op, adds, removes, schema_json, ts, base_version, revalidate, **kw)

    t._commit = racing_commit
    with pytest.raises(TxError, match="constraint violation"):
        t.append(spark.range(90, 95).coalesce(1), ts=2.0)
    t._commit = real_commit
    assert sorted(r["id"] for r in t.read().collect()) == list(range(10))
    # a CLEAN racing batch still lands (constraint re-check passes)
    state["injected"] = False

    def racing_commit2(op, adds, removes, schema_json, ts, base_version, revalidate, **kw):
        if op == "append" and not state["injected"]:
            state["injected"] = True
            other = TxTable(spark, t.path)
            other.set_constraint("nonneg", "id >= 0", ts=2.5)
        return real_commit(op, adds, removes, schema_json, ts, base_version, revalidate, **kw)

    t._commit = racing_commit2
    t.append(spark.range(20, 25).coalesce(1), ts=3.0)
    assert t.read().count() == 15
    assert set(t.constraints()) == {"small", "nonneg"}


def test_mor_merge_zero_rewrites_and_equals_cow(spark, tmp_path):
    """Merge-on-read MERGE: matched rows are DV-invalidated and the source
    appended in ONE commit — zero files rewritten — and the result equals
    the copy-on-write merge on the same inputs."""
    src = spark.createDataFrame(
        [(3, 99), (7, 77), (100, 1)], "id long, v int"
    ).coalesce(1)
    results = {}
    for mode in ("cow", "mor"):
        t = _mk(spark, tmp_path, f"t_merge_{mode}")
        t.append(spark.range(0, 20).withColumn("v", F.lit(1)).coalesce(1), ts=1.0)
        before = set(t.snapshot().live_paths())
        t.merge(src, keys=["id"], ts=2.0, mode=mode)
        after = set(t.snapshot().live_paths())
        if mode == "mor":
            assert before <= after  # nothing rewritten, only appends
            assert t.snapshot().dv_map()  # the old matched rows are DV'd
        else:
            assert before - after  # cow rewrote the hit file
        results[mode] = sorted(map(tuple, t.read().collect()))
    assert results["cow"] == results["mor"]
    assert dict(results["mor"])[3] == 99 and dict(results["mor"])[100] == 1
    assert len(results["mor"]) == 21


def test_mor_merge_cdf_row_exact_and_history_nets(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_merge_mor_cdf")
    t.append(spark.range(0, 10).withColumn("v", F.lit(1)).coalesce(1), ts=1.0)
    t.merge(
        spark.createDataFrame([(4, 2), (40, 2)], "id long, v int").coalesce(1),
        keys=["id"], ts=2.0, mode="mor",
    )
    cdf = t.row_changes(1, 2)
    dels = sorted((r["id"], r["v"]) for r in cdf.where("_change_type='delete'").collect())
    ins = sorted((r["id"], r["v"]) for r in cdf.where("_change_type='insert'").collect())
    assert dels == [(4, 1)]           # the replaced OLD row, exactly once
    assert ins == [(4, 2), (40, 2)]   # the update's new image + the insert
    net = 0
    for r in sorted(t.history().collect(), key=lambda r: r["version"]):
        net += r["rows_added"] - r["rows_removed"]
        assert net == t.read(version=r["version"]).count()
    # a second MOR merge touching an already-DV'd file does not re-delete
    t.merge(
        spark.createDataFrame([(5, 3)], "id long, v int").coalesce(1),
        keys=["id"], ts=3.0, mode="mor",
    )
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[4] == 2 and got[5] == 3 and len(got) == 11
    # compaction materializes all vectors away
    t.compact(target_files=1, ts=4.0)
    assert not t.snapshot().dv_map()
    assert {r["id"]: r["v"] for r in t.read().collect()} == got


def test_mor_merge_respects_prior_deletes_and_cap(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_merge_mor_prior")
    t.append(spark.range(0, 20).withColumn("v", F.lit(1)).coalesce(1), ts=1.0)
    t.delete_where("id = 7", ts=2.0, mode="mor")
    # merging key 7 after its MOR delete INSERTS it (no match against a
    # deleted row) and must not double-report or resurrect the old image
    t.merge(
        spark.createDataFrame([(7, 9)], "id long, v int").coalesce(1),
        keys=["id"], ts=3.0, mode="mor",
    )
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[7] == 9 and len(got) == 20
    cdf = t.row_changes(2, 3)
    assert cdf.where("_change_type='delete'").count() == 0  # nothing matched
    # above the inline cap a MOR merge writes a SIDECAR vector in the same
    # atomic commit as its appends — still zero rewrites, answer unchanged
    t2 = _mk(spark, tmp_path, "t_merge_mor_cap")
    t2.MOR_MAX_INLINE_DV = 5
    t2.append(spark.range(0, 20).withColumn("v", F.lit(1)).coalesce(1), ts=1.0)
    before2 = set(t2.snapshot().live_paths())
    t2.merge(
        spark.range(0, 10).withColumn("v", F.lit(2).cast("int")).coalesce(1),
        keys=["id"], ts=2.0, mode="mor",
    )
    assert before2 <= set(t2.snapshot().live_paths())
    assert t2.snapshot().dvf_map()
    got2 = {r["id"]: r["v"] for r in t2.read().collect()}
    assert len(got2) == 20 and all(got2[i] == 2 for i in range(10))
    # CDF is row-exact through the sidecar
    cdf2 = t2.row_changes(1, 2)
    assert cdf2.where("_change_type='delete'").count() == 10
    assert cdf2.where("_change_type='insert'").count() == 10


def test_apply_changes_updates_deletes_in_one_commit(spark, tmp_path):
    """apply_changes: one atomic MOR commit applies a CDF batch — updates
    (delete old + insert new at one version) take the NEW image, deletes
    remove the row, fresh keys insert; zero files rewritten."""
    t = _mk(spark, tmp_path, "t_apply")
    t.append(
        spark.range(0, 10).withColumn("v", F.lit(1).cast("int")).coalesce(1), ts=1.0
    )
    before = set(t.snapshot().live_paths())
    changes = spark.createDataFrame(
        [
            (3, 1, "delete", 7),   # update: old image out...
            (3, 9, "insert", 7),   # ...new image in (same version — insert wins)
            (5, 1, "delete", 7),   # plain delete
            (50, 2, "insert", 7),  # plain insert
            (6, 1, "delete", 6),   # STALE delete superseded by...
            (6, 4, "insert", 7),   # ...a later insert: the insert wins
        ],
        "id long, v int, _change_type string, _commit_version long",
    ).coalesce(1)
    v = t.apply_changes(changes, keys=["id"], ts=2.0)
    assert v == 2
    assert before <= set(t.snapshot().live_paths())  # nothing rewritten
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[3] == 9 and got[6] == 4 and got[50] == 2
    assert 5 not in got and len(got) == 10  # 10 - 1 delete + 1 insert
    # history still nets
    net = 0
    for r in sorted(t.history().collect(), key=lambda r: r["version"]):
        net += r["rows_added"] - r["rows_removed"]
        assert net == t.read(version=r["version"]).count()


def test_apply_changes_idempotent_on_txn(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_apply_txn")
    t.append(spark.range(0, 5).withColumn("v", F.lit(1).cast("int")).coalesce(1), ts=1.0)
    changes = spark.createDataFrame(
        [(2, 8, "insert", 3), (4, 1, "delete", 3)],
        "id long, v int, _change_type string, _commit_version long",
    ).coalesce(1)
    txn = {"app": "cdc", "batch": 3}
    v1 = t.apply_changes(changes, keys=["id"], ts=2.0, txn=txn)
    v2 = t.apply_changes(changes, keys=["id"], ts=3.0, txn=txn)  # replay: no-op
    assert v1 == v2 == t.latest_version()
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[2] == 8 and 4 not in got and len(got) == 4


def test_incremental_optimize_packs_only_small_files(spark, tmp_path):
    """compact(only_smaller_than=...): bin-packs the small-file backlog a
    streaming table accretes, leaves right-sized files (and their deletion
    vectors) untouched — cost tracks the backlog, not the table."""
    t = _mk(spark, tmp_path, "t_opt_small")
    t.append(spark.range(0, 100_000).coalesce(1), ts=1.0)  # the big file
    for i in range(4):  # micro-batch dribble: 4 small files
        t.append(spark.range(200_000 + 10 * i, 200_000 + 10 * i + 10).coalesce(1),
                 ts=2.0 + i)
    t.delete_where("id = 5", ts=6.0, mode="mor")  # DV on the BIG file
    snap = t.snapshot()
    big = max(snap.live_paths(), key=lambda p: snap.files[p]["bytes"])
    threshold = snap.files[big]["bytes"]  # strictly-below: excludes the big file
    v = t.compact(target_files=1, ts=7.0, only_smaller_than=threshold)
    snap2 = t.snapshot()
    assert big in snap2.files                      # untouched
    assert snap2.files[big].get("dv") == [5]       # its vector survives
    assert len(snap2.live_paths()) == 2            # big + one packed file
    assert t.read().count() == 100_000 + 40 - 1
    # packing nothing is a no-op (all remaining files >= their own size)
    assert t.compact(ts=8.0, only_smaller_than=1) == v
    # history still nets to live rows
    net = 0
    for r in sorted(t.history().collect(), key=lambda r: r["version"]):
        net += r["rows_added"] - r["rows_removed"]
        assert net == t.read(version=r["version"]).count()


def test_compact_conflicts_on_concurrent_mor_delete(spark, tmp_path):
    """A deletion vector committed on a compaction input AFTER the rewrite
    was staged must abort the compaction — a retry would resurrect the
    concurrently deleted rows (review finding, round 11)."""
    t = _mk(spark, tmp_path, "t_cmp_dv_race")
    t.append(spark.range(0, 30).coalesce(1), ts=1.0)
    real_commit = t._commit
    state = {"injected": False}

    def racing_commit(op, adds, removes, schema_json, ts, base_version, revalidate, **kw):
        if op == "compact" and not state["injected"]:
            state["injected"] = True
            TxTable(spark, t.path).delete_where("id = 7", ts=1.5, mode="mor")
        return real_commit(op, adds, removes, schema_json, ts, base_version, revalidate, **kw)

    t._commit = racing_commit
    with pytest.raises(TxConflict, match="deletion vectors changed"):
        t.compact(target_files=1, ts=2.0)
    t._commit = real_commit
    assert t.read().count() == 29  # the delete won; nothing resurrected


def test_compact_race_adopts_evolved_schema(spark, tmp_path):
    """An append that evolves the schema while a compaction is staging must
    not be rolled back by the compaction's commit: the retry adopts the
    winner's (additively evolved) schema."""
    t = _mk(spark, tmp_path, "t_cmp_schema_race")
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)
    real_commit = t._commit
    state = {"injected": False}

    def racing_commit(op, adds, removes, schema_json, ts, base_version, revalidate, **kw):
        if op == "compact" and not state["injected"]:
            state["injected"] = True
            TxTable(spark, t.path).append(
                spark.range(100, 103).withColumn("tag", F.lit("n")).coalesce(1), ts=1.5
            )
        return real_commit(op, adds, removes, schema_json, ts, base_version, revalidate, **kw)

    t._commit = racing_commit
    t.compact(target_files=1, ts=2.0)
    t._commit = real_commit
    got = t.read()
    assert got.columns == ["id", "tag"]  # the evolved column SURVIVED the compact
    assert got.where("tag = 'n'").count() == 3
    assert got.count() == 13


def test_protocol_gate_refuses_future_logs(spark, tmp_path):
    """Protocol versioning: a commit from a future engine records a higher
    (reader, writer) floor; this engine must refuse to read/write instead of
    silently misinterpreting the log."""
    import json as _json

    t = _mk(spark, tmp_path, "t_proto")
    t.append(spark.range(0, 5).coalesce(1), ts=1.0)
    assert t.snapshot().proto == (1, 1)  # plain tables stay at level 1
    # hand-write a future-protocol commit
    with open(t._version_file(2), "w") as fh:
        fh.write(_json.dumps({"meta": {
            "version": 2, "op": "append", "ts": 2.0, "schema": None,
            "proto": [99, 99],
        }}) + "\n")
    with pytest.raises(TxError, match="reader protocol 99"):
        t.read()
    with pytest.raises(TxError, match="reader protocol 99"):
        t.append(spark.range(5, 6).coalesce(1), ts=3.0)


def test_apply_changes_sidecar_and_exactly_once(spark, tmp_path):
    """apply_changes above the inline cap commits its vector as a sidecar in
    the same atomic version as its appends; txn replay stays a no-op."""
    t = _mk(spark, tmp_path, "t_apply_dvf")
    t.MOR_MAX_INLINE_DV = 4
    t.append(spark.range(0, 20).withColumn("v", F.lit(1).cast("int")).coalesce(1), ts=1.0)
    changes = (
        spark.range(0, 10)
        .withColumn("v", F.lit(2).cast("int"))
        .withColumn("_change_type", F.lit("insert"))
        .withColumn("_commit_version", F.lit(5).cast("long"))
    ).coalesce(1)
    txn = {"app": "cdc", "batch": 1}
    v1 = t.apply_changes(changes, keys=["id"], ts=2.0, txn=txn)
    assert t.snapshot().dvf_map()
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert len(got) == 20 and all(got[i] == 2 for i in range(10))
    assert t.apply_changes(changes, keys=["id"], ts=3.0, txn=txn) == v1  # replay
    assert t.latest_version() == v1
    # history nets through the sidecar version
    net = 0
    for r in sorted(t.history().collect(), key=lambda r: r["version"]):
        net += r["rows_added"] - r["rows_removed"]
        assert net == t.read(version=r["version"]).count()


def test_restore_resets_sidecar_vectors(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_restore_dvf")
    t.MOR_MAX_INLINE_DV = 4
    t.append(spark.range(0, 30).coalesce(1), ts=1.0)
    t.delete_where("id % 2 = 0", ts=2.0, mode="mor")  # 15 rows -> sidecar
    assert t.read().count() == 15
    t.restore(1, ts=3.0)
    assert t.read().count() == 30
    assert not t.snapshot().dvf_map()
    t.restore(2, ts=4.0)  # forward again: the sidecar reference returns
    assert t.read().count() == 15
    assert t.snapshot().dvf_map()
    cdf = t.row_changes(2, 3)
    assert cdf.where("_change_type='insert'").count() == 15


def test_incremental_optimize_composes_with_clustering(spark, tmp_path):
    """compact(only_smaller_than=..., cluster_expr=...) is incremental
    Z-order maintenance: the small-file backlog is re-clustered so its
    output files get tight footer stats, while right-sized (already
    clustered) files stay untouched."""
    t = _mk(spark, tmp_path, "t_opt_cluster")
    # the big, already-clustered file
    t.append(spark.range(0, 50_000).repartitionByRange(1, "id"), ts=1.0)
    for i in range(4):  # unclustered dribble: interleaved id ranges
        t.append(
            spark.range(100_000 + i, 100_400 + i, 4).coalesce(1), ts=2.0 + i
        )
    snap = t.snapshot()
    big = max(snap.live_paths(), key=lambda p: snap.files[p]["bytes"])
    t.compact(
        target_files=2, ts=6.0,
        cluster_expr="id", only_smaller_than=snap.files[big]["bytes"],
    )
    snap2 = t.snapshot()
    assert big in snap2.files  # untouched
    new_files = set(snap2.live_paths()) - set(snap.live_paths())
    assert len(new_files) == 2
    # the re-clustered outputs cover DISJOINT id ranges (tight stats)
    ranges = sorted(
        (snap2.files[p]["stats"]["id"]["min"], snap2.files[p]["stats"]["id"]["max"])
        for p in new_files
    )
    assert ranges[0][1] < ranges[1][0]
    assert t.read().count() == 50_000 + 400


def test_describe_detail_summarizes_the_live_snapshot(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t_detail"), partition_by=("g",))
    t.MOR_MAX_INLINE_DV = 4
    t.append(
        spark.range(0, 20).withColumn("g", (F.col("id") % 2).cast("int")).coalesce(1),
        ts=1.0,
    )
    t.set_constraint("nonneg", "id >= 0", ts=2.0)
    t.delete_where("id IN (3, 5)", ts=3.0, mode="mor")       # inline DV
    t.delete_where("id >= 10", ts=4.0, mode="mor")           # sidecar DV
    d = t.describe_detail()
    assert d["version"] == 4 and d["num_files"] == 2
    assert d["num_rows"] == 8 and d["partition_by"] == ["g"]
    assert d["protocol"] == {"min_reader": 2, "min_writer": 2}
    assert d["constraints"] == ["nonneg"]
    assert d["dv_inline_rows"] == 2
    assert d["dv_sidecar_files"] == 1 and d["dv_sidecar_rows"] == 10
    assert d["schema_fields"] == ["id", "g"]
    assert d["size_bytes"] > 0 and d["column_mapping"] == {}


# -- round 12: writer gate, checkpoint proto persistence, partition-spec race


def test_writer_gate_refuses_future_writer_protocol(spark, tmp_path):
    """A table READABLE at this engine's level but whose WRITER floor is
    higher must refuse every mutation (the Delta minWriter stance) — a
    write that doesn't understand the table's invariants could corrupt it.
    Round-12 ADVICE fix: _writer_gate is now invoked by every mutating op."""
    t = _mk(spark, tmp_path, "t_wproto")
    t.append(spark.range(0, 5).coalesce(1), ts=1.0)
    with open(t._version_file(2), "w") as fh:
        fh.write(json.dumps({"meta": {
            "version": 2, "op": "append", "ts": 2.0, "schema": None,
            "proto": [1, 99],  # readable here, writable only by the future
        }}) + "\n")
    assert t.read().count() == 5  # reads stay fine
    one = spark.range(5, 6).coalesce(1)
    with pytest.raises(TxError, match="writer protocol 99"):
        t.append(one, ts=3.0)
    with pytest.raises(TxError, match="writer protocol 99"):
        t.overwrite(one, ts=3.0)
    with pytest.raises(TxError, match="writer protocol 99"):
        t.delete_where("id = 0", ts=3.0)
    with pytest.raises(TxError, match="writer protocol 99"):
        t.merge(one, keys=["id"], ts=3.0)
    with pytest.raises(TxError, match="writer protocol 99"):
        t.compact(ts=3.0)
    with pytest.raises(TxError, match="writer protocol 99"):
        t.restore(1, ts=3.0)
    with pytest.raises(TxError, match="writer protocol 99"):
        t.set_constraint("c", "id >= 0", ts=3.0)
    with pytest.raises(TxError, match="writer protocol 99"):
        t.rename_column("id", "id2", ts=3.0)
    assert t.latest_version() == 2  # nothing slipped through


def test_checkpoint_persists_protocol_floor(spark, tmp_path):
    """Round-12 ADVICE fix: the protocol floor must survive checkpointing —
    a checkpoint-seeded replay that reported (1,1) for a sidecar-DV table
    would silently bypass the reader/writer gates."""
    t = _mk(spark, tmp_path, "t_ckpt_proto")
    t.MOR_MAX_INLINE_DV = 3
    t.append(spark.range(0, 40).coalesce(1), ts=1.0)
    t.delete_where("id % 2 = 0", ts=2.0, mode="mor")  # 20 rows -> sidecar, proto (2,2)
    assert t.snapshot().proto == (2, 2)
    t._write_checkpoint(t.snapshot())
    assert t._list_checkpoints() == [2]
    # checkpoint-seeded replay (no tail) must report the same protocol
    seeded = t.snapshot()
    assert seeded.proto == (2, 2)
    # equivalence with the raw log replay, proto included
    os.rename(t._checkpoint_file(2), t._checkpoint_file(2) + ".hidden")
    raw = t.snapshot()
    os.rename(t._checkpoint_file(2) + ".hidden", t._checkpoint_file(2))
    assert raw.proto == seeded.proto
    assert raw.files == seeded.files


def test_racing_first_commits_with_different_partition_specs_conflict(spark, tmp_path):
    """Round-12 ADVICE fix: two racing FIRST commits constructed with
    different partition_by must not both land (last-meta-wins replay would
    leave flat and col=value/ files mixed under one basePath, which Spark's
    partition discovery rejects at read time). The loser now gets TxConflict
    from revalidate instead of silently committing."""
    path = str(tmp_path / "t_spec_race")
    t_flat = TxTable(spark, path)                      # stages flat
    t_part = TxTable(spark, path, partition_by=("g",))  # wins the race
    df_flat = spark.range(0, 6).withColumn("g", (F.col("id") % 2).cast("int"))
    orig_stage = TxTable._stage
    raced = []

    def racing_stage(self, df, partition_by=(), mapping=None):
        adds = orig_stage(self, df, partition_by, mapping=mapping)
        if not raced:  # the partitioned writer lands v1 while we're staged
            raced.append(1)
            t_part.append(df_flat.coalesce(1), ts=1.0)
        return adds

    t_flat._stage = racing_stage.__get__(t_flat, TxTable)
    with pytest.raises(TxConflict, match="partition spec"):
        t_flat.append(df_flat.coalesce(1), ts=2.0)
    # the table is intact under the winner's spec, every file hive-laid-out
    snap = TxTable(spark, path).snapshot()
    assert snap.partition_by == ("g",)
    assert all(p.startswith("g=") for p in snap.live_paths())
    assert TxTable(spark, path).read().count() == 6


def test_distributed_stats_harvest_equals_driver_loop(spark, tmp_path):
    """Round-12 verdict #6: commits past STATS_DISTRIBUTE_THRESHOLD files
    harvest footer stats in ONE distributed job; the add-actions must be
    byte-identical to what the driver loop computes (ground truth:
    _footer_stats re-run directly on every live file)."""
    from snapshot_sender_spark.operators.txlog import _footer_stats

    t = _mk(spark, tmp_path, "t_dstats")
    assert t.STATS_DISTRIBUTE_THRESHOLD == 16
    t.append(
        spark.range(0, 2000).withColumn("v", F.col("id") % 7)
        .repartitionByRange(24, "id"),  # 24 > threshold -> distributed path
        ts=1.0,
    )
    snap = t.snapshot()
    assert len(snap.files) == 24
    for rel, add in snap.files.items():
        rows, nbytes, stats = _footer_stats(os.path.join(t.path, rel))
        assert (add["rows"], add["bytes"]) == (rows, nbytes)
        assert add["stats"] == json.loads(json.dumps(stats))  # log round-trip
    # the harvested stats drive pruning exactly as before
    assert len(t.candidate_files(prune=[("id", 0, 50)])) <= 2
    assert t.read(prune=[("id", 0, 50)]).where("id <= 50").count() == 51


def test_small_commit_stats_stay_on_fast_path(spark, tmp_path, monkeypatch):
    """Small commits must not pay a Spark job for stats: the driver loop
    runs when file count <= threshold (pinned by poisoning parallelize)."""
    t = _mk(spark, tmp_path, "t_dstats_small")

    def boom(*a, **k):  # pragma: no cover - must never be called
        raise AssertionError("small commit took the distributed stats path")

    monkeypatch.setattr(t.spark.sparkContext, "parallelize", boom)
    t.append(spark.range(0, 50).coalesce(2), ts=1.0)
    assert t.read().count() == 50


def test_apply_changes_scd2_history_and_idempotence(spark, tmp_path):
    """stored_as_scd2: inserts open effective ranges, later changes CLOSE
    the open fringe (DV + closed re-add, zero rewrites of history files),
    updates at one version produce back-to-back ranges, txn replay is a
    no-op."""
    t = _mk(spark, tmp_path, "t_scd2")
    t.append(spark.range(0, 0).withColumn("v", F.lit(0).cast("int")).coalesce(1), ts=0.0)

    def batch(rows, ts, bid):
        df = spark.createDataFrame(
            rows, "id long, v int, _change_type string, _commit_version long"
        )
        return t.apply_changes(
            df.coalesce(1), keys=["id"], ts=ts, stored_as_scd2=True,
            txn={"app": "scd2", "batch": bid},
        )

    # batch 0: two inserts
    batch([(1, 10, "insert", 1), (2, 20, "insert", 1)], 1.0, 0)
    got = {(r["id"], r["v"], r["__start_ver"], r["__end_ver"])
           for r in t.read().collect()}
    assert got == {(1, 10, 1, None), (2, 20, 1, None)}
    files_after_b0 = set(t.snapshot().live_paths())
    # batch 1: update id=1 (delete+insert at v2), delete id=2 at v3
    v = batch(
        [(1, 11, "delete", 2), (1, 12, "insert", 2), (2, 20, "delete", 3)],
        2.0, 1,
    )
    got = {(r["id"], r["v"], r["__start_ver"], r["__end_ver"])
           for r in t.read().collect()}
    assert got == {
        (1, 10, 1, 2),   # closed by the update
        (1, 12, 2, None),  # new current image
        (2, 20, 1, 3),   # closed by the delete, no new row
    }
    # history files were DV'd, never rewritten
    assert files_after_b0 <= set(t.snapshot().live_paths())
    # txn replay: same batch id is a no-op returning the committed version
    assert batch([(9, 9, "insert", 9)], 3.0, 1) == v
    assert t.read().where("id = 9").count() == 0
    # within-ONE-batch multi-version key: ranges chain, delete closes
    batch(
        [(5, 1, "insert", 4), (5, 2, "insert", 5), (5, 2, "delete", 6)],
        4.0, 2,
    )
    got5 = {(r["v"], r["__start_ver"], r["__end_ver"])
            for r in t.read().where("id = 5").collect()}
    assert got5 == {(1, 4, 5), (2, 5, 6)}


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    t = _mk(spark, tmp_path, "t_vac_dry")
    t.append(spark.range(0, 10).coalesce(1), ts=1.0)
    t.overwrite(spark.range(50, 55).coalesce(1), ts=2.0)
    would = t.vacuum(retain_versions=1, min_age_s=0, dry_run=True)
    assert len(would) == 1  # v1's file is unreachable from the latest
    assert all(os.path.exists(os.path.join(t.path, r)) for r in would)
    assert t.read(version=1).count() == 10  # history intact after dry run
    # the real vacuum removes exactly what the dry run reported
    assert t.vacuum(retain_versions=1, min_age_s=0) == would
    assert not os.path.exists(os.path.join(t.path, would[0]))


def test_compact_by_target_file_bytes(spark, tmp_path):
    """OPTIMIZE toward a stated file SIZE: target_files derives from the
    inputs' total bytes (ceil), so the table converges to the size policy
    whatever the backlog weighs."""
    t = _mk(spark, tmp_path, "t_target_bytes")
    t.append(spark.range(0, 20000).repartition(16), ts=1.0)
    snap = t.snapshot()
    total = sum(a["bytes"] for a in snap.files.values())
    target = total // 3  # expect ceil(total/target) = 3 (maybe 4) outputs
    t.compact(ts=2.0, target_file_bytes=target)
    out = t.snapshot()
    assert 3 <= len(out.files) <= 4
    assert t.read().count() == 20000
    # a huge target size packs to ONE file
    t.append(spark.range(20000, 20100).coalesce(1), ts=3.0)
    t.compact(ts=4.0, target_file_bytes=10**12)
    assert len(t.snapshot().files) == 1 and t.read().count() == 20100
