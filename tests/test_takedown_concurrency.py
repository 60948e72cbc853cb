"""Round-9 verdict #2: takedown concurrent with LIVE ingestion and with
compaction — on purpose, with barrier seams, not by accident.

The contract under test (operators/index_lifecycle.py, table_mutation_lock):
read-modify-write mutations of one index table (takedown, compaction fold)
are serialized per process — the lost-update interleavings (a fold copying
pre-takedown rows into the compacted partition; two takedowns of different
ids last-writer-winning one partition) cannot happen. Plain epoch APPENDS
take no lock: their partitions are disjoint from anything a takedown or
fold touches, proven live here by running them INSIDE a paused fold."""

import threading
import time

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators import index_lifecycle

T = "t_conc_takedown_idx"


@pytest.fixture(autouse=True)
def clean_tables(spark):
    spark.sql(f"DROP TABLE IF EXISTS {T}")
    yield
    spark.sql(f"DROP TABLE IF EXISTS {T}")


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "id long")


def _rows(epoch, ids, per_id=3):
    return [(i, 100 * i + k) for i in ids for k in range(per_id)]


def _mk_index(spark, epochs_ids):
    for e, ids in epochs_ids.items():
        df = spark.createDataFrame(_rows(e, ids), "id long, h long")
        index_lifecycle.append_epoch_partition(
            spark, T, df, epoch=e, bucket_cols=["h"]
        )


def test_takedown_concurrent_with_live_epoch_append(spark):
    """Takedown of epochs 0-1 ids racing a NEW epoch-2 append: disjoint
    partitions, no lock between them — both effects must land intact."""
    _mk_index(spark, {0: [1, 2, 3], 1: [4, 5]})
    barrier = threading.Barrier(2)
    errs = []

    def append():
        try:
            barrier.wait(timeout=30)
            df = spark.createDataFrame(_rows(2, [10, 11, 12]), "id long, h long")
            index_lifecycle.append_epoch_partition(
                spark, T, df, epoch=2, bucket_cols=["h"]
            )
        except Exception as exc:  # pragma: no cover - surfaced below
            errs.append(exc)

    def takedown():
        try:
            barrier.wait(timeout=30)
            index_lifecycle.remove_ids_from_epoch_table(
                spark, T, _ids(spark, [1, 4])
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [threading.Thread(target=append), threading.Thread(target=takedown)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errs, errs
    spark.catalog.refreshTable(T)
    got = {(r["id"], r["epoch"]) for r in spark.table(T).select("id", "epoch").collect()}
    ids_by_epoch = {}
    for i, e in got:
        ids_by_epoch.setdefault(e, set()).add(i)
    assert ids_by_epoch[0] == {2, 3}          # 1 removed, others intact
    assert ids_by_epoch[1] == {5}             # 4 removed
    assert ids_by_epoch[2] == {10, 11, 12}    # the racing append landed whole
    assert spark.table(T).count() == 6 * 3


def test_takedown_blocks_during_compaction_fold_then_converges(spark, monkeypatch):
    """Takedown issued while a compaction fold sits INSIDE its
    read→write→drop window (paused at the _drop_partition seam, the same
    seam the crash tests use): the mutation lock must HOLD the takedown
    until the fold finishes — if it ran inside the window it would rewrite
    epoch 0 while the fold has already copied epoch 0's pre-takedown rows
    into epoch -1, resurrecting the removed id. Meanwhile a plain epoch
    append (no lock) must complete DURING the pause. After release: the id
    is gone everywhere, including the freshly compacted partition."""
    _mk_index(spark, {0: [1, 2], 1: [3, 4]})
    in_window = threading.Event()
    release = threading.Event()
    real_drop = index_lifecycle._drop_partition
    first = threading.Event()

    def paused_drop(spark_, table, epoch):
        if not first.is_set():
            first.set()
            in_window.set()
            assert release.wait(timeout=120), "test release never arrived"
        real_drop(spark_, table, epoch)

    monkeypatch.setattr(index_lifecycle, "_drop_partition", paused_drop)
    errs = []
    td_done = threading.Event()

    def compact():
        try:
            index_lifecycle.fold_epoch_partitions(
                spark, [(T, ["id", "h"])], epochs=[0, 1],
                target_epoch=index_lifecycle.COMPACTED_EPOCH, write_tasks=1,
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    def takedown():
        try:
            index_lifecycle.remove_ids_from_epoch_table(spark, T, _ids(spark, [1, 3]))
            td_done.set()
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    tc = threading.Thread(target=compact)
    tc.start()
    assert in_window.wait(timeout=120), "fold never reached its seam"
    tt = threading.Thread(target=takedown)
    tt.start()
    # the takedown must be HELD while the fold owns the lock mid-window
    time.sleep(2.0)
    assert not td_done.is_set(), (
        "takedown ran inside the fold's read->write->drop window: the fold "
        "has already copied pre-takedown rows into the compacted partition"
    )
    # a lock-free epoch append lands fine DURING the pause (disjoint partition)
    df = spark.createDataFrame(_rows(9, [9]), "id long, h long")
    index_lifecycle.append_epoch_partition(spark, T, df, epoch=9, bucket_cols=["h"])
    release.set()
    tc.join(timeout=180)
    tt.join(timeout=180)
    assert not errs, errs
    assert td_done.is_set()
    spark.catalog.refreshTable(T)
    rows = spark.table(T).select("id", "epoch").collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(int(r["epoch"]), set()).add(int(r["id"]))
    # ids 1 and 3 gone EVERYWHERE — most importantly from epoch -1
    assert by_epoch[index_lifecycle.COMPACTED_EPOCH] == {2, 4}
    assert by_epoch[9] == {9}
    assert set(by_epoch) == {index_lifecycle.COMPACTED_EPOCH, 9}
    # and nothing duplicated: 2 survivors x 3 rows + the appended id
    assert len(rows) == 2 * 3 + 3


def test_concurrent_distinct_id_takedowns_same_partition(spark):
    """THE lost-update this lock exists for: two takedowns of DIFFERENT ids
    both hitting epoch 0. Unserialized, each would rewrite the partition
    from the same original files and the last writer would resurrect the
    other's removed rows; under the lock both removals survive."""
    _mk_index(spark, {0: [1, 2, 3, 4, 5, 6]})
    barrier = threading.Barrier(2)
    removed = {}
    errs = []

    def takedown(name, ids):
        try:
            barrier.wait(timeout=30)
            removed[name] = index_lifecycle.remove_ids_from_epoch_table(
                spark, T, _ids(spark, ids)
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [
        threading.Thread(target=takedown, args=("a", [1, 2])),
        threading.Thread(target=takedown, args=("b", [5, 6])),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errs, errs
    assert removed == {"a": 6, "b": 6}  # 2 ids x 3 rows each
    spark.catalog.refreshTable(T)
    assert {r["id"] for r in spark.table(T).select("id").collect()} == {3, 4}
    assert spark.table(T).count() == 6


def test_concurrent_distinct_id_ivf_takedowns(spark, tmp_path):
    """The IVF (path-based) takedown has the same read-modify-write shape as
    the table form and takes the same per-index mutation lock (round-9
    review finding): two concurrent takedowns of different ids hitting the
    same bucket partitions must both survive."""
    from snapshot_sender_spark.operators import similarity

    idx = str(tmp_path / "ivf")
    vecs = spark.createDataFrame(
        [(i, [float(i % 2), 1.0]) for i in range(40)],
        "id long, vec array<double>",
    )
    similarity.build_ivf_index(vecs, "vec", "id", idx, n_centroids=2, epoch=0)
    barrier = threading.Barrier(2)
    removed = {}
    errs = []

    def takedown(name, ids):
        try:
            barrier.wait(timeout=30)
            removed[name] = similarity.takedown_ivf_index(
                spark, idx, _ids(spark, ids)
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [
        threading.Thread(target=takedown, args=("a", [0, 1])),
        threading.Thread(target=takedown, args=("b", [2, 3])),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errs, errs
    assert removed == {"a": 2, "b": 2}
    left = {r["id"] for r in spark.read.parquet(f"{idx}/vectors").select("id").collect()}
    assert left == set(range(4, 40))
