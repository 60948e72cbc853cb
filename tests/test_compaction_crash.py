"""Crash MID-COMPACTION (round-8 verdict #4): the fold's crash window — a
kill between the target-partition write and the source-partition drops —
leaves folded rows in BOTH places. The docstring contract
(operators/index_lifecycle.py:fold_epoch_partitions) says re-running the
compaction is curative because rows are globally unique by key; these tests
PROVE it for the distinct-hash and signature indexes the way
test_streaming_dedup_crash_after_index_append_replay proves the
append→marker window: inject the crash, assert the duplicated intermediate
state, re-run, assert exact convergence (no duplicate, no lost rows) and
that probes against the recovered index are result-identical."""

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators import dedup, index_lifecycle

HASH_TABLE = "t_crash_fold_hash_idx"
SIG_TABLE = "t_crash_fold_sig_idx"


@pytest.fixture(autouse=True)
def clean_tables(spark):
    for t in (HASH_TABLE, SIG_TABLE):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    yield
    for t in (HASH_TABLE, SIG_TABLE):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _crash_first_drop(monkeypatch):
    """Kill the fold at its first source-partition drop: the target
    partition is fully written, every source partition still exists."""
    calls = {"n": 0}
    real = index_lifecycle._drop_partition

    def crashing(spark, table, epoch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash after target write, before drops")
        return real(spark, table, epoch)

    monkeypatch.setattr(index_lifecycle, "_drop_partition", crashing)
    return calls


def _partitions(spark, table):
    return {r[0] for r in spark.sql(f"SHOW PARTITIONS {table}").collect()}


def test_hash_index_crash_mid_fold_rerun_converges(spark, monkeypatch):
    h = lambda s: F.unhex(F.md5(F.lit(s)))  # noqa: E731
    e0 = spark.range(1).select(h("alpha").alias("h")).union(
        spark.range(1).select(h("beta").alias("h"))
    )
    e1 = spark.range(1).select(h("beta").alias("h")).union(  # cross-epoch dup: legal
        spark.range(1).select(h("gamma").alias("h"))
    )
    dedup.append_hash_index_epoch(spark, HASH_TABLE, e0, epoch=0)
    dedup.append_hash_index_epoch(spark, HASH_TABLE, e1, epoch=1)
    assert spark.table(HASH_TABLE).count() == 4

    _crash_first_drop(monkeypatch)
    with pytest.raises(RuntimeError, match="injected crash"):
        dedup.compact_hash_index(spark, HASH_TABLE, [0, 1])
    # the crash state: target written, sources retained -> rows duplicated
    spark.catalog.refreshTable(HASH_TABLE)
    assert _partitions(spark, HASH_TABLE) == {"epoch=-1", "epoch=0", "epoch=1"}
    assert spark.table(HASH_TABLE).count() == 4 + 3  # 3 distinct in the fold
    # a probe in the window double-sees hashes but membership is unchanged
    # (the span/chunk probes are EXISTS-shaped, so the window is benign)
    monkeypatch.undo()

    # re-running with the SAME epochs is curative, not amplifying
    moved = dedup.compact_hash_index(spark, HASH_TABLE, [0, 1])
    assert moved == 3
    assert _partitions(spark, HASH_TABLE) == {"epoch=-1"}
    rows = [bytes(r["h"]).hex() for r in spark.table(HASH_TABLE).collect()]
    assert len(rows) == 3 and len(set(rows)) == 3  # no duplicates, none lost

    # and the fold stays stable on yet another cycle (markers outlive folds)
    assert dedup.compact_hash_index(spark, HASH_TABLE, [0, 1]) == 0


def test_sig_index_crash_mid_fold_rerun_converges(spark, monkeypatch):
    sigs0 = spark.createDataFrame([(0, 7), (1, 1024)], "id long, sig long")
    sigs1 = spark.createDataFrame([(2, -99)], "id long, sig long")
    dedup.append_sig_index_epoch(spark, SIG_TABLE, sigs0, epoch=0)
    dedup.append_sig_index_epoch(spark, SIG_TABLE, sigs1, epoch=1)
    assert spark.table(SIG_TABLE).count() == 3 * 4  # 4 band rows per sig

    batch = spark.createDataFrame([(10, 7)], "id long, sig long")
    before = {
        (r["batch_id"], r["corpus_id"], r["hamming"])
        for r in dedup.banded_hamming_pairs_against_index(
            spark, SIG_TABLE, batch, max_hamming=3
        ).collect()
    }

    _crash_first_drop(monkeypatch)
    with pytest.raises(RuntimeError, match="injected crash"):
        dedup.compact_sig_index(spark, SIG_TABLE, [0, 1])
    spark.catalog.refreshTable(SIG_TABLE)
    assert _partitions(spark, SIG_TABLE) == {"epoch=-1", "epoch=0", "epoch=1"}
    assert spark.table(SIG_TABLE).count() == 2 * 3 * 4  # duplicated window
    # probes DEDUP candidate pairs, so even the crash window is
    # result-identical for the pair output
    mid = {
        (r["batch_id"], r["corpus_id"], r["hamming"])
        for r in dedup.banded_hamming_pairs_against_index(
            spark, SIG_TABLE, batch, max_hamming=3
        ).collect()
    }
    assert mid == before
    monkeypatch.undo()

    moved = dedup.compact_sig_index(spark, SIG_TABLE, [0, 1])
    assert moved == 3 * 4
    assert _partitions(spark, SIG_TABLE) == {"epoch=-1"}
    rows = [(r["id"], r["sig"], r["band"]) for r in spark.table(SIG_TABLE).collect()]
    assert len(rows) == 12 and len(set(rows)) == 12  # no duplicates, none lost
    after = {
        (r["batch_id"], r["corpus_id"], r["hamming"])
        for r in dedup.banded_hamming_pairs_against_index(
            spark, SIG_TABLE, batch, max_hamming=3
        ).collect()
    }
    assert after == before == {(10, 0, 0)}
