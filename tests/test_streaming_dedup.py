"""Streaming ingestion-dedup service: per-batch dedup against the persisted
bucketed index, index grows with accepted docs, epochs idempotent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.streaming.dedup_stream import run_streaming_ingestion_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture
def dirs(tmp_path):
    d = {
        "input": str(tmp_path / "input"),
        "accepted": str(tmp_path / "accepted"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["input"])
    return d


TABLE = "t_stream_dedup_idx"


@pytest.fixture(autouse=True)
def _drop_table(spark):
    yield
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}_sizes")


def accepted_ids(spark, dirs):
    return {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(dirs["accepted"], "data")).collect()
    }


def test_streaming_dedup_within_batch_and_against_index(spark, dirs):
    """Batch 1: exact dup and near-dup collapse to the min id. Batch 2: a
    near-dup of an already-accepted doc is rejected via the index; novel
    docs are accepted and indexed."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    _docs(
        spark,
        [
            (1, base),
            (2, base),  # exact dup of 1 → dropped
            (3, base + " iota"),  # near-dup of 1 → dropped
            (4, "one two three four five six seven eight"),
        ],
    ).write.mode("append").parquet(dirs["input"])
    run_streaming_ingestion_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"], threshold=0.5
    )
    assert accepted_ids(spark, dirs) == {1, 4}

    _docs(
        spark,
        [
            (10, base + " kappa"),  # near-dup of accepted 1 → rejected
            (11, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
        ],
    ).write.mode("append").parquet(dirs["input"])
    run_streaming_ingestion_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"], threshold=0.5
    )
    assert accepted_ids(spark, dirs) == {1, 4, 11}
    # the index holds exactly the accepted docs' postings
    assert {
        r["id"] for r in spark.table(TABLE).select("id").distinct().collect()
    } == {1, 4, 11}


def test_streaming_dedup_index_grows_between_epochs_of_one_run(spark, dirs):
    """With maxFilesPerTrigger=1, two input files become two epochs of one
    run: the second epoch must see the first epoch's index append (clone-
    session refresh) and reject its near-dup."""
    base = "red orange yellow green blue indigo violet ultraviolet"
    _docs(spark, [(1, base)]).coalesce(1).write.mode("append").parquet(dirs["input"])
    _docs(spark, [(2, base + " extra")]).coalesce(1).write.mode("append").parquet(
        dirs["input"]
    )
    run_streaming_ingestion_dedup(
        spark,
        dirs["input"],
        TABLE,
        dirs["accepted"],
        dirs["ckpt"],
        threshold=0.5,
        max_files_per_trigger=1,
    )
    assert accepted_ids(spark, dirs) == {1}


def test_streaming_dedup_epoch_replay_is_noop(spark, dirs):
    """A replayed epoch (marker present, checkpoint lost) must not re-append
    to the corpus or the index."""
    _docs(spark, [(1, "solo unique document text body here")]).write.mode(
        "append"
    ).parquet(dirs["input"])
    run_streaming_ingestion_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"], threshold=0.5
    )
    n_files = len(os.listdir(os.path.join(dirs["accepted"], "data")))
    # simulate checkpoint loss: rerun over the same input with a fresh ckpt
    run_streaming_ingestion_dedup(
        spark,
        dirs["input"],
        TABLE,
        dirs["accepted"],
        str(dirs["ckpt"]) + "_2",
        threshold=0.5,
    )
    assert accepted_ids(spark, dirs) == {1}
    assert len(os.listdir(os.path.join(dirs["accepted"], "data"))) == n_files
