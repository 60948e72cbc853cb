"""Streaming MEDIA ingestion-dedup service (round 7): accept/drop semantics
across epochs, replay idempotence, epoch-collision detection, and
compaction — the media mirror of test_streaming_dedup's core contract."""

import glob
import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.operators import multimodal
from snapshot_sender_spark.streaming.media_dedup_stream import (
    committed_epochs,
    run_streaming_media_dedup,
)

TABLE = "t_media_stream_test_idx"


def _png_bits(bits):
    """32×32 RGB PNG whose 8×8-block aHash is exactly ``bits`` (64 bools):
    high blocks 40, low 20 — any mix keeps the mean strictly inside (20, 40),
    so flipping k blocks moves the hash by exactly k bits."""
    import numpy as np

    vals = np.where(np.asarray(bits, bool), 40, 20).astype(np.uint8).reshape(8, 8)
    gray = np.kron(vals, np.ones((4, 4), np.uint8))
    return multimodal.encode_png_rgb8(np.stack([gray, gray, gray], axis=2))


def _pattern(seed, flips=()):
    import numpy as np

    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, 64).astype(bool)
    for i in flips:
        bits[i] = ~bits[i]
    return bits


@pytest.fixture
def dirs(tmp_path):
    d = {
        "input": str(tmp_path / "input"),
        "accepted": str(tmp_path / "accepted"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["input"])
    return d


@pytest.fixture(autouse=True)
def clean_table(spark):
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    yield
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def _land_epoch(spark, dirs, k, rows):
    df = spark.createDataFrame(rows, "media_id long, content binary")
    tmp = dirs["input"] + f"_stage{k}"
    df.coalesce(1).write.parquet(tmp)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(dirs["input"], f"e{k}.parquet")
    shutil.move(src, dst)
    os.utime(dst, (time.time() - 300 + 60 * k,) * 2)


def _accepted_ids(spark, dirs):
    data = os.path.join(dirs["accepted"], "data")
    return {
        (r["media_id"], int(r["epoch"]))
        for r in spark.read.parquet(data).collect()
    }


def test_media_service_lifecycle(spark, dirs):
    a, b, c, d = (_pattern(s) for s in (1, 2, 3, 4))
    _land_epoch(spark, dirs, 0, [(0, _png_bits(a)), (1, _png_bits(b))])
    _land_epoch(
        spark, dirs, 1,
        [
            (10, _png_bits(_pattern(1, flips=(3, 40)))),  # hamming 2 of id 0
            (11, _png_bits(c)),                            # novel
        ],
    )
    _land_epoch(
        spark, dirs, 2,
        [
            (20, _png_bits(b)),                            # exact dup of id 1
            (21, _png_bits(_pattern(3, flips=(7,)))),      # hamming 1 of id 11
            (22, _png_bits(d)),                            # novel
        ],
    )
    epochs = run_streaming_media_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        max_hamming=3, max_files_per_trigger=1,
    )
    assert epochs == [0, 1, 2]
    assert _accepted_ids(spark, dirs) == {(0, 0), (1, 0), (11, 1), (22, 2)}
    # index holds exactly the accepted signatures, 4 band rows each
    assert spark.table(TABLE).count() == 4 * 4
    assert committed_epochs(dirs["accepted"]) == [0, 1, 2]

    # replay with the SAME checkpoint: availableNow already consumed the
    # files — rerun processes nothing new and the state is unchanged
    again = run_streaming_media_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        max_hamming=3,
    )
    assert again == []
    assert _accepted_ids(spark, dirs) == {(0, 0), (1, 0), (11, 1), (22, 2)}

    # FRESH checkpoint + retained markers + same input: epoch ids restart at
    # 0; the fingerprint now covers ALL THREE files in one batch, so the
    # collision guard must refuse loudly rather than fast-skip or overwrite
    with pytest.raises(Exception, match="fingerprint|collided"):
        run_streaming_media_dedup(
            spark, dirs["input"], TABLE, dirs["accepted"],
            dirs["ckpt"] + "_fresh", max_hamming=3,
        )


def test_media_service_compact_then_continue(spark, dirs):
    a, b = _pattern(21), _pattern(22)
    _land_epoch(spark, dirs, 0, [(0, _png_bits(a))])
    _land_epoch(spark, dirs, 1, [(1, _png_bits(b))])
    run_streaming_media_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        max_hamming=3, max_files_per_trigger=1, compact_after=True,
    )
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {TABLE}").collect()}
    assert parts == {"epoch=-1"}  # both epochs folded
    assert spark.table(TABLE).count() == 2 * 4

    # the service continues against the compacted index: a near-dup of the
    # folded id 0 is dropped, a novel image is accepted under a new epoch
    _land_epoch(
        spark, dirs, 2,
        [(30, _png_bits(_pattern(21, flips=(5,)))), (31, _png_bits(_pattern(23)))],
    )
    run_streaming_media_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        max_hamming=3,
    )
    got = _accepted_ids(spark, dirs)
    assert (31, 2) in got and not any(m == 30 for m, _ in got)
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {TABLE}").collect()}
    assert "epoch=-1" in parts and "epoch=2" in parts


def test_media_marker_fingerprint_roundtrip(spark, dirs):
    _land_epoch(spark, dirs, 0, [(0, _png_bits(_pattern(31)))])
    run_streaming_media_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"]
    )
    marker = os.path.join(dirs["accepted"], "_epochs", "epoch_0.committed")
    fp = json.loads(open(marker).read())
    assert fp["n"] == 1 and isinstance(fp["x"], int)


def test_media_redelivered_id_is_deduplicated(spark, dirs):
    """An id re-delivered in a LATER epoch (same media re-ingested — a new
    input file, not a crash replay) must be dropped by its own indexed
    signature at hamming 0, matching the text service's behavior for
    re-delivered content. This is why the index probe has no same-id guard
    (the r7 review finding): crash replays are covered by exclude_epoch +
    markers, so a visible self-match always means a genuine duplicate."""
    png = _png_bits(_pattern(41))
    _land_epoch(spark, dirs, 0, [(0, png)])
    _land_epoch(spark, dirs, 1, [(0, png), (1, _png_bits(_pattern(42)))])
    run_streaming_media_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        max_hamming=3, max_files_per_trigger=1,
    )
    # id 0 accepted ONCE (epoch 0); its epoch-1 re-delivery dropped
    assert _accepted_ids(spark, dirs) == {(0, 0), (1, 1)}
    # index holds one signature row set per accepted media, no duplicates
    assert spark.table(TABLE).count() == 2 * 4
