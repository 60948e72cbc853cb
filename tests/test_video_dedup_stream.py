"""Streaming VIDEO ingestion-dedup service (round 8): the posting-mode
(set-Jaccard over per-frame fingerprints) form of the media service —
accept/drop semantics across epochs, replay idempotence, epoch-collision
detection, compaction, and re-delivered-id dedup, mirroring
test_media_dedup_stream's matrix for the signature mode."""

import glob
import json
import os
import shutil
import time

import numpy as np
import pytest

from snapshot_sender_spark.operators import multimodal
from snapshot_sender_spark.streaming.media_dedup_stream import (
    committed_epochs,
    run_streaming_video_dedup,
)

TABLE = "t_video_stream_test_idx"


def _pattern(seed, flips=()):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, 64).astype(bool)
    for i in flips:
        bits[i] = ~bits[i]
    return bits


def _vid(patterns):
    """16×16 I_PCM video whose per-frame luma aHashes are exactly the given
    64-bit patterns (high blocks 40, low 20 — mean strictly inside, same
    construction as the batch video fixture)."""
    cb = np.full((8, 8), 128, np.uint8)
    frames = []
    for bits in patterns:
        vals = np.where(np.asarray(bits, bool), 40, 20).astype(np.uint8).reshape(8, 8)
        luma = np.kron(vals, np.ones((2, 2), np.uint8))
        frames.append((luma, cb, cb))
    return multimodal.encode_h264_ipcm_video(16, 16, frames)


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
    for t in (TABLE, TABLE + "_sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    yield
    for t in (TABLE, TABLE + "_sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _land_epoch(spark, dirs, k, rows):
    df = spark.createDataFrame(rows, "media_id long, content binary")
    tmp = dirs["input"] + f"_stage{k}"
    df.coalesce(1).write.parquet(tmp)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(dirs["input"], f"e{k}.parquet")
    shutil.move(src, dst)
    os.utime(dst, (time.time() - 300 + 60 * k,) * 2)


def _accepted(spark, dirs):
    data = os.path.join(dirs["accepted"], "data")
    return {
        (r["media_id"], int(r["epoch"]), r["n_frames"])
        for r in spark.read.parquet(data).collect()
    }


# frame alphabet: distinct random patterns share no fingerprints, so
# cross-video Jaccard is 0 unless frames are engineered to overlap
A, B, C, D = (_pattern(s) for s in (1, 2, 3, 4))
E, Fp, G, H = (_pattern(s) for s in (5, 6, 7, 8))
I_, J, K, L = (_pattern(s) for s in (9, 10, 11, 12))


def test_video_service_lifecycle(spark, dirs):
    _land_epoch(
        spark, dirs, 0, [(0, _vid([A, B, C, D])), (1, _vid([E, Fp, G, H]))]
    )
    _land_epoch(
        spark, dirs, 1,
        [
            (10, _vid([A, B, C, _pattern(40)])),  # 3 of 5 shared with id 0 -> 0.6
            (11, _vid([I_, J, K, L])),            # novel
        ],
    )
    _land_epoch(
        spark, dirs, 2,
        [
            (20, _vid([E, Fp, G, H])),            # exact dup of id 1 (Jaccard 1.0)
            (21, _vid([I_, J, K, _pattern(41)])), # 0.6 vs id 11
            (22, _vid([_pattern(s) for s in (42, 43, 44, 45)])),  # novel
        ],
    )
    epochs = run_streaming_video_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        threshold=0.5, max_files_per_trigger=1,
    )
    assert epochs == [0, 1, 2]
    assert _accepted(spark, dirs) == {(0, 0, 4), (1, 0, 4), (11, 1, 4), (22, 2, 4)}
    # index holds exactly the accepted videos' postings: 4 frame hashes each
    assert spark.table(TABLE).count() == 4 * 4
    assert {r["set_size"] for r in spark.table(TABLE + "_sizes").collect()} == {4}
    assert committed_epochs(dirs["accepted"]) == [0, 1, 2]

    # replay with the SAME checkpoint: no new files, state unchanged
    again = run_streaming_video_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        threshold=0.5,
    )
    assert again == []
    assert _accepted(spark, dirs) == {(0, 0, 4), (1, 0, 4), (11, 1, 4), (22, 2, 4)}

    # fresh checkpoint + retained markers + same input: epoch-id collision
    # across checkpoint generations must fail loudly
    with pytest.raises(Exception, match="fingerprint|collided"):
        run_streaming_video_dedup(
            spark, dirs["input"], TABLE, dirs["accepted"],
            dirs["ckpt"] + "_fresh", threshold=0.5,
        )


def test_video_service_compact_then_continue(spark, dirs):
    _land_epoch(spark, dirs, 0, [(0, _vid([A, B, C, D]))])
    _land_epoch(spark, dirs, 1, [(1, _vid([E, Fp, G, H]))])
    run_streaming_video_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        threshold=0.5, max_files_per_trigger=1, compact_after=True,
    )
    for t in (TABLE, TABLE + "_sizes"):
        parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {t}").collect()}
        assert parts == {"epoch=-1"}
    assert spark.table(TABLE).count() == 2 * 4

    # continue against the compacted index: a near-dup of folded id 0 is
    # dropped, a novel video is accepted under a new epoch
    _land_epoch(
        spark, dirs, 2,
        [
            (30, _vid([A, B, C, _pattern(50)])),
            (31, _vid([_pattern(s) for s in (51, 52, 53, 54)])),
        ],
    )
    run_streaming_video_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        threshold=0.5,
    )
    got = _accepted(spark, dirs)
    assert (31, 2, 4) in got and not any(m == 30 for m, _, _ in got)
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {TABLE}").collect()}
    assert "epoch=-1" in parts and "epoch=2" in parts


def test_video_marker_fingerprint_roundtrip(spark, dirs):
    _land_epoch(spark, dirs, 0, [(0, _vid([A, B]))])
    run_streaming_video_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"]
    )
    marker = os.path.join(dirs["accepted"], "_epochs", "epoch_0.committed")
    fp = json.loads(open(marker).read())
    assert fp["n"] == 1 and isinstance(fp["x"], int)


def test_video_redelivered_id_is_deduplicated(spark, dirs):
    """An id re-delivered in a LATER epoch must be dropped by its own
    indexed posting list at Jaccard 1.0 — the posting-index probe
    (incremental_jaccard_against_index) has no same-id guard for the same
    reason the signature probe keeps self-matches: crash replays are
    covered by exclude_epoch + markers, so a visible self-match is a
    genuine duplicate."""
    vid = _vid([A, B, C, D])
    _land_epoch(spark, dirs, 0, [(0, vid)])
    _land_epoch(spark, dirs, 1, [(0, vid), (1, _vid([E, Fp, G, H]))])
    run_streaming_video_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        threshold=0.5, max_files_per_trigger=1,
    )
    assert _accepted(spark, dirs) == {(0, 0, 4), (1, 1, 4)}
    assert spark.table(TABLE).count() == 2 * 4


def test_zero_frame_media_is_accepted_not_lost(spark, dirs):
    """Media whose frame stage yields zero fingerprints must be ACCEPTED
    with n_frames = 0 (empty sets match nothing), not silently vanish —
    the text service's shingle-less-doc behavior."""
    from pyspark.sql import functions as F

    _land_epoch(spark, dirs, 0, [(0, _vid([A, B])), (1, _vid([C]))])

    def dropping_frames(df):
        # a frame stage that yields nothing for media_id 1
        return (
            multimodal.video_frame_ahash(df)
            .filter(F.col("media_id") != 1)
            .select("media_id", "ahash")
            .distinct()
            .select("media_id", F.xxhash64("ahash").alias("h"))
        )

    run_streaming_video_dedup(
        spark, dirs["input"], TABLE, dirs["accepted"], dirs["ckpt"],
        frame_hashes=dropping_frames,
    )
    assert _accepted(spark, dirs) == {(0, 0, 2), (1, 0, 0)}
    # the empty set contributed nothing to the index
    assert {r["id"] for r in spark.table(TABLE).collect()} == {0}
