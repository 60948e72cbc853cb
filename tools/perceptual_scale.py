"""Scale-tier measurement for the perceptual near-dup families (round 7).

``python tools/perceptual_scale.py <sf_dir> <n_media> [image|video|audio|all]``

The DECLARED image/video/audio near-dup queries fix their media corpus (100
images / 60 videos / 160 audio) so their brute-force DuckDB oracles stay
tractable — which also means running them across tiers measures nothing.
This tool re-runs the SAME pipelines (synth → real decode → signature →
banded/posting join, byte-identical operator code) with a corpus that
GROWS:

* image — n 32×32 PNGs, per-media pseudo-random 8×8 block masks (numpy
  default_rng seeded by base id, so masks don't repeat and accidental
  collisions stay rare); every odd id re-renders its base with two blocks
  flipped — one engineered hamming-2 pair per id pair, so TRUE pairs scale
  linearly with n. Real PNG decode → aHash → 4×16-bit banded hamming join.
* video — n four-frame 16×16 all-I_PCM H.264 videos, pseudo-random frames,
  odd ids invert the last frame (set-Jaccard 3/5): real streamed decode →
  per-frame aHash → distinct → posting equi-join on the 16-hex key.
* audio — the declared dedup_audio_near operators over n seeded-random
  256-sample PCM recordings (odd ids silence the last 8 samples — a tail
  re-master touching only the final energy bins): FLAC round-trip → 64-bit
  energy fingerprint → banded hamming join. Synthetic PCM instead of the
  tier's document text because gen_scale's replicated copies differ only by
  a suffix token — at energy-fingerprint granularity every replica is a
  TRUE near-dup of its base, so pair counts would grow with replication²
  and measure the corpus shape, not the operator.

Timed cold + best-of-2 warm through the noop sink; prints ONE JSON line per
family with the confirmed pair count. Feeds SCALE.md's round-7 table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from snapshot_sender_spark.operators import dedup as dedup_ops
from snapshot_sender_spark.operators import multimodal
from snapshot_sender_spark.session import get_spark


def _lap(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _timed(build):
    cold = _lap(build())
    warm = min(_lap(build()) for _ in range(2))
    return cold, warm


def _image_pipeline(spark, n: int):
    ids = spark.range(n).select(F.col("id").alias("doc_id"))

    def synth(batches):
        import numpy as np
        import pandas as pd_

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                base, v = did // 2, did % 2
                rng = np.random.default_rng(base)
                high = rng.integers(0, 2, 64).astype(bool)
                if v == 1:
                    for flip in (base % 64, (base + 17) % 64):
                        high[flip] = ~high[flip]
                vals = np.where(high, 40, 20).astype(np.uint8).reshape(8, 8)
                gray = np.kron(vals, np.ones((4, 4), np.uint8))
                px = np.stack([gray, gray, gray], axis=2)
                rows.append(
                    {"media_id": did, "content": multimodal.encode_png_rgb8(px)}
                )
            yield pd_.DataFrame(rows, columns=["media_id", "content"])

    media = ids.mapInPandas(synth, "media_id long, content binary")
    sigs = multimodal.image_ahash(media).select(F.col("media_id").alias("id"), "sig")
    return dedup_ops.banded_hamming_pairs(sigs, max_hamming=3)


def _video_pipeline(spark, n: int):
    ids = spark.range(n).select(F.col("id").alias("doc_id"))

    def synth(batches):
        import numpy as np
        import pandas as pd_

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                base, v = did // 2, did % 2
                rng = np.random.default_rng(base)
                cb = np.full((8, 8), 128, np.uint8)
                frames = []
                for f in range(4):
                    high = rng.integers(0, 2, 64).astype(bool)
                    if v == 1 and f == 3:
                        high = ~high
                    vals = np.where(high, 40, 20).astype(np.uint8).reshape(8, 8)
                    luma = np.kron(vals, np.ones((2, 2), np.uint8))
                    frames.append((luma, cb, cb))
                rows.append(
                    {
                        "media_id": did,
                        "content": multimodal.encode_h264_ipcm_video(16, 16, frames),
                    }
                )
            yield pd_.DataFrame(rows, columns=["media_id", "content"])

    media = ids.mapInPandas(synth, "media_id long, content binary")
    vh = multimodal.video_frame_ahash(media).select("media_id", "ahash").distinct()
    sz = vh.groupBy("media_id").agg(F.count("*").alias("s"))
    a = vh.select(F.col("media_id").alias("id_a"), "ahash")
    c = vh.select(F.col("media_id").alias("id_b"), "ahash")
    inter = (
        a.join(c, "ahash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sz.select(F.col("media_id").alias("id_a"), F.col("s").alias("sa"))
    sb = sz.select(F.col("media_id").alias("id_b"), F.col("s").alias("sb"))
    jac = F.col("n_shared") / (F.col("sa") + F.col("sb") - F.col("n_shared"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


def _audio_pipeline(spark, n: int):
    ids = spark.range(n).select(F.col("id").alias("doc_id"))

    def synth(batches):
        import numpy as np
        import pandas as pd_

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                base, v = did // 2, did % 2
                rng = np.random.default_rng(base)
                pcm = rng.integers(-32768, 32768, 256).astype("<i2")
                if v == 1:
                    pcm[-8:] = 0  # tail re-master: last 2 of 64 energy bins
                rows.append({"media_id": did, "content": pcm.tobytes()})
            yield pd_.DataFrame(rows, columns=["media_id", "content"])

    media = ids.mapInPandas(synth, "media_id long, content binary")
    sigs = multimodal.audio_energy_ahash(multimodal.encode_as_flac(media)).select(
        F.col("media_id").alias("id"), "sig"
    )
    return dedup_ops.banded_hamming_pairs(sigs, max_hamming=3)


def main() -> None:
    sf_dir, n = sys.argv[1], int(sys.argv[2])
    which = sys.argv[3] if len(sys.argv) > 3 else "all"
    spark = get_spark(app_name="perceptual_scale")
    spark.sparkContext.setLogLevel("ERROR")
    fams = ("image", "video", "audio") if which == "all" else (which,)
    for fam in fams:
        if fam == "image":
            build = lambda: _image_pipeline(spark, n)  # noqa: E731
        elif fam == "video":
            build = lambda: _video_pipeline(spark, n)  # noqa: E731
        else:
            build = lambda: _audio_pipeline(spark, n)  # noqa: E731
        cold, warm = _timed(build)
        pairs = build().count()
        print(
            json.dumps(
                {
                    "family": fam,
                    "sf_dir": sf_dir,
                    "n_media": n,
                    "cold_sec": cold,
                    "warm_sec": warm,
                    "pairs": pairs,
                }
            )
        )


if __name__ == "__main__":
    main()
