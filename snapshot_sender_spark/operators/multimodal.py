"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is stubbed because the
container has no image/audio libraries — ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic fake
decoder (blake2b-seeded) produces stable pseudo-features so the distributed
plumbing can be exercised end-to-end.

Pattern: ``mapInPandas`` over batches of (id, content, meta) — one Python
crossing per Arrow batch; media bytes never shuffle (derive features first,
join later on id).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, sha256 string, feat array<double>"


def decode_image(content: bytes, fake: bool = False) -> list[float]:
    """STUB: real image decode needs PIL/libjpeg — not in this container.
    fake=True yields a deterministic 8-dim pseudo-feature from a keyed hash."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this environment; "
            "pass fake=True for the deterministic test double"
        )
    h = hashlib.blake2b(content or b"", digest_size=16).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary media content — the batch
    shape (Arrow RecordBatch per ~10k rows) is what a real decoder would see."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: 0 if b is None else len(b)),
                    "sha256": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feat": content.map(lambda b: decode_image(b or b"", fake=fake)),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: recompute the metadata struct and shrink the payload
    proportionally to the pixel-count ratio (stand-in for a real resampler —
    the byte budget `len·(tw·th)/(w·h)` in exact integer math is what a
    nearest-neighbor downsample would produce; the interpolation itself is
    the documented stub). Binary in, binary out, one Arrow crossing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                data = bytes(content or b"")
                w = int(meta["width"]) if meta is not None and meta["width"] else target_w
                h = int(meta["height"]) if meta is not None and meta["height"] else target_h
                out_len = (len(data) * target_w * target_h) // max(1, w * h)
                resized = data[:out_len]
                rows.append(
                    {
                        "media_id": mid,
                        "width": target_w,
                        "height": target_h,
                        "n_bytes_out": len(resized),
                        "content_sha": hashlib.sha256(resized).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes_out", "content_sha"],
            )

    return df.mapInPandas(
        run, schema="media_id long, width int, height int, n_bytes_out long, content_sha string"
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing: slice the binary into evenly spaced windows
    (stand-in for video frame extraction; the slicing/partitioning is the real
    pattern, the decode is the stub)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content or b"")
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_no": i,
                            "frame_sha": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame_sha"])

    return df.mapInPandas(run, schema="media_id long, frame_no int, frame_sha string")


AUDIO_ENERGY_SCHEMA = "media_id long, window_no int, n_samples int, energy bigint"


def pcm16_window_energy(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content", window: int = 8
) -> DataFrame:
    """Windowed audio energy over raw PCM — a REAL decode, not a stub: 16-bit
    little-endian PCM needs no codec library, just numpy.frombuffer. Each
    binary payload becomes int16 samples; per fixed-size window the energy is
    the exact integer sum of squares (≤ 2^15² per sample — BIGINT-safe), so
    the result is engine-reproducible bit-for-bit.

    Same scale contract as the other media ops: features are derived next to
    the bytes in mapInPandas (one Arrow crossing per batch); only
    (id, window, energy) rows ever shuffle. A trailing odd byte is ignored —
    the PCM frame convention."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            wins: list = []
            ns: list = []
            energies: list = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf or b"")
                b = b[: len(b) - (len(b) % 2)]
                samples = np.frombuffer(b, dtype="<i2").astype(np.int64)
                for w in range(0, len(samples), window):
                    chunk = samples[w : w + window]
                    ids.append(mid)
                    wins.append(w // window)
                    ns.append(len(chunk))
                    energies.append(int((chunk * chunk).sum()))
            yield pd.DataFrame(
                {"media_id": ids, "window_no": wins, "n_samples": ns, "energy": energies}
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(content_col).alias(content_col)
    ).mapInPandas(gen, schema=AUDIO_ENERGY_SCHEMA)
