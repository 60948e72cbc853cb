"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Two decodes are REAL with nothing but the
stdlib + numpy: PNG (zlib inflate + per-row unfilter — see the codec section
below) and 16-bit PCM audio. Formats that genuinely need codec libraries not
in this container (JPEG, MP3, H.264) remain documented stubs: ``decode_image``
raises NotImplementedError for them unless ``fake=True``, in which case a
deterministic fake decoder (blake2b-seeded) produces stable pseudo-features so
the distributed plumbing can be exercised end-to-end.

Pattern: ``mapInPandas`` over batches of (id, content, meta) — one Python
crossing per Arrow batch; media bytes never shuffle (derive features first,
join later on id).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    """PNG payloads decode for REAL (stdlib-zlib decoder below — 8-bit
    RGB/RGBA, all five scanline filters): the 8-dim feature is
    [w, h, channels, overall/R/G/B pixel means, pixel max/255], every value an
    exact integer ratio. Other formats (JPEG etc.) need codec libraries not in
    this container and remain the documented stub; ``fake=True`` yields a
    deterministic pseudo-feature from a keyed hash for plumbing tests."""
    if content[:8] == PNG_MAGIC:
        px = decode_png(bytes(content))
        h, w, c = px.shape
        flat = px.reshape(-1).astype("int64")
        rgb = px.reshape(-1, c)
        n = flat.size
        return [
            float(w),
            float(h),
            float(c),
            int(flat.sum()) / (n * 255),
            int(rgb[:, 0].sum()) / (h * w * 255),
            int(rgb[:, 1].sum()) / (h * w * 255),
            int(rgb[:, 2].sum()) / (h * w * 255),
            int(flat.max()) / 255 if n else 0.0,
        ]
    if not fake:
        raise NotImplementedError(
            "non-PNG image decode requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic test double"
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


# =============================================================================
# PNG codec — stdlib only (zlib + struct), no imaging library required.
# PNG (RFC 2083) is DEFLATE-compressed scanlines with 5 per-row predictor
# filters; 8-bit RGB/RGBA with no interlace decodes with nothing but inflate
# + unfilter, which makes image decode a REAL operator in this container.
# =============================================================================

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_rgb8(pixels, filters=None) -> bytes:
    """Encode an (h, w, 3|4) uint8 array as a PNG. ``filters`` picks the
    per-row filter type (default: cycle 0..4 so every decoder path is
    exercised). Filtering references the RAW neighbor bytes (per spec), so the
    encode side is fully vectorized."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c not in (3, 4):
        raise ValueError("RGB or RGBA only")
    color_type = 2 if c == 3 else 6
    stride = w * c
    raw = bytearray()
    zero = np.zeros(c, dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int32)
        f = (y % 5) if filters is None else int(filters[y])
        left = np.concatenate([zero, row[:-c]])
        if f == 0:
            out = row
        elif f == 1:
            out = (row - left) % 256
        elif f == 2:
            out = (row - prev) % 256
        elif f == 3:
            out = (row - (left + prev) // 2) % 256
        elif f == 4:
            upleft = np.concatenate([zero, prev[:-c]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            out = (row - pred) % 256
        else:
            raise ValueError(f"filter {f}")
        raw.append(f)
        raw += out.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes):
    """Decode an 8-bit RGB/RGBA non-interlaced PNG to an (h, w, c) uint8 array
    using only stdlib zlib: chunk walk (CRC-verified), IDAT inflate, per-row
    unfilter (all five filter types — Sub/Avg/Paeth reconstruct sequentially
    in x because they reference the reconstructed left pixel)."""
    import numpy as np

    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, dims = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        pos += 12 + length
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", chunk)
            if depth != 8 or color not in (2, 6) or interlace:
                raise NotImplementedError("only 8-bit RGB/RGBA, no interlace")
            dims = (w, h, 3 if color == 2 else 4)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if dims is None:
        raise ValueError("missing IHDR")
    w, h, c = dims
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8).astype(np.int32)
        pos += 1 + stride
        if f == 0:
            recon = row
        elif f == 2:
            recon = (row + prev) % 256
        elif f == 1:
            recon = row.copy()
            for x in range(c, stride):
                recon[x] = (recon[x] + recon[x - c]) % 256
        elif f == 3:
            recon = row.copy()
            for x in range(stride):
                left = recon[x - c] if x >= c else 0
                recon[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif f == 4:
            recon = row.copy()
            for x in range(stride):
                a = int(recon[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                recon[x] = (row[x] + _paeth(a, b, cc)) % 256
        else:
            raise ValueError(f"unknown filter {f}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out.reshape(h, w, c)


def encode_as_png(
    df: DataFrame, width: int = 8, height: int = 8,
    id_col: str = "media_id", content_col: str = "content",
) -> DataFrame:
    """Pack each payload's first width·height·3 bytes as the pixels of an RGB8
    PNG (row-major RGB interleave; per-row filter cycles 0..4 so every PNG
    predictor is actually applied). Payloads shorter than one image are
    dropped. One Arrow crossing; bytes stay executor-side."""
    import numpy as np

    need = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pngs = [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                buf = bytes(content or b"")
                if len(buf) < need:
                    continue
                px = np.frombuffer(buf[:need], dtype=np.uint8).reshape(height, width, 3)
                ids.append(mid)
                pngs.append(encode_png_rgb8(px))
            yield pd.DataFrame({"media_id": ids, "content": pngs})

    return df.mapInPandas(run, schema="media_id long, content binary")


PNG_STATS_SCHEMA = (
    "media_id long, width int, height int, channels int, pixel_sum long, "
    "pixel_min int, pixel_max int, r_sum long, g_sum long, b_sum long"
)


def png_pixel_stats(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """REAL image decode as a distributed operator: inflate + unfilter each
    PNG payload inside mapInPandas and reduce to exact integer pixel stats
    (engine-reproducible bit-for-bit, like pcm16_window_energy for audio).
    Only (id, stats) rows ever shuffle; pixels die inside the task."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                px = decode_png(bytes(content))
                h, w, c = px.shape
                flat = px.reshape(-1).astype(np.int64)
                rgb = px.reshape(-1, c).astype(np.int64)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "pixel_sum": int(flat.sum()),
                        "pixel_min": int(flat.min()),
                        "pixel_max": int(flat.max()),
                        "r_sum": int(rgb[:, 0].sum()),
                        "g_sum": int(rgb[:, 1].sum()),
                        "b_sum": int(rgb[:, 2].sum()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels", "pixel_sum",
                    "pixel_min", "pixel_max", "r_sum", "g_sum", "b_sum",
                ],
            )

    return df.mapInPandas(run, schema=PNG_STATS_SCHEMA)


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
