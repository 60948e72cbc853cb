"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Three decodes are REAL with nothing but the
stdlib + numpy: PNG (zlib inflate + per-row unfilter), JPEG — baseline
sequential AND progressive/SOF2 (full Huffman → dequant → IDCT pipeline,
spectral-selection + successive-approximation scans — see the codec sections
below), 16-bit PCM audio, and a FLAC subset (mono 16-bit, Rice-coded
fixed-prediction subframes, CRC-8/16 + MD5 integrity — bit-exact lossless,
see the FLAC section). For MP3 and H.264 the bitstream METADATA
layer is also real (round 5): an MPEG-1 Layer III frame-header walk
(frame count / sample rate / bitrate mode / exact sample total, ID3v2
skip) and an Annex B NAL walk with Exp-Golomb SPS decode (exact coded
resolution incl. frame cropping, profile/level, NAL census). Round 6
adds two real CORE subsets: MPEG-1 Layer III spectral decode (side-info
walk, scalefactors, table-1 Huffman, bit reservoir, scfsi — see the MP3
section) and H.264 PIXEL decode for all-I_PCM streams (slice-header
walk, per-MB raw 4:2:0 extraction, SPS crop — see the I_PCM section).
Only the codec paths that genuinely need external libraries or the
specs' large constant tables — Layer III synthesis filterbank / other
Huffman tables, and AVC predicted-MB residuals — remain typed stubs:
``decode_image`` raises NotImplementedError for them unless ``fake=True``,
in which case a deterministic fake decoder (blake2b-seeded) produces stable
pseudo-features so the distributed plumbing can be exercised end-to-end.

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
    """PNG and JPEG payloads decode for REAL (stdlib+numpy codecs below —
    PNG: 8-bit RGB/RGBA, all five scanline filters; JPEG: baseline
    sequential with any sampling AND progressive/SOF2): the 8-dim feature is
    [w, h, channels, overall/R/G/B pixel means, pixel max/255], every value
    an exact integer ratio. Other formats (MP3, H.264) need codec libraries
    not in this container and remain the documented stub; ``fake=True``
    yields a deterministic pseudo-feature from a keyed hash for plumbing
    tests."""
    px = None
    try:
        if content[:8] == PNG_MAGIC:
            px = decode_png(bytes(content))
        elif content[:2] == b"\xff\xd8":
            import numpy as np

            px = decode_jpeg(bytes(content))
            if px.ndim == 2:  # grayscale → single-channel plane
                px = px[:, :, np.newaxis]
    except (ValueError, NotImplementedError, struct.error, zlib.error) as e:
        # magic-matched but undecodable (corrupt, hierarchical, 16-bit …):
        # with fake=True the contract is "never raise, deterministic pseudo-
        # features for plumbing tests"; without it, decode errors propagate
        # (normalized to ValueError for the PNG walker's low-level errors)
        if not fake:
            if isinstance(e, (ValueError, NotImplementedError)):
                raise
            raise ValueError(f"corrupt image: {type(e).__name__}: {e}") from e
        px = None
    if px is not None:
        h, w, c = px.shape
        flat = px.reshape(-1).astype("int64")
        rgb = px.reshape(-1, c)
        n = flat.size
        # a structurally valid stream may declare a zero dimension (w=0 or
        # h=0): zero pixels → all ratio features are 0, never a division crash
        denom = (n * 255) or 1
        plane = (h * w * 255) or 1
        return [
            float(w),
            float(h),
            float(c),
            int(flat.sum()) / denom,
            int(rgb[:, 0].sum()) / plane,
            int(rgb[:, min(1, c - 1)].sum()) / plane,
            int(rgb[:, min(2, c - 1)].sum()) / plane,
            int(flat.max()) / 255 if n else 0.0,
        ]
    if not fake:
        raise NotImplementedError(
            "image decode beyond PNG/JPEG requires a codec library not "
            "present in this environment; pass fake=True for the deterministic "
            "test double"
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


def ahash64(pixels) -> int:
    """64-bit average hash (aHash) of an (h, w[, 3|4]) uint8 image, EXACT
    integer arithmetic: the per-pixel RGB channel sums (grayscale: the value
    itself — the hash is homogeneous, so channel count cancels) collapse to
    an 8×8 grid of block sums and bit i (MSB-first, raster block order) is
    set iff 64·block_sum ≥ total_sum — the classic perceptual thumbprint,
    with the float mean replaced by an equivalent cross-multiplication so
    two engines can agree bit-for-bit. Alpha is ignored. Dims must be
    multiples of 8."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.int64)
    h, w = px.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("aHash needs dims that are multiples of 8")
    plane = px if px.ndim == 2 else px[:, :, :3].sum(axis=2)
    blocks = plane.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
    total = int(blocks.sum())
    v = 0
    for i, s in enumerate(int(x) for x in blocks.reshape(-1)):
        if 64 * s >= total:
            v |= 1 << (63 - i)
    return v


def dhash64(pixels) -> int:
    """64-bit difference hash (dHash): block means over an 8-row × 9-column
    grid, bit (r,c) = left block strictly brighter than its right neighbor —
    equal-size blocks make the comparison exact on integer block SUMS, no
    division. Invariant to brightness (+b adds equally to both sides) and to
    contrast (a·x with a>0 preserves order) — but ONLY for transforms that
    keep every pixel inside [0, 255] without clipping or wrapping: a clipped
    a·x+b can reorder block sums and flip bits (uint8 saturation is not
    order-preserving). The robustness complement to ``ahash64``'s mean
    threshold. Height must be a multiple of 8, width of 9. Grayscale or RGB
    (channel sums)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.int64)
    h, w = px.shape[:2]
    if h % 8 or w % 9:
        raise ValueError("dHash needs height % 8 == 0 and width % 9 == 0")
    plane = px if px.ndim == 2 else px[:, :, :3].sum(axis=2)
    blocks = plane.reshape(8, h // 8, 9, w // 9).sum(axis=(1, 3))
    v = 0
    for r in range(8):
        for c in range(8):
            if int(blocks[r, c]) > int(blocks[r, c + 1]):
                v |= 1 << (63 - (r * 8 + c))
    return v


IMAGE_AHASH_SCHEMA = "media_id long, width int, height int, ahash string, sig long"


def image_ahash(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Distributed perceptual image hashing (mapInPandas): REAL decode (PNG
    or baseline/progressive JPEG, dispatched on the magic bytes) → exact
    integer aHash per image. ``ahash`` is the 16-hex-char MSB-first
    rendering (oracle-comparable); ``sig`` is the same 64 bits as a signed
    long for the banded hamming pair mining downstream. Bytes never shuffle —
    only (id, 8-byte hash) rows leave the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "width", "height", "ahash", "sig"]
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                data = bytes(buf or b"")
                if data[:8] == PNG_MAGIC:
                    px = decode_png(data)
                elif data[:2] == b"\xff\xd8":
                    px = decode_jpeg(data)
                else:
                    raise ValueError("unrecognized image magic (PNG/JPEG only)")
                v = ahash64(px)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "ahash": f"{v:016x}",
                        "sig": v - (1 << 64) if v >= (1 << 63) else v,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=IMAGE_AHASH_SCHEMA)


IMAGE_DHASH_SCHEMA = "media_id long, width int, height int, dhash string, sig long"


def image_dhash(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Distributed dHash (mapInPandas): REAL decode (PNG/JPEG by magic) →
    exact integer difference hash per image — same output contract as
    ``image_ahash`` so the banded hamming miners take either family."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "width", "height", "dhash", "sig"]
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                data = bytes(buf or b"")
                if data[:8] == PNG_MAGIC:
                    px = decode_png(data)
                elif data[:2] == b"\xff\xd8":
                    px = decode_jpeg(data)
                else:
                    raise ValueError("unrecognized image magic (PNG/JPEG only)")
                v = dhash64(px)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "dhash": f"{v:016x}",
                        "sig": v - (1 << 64) if v >= (1 << 63) else v,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=IMAGE_DHASH_SCHEMA)


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


# =============================================================================
# Baseline JPEG codec — stdlib + numpy, no imaging library.
# Sequential baseline DCT JPEG (ITU T.81 Annex F, public spec): marker parse
# (DQT/SOF0/DHT/SOS/DRI), Huffman entropy decode with 0xFF00 byte unstuffing,
# dequantize, inverse zigzag, orthonormal-matrix 2-D IDCT, level shift +
# clamp, nearest-neighbor chroma upsample, JFIF YCbCr→RGB. The encoder (used
# by fixtures/queries to synthesize payloads executor-side) emits grayscale or
# 4:4:4 color with the standard Annex K Huffman tables. Reference analog:
# none — the reference never decodes payloads (HttpWriter.kt:75 posts bytes
# unparsed); this is a north-star LLM-data capability.
# =============================================================================

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU T.81 Annex K.3 typical Huffman tables (public spec constants)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_basis():
    """Orthonormal 8×8 DCT-II basis A: FDCT = A·f·Aᵀ, IDCT = Aᵀ·F·A (DC-only
    block reconstructs to the constant DC/8 — exact in float64, which is what
    makes flat-block JPEGs decode bit-for-bit)."""
    import math

    import numpy as np

    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = (0.5 / math.sqrt(2.0)) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a


_DCT_A = None


def _A():
    global _DCT_A
    if _DCT_A is None:
        _DCT_A = _dct_basis()
    return _DCT_A


def _build_huffman(bits, values):
    """T.81 C.2: canonical code assignment — (length, code) → symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_huffman_spec(bits, values):
    """symbol → (code, length) for the encoder side."""
    return {sym: (code, length) for (length, code), sym in _build_huffman(bits, values).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t magnitude bits to the signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _encode_block(bw, block, qz, A, dcs, acs, pred, ci):
    """FDCT → quantize → Huffman-encode one 8×8 block; updates pred[ci]."""
    import numpy as np

    coef = A @ (block - 128.0) @ A.T
    zz = np.array([coef.flat[ZIGZAG[i]] for i in range(64)])
    q = np.rint(zz / qz).astype(np.int64)
    diff = int(q[0]) - pred[ci]
    pred[ci] = int(q[0])
    t = _category(diff)
    code, length = dcs[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if q[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = acs[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        t = _category(v)
        code, length = acs[(run << 4) | t]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        code, length = acs[0x00]  # EOB
        bw.write(code, length)


def encode_jpeg(pixels, quant=None, subsample=False, restart_interval=0) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a baseline
    sequential JPEG (Annex K Huffman tables, one quant table). ``quant`` is a
    length-64 table in natural (row-major) order, default all-8s: DC step 8
    makes flat 8×8 blocks reconstruct EXACTLY (8·(v−128)/8 survives
    quantization and the DC-only IDCT is the constant DC/8), the property
    the oracle-checked queries build on.

    ``subsample=True`` (color only) emits 4:2:0 — luma 2×2 per MCU, chroma
    box-averaged to half resolution — exercising the decoder's multi-block
    MCU interleave + upsample path. ``restart_interval=N`` emits a DRI
    segment and RSTn markers every N MCUs (byte-aligned, DC predictors
    reset), exercising the decoder's restart resynchronization. Dimensions
    must be multiples of the MCU size (8, or 16 when subsampled)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if subsample and gray:
        raise ValueError("subsampling applies to color images only")
    mcu = 16 if subsample else 8
    if h % mcu or w % mcu:
        raise ValueError(f"dimensions must be multiples of {mcu}")
    quant = list(quant) if quant is not None else [8] * 64
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # box-average 2×2 → half-resolution chroma
            def half(p):
                return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

            planes = [y, half(cb), half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    qz = np.array([quant[ZIGZAG[i]] for i in range(64)], dtype=np.float64)
    A = _A()
    dc_spec = _encode_huffman_spec(*_DC_LUMA)
    ac_spec = _encode_huffman_spec(*_AC_LUMA)
    dc_spec_c = _encode_huffman_spec(*_DC_CHROMA)
    ac_spec_c = _encode_huffman_spec(*_AC_CHROMA)
    bw = _BitWriter()
    pred = [0] * len(planes)
    mcux, mcuy = w // mcu, h // mcu
    scan_parts: list[bytes] = []
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                scan_parts.append(bw.flush())
                scan_parts.append(
                    bytes([0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)])
                )
                bw = _BitWriter()
                pred = [0] * len(planes)
            n_mcu += 1
            for ci, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
                dcs, acs = (dc_spec, ac_spec) if ci == 0 else (dc_spec_c, ac_spec_c)
                for byi in range(sv):
                    for bxi in range(sh):
                        py = (my * sv + byi) * 8
                        pxx = (mx * sh + bxi) * 8
                        block = plane[py : py + 8, pxx : pxx + 8]
                        _encode_block(bw, block, qz, A, dcs, acs, pred, ci)
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0]) + bytes(quant[ZIGZAG[i]] for i in range(64)))
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0])  # id, sampling, qt 0
    out += _seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA),
    ):
        if nc == 1 and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid] + bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _ac_prog_table():
    """AC Huffman table for PROGRESSIVE scans: the Annex K sequential tables
    have no EOBn symbols (r<<4 for r>0), which EOB-run coding needs, so
    progressive files carry their own DHT — every symbol we emit (EOB0-14,
    ZRL, all run/size pairs) as a flat canonical 8-bit code (176 symbols ≤
    255, so the reserved all-ones code is never assigned)."""
    vals = [r << 4 for r in range(15)]  # EOB0..EOB14
    vals.append(0xF0)  # ZRL
    vals.extend((r << 4) | s for r in range(16) for s in range(1, 11))
    bits = [0] * 16
    bits[7] = len(vals)  # every code 8 bits long
    return bits, vals


_AC_PROG = _ac_prog_table()


def _plane_coefs(plane, qz, A):
    """(h, w) float plane → (nby, nbx, 64) int32 quantized coefficients in
    zigzag order — the shared FDCT+quant front half of both entropy coders."""
    import numpy as np

    h, w = plane.shape
    nby, nbx = h // 8, w // 8
    blocks = (
        plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    )
    # stacked matmul, NOT einsum: it lowers to the same per-block gemm as the
    # baseline encoder's A @ block @ A.T, so float ties quantize (np.rint at
    # exactly .5) identically and the two encoders emit the SAME coefficients
    coefs = (A @ blocks @ A.T).reshape(-1, 64)
    zz = coefs[:, [ZIGZAG[i] for i in range(64)]]
    q = np.rint(zz / qz).astype(np.int32)
    return q.reshape(nby, nbx, 64)


class _ACProgWriter:
    """Shared EOB-run + buffered-correction-bit state for one progressive AC
    scan (libjpeg jcphuff's EOBRUN/BE machinery, G.1.2.2-G.1.2.3)."""

    def __init__(self, bw, acs):
        self.bw = bw
        self.acs = acs
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits deferred inside EOB runs

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.acs[r << 4]
            self.bw.write(code, length)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.pending:
            self.bw.write(bit, 1)
        self.pending = []

    def end_block(self, buffered_bits: list[int]) -> None:
        self.eobrun += 1
        self.pending.extend(buffered_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def encode_jpeg_progressive(pixels, quant=None, successive=True) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    PROGRESSIVE JPEG (SOF2, Annex K Huffman tables, 4:4:4 — no subsampling).
    Quantized coefficients are identical to ``encode_jpeg``'s, so decoding
    the progressive stream must reproduce the baseline decode bit-for-bit —
    the property the parity tests and the oracle-checked query build on.

    ``successive=True`` writes the full successive-approximation script
    (DC first at Al=1 → per-component AC first 1..63 at Al=1 → DC refinement
    → per-component AC refinement), exercising the decoder's refinement and
    correction-bit paths; ``successive=False`` writes spectral selection
    only (DC, then per-component AC split into bands 1-5 and 6-63) at Al=0.
    Dimensions must be multiples of 8."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("dimensions must be multiples of 8")
    quant = list(quant) if quant is not None else [8] * 64
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qz = np.array([quant[ZIGZAG[i]] for i in range(64)], dtype=np.float64)
    A = _A()
    coefs = [_plane_coefs(p, qz, A) for p in planes]
    nc = len(planes)
    dc_specs = [_encode_huffman_spec(*(_DC_LUMA if ci == 0 else _DC_CHROMA)) for ci in range(nc)]
    ac_specs = [_encode_huffman_spec(*_AC_PROG) for _ in range(nc)]
    nby, nbx = h // 8, w // 8

    def dc_first_scan(al: int) -> bytes:
        bw = _BitWriter()
        pred = [0] * nc
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(nc):
                    val = int(coefs[ci][by, bx, 0]) >> al  # arithmetic shift
                    diff = val - pred[ci]
                    pred[ci] = val
                    t = _category(diff)
                    code, length = dc_specs[ci][t]
                    bw.write(code, length)
                    if t:
                        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return bw.flush()

    def dc_refine_scan(al: int) -> bytes:
        bw = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(nc):
                    bw.write((int(coefs[ci][by, bx, 0]) >> al) & 1, 1)
        return bw.flush()

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        wtr = _ACProgWriter(bw, ac_specs[ci])
        for by in range(nby):
            for bx in range(nbx):
                blk = coefs[ci][by, bx]
                run = 0
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    mag = (abs(v) >> al) if al else abs(v)  # toward zero
                    if mag == 0:
                        run += 1
                        continue
                    wtr.flush_eobrun()
                    while run > 15:
                        code, length = ac_specs[ci][0xF0]
                        bw.write(code, length)
                        run -= 16
                    t = mag.bit_length()
                    enc = mag if v >= 0 else (-mag) + (1 << t) - 1
                    code, length = ac_specs[ci][(run << 4) | t]
                    bw.write(code, length)
                    bw.write(enc, t)
                    run = 0
                if run > 0:
                    wtr.end_block([])
        wtr.flush_eobrun()
        return bw.flush()

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        wtr = _ACProgWriter(bw, ac_specs[ci])
        p_spec = ac_specs[ci]
        for by in range(nby):
            for bx in range(nbx):
                blk = coefs[ci][by, bx]
                absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                eob = 0  # index AFTER the last newly-significant coefficient
                for i, m in enumerate(absv):
                    if m == 1:
                        eob = i + 1
                run = 0
                buffered: list[int] = []
                for i, m in enumerate(absv):
                    if m == 0:
                        run += 1
                        continue
                    while run > 15 and i < eob:
                        wtr.flush_eobrun()
                        code, length = p_spec[0xF0]
                        bw.write(code, length)
                        run -= 16
                        for bit in buffered:
                            bw.write(bit, 1)
                        buffered = []
                    if m > 1:
                        buffered.append(m & 1)
                        continue
                    # newly significant (magnitude exactly 1 after the shift)
                    wtr.flush_eobrun()
                    code, length = p_spec[(run << 4) | 1]
                    bw.write(code, length)
                    bw.write(0 if int(blk[ss + i]) < 0 else 1, 1)
                    for bit in buffered:
                        bw.write(bit, 1)
                    buffered = []
                    run = 0
                if run > 0 or buffered:
                    wtr.end_block(buffered)
        wtr.flush_eobrun()
        return bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0]) + bytes(quant[ZIGZAG[i]] for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])  # id, 1x1 sampling, qt 0
    out += _seg(0xC2, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_PROG), (0, 1, _DC_CHROMA), (1, 1, _AC_PROG),
    ):
        if nc == 1 and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid] + bits) + bytes(vals))

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00 if cid == 1 else 0x11])  # td/ta table ids
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    all_ids = list(range(1, nc + 1))
    if successive:
        out += sos(all_ids, 0, 0, 0, 1) + dc_first_scan(1)
        for ci in range(nc):
            out += sos([ci + 1], 1, 63, 0, 1) + ac_first_scan(ci, 1, 63, 1)
        out += sos(all_ids, 0, 0, 1, 0) + dc_refine_scan(0)
        for ci in range(nc):
            out += sos([ci + 1], 1, 63, 1, 0) + ac_refine_scan(ci, 1, 63, 0)
    else:
        out += sos(all_ids, 0, 0, 0, 0) + dc_first_scan(0)
        for ci in range(nc):
            out += sos([ci + 1], 1, 5, 0, 0) + ac_first_scan(ci, 1, 5, 0)
            out += sos([ci + 1], 6, 63, 0, 0) + ac_first_scan(ci, 6, 63, 0)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(data: bytes):
    """Decode a baseline sequential (SOF0/SOF1) or PROGRESSIVE (SOF2,
    spectral selection + successive approximation, Huffman) JPEG to an
    (h, w) grayscale or (h, w, 3) RGB uint8 array — stdlib + numpy only.
    Arbitrary sampling factors are reconstructed by nearest-neighbor
    (pixel-replication) upsampling; hierarchical/lossless frames and
    arithmetic coding raise NotImplementedError.
    Truncated or structurally corrupt streams always raise ValueError (or
    NotImplementedError for recognized-but-unsupported modes) — never a bare
    IndexError/KeyError/StopIteration from running off the buffer or
    dereferencing a table a corrupt stream never defined."""
    try:
        return _decode_jpeg(data)
    except (
        IndexError, KeyError, StopIteration, TypeError, ZeroDivisionError,
        struct.error,
    ) as e:
        raise ValueError(f"truncated or corrupt JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(data: bytes):
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    prog_state = None  # progressive: comp id → (nby, nbx, 64) coefficient array
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                qz = list(seg[o + 1 : o + 65])
                tbl = [0] * 64
                for i in range(64):
                    tbl[ZIGZAG[i]] = qz[i]
                qt[tq] = tbl
                o += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            o = 0
            while o < len(seg):
                cls, tid = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                vals = list(seg[o + 17 : o + 17 + n])
                huff[(cls, tid)] = _build_huffman(bits, vals)
                o += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext sequential / progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                sh, sv = hv >> 4, hv & 0xF
                if not (1 <= sh <= 4 and 1 <= sv <= 4):  # T.81 B.2.2 bounds
                    raise ValueError(f"invalid sampling factors {sh}x{sv}")
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline frame marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF: no frame header")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                comp = next((c for c in frame["comps"] if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"SOS names component {cs} absent from SOF")
                scan_comps.append({**comp, "td": tdta >> 4, "ta": tdta & 0xF})
            # locate the end of the entropy-coded segment (next non-RST marker)
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] not in (0x00, *range(0xD0, 0xD8)):
                    break
                end += 1
            if frame.get("progressive"):
                if prog_state is None:
                    prog_state = _alloc_prog_state(frame)
                ns_params = seg[1 + 2 * ns : 4 + 2 * ns]
                ss, se, ahal = ns_params[0], ns_params[1], ns_params[2]
                _decode_progressive_scan(
                    data[pos:end], frame, scan_comps, huff, restart_interval,
                    ss, se, ahal >> 4, ahal & 0xF, prog_state,
                )
                pos = end
                continue
            planes = _decode_scan(
                data[pos:end], frame, scan_comps, qt, huff, restart_interval
            )
            pos = end
            return _compose_image(frame, scan_comps, planes)
    if frame is not None and frame.get("progressive") and prog_state is not None:
        planes = _idct_prog_state(frame, prog_state, qt)
        return _compose_image(frame, frame["comps"], planes)
    raise ValueError("no scan data found")


def _compose_image(frame, comps, planes):
    """Per-component planes (native sampling resolution, MCU-padded) →
    grayscale array or YCbCr→RGB image cropped to the frame dimensions."""
    import numpy as np

    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    out = []
    for c, plane in zip(comps, planes):
        rep_y = vmax // c["v"]
        rep_x = hmax // c["h"]
        up = np.repeat(np.repeat(plane, rep_y, axis=0), rep_x, axis=1)
        out.append(up[:fh, :fw])
    if len(out) == 1:
        return out[0]
    y, cb, cr = (p.astype(np.float64) for p in out)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _split_rst(scan: bytes, restart_interval: int) -> list[bytes]:
    """Split entropy-coded data on restart markers (RSTn live OUTSIDE the
    bitstream proper) — shared by the baseline and progressive scan decoders."""
    if not restart_interval:
        return [scan]
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF and i + 1 < len(scan) and 0xD0 <= scan[i + 1] <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            cur.append(scan[i])
            i += 1
    intervals.append(bytes(cur))
    return intervals


def _mcu_grid(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _comp_grid(frame, c):
    """A component's own (non-interleaved) block grid (T.81 A.2.2)."""
    hmax, vmax, _, _ = _mcu_grid(frame)
    cw = (-(-frame["w"] * c["h"] // hmax) + 7) // 8
    ch = (-(-frame["h"] * c["v"] // vmax) + 7) // 8
    return cw, ch


def _alloc_prog_state(frame):
    """Progressive decoding accumulates dequantized-later coefficients across
    scans: comp id → int32 (nby, nbx, 64) in ZIGZAG index space (scans
    address spectral band k = Ss..Se directly)."""
    import numpy as np

    _, _, mcux, mcuy = _mcu_grid(frame)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _ac_first_block(br, act, blk, ss, se, al, eobrun):
    """T.81 G.2 / libjpeg decode_mcu_AC_first: one block of a first-pass AC
    scan — EOB-run aware, coefficients arrive shifted left by Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_symbol(act)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("AC index out of range")
            blk[k] = _extend(br.read_bits(s), s) << al
        else:
            if r != 15:
                eobrun = (1 << r) + (br.read_bits(r) if r else 0) - 1
                break
            k += 15  # ZRL: +15 here, +1 below
        k += 1
    return eobrun


def _ac_refine_block(br, act, blk, ss, se, al, eobrun):
    """T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine: one block of an AC
    successive-approximation refinement scan — newly-significant coefficients
    arrive as ±1<<Al, already-significant ones get a correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_symbol(act)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("invalid refinement magnitude category")
                newval = p1 if br.read_bit() else -p1
            elif r != 15:
                eobrun = (1 << r) + (br.read_bits(r) if r else 0)
                break
            # advance past r zero-HISTORY coefficients, emitting a correction
            # bit for every nonzero-history coefficient crossed
            while k <= se:
                if blk[k]:
                    if br.read_bit() and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        # inside an EOB run: only correction bits for the remaining
        # nonzero-history coefficients of this block
        while k <= se:
            if blk[k]:
                if br.read_bit() and (int(blk[k]) & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    scan: bytes, frame, comps, huff, restart_interval, ss, se, ah, al, state
):
    """One progressive scan (T.81 G.2): DC scans (Ss=0) walk MCUs interleaved
    (or a single component's own grid), AC scans (Ss>=1) are always
    single-component over that component's grid. Restart markers reset the
    DC predictors / EOB run like the baseline path."""
    hmax, vmax, mcux, mcuy = _mcu_grid(frame)
    intervals = _split_rst(scan, restart_interval)
    interval_idx = 0
    br = _BitReader(intervals[0])
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        pred = [0] * len(comps)
        interleaved = len(comps) > 1
        if interleaved:
            units = mcuy * mcux
        else:
            cw, ch = _comp_grid(frame, comps[0])
            units = cw * ch
        n = 0
        for u in range(units):
            if restart_interval and n and n % restart_interval == 0:
                interval_idx += 1
                br = _BitReader(intervals[interval_idx])
                pred = [0] * len(comps)
            n += 1
            if interleaved:
                my, mx = divmod(u, mcux)
                targets = [
                    (ci, c, my * c["v"] + byi, mx * c["h"] + bxi)
                    for ci, c in enumerate(comps)
                    for byi in range(c["v"])
                    for bxi in range(c["h"])
                ]
            else:
                by, bx = divmod(u, cw)
                targets = [(0, comps[0], by, bx)]
            for ci, c, by, bx in targets:
                blk = state[c["id"]][by, bx]
                if ah == 0:
                    t = br.decode_symbol(huff[(0, c["td"])])
                    diff = _extend(br.read_bits(t), t) if t else 0
                    pred[ci] += diff
                    blk[0] = pred[ci] << al
                elif br.read_bit():
                    blk[0] = int(blk[0]) | (1 << al)
    else:
        if len(comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        c = comps[0]
        act = huff[(1, c["ta"])]
        arr = state[c["id"]]
        cw, ch = _comp_grid(frame, c)
        eobrun = 0
        n = 0
        for u in range(ch * cw):
            if restart_interval and n and n % restart_interval == 0:
                interval_idx += 1
                br = _BitReader(intervals[interval_idx])
                eobrun = 0
            n += 1
            by, bx = divmod(u, cw)
            blk = arr[by, bx]
            if ah == 0:
                eobrun = _ac_first_block(br, act, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(br, act, blk, ss, se, al, eobrun)


def _idct_prog_state(frame, state, qt):
    """All scans consumed → dequantize + inverse-zigzag + IDCT every block of
    every component (vectorized over blocks), producing the same MCU-padded
    native-resolution planes the baseline scan decoder emits."""
    import numpy as np

    A = _A()
    planes = []
    for c in frame["comps"]:
        qtab = qt[c["tq"]]  # natural order
        qzz = np.array([qtab[ZIGZAG[i]] for i in range(64)], dtype=np.float64)
        arr = state[c["id"]]
        nby, nbx = arr.shape[:2]
        dq = arr.reshape(-1, 64).astype(np.float64) * qzz
        nat = np.zeros_like(dq)
        nat[:, [ZIGZAG[i] for i in range(64)]] = dq
        blocks = nat.reshape(-1, 8, 8)
        px = np.einsum("ij,njk,kl->nil", A.T, blocks, A) + 128.0
        px = np.clip(np.rint(px), 0, 255).astype(np.uint8)
        plane = (
            px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        planes.append(plane)
    return planes


def _decode_scan(scan: bytes, frame, comps, qt, huff, restart_interval):
    """Interleaved baseline scan → list of per-component uint8 planes (at
    their native sampling resolution, MCU-padded then cropped by caller)."""
    import numpy as np

    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.uint8) for c in comps
    ]
    A = _A()
    intervals = _split_rst(scan, restart_interval)
    br = _BitReader(intervals[0])
    interval_idx = 0
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                interval_idx += 1
                br = _BitReader(intervals[interval_idx])
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                qtab = qt[c["tq"]]
                dct = huff[(0, c["td"])]
                act = huff[(1, c["ta"])]
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = br.decode_symbol(dct)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci] * qtab[0]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(br.read_bits(s), s) * qtab[ZIGZAG[k]]
                            k += 1
                        coef = np.zeros((8, 8), dtype=np.float64)
                        for i in range(64):
                            coef.flat[ZIGZAG[i]] = zz[i]
                        block = A.T @ coef @ A + 128.0
                        py = (my * c["v"] + byi) * 8
                        pxx = (mx * c["h"] + bxi) * 8
                        planes[ci][py : py + 8, pxx : pxx + 8] = np.clip(
                            np.rint(block), 0, 255
                        ).astype(np.uint8)
    return planes


JPEG_STATS_SCHEMA = (
    "media_id long, width int, height int, channels int, pixel_sum long, "
    "pixel_min int, pixel_max int"
)


def jpeg_pixel_stats(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """REAL JPEG decode as a distributed operator: full baseline decode
    (Huffman → dequant → IDCT → clamp) inside mapInPandas, reduced to exact
    integer pixel stats. Only (id, stats) rows shuffle; pixels die in-task —
    the JPEG sibling of png_pixel_stats."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                px = decode_jpeg(bytes(content))
                if px.ndim == 2:
                    h, w = px.shape
                    c = 1
                else:
                    h, w, c = px.shape
                flat = px.reshape(-1).astype(np.int64)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "pixel_sum": int(flat.sum()),
                        "pixel_min": int(flat.min()),
                        "pixel_max": int(flat.max()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels",
                    "pixel_sum", "pixel_min", "pixel_max",
                ],
            )

    return df.mapInPandas(run, schema=JPEG_STATS_SCHEMA)


def encode_as_jpeg_flatblocks(
    df: DataFrame, blocks_w: int = 8, blocks_h: int = 8,
    id_col: str = "media_id", content_col: str = "content",
    progressive: bool = False,
) -> DataFrame:
    """Pack each payload's first blocks_w·blocks_h bytes as a grayscale JPEG
    where byte i is the CONSTANT value of 8×8 block i (row-major) — with the
    all-8s quant table such flat blocks survive encode→decode bit-for-bit
    (see encode_jpeg), so downstream pixel stats are exactly derivable from
    the source bytes by any engine. Payloads shorter than one image drop.
    ``progressive=True`` emits SOF2 streams instead (successive-approximation
    scan script, see encode_jpeg_progressive) — same quantized coefficients,
    so the bit-exactness property is unchanged."""
    import numpy as np

    need = blocks_w * blocks_h
    enc = (
        (lambda px: encode_jpeg_progressive(px, successive=True))
        if progressive
        else encode_jpeg
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, jpgs = [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                buf = bytes(content or b"")
                if len(buf) < need:
                    continue
                vals = np.frombuffer(buf[:need], dtype=np.uint8).reshape(
                    blocks_h, blocks_w
                )
                px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                ids.append(mid)
                jpgs.append(enc(px))
            yield pd.DataFrame({"media_id": ids, "content": jpgs})

    return df.mapInPandas(run, schema="media_id long, content binary")


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


# =============================================================================
# MP3 bitstream metadata (frame-header walk) — REAL parse, stdlib-only.
# The audio payload itself (Layer III Huffman spectral data → PCM) genuinely
# needs a codec library and stays out of scope; everything a data pipeline
# typically extracts from an MP3 column — frame count, sample rate, bitrate
# mode, exact duration in samples — comes from the frame HEADERS, and that
# walk is implemented from the MPEG-1 audio spec (ISO 11172-3 2.4.1.3).
# =============================================================================

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free, 15 = bad
MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
MP3_SAMPLERATES = [44100, 48000, 32000]  # index 3 = reserved
MP3_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def mp3_frame_size(bitrate_kbps: int, samplerate: int, padding: int = 0) -> int:
    """Layer III MPEG-1 frame length in bytes: 144·bitrate/samplerate (+pad)."""
    return 144 * bitrate_kbps * 1000 // samplerate + padding


def _id3v2(tag: bytes) -> bytes:
    """ID3v2.3 container for ``tag`` bytes: 'ID3' + version + flags + the
    4×7-bit syncsafe size. Shared by both fixture writers."""
    sz = len(tag)
    return b"ID3" + bytes([3, 0, 0]) + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
    ) + tag


def _skip_id3v2(data: bytes) -> int:
    """Offset of the first audio byte: past a leading ID3v2 tag (syncsafe
    size) if present, else 0. Shared by both parsers."""
    if data[:3] != b"ID3":
        return 0
    if len(data) < 10:
        raise ValueError("truncated ID3v2 header")
    sz = (
        ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14)
        | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    )
    return 10 + sz


def encode_mp3_frames(
    n_frames: int, bitrate_kbps: int = 128, samplerate: int = 44100,
    payload_byte: int = 0, id3_tag: bytes | None = None,
) -> bytes:
    """Fixture writer: a structurally valid CBR MPEG-1 Layer III stream of
    ``n_frames`` frames — correct sync/version/layer/bitrate/samplerate
    header fields and exact frame sizes, deterministic dummy payload (the
    spectral data is not audio). Optionally preceded by an ID3v2 tag."""
    bi = MP3_BITRATES.index(bitrate_kbps)
    si = MP3_SAMPLERATES.index(samplerate)
    hdr = bytes(
        [
            0xFF,
            0xFB,  # sync 11111111 111, MPEG-1 (11), Layer III (01), no CRC (1)
            (bi << 4) | (si << 2) | 0b00,  # bitrate idx, samplerate idx, no pad
            0b11000100,  # mono, no mode ext, not copyrighted, original, no emph
        ]
    )
    size = mp3_frame_size(bitrate_kbps, samplerate)
    frame = hdr + bytes([payload_byte]) * (size - 4)
    out = bytearray()
    if id3_tag is not None:
        out += _id3v2(id3_tag)
    out += frame * n_frames
    return bytes(out)


def parse_mp3_info(data: bytes) -> dict:
    """Walk an MP3 stream's frame headers: skip a leading ID3v2 tag, then
    decode every frame header (sync, version, layer, bitrate, samplerate,
    padding), stepping exact frame sizes. Returns n_frames, samplerate,
    bitrate_kbps (of the first frame), cbr flag, total_samples (exact:
    n_frames × 1152) and parsed_bytes. Corrupt/truncated streams raise
    ValueError — never a bare IndexError."""
    pos = _skip_id3v2(data)
    n_frames = 0
    first_bitrate = None
    samplerate = None
    cbr = True
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2, _b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 sync at byte {pos}")
        version = (b1 >> 3) & 0b11
        layer = (b1 >> 1) & 0b11
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError("only MPEG-1 Layer III streams")
        bi = (b2 >> 4) & 0xF
        si = (b2 >> 2) & 0b11
        padding = (b2 >> 1) & 1
        if bi in (0, 15) or si == 3:
            raise ValueError(f"invalid bitrate/samplerate index at byte {pos}")
        br = MP3_BITRATES[bi]
        sr = MP3_SAMPLERATES[si]
        if samplerate is None:
            samplerate, first_bitrate = sr, br
        elif br != first_bitrate:
            cbr = False
        size = mp3_frame_size(br, sr, padding)
        if pos + size > len(data):
            raise ValueError(f"truncated MP3 frame at byte {pos}")
        pos += size
        n_frames += 1
    if n_frames == 0:
        raise ValueError("no MP3 frames")
    return {
        "n_frames": n_frames,
        "samplerate": samplerate,
        "bitrate_kbps": first_bitrate,
        "cbr": cbr,
        "total_samples": n_frames * MP3_SAMPLES_PER_FRAME,
        "parsed_bytes": pos,
    }


MP3_INFO_SCHEMA = (
    "media_id long, n_frames int, samplerate int, bitrate_kbps int, "
    "cbr boolean, total_samples bigint, parsed_bytes bigint"
)


def mp3_stream_info(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Distributed MP3 metadata extraction (mapInPandas, bytes never
    shuffle): one row of exact header-derived facts per payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                info = parse_mp3_info(bytes(buf or b""))
                rows.append({"media_id": mid, **info})
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "samplerate", "bitrate_kbps",
                    "cbr", "total_samples", "parsed_bytes",
                ],
            )

    return df.mapInPandas(run, schema=MP3_INFO_SCHEMA)


# =============================================================================
# MPEG-1 Layer III SPECTRAL decode — REAL bit-level parse of a documented
# SUBSET, from the public ISO/IEC 11172-3 structure (2.4.1.7 side info,
# 2.4.2.7 main data, Table B.6 scalefac_compress, Table B.7 code table 1,
# Table B.8 scalefactor bands): mono long-block streams, 44.1 kHz band
# table, Huffman code tables 0 and 1, empty count1 region, and the BIT
# RESERVOIR (main_data_begin back-pointer with cross-frame packing) and
# SCFSI scalefactor sharing (granule 1 copies scfsi-marked band groups and
# transmits no bits for them) — both structural, needing no spec tables.
# The side-info walk, scalefactor read, per-REGION Huffman decode with
# sign bits, and the power-law requantization
# xr = ±|v|^(4/3)·2^((gain−210)/4 − mult·(sf+pre)) are all real; what
# stays typed NotImplementedError — with the reason in the message — is
# exactly the part that needs the spec's large constant tables or a codec
# library: Huffman tables 2–31 (linbits), the count1 quadruple tables,
# short/mixed blocks, other band tables, and the polyphase synthesis
# filterbank (512 tabulated window coefficients). The container ships no MP3 codec to source or
# cross-check those against; the subset here is round-trip verified by
# this repo's own encoder + the oracle's independent integer
# recomputation.
# =============================================================================

# Table B.6: scalefac_compress → (slen1 over sfb 0-10, slen2 over sfb 11-20)
MP3_SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]
# Table B.8, long blocks, 44.1 kHz: start line of each of the 21 scalefactor
# bands plus the 576 terminator (band widths 4,4,4,4,4,4,6,6,8,8,10,12,16,
# 20,24,28,34,42,50,54,76 and the 158-line residue above band 20)
MP3_SFB_LONG_44100 = [
    0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134, 162,
    196, 238, 288, 342, 418, 576,
]
# Table B.7 code table 1 (the only table whose codes fit in one line):
# (|x|,|y|) → (code, bits); prefix-free {1, 01, 001, 000}
MP3_HUFF_T1 = {(0, 0): (0b1, 1), (1, 0): (0b01, 2), (0, 1): (0b001, 3), (1, 1): (0b000, 3)}
_MP3_HUFF_T1_DEC = {v: k for k, v in MP3_HUFF_T1.items()}
# preflag pretab (2.4.3.4.array), bands 0..20
MP3_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2]
# scfsi band groups (2.4.2.7): long-block sfb ranges whose granule-1
# scalefactors are OMITTED (copied from granule 0) when the group's bit is 1
MP3_SCFSI_BANDS = [(0, 6), (6, 11), (11, 16), (16, 21)]


def encode_mp3_spectral(
    granule_specs: list[tuple[int, int]],
    bitrate_kbps: int = 128,
    scalefac_compress: int = 1,
    id3_tag: bytes | None = None,
    reservoir_targets: list[int] | None = None,
    scfsi: int = 0,
) -> bytes:
    """Fixture writer for the spectral subset: a CBR 44.1 kHz mono MPEG-1
    Layer III stream whose frames carry REAL side info, scalefactors and
    Huffman-coded spectra. ``granule_specs`` is a flat list of (nnz, m) —
    two entries per frame — where granule g gets its first ``nnz`` spectral
    lines set to ±1 (signs alternating +,−,…) coded with table 1, and
    global_gain = 210 + 4·m so requantized lines are exactly ±2^m.

    Layout per granule: big_values = ⌈nnz/2⌉ pairs, all inside region0
    (region0_count=15 spans lines 0..161 at 44.1 kHz — nnz is capped at 160
    by validation), table_select = (1, 0, 0), count1 region empty
    (part2_3_length ends exactly after the last sign bit), scalefactor
    values all zero but with ``scalefac_compress``-many REAL bits on the
    wire so the decoder's part2 walk is exercised.

    ``reservoir_targets`` enables the BIT RESERVOIR (2.4.2.7
    main_data_begin): one byte offset per frame (frame 0 must be 0); frame
    n's two-granule main-data blob then starts ``targets[n]`` bytes BEFORE
    frame n's own main_data region, inside the stuffing bytes of earlier
    frames — the blobs pack back-to-back into the concatenated regions
    exactly as real encoders do, with ancillary stuffing inserted to hit
    each frame's pointer. Targets must satisfy the spec's feasibility
    constraints (≤ 511, ≤ bytes actually in the reservoir, and the next
    pointer cannot exceed what this frame leaves unconsumed); infeasible
    targets raise ValueError.

    ``scfsi`` (4 bits, group 0 = MSB per 2.4.1.7 read order) marks
    scalefactor band groups whose granule-1 scalefactors are SHARED:
    granule 1 then transmits no bits for sfb groups 0–5 / 6–10 / 11–15 /
    16–20 with a set bit — the decoder must copy granule 0's values, and
    its part2 bit budget shrinks accordingly."""
    assert len(granule_specs) % 2 == 0, "two granules per frame"
    if not 0 <= scfsi <= 0xF:
        raise ValueError("scfsi is a 4-bit field")
    slen1, slen2 = MP3_SLEN[scalefac_compress]

    def slen_of(band: int) -> int:
        return slen1 if band < 11 else slen2

    # bands actually transmitted per granule under scfsi (granule 0 always
    # sends all 21; granule 1 skips shared groups)
    tx_bands = [list(range(21)), []]
    for gi, (lo, hi) in enumerate(MP3_SCFSI_BANDS):
        if not (scfsi >> (3 - gi)) & 1:
            tx_bands[1].extend(range(lo, hi))
    part2_of = [sum(slen_of(b) for b in bands) for bands in tx_bands]
    bi = MP3_BITRATES.index(bitrate_kbps)
    hdr = bytes([0xFF, 0xFB, (bi << 4) | (0 << 2), 0b11000100])
    size = mp3_frame_size(bitrate_kbps, 44100)
    region_cap = size - 21  # bytes of main_data space per frame
    n_frames = len(granule_specs) // 2
    targets = list(reservoir_targets) if reservoir_targets is not None else [0] * n_frames
    if len(targets) != n_frames:
        raise ValueError("reservoir_targets needs one entry per frame")
    if targets and targets[0] != 0:
        raise ValueError("frame 0 cannot point into an empty reservoir")

    # pass 1: side info (main_data_begin = target) + byte-aligned blobs
    sides: list[bytes] = []
    blobs: list[bytes] = []
    for n in range(n_frames):
        t = targets[n]
        if not 0 <= t <= 511:
            raise ValueError("main_data_begin is a 9-bit field")
        if t > n * region_cap:
            raise ValueError("reservoir target exceeds bytes ever written")
        side = _FlacBitWriter()  # generic MSB-first writer
        main = _FlacBitWriter()
        side.write(t, 9)   # main_data_begin
        side.write(0, 5)   # private_bits
        side.write(scfsi, 4)
        for g, (nnz, m) in enumerate(granule_specs[2 * n : 2 * n + 2]):
            if not 0 <= nnz <= 160:
                raise ValueError("nnz must fit region0 (lines 0..161)")
            if not 0 <= m <= 11:
                raise ValueError("m out of the exact-dyadic gain range")
            big_values = (nnz + 1) // 2
            part3 = 0
            for p in range(big_values):
                x = 1 if 2 * p < nnz else 0
                y = 1 if 2 * p + 1 < nnz else 0
                part3 += MP3_HUFF_T1[(x, y)][1] + x + y  # code + sign bits
            side.write(part2_of[g] + part3, 12)  # part2_3_length
            side.write(big_values, 9)
            side.write(210 + 4 * m, 8)     # global_gain
            side.write(scalefac_compress, 4)
            side.write(0, 1)               # window_switching_flag: long blocks
            side.write(1, 5)               # table_select region0 → table 1
            side.write(0, 5)               # region1 → table 0 (no bits, zeros)
            side.write(0, 5)               # region2 → table 0
            side.write(15, 4)              # region0_count: sfb 0..15 ⊇ lines 0..161
            side.write(0, 3)               # region1_count
            side.write(0, 1)               # preflag
            side.write(0, 1)               # scalefac_scale → mult 0.5 (unused: sf=0)
            side.write(0, 1)               # count1table_select
            # main data for this granule: scalefactors (zero-valued, real
            # widths; granule 1 omits scfsi-shared groups), then the
            # Huffman spectrum
            for b in tx_bands[g]:
                main.write(0, slen_of(b))
            for p in range(big_values):
                x = 1 if 2 * p < nnz else 0
                y = 1 if 2 * p + 1 < nnz else 0
                code, bits = MP3_HUFF_T1[(x, y)]
                main.write(code, bits)
                if x:
                    main.write((2 * p) % 2, 1)      # sign: 1 = negative
                if y:
                    main.write((2 * p + 1) % 2, 1)
        sb = side.flush_zero()
        assert len(sb) == 17, "mono MPEG-1 side info is 17 bytes"
        sides.append(sb)
        blobs.append(main.flush_zero())

    # pass 2: pack blobs back-to-back into the concatenated main_data
    # regions; frame n's blob must start at queue offset n·C − target[n],
    # so stuffing (ancillary bytes of the PREVIOUS frame) fills any gap
    queue = bytearray()
    for n in range(n_frames):
        start = n * region_cap - targets[n]
        if len(queue) > start:
            raise ValueError(
                "infeasible reservoir target: previous frame's data extends "
                "past where this frame's pointer says its data begins"
            )
        queue += bytes(start - len(queue))  # stuffing
        queue += blobs[n]
        if len(queue) > (n + 1) * region_cap:
            raise ValueError("spectra overflow the frame's main_data capacity")
    queue += bytes(n_frames * region_cap - len(queue))

    out = bytearray()
    if id3_tag is not None:
        out += _id3v2(id3_tag)
    for n in range(n_frames):
        out += hdr
        out += sides[n]
        out += queue[n * region_cap : (n + 1) * region_cap]
    return bytes(out)


def parse_mp3_spectra(data: bytes, keep_lines: bool = False) -> list[dict]:
    """REAL Layer III spectral decode for the documented subset: walks every
    frame, parses the 17-byte mono side info field by field, reads the
    scalefactors, Huffman-decodes the big_values region per REGION (table 0
    = zero lines / no bits, table 1 = real prefix decode + sign bits,
    region boundaries from the 44.1 kHz long-block band table clipped to
    big_values·2), and requantizes xr_i = sign·|v|^(4/3) ·
    2^((global_gain−210)/4 − mult·(scalefac+preflag·pretab)). Returns one
    dict per granule: frame_no, granule, global_gain, nnz (nonzero lines)
    and energy = Σ xr² (exact for the ±2^m subset; float otherwise).
    ``keep_lines`` adds ``xr``: the full 576-line requantized vector (list
    of floats) — the input the IMDCT stage (``mp3_subband_samples``) needs.

    The BIT RESERVOIR is supported (it is structural, not tabular): the
    decoder keeps the last 511 bytes of main_data regions seen so far, and
    a frame with main_data_begin = B bit-reads its two granules from B
    bytes back in that buffer, continuing into its own region — exactly the
    2.4.2.7 model. A pointer reaching before the reservoir's start raises
    ValueError.

    Out-of-subset features raise typed NotImplementedError naming the
    missing constant tables (see the section comment above); malformed
    streams raise ValueError."""
    pos = _skip_id3v2(data)
    out: list[dict] = []
    frame_no = 0
    reservoir = bytearray()  # last ≤511 bytes of main_data regions seen
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 sync at byte {pos}")
        if (b1 >> 3) & 0b11 != 0b11 or (b1 >> 1) & 0b11 != 0b01:
            raise NotImplementedError("only MPEG-1 Layer III streams")
        if not (b1 & 1):
            raise NotImplementedError("CRC-protected frames")
        bi, si, padding = (b2 >> 4) & 0xF, (b2 >> 2) & 0b11, (b2 >> 1) & 1
        if bi in (0, 15) or si == 3:
            raise ValueError(f"invalid bitrate/samplerate index at byte {pos}")
        if MP3_SAMPLERATES[si] != 44100:
            raise NotImplementedError(
                "scalefactor band table implemented for 44.1 kHz only"
            )
        if (b3 >> 6) & 0b11 != 0b11:
            raise NotImplementedError("only single_channel (mono) side info")
        size = mp3_frame_size(MP3_BITRATES[bi], 44100, padding)
        if pos + size > len(data):
            raise ValueError(f"truncated MP3 frame at byte {pos}")
        br = _FlacBitReader(data, pos=pos + 4)  # generic MSB-first reader
        main_data_begin = br.bits(9)
        if main_data_begin > len(reservoir):
            raise ValueError(
                f"reservoir underflow at frame {frame_no}: main_data_begin "
                f"{main_data_begin} > {len(reservoir)} buffered bytes"
            )
        br.bits(5)  # private_bits
        scfsi = br.bits(4)  # granule-1 scalefactor sharing per band group
        gr_side = []
        for _g in range(2):
            side = {
                "part2_3_length": br.bits(12),
                "big_values": br.bits(9),
                "global_gain": br.bits(8),
                "scalefac_compress": br.bits(4),
            }
            if br.bit():
                raise NotImplementedError("window switching (short/mixed blocks)")
            side["table_select"] = [br.bits(5) for _ in range(3)]
            side["region0_count"] = br.bits(4)
            side["region1_count"] = br.bits(3)
            side["preflag"] = br.bit()
            side["scalefac_scale"] = br.bit()
            if br.bit():
                raise NotImplementedError("count1 code table A")
            gr_side.append(side)
        # main_data window: main_data_begin bytes back in the reservoir,
        # continuing into this frame's own region (2.4.2.7)
        region = data[pos + 21 : pos + size]
        window = bytes(reservoir[len(reservoir) - main_data_begin :]) + region
        main = _FlacBitReader(window)
        prev_scalefacs: list[int] = []
        for g, side in enumerate(gr_side):
            consumed = 0  # bits read against this granule's part2_3_length
            slen1, slen2 = MP3_SLEN[side["scalefac_compress"]]
            # scalefactors: granule 1 COPIES granule 0's values for scfsi-
            # shared band groups and reads no bits for them (2.4.2.7)
            scalefacs = []
            for band in range(21):
                group = next(
                    gi for gi, (lo, hi) in enumerate(MP3_SCFSI_BANDS)
                    if lo <= band < hi
                )
                shared = g == 1 and (scfsi >> (3 - group)) & 1
                slen = slen1 if band < 11 else slen2
                if shared:
                    scalefacs.append(prev_scalefacs[band])
                elif slen:
                    scalefacs.append(main.bits(slen))
                    consumed += slen
                else:
                    scalefacs.append(0)
            prev_scalefacs = scalefacs
            # region line boundaries (long blocks): region0 ends at band
            # region0_count+1, region1 at band +region1_count+1 more, all
            # clipped to the big_values line span
            bv_lines = side["big_values"] * 2
            if bv_lines > 576:
                # 2.4.2.7: big_values <= 288 — more would address spectral
                # lines past 575. Malformed, not out-of-subset; the guard
                # keeps keep_lines' fixed 576-slot vector in range too.
                raise ValueError(
                    f"big_values {side['big_values']} addresses lines past 575"
                )
            r0 = min(MP3_SFB_LONG_44100[min(side["region0_count"] + 1, 22)], bv_lines)
            r1 = min(
                MP3_SFB_LONG_44100[
                    min(side["region0_count"] + 1 + side["region1_count"] + 1, 22)
                ],
                bv_lines,
            )
            values: list[int] = []
            for region_end, table in zip(
                (r0, r1, bv_lines), side["table_select"]
            ):
                while len(values) < region_end:
                    if table == 0:
                        values.extend((0, 0))
                        continue
                    if table != 1:
                        raise NotImplementedError(
                            f"Huffman code table {table} (linbits tables need "
                            "the spec's constant tables)"
                        )
                    code, bits = 0, 0
                    while (code, bits) not in _MP3_HUFF_T1_DEC:
                        code = (code << 1) | main.bit()
                        bits += 1
                        if bits > 3:
                            raise ValueError("invalid table-1 codeword")
                    consumed += bits
                    x, y = _MP3_HUFF_T1_DEC[(code, bits)]
                    if x:
                        x = -x if main.bit() else x
                        consumed += 1
                    if y:
                        y = -y if main.bit() else y
                        consumed += 1
                    values.extend((x, y))
            if consumed < side["part2_3_length"]:
                raise NotImplementedError(
                    "count1 region (quadruple code tables need the spec's "
                    "constant tables)"
                )
            if consumed > side["part2_3_length"]:
                raise ValueError("Huffman data overran part2_3_length")
            # requantization: exact power-of-two scaling for the ±1 subset
            mult = 0.5 if side["scalefac_scale"] == 0 else 1.0
            gain = 2.0 ** ((side["global_gain"] - 210) / 4.0)
            energy = 0.0
            nnz = 0
            lines = [0.0] * 576 if keep_lines else None
            for i, v in enumerate(values):
                if v == 0:
                    continue
                sfb = _sfb_of_line(i)
                sf = scalefacs[sfb] if sfb < 21 else 0
                xr = (abs(v) ** (4.0 / 3.0)) * gain * 2.0 ** (
                    -mult * (sf + side["preflag"] * MP3_PRETAB[min(sfb, 20)])
                )
                if v < 0:
                    xr = -xr
                energy += xr * xr
                nnz += 1
                if lines is not None:
                    lines[i] = xr
            rec = {
                "frame_no": frame_no,
                "granule": g,
                "global_gain": side["global_gain"],
                "nnz": nnz,
                "energy": energy,
            }
            if lines is not None:
                rec["xr"] = lines
            out.append(rec)
        reservoir = (reservoir + region)[-511:]  # 9-bit pointer ceiling
        pos += size
        frame_no += 1
    if frame_no == 0:
        raise ValueError("no MP3 frames")
    return out


def _sfb_of_line(i: int) -> int:
    """Long-block scalefactor band containing spectral line i (44.1 kHz)."""
    for b in range(22):
        if i < MP3_SFB_LONG_44100[b + 1]:
            return b
    return 21


MP3_SPECTRAL_SCHEMA = (
    "media_id long, frame_no int, granule int, global_gain int, "
    "nnz int, energy bigint"
)


def mp3_spectral_energy(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Distributed Layer III spectral decode (mapInPandas, bytes never
    shuffle): one row per granule with the nonzero-line count and the exact
    integer spectral energy Σ xr² (the fixture subset keeps xr = ±2^m, so
    the float accumulation is exact and the BIGINT cast is lossless)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                for g in parse_mp3_spectra(bytes(buf or b"")):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_no": g["frame_no"],
                            "granule": g["granule"],
                            "global_gain": g["global_gain"],
                            "nnz": g["nnz"],
                            "energy": int(g["energy"]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_no", "granule", "global_gain", "nnz",
                    "energy",
                ],
            )

    return df.mapInPandas(run, schema=MP3_SPECTRAL_SCHEMA)


# -----------------------------------------------------------------------------
# Layer III hybrid filterbank, the FORMULAIC half (round 7): alias reduction
# (8 rotation butterflies per subband boundary, coefficients from the spec's
# published ci list), the 18→36 long-block IMDCT (pure cosine formula), the
# sine window sin(π/36·(i+0.5)), 50% overlap-add, and the odd-subband
# frequency inversion — everything between requantized spectral lines and
# time-domain SUBBAND samples, none of it needing tabulated constants. What
# remains out of scope is exactly the final polyphase synthesis to PCM: its
# 512-coefficient window (ISO 11172-3 Table B.3) is a numerically-designed
# prototype with no closed form, so it cannot be derived from public formulas
# — only transcribed — and the container ships no codec to transcribe or
# verify against. mp3_synthesize_pcm raises the typed NotImplementedError
# naming that table. The machinery here is verified mathematically instead:
# the alias butterflies are exact rotations (inverse-applied round-trip), and
# the window/IMDCT/overlap-add chain satisfies perfect reconstruction against
# a test-side forward MDCT (Princen–Bradley: sin² + cos² = 1), pinned in
# tests/test_operators.py.
# -----------------------------------------------------------------------------

# alias-reduction coefficients ci (ISO 11172-3 2.4.3.4.10.1 / Table B.9)
MP3_ALIAS_C = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]


def _alias_coeffs():
    import numpy as np

    c = np.asarray(MP3_ALIAS_C)
    cs = 1.0 / np.sqrt(1.0 + c * c)
    ca = c / np.sqrt(1.0 + c * c)
    return cs, ca


def alias_reduce(xr, inverse: bool = False):
    """Alias-reduction butterflies over the 576-line granule: at each of the
    31 long-block subband boundaries, 8 rotations mix line (18·sb−1−i) of the
    lower subband with line (18·sb+i) of the upper one. cs²+ca²=1, so each
    butterfly is an exact rotation; ``inverse=True`` applies the transpose
    (the encoder side), making round-trip identity testable to float
    precision."""
    import numpy as np

    cs, ca = _alias_coeffs()
    out = np.asarray(xr, dtype=np.float64).copy()
    if out.shape != (576,):
        raise ValueError("alias_reduce expects one 576-line granule")
    for sb in range(1, 32):
        lo = out[18 * sb - 1 - np.arange(8)]
        hi = out[18 * sb + np.arange(8)]
        if inverse:
            out[18 * sb - 1 - np.arange(8)] = lo * cs + hi * ca
            out[18 * sb + np.arange(8)] = hi * cs - lo * ca
        else:
            out[18 * sb - 1 - np.arange(8)] = lo * cs - hi * ca
            out[18 * sb + np.arange(8)] = hi * cs + lo * ca
    return out


_IMDCT18_CACHE = None


def _imdct18_matrix():
    # cached: mp3_subband_samples calls imdct18 32x per granule — rebuilding
    # the constant 36x18 cosine matrix each call is pure waste
    global _IMDCT18_CACHE
    if _IMDCT18_CACHE is None:
        import numpy as np

        i = np.arange(36)[:, None]
        k = np.arange(18)[None, :]
        _IMDCT18_CACHE = np.cos(np.pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
    return _IMDCT18_CACHE


def imdct18(X):
    """Long-block IMDCT (ISO 11172-3 2.4.3.4.12): 18 spectral lines → 36
    time samples, x_i = Σ_k X_k · cos(π/72 · (2i+1+18) · (2k+1))."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    if X.shape != (18,):
        raise ValueError("imdct18 expects 18 spectral lines")
    return _imdct18_matrix() @ X


def mp3_long_window():
    """Long-block synthesis window w_i = sin(π/36 · (i+0.5)) — satisfies
    Princen–Bradley (w_i² + w_{i+18}² = sin²+cos² = 1), which is what makes
    the 50% overlap-add below perfectly reconstructing."""
    import numpy as np

    return np.sin(np.pi / 36.0 * (np.arange(36) + 0.5))


def mp3_subband_samples(data: bytes) -> list[dict]:
    """Decode an MP3 stream (the documented spectral subset) through the
    hybrid filterbank's formulaic half: per granule, alias-reduce the 576
    requantized lines, IMDCT each of the 32 subbands' 18 lines to 36 time
    samples, window, 50%-overlap-add with the decoder's per-subband state,
    and apply the odd-subband frequency inversion (every odd time sample of
    every odd subband negated — the polyphase-compensation step that
    precedes synthesis). Returns one dict per granule:
    {frame_no, granule, samples: float64 (18, 32)} — 18 time steps × 32
    subbands, the exact input the (out-of-scope) polyphase filterbank would
    consume."""
    import numpy as np

    w = mp3_long_window()
    state = np.zeros((32, 18))
    out = []
    for g in parse_mp3_spectra(data, keep_lines=True):
        xar = alias_reduce(np.asarray(g["xr"]))
        samples = np.empty((18, 32))
        for sb in range(32):
            z = imdct18(xar[18 * sb : 18 * sb + 18]) * w
            samples[:, sb] = z[:18] + state[sb]
            state[sb] = z[18:]
        # frequency inversion: odd time samples of odd subbands negated
        samples[1::2, 1::2] = -samples[1::2, 1::2]
        out.append(
            {"frame_no": g["frame_no"], "granule": g["granule"], "samples": samples}
        )
    return out


def mp3_synthesize_pcm(data: bytes):
    """PCM synthesis is the one Layer III stage that genuinely needs a
    tabulated constant set: the polyphase filterbank's 512-coefficient
    window (ISO 11172-3 Table B.3) is a numerically-optimized prototype
    filter with no closed form — it can only be transcribed from the spec or
    a codec, neither of which ships in this container. Everything upstream
    (side info, scalefactors, Huffman, requantization, bit reservoir, alias
    reduction, IMDCT, windowing, overlap-add, frequency inversion) is real
    — see ``mp3_subband_samples``."""
    raise NotImplementedError(
        "polyphase synthesis window (ISO 11172-3 Table B.3, 512 tabulated "
        "coefficients) — no closed form to derive it from"
    )


MP3_SUBBAND_SCHEMA = (
    "media_id long, frame_no int, granule int, subband int, energy double"
)


def mp3_subband_energy(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Distributed hybrid-filterbank decode (mapInPandas, bytes never
    shuffle): one row per (granule, subband) with the time-domain energy
    Σ s² over the granule's 18 overlap-added samples. Zero-energy subbands
    are kept — the row count (granules × 32) is part of the contract."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_no", "granule", "subband", "energy"]
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                for g in mp3_subband_samples(bytes(buf or b"")):
                    e = (g["samples"] * g["samples"]).sum(axis=0)
                    for sb in range(32):
                        rows.append(
                            {
                                "media_id": int(mid),
                                "frame_no": g["frame_no"],
                                "granule": g["granule"],
                                "subband": sb,
                                "energy": float(e[sb]),
                            }
                        )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=MP3_SUBBAND_SCHEMA)


# =============================================================================
# H.264 (AVC) bitstream metadata — REAL parse, stdlib-only: Annex B NAL walk
# + Exp-Golomb SPS decode (ITU-T H.264 7.3.2.1.1) recovering the exact coded
# resolution incl. frame cropping. Pixel decode (CABAC/CAVLC residuals,
# inter prediction) genuinely needs a codec library and stays out of scope.
# =============================================================================


class _ExpGolombReader:
    def __init__(self, data: bytes):
        # strip emulation-prevention bytes (00 00 03 xx → 00 00 xx)
        out = bytearray()
        i = 0
        while i < len(data):
            if i + 2 < len(data) and data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 3:
                out += data[i : i + 2]
                i += 3
            else:
                out.append(data[i])
                i += 1
        self.data = bytes(out)
        self.pos = 0

    def bit(self) -> int:
        byte, off = divmod(self.pos, 8)
        if byte >= len(self.data):
            raise ValueError("truncated NAL payload")
        self.pos += 1
        return (self.data[byte] >> (7 - off)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self) -> int:  # unsigned Exp-Golomb
        zeros = 0
        while self.bit() == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("invalid Exp-Golomb code")
        return (1 << zeros) - 1 + (self.bits(zeros) if zeros else 0)

    def se(self) -> int:  # signed Exp-Golomb
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def aligned_bytes(self, n: int) -> bytes:
        """Read n raw bytes at a byte-aligned position (I_PCM samples)."""
        if self.pos % 8:
            raise ValueError("read not byte-aligned")
        byte = self.pos // 8
        if byte + n > len(self.data):
            raise ValueError("truncated NAL payload")
        self.pos += 8 * n
        return self.data[byte : byte + n]


class _ExpGolombWriter:
    def __init__(self):
        self.bits_: list[int] = []

    def bit(self, b: int) -> None:
        self.bits_.append(b & 1)

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def ue(self, v: int) -> None:
        n = (v + 1).bit_length() - 1
        self.bits(0, n)
        self.bits(v + 1, n + 1)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        while len(self.bits_) % 8:
            self.bit(0)

    def raw_bytes(self, data) -> None:
        """Append bytes at a byte-aligned position (I_PCM samples)."""
        if len(self.bits_) % 8:
            raise ValueError("write not byte-aligned")
        for b in data:
            self.bits(int(b), 8)

    def rbsp(self) -> bytes:
        bits = self.bits_ + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            raw.append(int("".join(map(str, bits[i : i + 8])), 2))
        # insert emulation prevention
        out = bytearray()
        zeros = 0
        for b in raw:
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(out)


def _h264_sps_nal(width: int, height: int, profile_idc: int, level_idc: int) -> bytes:
    """SPS NAL (start code included) whose decode is exactly (width, height):
    baseline fields only, frame cropping when the dims aren't MB multiples."""
    mbs_w = (width + 15) // 16
    mbs_h = (height + 15) // 16
    crop_r = (mbs_w * 16 - width) // 2  # crop units of 2 px (4:2:0)
    crop_b = (mbs_h * 16 - height) // 2
    if (mbs_w * 16 - width) % 2 or (mbs_h * 16 - height) % 2:
        raise ValueError("width/height must be even (4:2:0 crop units)")
    w = _ExpGolombWriter()
    w.bits(profile_idc, 8)
    w.bits(0, 8)  # constraint flags + reserved
    w.bits(level_idc, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(0)  # max_num_ref_frames
    w.bit(0)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mbs_w - 1)  # pic_width_in_mbs_minus1
    w.ue(mbs_h - 1)  # pic_height_in_map_units_minus1
    w.bit(1)  # frame_mbs_only_flag
    w.bit(1)  # direct_8x8_inference_flag
    crop = crop_r or crop_b
    w.bit(1 if crop else 0)  # frame_cropping_flag
    if crop:
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    w.bit(0)  # vui_parameters_present_flag
    return b"\x00\x00\x00\x01" + bytes([0x67]) + w.rbsp()


def encode_h264_sps_stream(width: int, height: int, profile_idc: int = 66,
                           level_idc: int = 30) -> bytes:
    """Fixture writer: a minimal Annex B stream — SPS (with frame cropping
    when width/height are not multiples of 16) + PPS + one dummy IDR NAL —
    whose SPS decodes to exactly (width, height)."""
    sps = _h264_sps_nal(width, height, profile_idc, level_idc)
    p = _ExpGolombWriter()
    p.ue(0)  # pic_parameter_set_id
    p.ue(0)  # seq_parameter_set_id
    p.bit(0)  # entropy_coding_mode_flag (CAVLC)
    p.bit(0)  # bottom_field_pic_order_in_frame_present_flag
    p.ue(0)  # num_slice_groups_minus1
    p.ue(0)  # num_ref_idx_l0_default_active_minus1
    p.ue(0)  # num_ref_idx_l1_default_active_minus1
    p.bit(0)  # weighted_pred_flag
    p.bits(0, 2)  # weighted_bipred_idc
    p.bits(0, 24)  # qp deltas (se(0)=1-bit each would differ; keep byte-simple)
    pps = b"\x00\x00\x00\x01" + bytes([0x68]) + p.rbsp()
    idr = b"\x00\x00\x01" + bytes([0x65, 0x88, 0x80])  # dummy slice payload
    return sps + pps + idr


def _split_annexb(data: bytes) -> list[bytes]:
    """Split an Annex B byte stream into NAL payloads (header byte included).

    bytes.find scans in C; a byte-at-a-time Python loop would allocate two
    slice objects per input byte on multi-MB NALs."""
    nals = []
    n = len(data)
    i = data.find(b"\x00\x00\x01")
    while i != -1:
        start = i + 3
        nxt = data.find(b"\x00\x00\x01", start)
        end = nxt if nxt != -1 else n
        # a 4-byte start code 00 00 00 01 is a 3-byte one found a byte late;
        # strip the trailing zero(s) this NAL inherits from the next code
        payload_end = end
        while payload_end > start and nxt != -1 and data[payload_end - 1] == 0:
            payload_end -= 1
        nals.append(data[start:payload_end])
        i = nxt
    if not nals:
        raise ValueError("no Annex B start codes")
    for nal in nals:
        if not nal:
            raise ValueError("empty NAL unit")
        if nal[0] & 0x80:
            raise ValueError("forbidden_zero_bit set")
    return nals


def _parse_sps(payload: bytes) -> dict:
    """Full SPS RBSP decode (H.264 7.3.2.1.1) — every field a slice-header
    parse later depends on, plus the display (cropped) geometry."""
    r = _ExpGolombReader(payload)
    profile = r.bits(8)
    r.bits(8)  # constraint flags
    level = r.bits(8)
    r.ue()  # sps id
    chroma = 1  # 4:2:0 implied when the chroma block is absent (A.2)
    separate_planes = 0
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        chroma = r.ue()
        if chroma > 3:
            raise ValueError(f"invalid chroma_format_idc {chroma}")
        if chroma == 3:
            separate_planes = r.bit()
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.bit()  # qpprime_y_zero_transform_bypass
        if r.bit():  # seq_scaling_matrix_present
            raise NotImplementedError("SPS scaling matrices")
    log2_frame_num_m4 = r.ue()
    poc_type = r.ue()
    log2_poc_lsb_m4 = 0
    delta_poc_always_zero = 0
    if poc_type == 0:
        log2_poc_lsb_m4 = r.ue()
    elif poc_type == 1:
        delta_poc_always_zero = r.bit()
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.bit()  # gaps allowed
    mbs_w = r.ue() + 1
    mbs_h = r.ue() + 1
    frame_mbs_only = r.bit()
    if not frame_mbs_only:
        r.bit()  # mb_adaptive_frame_field_flag
    r.bit()  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.bit():  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    h_mult = 1 if frame_mbs_only else 2
    # crop units per H.264 7-21..7-24: SubWidthC/SubHeightC depend on
    # chroma_format_idc (monochrome and separate-planes crop in luma
    # samples); CropUnitY additionally doubles for field coding
    if chroma == 0 or separate_planes:
        cux, cuy = 1, h_mult
    else:
        cux = 2 if chroma in (1, 2) else 1  # SubWidthC
        cuy = (2 if chroma == 1 else 1) * h_mult  # SubHeightC · (2−fmo)
    return {
        "width": mbs_w * 16 - cux * (crop_l + crop_r),
        "height": h_mult * mbs_h * 16 - cuy * (crop_t + crop_b),
        "profile_idc": profile,
        "level_idc": level,
        "chroma_format_idc": chroma,
        "log2_max_frame_num_minus4": log2_frame_num_m4,
        "poc_type": poc_type,
        "log2_max_poc_lsb_minus4": log2_poc_lsb_m4,
        "delta_poc_always_zero": delta_poc_always_zero,
        "frame_mbs_only": frame_mbs_only,
        "mbs_w": mbs_w,
        "mbs_h": mbs_h,
        "crop": (crop_l, crop_r, crop_t, crop_b),
        "crop_units": (cux, cuy),
    }


def parse_h264_info(data: bytes) -> dict:
    """Annex B NAL walk + SPS decode: returns exact (width, height),
    profile_idc, level_idc and the NAL-type census. Baseline/Main/Extended
    SPS only (profile_idc >= 100 adds the chroma/scaling block — parsed for
    the common high-profile fields); corrupt streams raise ValueError."""
    nals = _split_annexb(data)
    sps_info = None
    census: dict[int, int] = {}
    for nal in nals:
        typ = nal[0] & 0x1F
        census[typ] = census.get(typ, 0) + 1
        if typ == 7 and sps_info is None:
            full = _parse_sps(nal[1:])
            sps_info = {k: full[k] for k in ("width", "height", "profile_idc", "level_idc")}
    if sps_info is None:
        raise ValueError("no SPS NAL in stream")
    return {
        **sps_info,
        "n_nals": len(nals),
        "n_idr": census.get(5, 0),
    }


H264_INFO_SCHEMA = (
    "media_id long, width int, height int, profile_idc int, level_idc int, "
    "n_nals int, n_idr int"
)


def h264_stream_info(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Distributed H.264 metadata extraction (mapInPandas): exact coded
    resolution + profile/level + NAL census per payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                info = parse_h264_info(bytes(buf or b""))
                rows.append({"media_id": mid, **info})
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "profile_idc", "level_idc",
                    "n_nals", "n_idr",
                ],
            )

    return df.mapInPandas(run, schema=H264_INFO_SCHEMA)


# =============================================================================
# H.264 I_PCM PIXEL decode (subset) — REAL pixel reconstruction, stdlib+numpy.
# I_PCM (ITU-T H.264 7.3.5, mb_type 25 in I slices) carries raw uncompressed
# 4:2:0 samples inside a normal coded slice: the decoder must do the real
# slice-header Exp-Golomb walk (frame_num/POC widths come from the SPS),
# per-macroblock mb_type decode, pcm_alignment_zero_bits, and byte-exact
# sample extraction through emulation-prevention stripping, then place each
# 16×16 luma / 8×8 chroma block at its raster position and apply the SPS
# frame cropping. Predicted macroblocks (CAVLC/CABAC residuals) genuinely
# need the spec's VLC tables / arithmetic coder and stay typed
# NotImplementedError. Reference analog: none — the reference never parses
# payloads (HttpWriter.kt:75 posts bytes unparsed).
# =============================================================================


def _h264_ipcm_parameter_sets(width: int, height: int, level_idc: int = 30) -> bytes:
    """SPS + a fully spec-parseable PPS (unlike the metadata fixture's
    byte-simple one) — the pixel decoder walks the PPS for real."""
    sps = _h264_sps_nal(width, height, 66, level_idc)
    p = _ExpGolombWriter()
    p.ue(0)  # pic_parameter_set_id
    p.ue(0)  # seq_parameter_set_id
    p.bit(0)  # entropy_coding_mode_flag (CAVLC)
    p.bit(0)  # bottom_field_pic_order_in_frame_present_flag
    p.ue(0)  # num_slice_groups_minus1
    p.ue(0)  # num_ref_idx_l0_default_active_minus1
    p.ue(0)  # num_ref_idx_l1_default_active_minus1
    p.bit(0)  # weighted_pred_flag
    p.bits(0, 2)  # weighted_bipred_idc
    p.se(0)  # pic_init_qp_minus26
    p.se(0)  # pic_init_qs_minus26
    p.se(0)  # chroma_qp_index_offset
    p.bit(0)  # deblocking_filter_control_present_flag
    p.bit(0)  # constrained_intra_pred_flag
    p.bit(0)  # redundant_pic_cnt_present_flag
    pps = b"\x00\x00\x00\x01" + bytes([0x68]) + p.rbsp()
    return sps + pps


def _h264_ipcm_idr_nal(
    width: int, height: int, luma, cb, cr, idr_pic_id: int = 0
) -> bytes:
    """One IDR slice NAL where EVERY macroblock is I_PCM. ``luma`` must be
    the PADDED (mbs_h·16, mbs_w·16) uint8 plane; ``cb``/``cr`` the padded
    (mbs_h·8, mbs_w·8) chroma planes."""
    import numpy as np

    mbs_w = (width + 15) // 16
    mbs_h = (height + 15) // 16
    luma = np.asarray(luma, dtype=np.uint8)
    cb = np.asarray(cb, dtype=np.uint8)
    cr = np.asarray(cr, dtype=np.uint8)
    if luma.shape != (mbs_h * 16, mbs_w * 16):
        raise ValueError(f"luma plane must be padded to {(mbs_h*16, mbs_w*16)}")
    if cb.shape != (mbs_h * 8, mbs_w * 8) or cr.shape != (mbs_h * 8, mbs_w * 8):
        raise ValueError(f"chroma planes must be padded to {(mbs_h*8, mbs_w*8)}")
    s = _ExpGolombWriter()
    s.ue(0)  # first_mb_in_slice
    s.ue(7)  # slice_type = 7 (I, all slices of the picture)
    s.ue(0)  # pic_parameter_set_id
    s.bits(0, 4)  # frame_num: u(log2_max_frame_num_minus4 + 4) = u(4); 0 for IDR
    s.ue(idr_pic_id)  # idr_pic_id (nal_unit_type 5)
    s.bits(0, 4)  # pic_order_cnt_lsb: u(4) (poc_type 0)
    s.bit(0)  # dec_ref_pic_marking: no_output_of_prior_pics_flag
    s.bit(0)  # long_term_reference_flag
    s.se(0)  # slice_qp_delta
    for m in range(mbs_w * mbs_h):
        my, mx = divmod(m, mbs_w)
        s.ue(25)  # mb_type = I_PCM
        s.align_zero()  # pcm_alignment_zero_bit(s)
        s.raw_bytes(luma[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].reshape(-1))
        s.raw_bytes(cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].reshape(-1))
        s.raw_bytes(cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].reshape(-1))
    return b"\x00\x00\x00\x01" + bytes([0x65]) + s.rbsp()


def encode_h264_ipcm_stream(
    width: int, height: int, luma, cb, cr, level_idc: int = 30
) -> bytes:
    """Fixture writer: SPS + PPS + one IDR slice where every MB is I_PCM."""
    return _h264_ipcm_parameter_sets(width, height, level_idc) + _h264_ipcm_idr_nal(
        width, height, luma, cb, cr
    )


def _parse_pps(payload: bytes) -> dict:
    """PPS RBSP decode (7.3.2.2) for the CAVLC single-slice-group subset."""
    r = _ExpGolombReader(payload)
    r.ue()  # pic_parameter_set_id
    r.ue()  # seq_parameter_set_id
    if r.bit():  # entropy_coding_mode_flag
        raise NotImplementedError("CABAC slices (arithmetic decoder)")
    bottom_field = r.bit()
    if r.ue():  # num_slice_groups_minus1
        raise NotImplementedError("slice groups (FMO)")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.bit()  # weighted_pred_flag
    r.bits(2)  # weighted_bipred_idc
    r.se()  # pic_init_qp_minus26
    r.se()  # pic_init_qs_minus26
    r.se()  # chroma_qp_index_offset
    deblock = r.bit()
    r.bit()  # constrained_intra_pred_flag
    redundant = r.bit()
    return {
        "bottom_field_present": bottom_field,
        "deblock_present": deblock,
        "redundant_present": redundant,
    }


def _decode_ipcm_slice(nal: bytes, sps: dict, pps: dict):
    """Decode one all-I_PCM coded slice into padded (luma, cb, cr) planes."""
    import numpy as np

    nal_type = nal[0] & 0x1F
    nal_ref_idc = (nal[0] >> 5) & 3
    r = _ExpGolombReader(nal[1:])
    if r.ue():  # first_mb_in_slice
        raise NotImplementedError("multi-slice pictures")
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise NotImplementedError(
            f"slice_type {slice_type}: inter prediction needs reference frames"
        )
    r.ue()  # pic_parameter_set_id
    r.bits(sps["log2_max_frame_num_minus4"] + 4)  # frame_num
    if not sps["frame_mbs_only"]:
        if r.bit():  # field_pic_flag
            raise NotImplementedError("field-coded pictures")
    if nal_type == 5:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.bits(sps["log2_max_poc_lsb_minus4"] + 4)  # pic_order_cnt_lsb
        if pps["bottom_field_present"]:
            r.se()  # delta_pic_order_cnt_bottom
    elif sps["poc_type"] == 1 and not sps["delta_poc_always_zero"]:
        r.se()
        if pps["bottom_field_present"]:
            r.se()
    if pps["redundant_present"]:
        r.ue()  # redundant_pic_cnt
    if nal_ref_idc:
        if nal_type == 5:
            r.bit()  # no_output_of_prior_pics_flag
            r.bit()  # long_term_reference_flag
        elif r.bit():  # adaptive_ref_pic_marking_mode_flag
            raise NotImplementedError("adaptive reference marking")
    r.se()  # slice_qp_delta
    if pps["deblock_present"]:
        if r.ue() != 1:  # disable_deblocking_filter_idc
            r.se()
            r.se()
    mbs_w, mbs_h = sps["mbs_w"], sps["mbs_h"]
    luma = np.zeros((mbs_h * 16, mbs_w * 16), np.uint8)
    cbp = np.zeros((mbs_h * 8, mbs_w * 8), np.uint8)
    crp = np.zeros((mbs_h * 8, mbs_w * 8), np.uint8)
    for m in range(mbs_w * mbs_h):
        my, mx = divmod(m, mbs_w)
        mb_type = r.ue()
        if mb_type != 25:
            raise NotImplementedError(
                f"mb_type {mb_type}: only I_PCM macroblocks — intra-predicted "
                "residual decode needs the spec's CAVLC tables"
            )
        while r.pos % 8:
            if r.bit():
                raise ValueError("pcm_alignment_zero_bit set")
        luma[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = np.frombuffer(
            r.aligned_bytes(256), np.uint8
        ).reshape(16, 16)
        cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.frombuffer(
            r.aligned_bytes(64), np.uint8
        ).reshape(8, 8)
        crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.frombuffer(
            r.aligned_bytes(64), np.uint8
        ).reshape(8, 8)
    if r.bit() != 1:  # rbsp_stop_one_bit
        raise ValueError("missing rbsp_stop_one_bit after slice data")
    return luma, cbp, crp


def parse_h264_ipcm_pixels(data: bytes) -> dict:
    """REAL H.264 pixel decode for the all-I_PCM subset: NAL walk, SPS/PPS
    decode, slice-header walk, per-MB I_PCM extraction, SPS frame cropping.
    Returns cropped numpy planes {luma (h,w), cb, cr (h/2,w/2)} + geometry."""
    nals = _split_annexb(data)
    sps = pps = None
    planes = None
    for nal in nals:
        typ = nal[0] & 0x1F
        if typ == 7 and sps is None:
            sps = _parse_sps(nal[1:])
        elif typ == 8 and pps is None:
            pps = _parse_pps(nal[1:])
        elif typ in (1, 5):
            if sps is None or pps is None:
                raise ValueError("coded slice before SPS/PPS")
            if planes is not None:
                # decoding only one picture and silently dropping the rest
                # would misreport multi-frame video as a still
                raise NotImplementedError("multiple coded pictures in stream")
            planes = _decode_ipcm_slice(nal, sps, pps)
    if planes is None:
        raise ValueError("no coded slice in stream")
    luma, cbp, crp = planes
    w, h = sps["width"], sps["height"]
    crop_l, _cr, crop_t, _cb = sps["crop"]
    cux, cuy = sps["crop_units"]
    x0, y0 = cux * crop_l, cuy * crop_t
    return {
        "width": w,
        "height": h,
        "n_mbs": sps["mbs_w"] * sps["mbs_h"],
        "luma": luma[y0 : y0 + h, x0 : x0 + w],
        "cb": cbp[y0 // 2 : y0 // 2 + h // 2, x0 // 2 : x0 // 2 + w // 2],
        "cr": crp[y0 // 2 : y0 // 2 + h // 2, x0 // 2 : x0 // 2 + w // 2],
    }


def encode_h264_ipcm_video(width: int, height: int, frames) -> bytes:
    """Fixture writer: an all-intra VIDEO — SPS + PPS + one all-I_PCM IDR
    slice per frame (the AVC-Intra pattern: every picture self-contained,
    frame_num = 0 as the spec requires for IDR, idr_pic_id alternating so
    consecutive IDRs are distinguishable). ``frames`` is a list of padded
    (luma, cb, cr) plane triples."""
    if not frames:
        raise ValueError("video needs at least one frame")
    out = [_h264_ipcm_parameter_sets(width, height)]
    for f, (luma, cb, cr) in enumerate(frames):
        out.append(_h264_ipcm_idr_nal(width, height, luma, cb, cr, idr_pic_id=f % 2))
    return b"".join(out)


def iter_h264_ipcm_frames(data: bytes):
    """Streaming H.264 all-I_PCM video decode: yields one
    (frame_no, width, height, luma, cb, cr) tuple per coded picture, in
    stream order, decoding lazily so PER-TASK MEMORY IS BOUNDED BY ONE FRAME
    — I_PCM pictures are uncompressed (~1.5 bytes/px), so materializing a
    long video's frame list would OOM an executor even though every consumer
    here reduces with at most two frames live (r6 advisory). Raises on an
    empty stream only when iterated to exhaustion, so callers that need the
    eager error use ``parse_h264_ipcm_video``."""
    sps = pps = None
    n = 0
    for nal in _split_annexb(data):
        typ = nal[0] & 0x1F
        if typ == 7 and sps is None:
            sps = _parse_sps(nal[1:])
        elif typ == 8 and pps is None:
            pps = _parse_pps(nal[1:])
        elif typ in (1, 5):
            if sps is None or pps is None:
                raise ValueError("coded slice before SPS/PPS")
            luma, cbp, crp = _decode_ipcm_slice(nal, sps, pps)
            w, h = sps["width"], sps["height"]
            crop_l, _cr, crop_t, _cb = sps["crop"]
            cux, cuy = sps["crop_units"]
            x0, y0 = cux * crop_l, cuy * crop_t
            yield (
                n,
                w,
                h,
                luma[y0 : y0 + h, x0 : x0 + w],
                cbp[y0 // 2 : y0 // 2 + h // 2, x0 // 2 : x0 // 2 + w // 2],
                crp[y0 // 2 : y0 // 2 + h // 2, x0 // 2 : x0 // 2 + w // 2],
            )
            n += 1
    if n == 0:
        raise ValueError("no coded slice in stream")


def parse_h264_ipcm_video(data: bytes) -> dict:
    """REAL H.264 video decode for the all-I_PCM subset: every coded picture
    in the stream is reconstructed (cropped planes, stream order). Returns
    {width, height, n_frames, frames: [(luma, cb, cr), ...]} — the EAGER
    form; the distributed operators fold ``iter_h264_ipcm_frames`` instead
    so they never hold a whole stream's decoded frames."""
    frames = []
    w = h = None
    for _n, w, h, luma, cbp, crp in iter_h264_ipcm_frames(data):
        frames.append((luma, cbp, crp))
    return {"width": w, "height": h, "n_frames": len(frames), "frames": frames}


H264_PIXEL_SCHEMA = (
    "media_id long, width int, height int, n_mbs int, luma_sum bigint, "
    "luma_sq_sum bigint, luma_pos_hash bigint, cb_sum bigint, cr_sum bigint"
)


def h264_ipcm_pixel_stats(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Distributed H.264 I_PCM pixel decode (mapInPandas): exact integer
    reductions over the reconstructed, cropped planes — sum / sum of squares
    / position-weighted sum Σ(i+1)·v over row-major luma, chroma sums. Bytes
    never shuffle; one Python crossing per Arrow batch."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "width", "height", "n_mbs", "luma_sum",
            "luma_sq_sum", "luma_pos_hash", "cb_sum", "cr_sum",
        ]
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                d = parse_h264_ipcm_pixels(bytes(buf or b""))
                y = d["luma"].astype(np.int64).reshape(-1)
                idx = np.arange(1, y.size + 1, dtype=np.int64)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": d["width"],
                        "height": d["height"],
                        "n_mbs": d["n_mbs"],
                        "luma_sum": int(y.sum()),
                        "luma_sq_sum": int((y * y).sum()),
                        "luma_pos_hash": int((idx * y).sum()),
                        "cb_sum": int(d["cb"].astype(np.int64).sum()),
                        "cr_sum": int(d["cr"].astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=H264_PIXEL_SCHEMA)


H264_FRAME_SCHEMA = (
    "media_id long, frame_no int, width int, height int, "
    "luma_sum bigint, luma_pos_hash bigint, cb_sum bigint"
)


def h264_video_frame_stats(
    df: DataFrame,
    every: int = 2,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """REAL video frame sampling (mapInPandas): decode every coded picture of
    an all-I_PCM H.264 stream, keep every ``every``-th frame (frame_no %
    every == 0 — the deterministic stride sampler a training pipeline uses
    to thin video into image examples), and reduce each kept frame to exact
    integer stats. One output row per SAMPLED frame; bytes never shuffle."""
    import numpy as np

    if every < 1:
        raise ValueError("every must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "frame_no", "width", "height",
            "luma_sum", "luma_pos_hash", "cb_sum",
        ]
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                # streamed decode: one frame live at a time (r6 advisory)
                for f, w, h, luma, cbp, _crp in iter_h264_ipcm_frames(
                    bytes(buf or b"")
                ):
                    if f % every:
                        continue
                    y = luma.astype(np.int64).reshape(-1)
                    idx = np.arange(1, y.size + 1, dtype=np.int64)
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_no": f,
                            "width": w,
                            "height": h,
                            "luma_sum": int(y.sum()),
                            "luma_pos_hash": int((idx * y).sum()),
                            "cb_sum": int(cbp.astype(np.int64).sum()),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=H264_FRAME_SCHEMA)


VIDEO_FRAME_AHASH_SCHEMA = "media_id long, frame_no int, ahash string"


def video_frame_ahash(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Per-frame perceptual fingerprints of an all-I_PCM H.264 video: decode
    every picture and aHash its LUMA plane (the grayscale path — chroma
    carries no extra structure for near-dup purposes). One (media_id,
    frame_no, 16-hex ahash) row per frame; downstream set-Jaccard over the
    distinct hashes turns this into video near-dup mining with the same
    posting-join machinery the text operators use. Bytes never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_no", "ahash"]
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                # streamed decode: one frame live at a time (r6 advisory)
                for f, _w, _h, luma, _cb, _cr in iter_h264_ipcm_frames(
                    bytes(buf or b"")
                ):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_no": f,
                            "ahash": f"{ahash64(luma):016x}",
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=VIDEO_FRAME_AHASH_SCHEMA)


H264_SCENE_SCHEMA = (
    "media_id long, frame_no int, sum_abs_delta bigint, is_cut boolean"
)


def h264_scene_changes(
    df: DataFrame,
    threshold: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """REAL shot-boundary detection (mapInPandas): decode every picture of an
    all-I_PCM H.264 stream and score each consecutive-frame transition by the
    exact integer sum of absolute luma differences over the cropped plane —
    the classic pixel-delta cut detector a video curation pipeline runs to
    split footage into shots before per-shot frame sampling. One row per
    transition (frame_no = the later frame, so 1..n−1); ``is_cut`` flags
    transitions whose delta exceeds ``threshold``. Exact integer arithmetic
    end-to-end, so the whole decode→delta→flag loop is oracle-checkable."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_no", "sum_abs_delta", "is_cut"]
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                prev = None
                # streamed decode: two frames live at a time (r6 advisory)
                for f, _w, _h, luma, _cb, _cr in iter_h264_ipcm_frames(
                    bytes(buf or b"")
                ):
                    cur = luma.astype(np.int64)
                    if prev is not None:
                        delta = int(np.abs(cur - prev).sum())
                        rows.append(
                            {
                                "media_id": int(mid),
                                "frame_no": f,
                                "sum_abs_delta": delta,
                                "is_cut": delta > threshold,
                            }
                        )
                    prev = cur
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=H264_SCENE_SCHEMA)


# =============================================================================
# FLAC (subset) — REAL lossless audio codec, stdlib-only: mono 16-bit,
# CONSTANT / VERBATIM / FIXED-prediction subframes with Rice-coded residuals,
# CRC-8 frame headers, CRC-16 frame footers, STREAMINFO MD5 of the raw PCM.
# Losslessness makes it fully oracle-able: decode(encode(pcm)) == pcm
# bit-for-bit, verified three ways (samples, CRCs, MD5). LPC subframes and
# multi-channel decorrelation raise typed NotImplementedError.
# =============================================================================


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_code(value: int) -> bytes:
    """FLAC's UTF-8-style coding of frame numbers (any 36-bit value)."""
    if value < 0x80:
        return bytes([value])
    for n_cont, lead, maxv in (
        (1, 0xC0, 1 << 11), (2, 0xE0, 1 << 16), (3, 0xF0, 1 << 21),
        (4, 0xF8, 1 << 26), (5, 0xFC, 1 << 31), (6, 0xFE, 1 << 36),
    ):
        if value < maxv:
            out = [lead | (value >> (6 * n_cont))]
            for i in range(n_cont - 1, -1, -1):
                out.append(0x80 | ((value >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


_FIXED_COEFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    co = _FIXED_COEFS[order]
    return [
        s - sum(c * samples[i - 1 - j] for j, c in enumerate(co))
        for i, s in enumerate(samples)
        if i >= order
    ] if order else list(samples)


class _FlacBitWriter:
    """MSB-first bit writer WITHOUT the JPEG 0xFF byte stuffing _BitWriter
    applies — FLAC streams carry raw bytes."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def write_rice(self, v: int, k: int) -> None:
        u = (v << 1) ^ (v >> 63) if v < 0 else v << 1  # zigzag fold
        self.write_unary(u >> k)
        if k:
            self.write(u & ((1 << k) - 1), k)

    def write_signed(self, v: int, bits: int) -> None:
        self.write(v & ((1 << bits) - 1), bits)

    def flush_zero(self) -> bytes:
        if self.nbits:
            self.write(0, 8 - self.nbits)  # FLAC pads frames with zeros
        return bytes(self.out)


def encode_flac(samples, block_size: int = 256) -> bytes:
    """Encode mono 16-bit PCM samples as a FLAC subset stream: per block the
    cheapest of CONSTANT / FIXED order 0-2 (single Rice partition, parameter
    from the mean folded residual) / VERBATIM fallback. Bit-exact lossless —
    the STREAMINFO MD5 of the raw little-endian PCM lets any decoder verify."""
    samples = [int(s) for s in samples]
    if not all(-32768 <= s <= 32767 for s in samples):
        raise ValueError("samples must be 16-bit")
    total = len(samples)
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    md5 = hashlib.md5(pcm).digest()

    si = _FlacBitWriter()
    si.write(block_size, 16)  # min block size
    si.write(block_size, 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(44100, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bits per sample - 1
    si.write(total, 36)
    streaminfo = si.flush_zero() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34]) + streaminfo  # last-block flag + type 0

    for frame_no, start in enumerate(range(0, total, block_size)):
        blk = samples[start : start + block_size]
        n = len(blk)
        hdr = _FlacBitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(0b0111, 4)  # block size: 16-bit value at header end
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(0b0000, 4)  # channel assignment: mono
        hdr.write(0b100, 3)  # sample size: 16 bits
        hdr.write(0, 1)  # reserved
        hdr_bytes = hdr.flush_zero() + _utf8_code(frame_no) + struct.pack(">H", n - 1)
        hdr_bytes += bytes([_crc8(hdr_bytes)])

        body = _FlacBitWriter()
        if all(s == blk[0] for s in blk):
            body.write(0, 1)
            body.write(0b000000, 6)  # CONSTANT
            body.write(0, 1)  # no wasted bits
            body.write_signed(blk[0], 16)
        else:
            # pick the FIXED order (0-2) with the smallest folded-residual sum
            best = None
            for order in range(3):
                if n <= order:
                    continue
                res = _fixed_residual(blk, order)
                cost = sum((abs(r) << 1) for r in res)
                if best is None or cost < best[2]:
                    best = (order, res, cost)
            order, res, cost = best
            mean = (sum((abs(r) << 1) for r in res) // max(1, len(res))) or 1
            k = min(14, max(0, mean.bit_length() - 1))
            rice_bits = sum(((((abs(r) << 1) >> k) + 1) + k) for r in res)
            if rice_bits + 16 * order > 16 * n:  # VERBATIM is cheaper
                body.write(0, 1)
                body.write(0b000001, 6)  # VERBATIM
                body.write(0, 1)
                for s in blk:
                    body.write_signed(s, 16)
            else:
                body.write(0, 1)
                body.write(0b001000 | order, 6)  # FIXED
                body.write(0, 1)  # no wasted bits
                for s in blk[:order]:
                    body.write_signed(s, 16)  # warmup
                body.write(0, 2)  # residual method: 4-bit Rice
                body.write(0, 4)  # partition order 0 → one partition
                body.write(k, 4)
                for r in res:
                    body.write_rice(r, k)
        frame = hdr_bytes + body.flush_zero()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


class _FlacBitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def bit(self) -> int:
        byte, off = divmod(self.bitpos, 8)
        if byte >= len(self.data):
            raise ValueError("truncated FLAC stream")
        self.bitpos += 1
        return (self.data[byte] >> (7 - off)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bit() == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def rice(self, k: int) -> int:
        u = (self.unary() << k) | (self.bits(k) if k else 0)
        return (u >> 1) ^ -(u & 1)  # unfold zigzag

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) // 8 * 8


def decode_flac(data: bytes, verify_md5: bool = True):
    """Decode a FLAC subset stream (mono, 16-bit, CONSTANT/VERBATIM/FIXED
    subframes, 4- or 5-bit Rice partitions, wasted bits) to a list of int16
    samples. Verifies the frame-header CRC-8, frame CRC-16, and (by default)
    the STREAMINFO MD5 of the decoded PCM — three independent lossless
    proofs. LPC subframes and multi-channel streams raise typed
    NotImplementedError; corrupt streams raise ValueError."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("truncated metadata block")
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("missing or malformed STREAMINFO")
    r = _FlacBitReader(streaminfo)
    r.bits(16)  # min block
    r.bits(16)
    r.bits(24)
    r.bits(24)
    samplerate = r.bits(20)
    channels = r.bits(3) + 1
    bps = r.bits(5) + 1
    total = r.bits(36)
    md5_expect = streaminfo[18:34]
    if channels != 1:
        raise NotImplementedError("only mono FLAC supported")
    if bps != 16:
        raise NotImplementedError("only 16-bit FLAC supported")
    if samplerate == 0:
        raise ValueError("invalid sample rate 0")

    samples: list[int] = []
    while len(samples) < total:
        frame_start = pos
        br = _FlacBitReader(data, pos)
        if br.bits(14) != 0b11111111111110:
            raise ValueError(f"lost FLAC frame sync at byte {pos}")
        br.bit()  # reserved
        br.bit()  # blocking strategy
        bs_bits = br.bits(4)
        sr_bits = br.bits(4)
        chan = br.bits(4)
        size_bits = br.bits(3)
        br.bit()  # reserved
        if chan != 0:
            raise NotImplementedError("multi-channel FLAC frame")
        if size_bits not in (0b100, 0b000):
            raise NotImplementedError("non-16-bit frame sample size")
        # UTF-8-coded frame number (byte-aligned here by construction)
        br.align()
        first = br.bits(8)
        n_cont = 0
        probe = first
        while probe & 0x80:
            if probe & 0x40 == 0:
                break
            n_cont += 1
            probe <<= 1
        for _ in range(n_cont):
            cont = br.bits(8)
            if cont & 0xC0 != 0x80:
                raise ValueError("malformed UTF-8 frame number")
        if bs_bits == 0b0110:
            n = br.bits(8) + 1
        elif bs_bits == 0b0111:
            n = br.bits(16) + 1
        elif bs_bits == 0:
            raise ValueError("reserved block size code")
        elif bs_bits == 1:
            n = 192
        elif 2 <= bs_bits <= 5:
            n = 576 << (bs_bits - 2)
        else:
            n = 256 << (bs_bits - 8)
        if sr_bits == 0b1100:
            br.bits(8)
        elif sr_bits in (0b1101, 0b1110):
            br.bits(16)
        elif sr_bits == 0b1111:
            raise ValueError("invalid sample rate code")
        hdr_len = br.bitpos // 8 - frame_start
        crc8_got = br.bits(8)
        if _crc8(data[frame_start : frame_start + hdr_len]) != crc8_got:
            raise ValueError(f"FLAC header CRC-8 mismatch at byte {frame_start}")

        # ---- one mono subframe
        if br.bit():
            raise ValueError("subframe padding bit set")
        stype = br.bits(6)
        wasted = 0
        if br.bit():
            wasted = 1
            while br.bit() == 0:
                wasted += 1
        eff_bits = 16 - wasted
        if stype == 0:
            blk = [br.signed(eff_bits)] * n
        elif stype == 1:
            blk = [br.signed(eff_bits) for _ in range(n)]
        elif 8 <= stype <= 12:
            order = stype - 8
            warm = [br.signed(eff_bits) for _ in range(order)]
            method = br.bits(2)
            if method > 1:
                raise ValueError("reserved residual coding method")
            plen = br.bits(4)
            kbits = 4 + method
            escape = (1 << kbits) - 1
            res: list[int] = []
            n_parts = 1 << plen
            if n % n_parts:
                raise ValueError("block size not divisible into partitions")
            for p in range(n_parts):
                cnt = n // n_parts - (order if p == 0 else 0)
                if cnt < 0:
                    raise ValueError("partition smaller than predictor order")
                k = br.bits(kbits)
                if k == escape:
                    vbits = br.bits(5)
                    res.extend(br.signed(vbits) if vbits else 0 for _ in range(cnt))
                else:
                    res.extend(br.rice(k) for _ in range(cnt))
            blk = list(warm)
            co = _FIXED_COEFS[order]
            for rv in res:
                blk.append(rv + sum(c * blk[-1 - j] for j, c in enumerate(co)))
        elif stype >= 32:
            raise NotImplementedError("LPC subframes not supported")
        else:
            raise ValueError(f"reserved subframe type {stype}")
        if wasted:
            blk = [s << wasted for s in blk]
        br.align()
        crc16_got = br.bits(16)
        frame_len = br.bitpos // 8 - frame_start
        if _crc16(data[frame_start : frame_start + frame_len - 2]) != crc16_got:
            raise ValueError(f"FLAC frame CRC-16 mismatch at byte {frame_start}")
        if not all(-32768 <= s <= 32767 for s in blk):
            raise ValueError("decoded sample out of 16-bit range")
        samples.extend(blk)
        pos = frame_start + frame_len
    samples = samples[:total]
    if verify_md5 and md5_expect != b"\x00" * 16:
        pcm = b"".join(struct.pack("<h", s) for s in samples)
        if hashlib.md5(pcm).digest() != md5_expect:
            raise ValueError("decoded PCM does not match STREAMINFO MD5")
    return samples


def flac_window_energy(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content", window: int = 8
) -> DataFrame:
    """Distributed FLAC decode → windowed integer energy (same reduction and
    schema as pcm16_window_energy, so the two oracles are directly
    comparable): each payload is a FLAC stream, decoded by the real subset
    codec above, MD5-verified, then reduced to exact sum-of-squares."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            wins: list = []
            ns: list = []
            energies: list = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                samples = np.array(decode_flac(bytes(buf or b"")), dtype=np.int64)
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


AUDIO_AHASH_SCHEMA = "media_id long, n_samples int, ahash string, sig long"


def audio_energy_ahash(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """64-bit ENERGY-PROFILE fingerprint of FLAC audio (the audio analog of
    the image aHash): decode the stream with the real subset codec, square
    every sample, bucket sample i into bin ⌊i·64/n⌋ (64 equal time slices
    regardless of duration), and set bit j iff 64·bin_j ≥ total — exact
    integer cross-multiplication, no float mean. The fingerprint is
    loudness-invariant (a uniform gain g scales both comparison sides by
    g²) and local edits move only the touched bins, so banded hamming
    mining finds re-mastered / tail-edited recordings. Needs ≥ 64 samples
    (every bin nonempty). ``ahash`` = 16-hex MSB-first; ``sig`` = the same
    bits as a signed long for banded_hamming_pairs."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "n_samples", "ahash", "sig"]
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                s = np.array(decode_flac(bytes(buf or b"")), dtype=np.int64)
                n = int(s.size)
                if n < 64:
                    raise ValueError("audio fingerprint needs >= 64 samples")
                sq = s * s
                bins = np.zeros(64, np.int64)
                np.add.at(bins, (np.arange(n) * 64) // n, sq)
                total = int(sq.sum())
                v = 0
                for j in range(64):
                    if 64 * int(bins[j]) >= total:
                        v |= 1 << (63 - j)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_samples": n,
                        "ahash": f"{v:016x}",
                        "sig": v - (1 << 64) if v >= (1 << 63) else v,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=AUDIO_AHASH_SCHEMA)


def encode_as_flac(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content",
    block_size: int = 64,
) -> DataFrame:
    """Pack each payload's bytes as mono 16-bit PCM (little-endian pairs,
    like pcm16_window_energy reads them) and encode as a FLAC subset stream —
    the audio analog of encode_as_png/encode_as_jpeg_flatblocks fixture
    synthesis: downstream decodes are then exactly derivable from the source
    bytes because the codec is lossless."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content or b"")
                b = b[: len(b) - (len(b) % 2)]
                samples = np.frombuffer(b, dtype="<i2").tolist()
                ids.append(mid)
                outs.append(encode_flac(samples, block_size=block_size))
            yield pd.DataFrame({"media_id": ids, "content": outs})

    return df.mapInPandas(run, schema="media_id long, content binary")
