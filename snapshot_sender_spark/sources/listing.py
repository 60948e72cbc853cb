"""Snapshot-file source: binary objects + per-object encryption metadata.

The reference's source is a paginated S3 ListObjectsV2 + per-object GET that
reads the encryption triple (iv, dataKeyEncryptionKeyId, cipherText) from S3
*user metadata* (S3DirectoryReader.kt:31-98). Spark's ``binaryFile`` source
gives us the bytes but not user metadata, so the source here is a composition:

    binaryFile scan (distributed, lazy bytes)  ⋈  metadata DataFrame (tiny)

Locally the metadata DataFrame comes from the fixture's ``metadata.sidecar.jsonl``
sidecar; against S3 it would come from a driver-side boto3 paginated listing
(one LIST per 1000 keys — the reference does exactly one listing per run too,
S3DirectoryReader.kt:51-80) materialized with ``spark.createDataFrame``. The
metadata side is O(number of files), small relative to content, so the join is
a broadcast hash join — no shuffle of the multi-TB content side.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import local_strings_df

ENCRYPTION_META_SCHEMA = T.StructType(
    [
        T.StructField("fileName", T.StringType(), False),
        T.StructField("iv", T.StringType(), False),
        T.StructField("dataKeyEncryptionKeyId", T.StringType(), False),
        T.StructField("cipherText", T.StringType(), False),
    ]
)

# Reader-handle memos (r13, guide §1.2 driver-side constants): building the
# sidecar JSON reader and especially the binaryFile reader re-runs driver-side
# file listing (InMemoryFileIndex) on every call — ~0.1-0.2 s per
# build_decrypted invocation for plan handles over *identical* inputs. Unlike
# the read-only testdata tables (tables._LOAD_CACHE), a delivery input dir CAN
# change between calls (fixtures regenerate, tests append objects), so a hit
# additionally requires a filesystem FINGERPRINT match: the (name, mtime_ns,
# size) set of the matching files, captured by a driver-side scandir that
# costs ~0.2 ms per 100 objects. A changed/deleted/added file changes the
# fingerprint and forces a fresh reader. DataFrames here are logical plan
# handles — no data is cached; every execution rescans the files.
_META_CACHE: dict[str, tuple] = {}
_FILES_CACHE: dict[str, tuple] = {}


def _dir_fingerprint(paths: list[str]) -> tuple:
    out = []
    for p in paths:
        try:
            st = os.stat(p)
            out.append((p, st.st_mtime_ns, st.st_size))
        except OSError:
            out.append((p, None, None))
    return tuple(out)


def _enc_listing(input_dir: str) -> list[str]:
    """Top-level ``*.enc`` files plus any subdirectories (the binaryFile
    source can descend into partition-style subdirs; a subdir's mtime changes
    whenever an entry is added/removed inside it, so including the dirs keeps
    the fingerprint sensitive to nested changes)."""
    try:
        with os.scandir(input_dir) as it:
            return sorted(
                e.path for e in it if e.name.endswith(".enc") or e.is_dir()
            )
    except OSError:
        return []


def read_encryption_meta(spark: SparkSession, input_dir: str) -> DataFrame:
    """The per-object encryption metadata (fileName, iv, keyId, cipherText) —
    the S3 user-metadata side of the source (S3DirectoryReader.kt:86-98),
    tiny: one short row per object."""
    sidecar = os.path.join(input_dir, "metadata.sidecar.jsonl")
    fp = _dir_fingerprint([sidecar])
    cached = _META_CACHE.get(input_dir)
    if cached is not None and cached[0] is spark and cached[1] == fp:
        return cached[2]
    df = spark.read.schema(ENCRYPTION_META_SCHEMA).json(sidecar)
    if len(_META_CACHE) >= 128:
        _META_CACHE.clear()
    _META_CACHE[input_dir] = (spark, fp, df)
    return df


def read_encrypted_files(
    spark: SparkSession, input_dir: str, meta: DataFrame | None = None
) -> DataFrame:
    """One row per encrypted object: (path, fileName, content, iv,
    dataKeyEncryptionKeyId, cipherText) — the EncryptedStream analog
    (DomainClasses.kt:10-32). ``meta``: pass an already-built
    ``read_encryption_meta`` DataFrame to avoid a second reader round trip
    for the same sidecar (callers that also need the key-distinct source)."""
    fp = _dir_fingerprint(_enc_listing(input_dir))
    cached = _FILES_CACHE.get(input_dir)
    if cached is not None and cached[0] is spark and cached[1] == fp:
        objects = cached[2]
    else:
        objects = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.enc")
            .load(input_dir)
            .select(
                F.col("path"),
                F.element_at(F.split(F.col("path"), "/"), -1).alias("fileName"),
                F.col("length"),
                F.col("content"),
            )
        )
        if len(_FILES_CACHE) >= 128:
            _FILES_CACHE.clear()
        _FILES_CACHE[input_dir] = (spark, fp, objects)
    if meta is None:
        meta = read_encryption_meta(spark, input_dir)
    # metadata side is tiny (one short row per object) → broadcast
    return objects.join(F.broadcast(meta), "fileName", "inner")


def read_finished_markers(spark: SparkSession, status_dir: str) -> DataFrame:
    """DataFrame of fileNames that already have a `.finished` marker
    (the reference's FinishedFilterProcessor.kt:17-27 existence probe,
    re-expressed as data for a left_anti join)."""
    # Only a missing/empty dir means "nothing finished"; a real I/O or
    # permission error must propagate — silently returning the empty set would
    # defeat the idempotent-restart filter and re-deliver everything.
    if not os.path.isdir(status_dir):
        return local_strings_df(spark, [], ["fileName"])
    try:
        markers = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.finished")
            .load(status_dir)
            .select(F.element_at(F.split(F.col("path"), "/"), -1).alias("marker"))
        )
    except AnalysisException:  # dir exists but matches no files → empty set
        return local_strings_df(spark, [], ["fileName"])
    return markers.select(
        F.regexp_replace(F.col("marker"), r"\.finished$", "").alias("fileName")
    )
