import base64
import gzip
import os

from pyspark.sql import functions as F

from snapshot_sender_spark.functions.crypto import (
    _ctr_transform,
    aes_ctr_decrypt,
    ctr_at_offset,
    empty_gzip,
    gunzip,
    gzip_bytes,
)


def test_ctr_roundtrip():
    key = os.urandom(32)
    iv = os.urandom(16)
    data = b"hello world" * 1000
    assert _ctr_transform(_ctr_transform(data, key, iv), key, iv) == data


def test_ctr_seek_matches_full_decrypt():
    key = bytes(range(32))
    iv = bytes(range(16))
    data = bytes(range(256)) * 33  # not block aligned
    full = _ctr_transform(data, key, iv)
    for off in (0, 1, 15, 16, 17, 100, 255):
        assert ctr_at_offset(full[off:], key, iv, off) == data[off:]


def test_ctr_counter_wraparound():
    key = bytes(range(32))
    iv = b"\xff" * 16  # counter at max → wraps within the stream
    data = os.urandom(64)
    assert _ctr_transform(_ctr_transform(data, key, iv), key, iv) == data


def test_spark_udfs_roundtrip(spark):
    key = os.urandom(32)
    iv = os.urandom(16)
    payload = b'{"a": 1}\n{"a": 2}\n'
    enc = _ctr_transform(gzip.compress(payload), key, iv)
    df = spark.createDataFrame(
        [(enc, base64.b64encode(key).decode(), base64.b64encode(iv).decode())],
        "content binary, key string, iv string",
    )
    out = df.select(
        gunzip(aes_ctr_decrypt(F.col("content"), F.col("key"), F.col("iv"))).alias("p")
    ).collect()
    assert bytes(out[0]["p"]) == payload


def test_gzip_udf_roundtrip(spark):
    df = spark.createDataFrame([(b"abc" * 100,)], "content binary")
    out = df.select(gunzip(gzip_bytes(F.col("content"))).alias("p")).collect()
    assert bytes(out[0]["p"]) == b"abc" * 100


def test_empty_gzip_is_valid_and_empty():
    assert gzip.decompress(empty_gzip()) == b""
