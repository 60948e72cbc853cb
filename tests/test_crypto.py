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


def test_builtin_aes_cbc_roundtrip_and_cross_check(spark):
    """Spark's built-in aes_encrypt/aes_decrypt (CBC/PKCS with explicit IV —
    deterministic, unlike the random-IV default) round-trips and its
    ciphertext matches the cryptography library bit-for-bit; try_aes_decrypt
    returns NULL on garbage instead of failing the job (the reference's
    permanent-error routing, HttpKeyService.kt:61-70). CTR itself is NOT
    offered by the built-in — the custom UDF in functions/crypto.py exists
    precisely for that gap (SURVEY.md §2B crypto row)."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
    from cryptography.hazmat.primitives.padding import PKCS7

    key = b"0123456789abcdef0123456789abcdef"
    iv = b"ABCDEF0123456789"
    plaintext = b'{"rec": 1}'

    df = spark.createDataFrame([(plaintext, key, iv)], "pt binary, key binary, iv binary")
    row = df.selectExpr(
        "aes_encrypt(pt, key, 'CBC', 'PKCS', iv) AS ct",
        "aes_decrypt(aes_encrypt(pt, key, 'CBC', 'PKCS', iv), key, 'CBC', 'PKCS') AS rt",
        "try_aes_decrypt(X'00112233445566', key, 'CBC', 'PKCS') AS bad",
    ).first()
    assert bytes(row["rt"]) == plaintext
    assert row["bad"] is None

    padder = PKCS7(128).padder()
    padded = padder.update(plaintext) + padder.finalize()
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    expected = enc.update(padded) + enc.finalize()
    # Spark prepends the IV to CBC output
    assert bytes(row["ct"]) == iv + expected


def test_chunked_decrypt_reassembles_large_object(spark, tmp_path):
    """One large AES-CTR object decrypted as independent range tasks must
    reassemble byte-identical to a whole-object decrypt, including chunk
    boundaries that fall mid-AES-block (chunk size not a multiple of 16)."""
    import base64 as b64
    import os

    from snapshot_sender_spark.functions.crypto import (
        _ctr_transform,
        chunked_decrypt,
        local_range_reader,
    )

    key = bytes(range(32))
    iv = bytes(range(16))
    plain = os.urandom(1_000_003)  # prime-ish size: last chunk is ragged
    cipher = _ctr_transform(plain, key, iv)
    path = str(tmp_path / "big.enc")
    with open(path, "wb") as f:
        f.write(cipher)

    out = chunked_decrypt(
        spark,
        size_bytes=len(cipher),
        key_b64=b64.b64encode(key).decode(),
        iv_b64=b64.b64encode(iv).decode(),
        range_reader=local_range_reader(path),
        chunk_bytes=65_537,  # not a multiple of 16 → intra-block seeks
    )
    rows = sorted(out.collect(), key=lambda r: r["chunk_idx"])
    assert len(rows) == -(-len(cipher) // 65_537)
    assert all(r["offset"] == i * 65_537 for i, r in enumerate(rows))
    assert b"".join(bytes(r["plaintext"]) for r in rows) == plain
