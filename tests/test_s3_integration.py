"""S3 source against a REAL local S3 HTTP stub (stdlib http.server): boto3
speaks actual wire protocol — signed requests, ListObjectsV2 XML with
continuation-token pagination, HEAD user-metadata headers — instead of the
botocore Stubber's canned dicts. Covers the reference's integration tier
(S3DirectoryReaderTest.kt:217-274 pagination/truncation;
SnapshotSenderIntegrationTest.kt:39-102 listing⋈content end-to-end, with the
content scan pointed at a local directory because no s3a connector jars ship
in this environment — the join plan is identical either way)."""

import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import boto3
import pytest
from botocore.config import Config

from snapshot_sender_spark.sources.s3 import (
    list_objects_with_metadata,
    read_encrypted_files_s3,
)

PAGE_SIZE = 2  # force multi-page listings even for small fixtures


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


class _S3StubHandler(BaseHTTPRequestHandler):
    """Minimal path-style S3: GET /<bucket>?list-type=2 and HEAD /<bucket>/<key>."""

    objects: dict = {}  # key -> {"body": bytes, "meta": dict[str, str]}

    def log_message(self, *a):  # silence request logging
        pass

    def do_GET(self):
        parsed = urlparse(self.path)
        qs = parse_qs(parsed.query)
        if "list-type" not in qs:
            self.send_error(400, "only ListObjectsV2 is stubbed")
            return
        prefix = qs.get("prefix", [""])[0]
        start = int(qs.get("continuation-token", ["0"])[0])
        keys = sorted(k for k in self.objects if k.startswith(prefix))
        page = keys[start : start + PAGE_SIZE]
        truncated = start + PAGE_SIZE < len(keys)
        parts = [
            '<?xml version="1.0" encoding="UTF-8"?>',
            '<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">',
            "<Name>bucket</Name>",
            f"<Prefix>{_xml_escape(prefix)}</Prefix>",
            f"<KeyCount>{len(page)}</KeyCount>",
            f"<MaxKeys>{PAGE_SIZE}</MaxKeys>",
            f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>",
        ]
        if truncated:
            parts.append(
                f"<NextContinuationToken>{start + PAGE_SIZE}</NextContinuationToken>"
            )
        for k in page:
            parts.append(
                f"<Contents><Key>{_xml_escape(k)}</Key><Size>{len(self.objects[k]['body'])}</Size>"
                "<ETag>&quot;0&quot;</ETag><StorageClass>STANDARD</StorageClass></Contents>"
            )
        parts.append("</ListBucketResult>")
        body = "".join(parts).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    heads: list = []  # every HEADed key, for request-count assertions

    def do_HEAD(self):
        key = unquote(urlparse(self.path).path.split("/", 2)[2])
        _S3StubHandler.heads.append(key)
        obj = self.objects.get(key)
        if obj is None:
            self.send_error(404, "NoSuchKey")
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(obj["body"])))
        self.send_header("ETag", '"0"')
        self.send_header("Last-Modified", "Thu, 01 Jan 2026 00:00:00 GMT")
        for mk, mv in obj["meta"].items():
            self.send_header(f"x-amz-meta-{mk}", mv)
        self.end_headers()


@pytest.fixture()
def s3_stub():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _S3StubHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    _S3StubHandler.objects = {}
    _S3StubHandler.heads = []
    client = boto3.client(
        "s3",
        endpoint_url=f"http://127.0.0.1:{server.server_address[1]}",
        region_name="eu-west-2",
        aws_access_key_id="stub",
        aws_secret_access_key="stub",
        config=Config(s3={"addressing_style": "path"}, retries={"max_attempts": 1}),
    )
    yield client, _S3StubHandler.objects
    server.shutdown()
    server.server_close()


def _put(objects, key, body=b"x", iv="aXY=", key_id="k1", cipher="Y3Q="):
    meta = {}
    if iv is not None:
        meta = {"iv": iv, "datakeyencryptionkeyid": key_id, "ciphertext": cipher}
    objects[key] = {"body": body, "meta": meta}


def test_http_stub_pagination_and_metadata(s3_stub):
    """5 objects at page size 2 → 3 ListObjectsV2 round trips with real
    continuation tokens; HEAD metadata arrives as x-amz-meta-* headers."""
    client, objects = s3_stub
    for i in range(5):
        _put(objects, f"exports/db.a.b-045-050-00000{i}.txt.gz.enc", iv=f"iv{i}")
    rows, rejected = list_objects_with_metadata(client, "bucket", "exports/", max_workers=4)
    assert [r["fileName"] for r in rows] == [
        f"db.a.b-045-050-00000{i}.txt.gz.enc" for i in range(5)
    ]
    assert [r["iv"] for r in rows] == [f"iv{i}" for i in range(5)]
    assert rejected == []


def test_http_stub_prefix_filter_and_missing_metadata(s3_stub):
    client, objects = s3_stub
    _put(objects, "exports/db.a.b-045-050-000001.txt.gz.enc")
    _put(objects, "exports/db.a.b-045-050-000002.txt.gz.enc", iv=None)  # no meta
    _put(objects, "other/db.a.b-045-050-000003.txt.gz.enc")  # outside prefix
    rows, rejected = list_objects_with_metadata(client, "bucket", "exports/")
    assert [r["fileName"] for r in rows] == ["db.a.b-045-050-000001.txt.gz.enc"]
    assert rejected == ["exports/db.a.b-045-050-000002.txt.gz.enc"]


def test_http_stub_empty_prefix(s3_stub):
    client, _objects = s3_stub
    rows, rejected = list_objects_with_metadata(client, "bucket", "exports/")
    assert rows == [] and rejected == []


def test_listing_joins_content_end_to_end(spark, s3_stub, tmp_path):
    """The full source: paginated stub listing + HEAD metadata broadcast-joined
    against the distributed binaryFile content scan, then AES-CTR decrypted —
    the reference's SnapshotSenderIntegrationTest shape. Objects whose
    metadata is missing never reach the scan output."""
    from pyspark.sql import functions as F

    from snapshot_sender_spark.functions import crypto
    from snapshot_sender_spark.sources import fixtures as fx

    f = fx.generate(str(tmp_path / "gen"), n_files=5, records_per_file=3, seed=77)
    client, objects = s3_stub
    meta_rows = {}
    import json

    for line in open(os.path.join(f.input_dir, "metadata.sidecar.jsonl")):
        r = json.loads(line)
        meta_rows[r["fileName"]] = r
    for i, name in enumerate(sorted(f.files)):
        body = open(os.path.join(f.input_dir, name), "rb").read()
        if i == 4:  # one object with missing metadata → rejected, not joined
            _put(objects, f"exports/{name}", body=body, iv=None)
        else:
            m = meta_rows[name]
            _put(
                objects, f"exports/{name}", body=body,
                iv=m["iv"], key_id=m["dataKeyEncryptionKeyId"], cipher=m["cipherText"],
            )
    files_df, rejected = read_encrypted_files_s3(
        spark, "bucket", "exports/", s3_client=client,
        objects_path=os.path.join(str(f.input_dir), "*.enc"),
    )
    joined = files_df.collect()
    assert len(joined) == 4  # 5 objects − 1 metadata-less reject
    assert len(rejected) == 1
    # decrypt proves iv/cipherText survived the HTTP hop intact
    from snapshot_sender_spark.plans.delivery import key_lookup_local

    keys = {
        (kid, ct): pk
        for kid, ct, pk in key_lookup_local(
            [(r["dataKeyEncryptionKeyId"], r["cipherText"]) for r in joined]
        )
    }
    keys_df = spark.createDataFrame(
        [(k[0], k[1], v) for k, v in keys.items()],
        "dataKeyEncryptionKeyId string, cipherText string, plaintextKey string",
    )
    decrypted = (
        files_df.join(F.broadcast(keys_df), ["dataKeyEncryptionKeyId", "cipherText"])
        .withColumn(
            "payload", crypto.gunzip(crypto.aes_ctr_decrypt("content", "plaintextKey", "iv"))
        )
        .select("fileName", "payload")
        .collect()
    )
    for row in decrypted:
        lines = bytes(row["payload"]).decode().strip().split("\n")
        assert len(lines) == 3  # records_per_file round-trips


def test_streaming_delivery_from_stub_listing(spark, s3_stub, tmp_path):
    """The STREAMING delivery service driven by the real-HTTP arrival signal:
    objects land in the stub bucket wave by wave; each poll_arrivals call
    pages the actual ListObjectsV2+HEAD wire protocol and appends only the
    listing DELTA as the next arrival-signal file; the streaming service then
    delivers exactly those files (content scan local, as in the batch test —
    no s3a jars here). Exercises the same real listing the batch path does,
    end to end through foreachBatch delivery + markers."""
    import gzip
    import json

    from snapshot_sender_spark.plans import delivery as dl
    from snapshot_sender_spark.sources import fixtures as fx
    from snapshot_sender_spark.streaming import delivery_stream as ds

    f = fx.generate(str(tmp_path / "gen"), n_files=5, records_per_file=3, seed=78)
    client, objects = s3_stub
    meta_rows = {}
    for line in open(os.path.join(f.input_dir, "metadata.sidecar.jsonl")):
        r = json.loads(line)
        meta_rows[r["fileName"]] = r

    input_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    status_dir = str(tmp_path / "status")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    def land(names):
        """An object 'lands': bytes + user metadata appear in the bucket, and
        the same bytes in the landing dir (the local stand-in for the s3a
        content scan)."""
        import shutil

        for name in names:
            body = open(os.path.join(f.input_dir, name), "rb").read()
            m = meta_rows[name]
            objects[f"exports/{name}"] = {
                "body": body,
                "meta": {
                    "iv": m["iv"],
                    "datakeyencryptionkeyid": m["dataKeyEncryptionKeyId"],
                    "ciphertext": m["cipherText"],
                },
            }
            shutil.copy(os.path.join(f.input_dir, name), os.path.join(input_dir, name))

    seen: set = set()
    # wave 1: two objects land; the poll signals exactly those two
    land(f.files[:2])
    assert sorted(ds.poll_arrivals(client, "bucket", "exports/", input_dir, seen)) == sorted(
        f.files[:2]
    )
    ds.run_streaming_delivery(
        spark, input_dir, out_dir, status_dir, ckpt, dl.key_lookup_local
    )
    outs = sorted(p for p in os.listdir(out_dir) if p.endswith(".json.gz"))
    assert len(outs) == 2

    # wave 2: three more land; the poll re-lists the WHOLE prefix over HTTP
    # (pagination exercised: 5 objects at page size 2) but signals only the delta
    land(f.files[2:])
    assert sorted(ds.poll_arrivals(client, "bucket", "exports/", input_dir, seen)) == sorted(
        f.files[2:]
    )
    # an immediate re-poll with nothing new signals nothing
    assert ds.poll_arrivals(client, "bucket", "exports/", input_dir, seen) == []
    ds.run_streaming_delivery(
        spark, input_dir, out_dir, status_dir, ckpt, dl.key_lookup_local
    )
    outs = sorted(p for p in os.listdir(out_dir) if p.endswith(".json.gz"))
    assert len(outs) == 5
    assert len([p for p in os.listdir(status_dir) if p.endswith(".finished")]) == 5
    # payloads decrypt + gunzip intact through the HTTP metadata hop
    for p in outs:
        with open(os.path.join(out_dir, p), "rb") as fh:
            assert len(gzip.decompress(fh.read()).decode().strip().split("\n")) == 3


def test_poll_arrivals_heads_only_unseen_keys(s3_stub, tmp_path):
    """Each poll pays one paginated LIST over the prefix but HEADs only the
    keys it hasn't signalled yet — per-poll request count is O(new arrivals),
    never O(corpus). With 4 objects seen and 2 new, the second poll issues
    exactly 2 HEADs; a no-change poll issues zero."""
    from snapshot_sender_spark.streaming import delivery_stream as ds

    client, objects = s3_stub
    input_dir = str(tmp_path / "landing")
    os.makedirs(input_dir)
    for i in range(4):
        _put(objects, f"exports/db.a.b-045-050-00000{i}.txt.gz.enc", iv=f"iv{i}")
    seen: set = set()
    first = ds.poll_arrivals(client, "bucket", "exports/", input_dir, seen)
    assert len(first) == 4 and len(_S3StubHandler.heads) == 4
    _S3StubHandler.heads.clear()
    for i in (4, 5):
        _put(objects, f"exports/db.a.b-045-050-00000{i}.txt.gz.enc", iv=f"iv{i}")
    second = ds.poll_arrivals(client, "bucket", "exports/", input_dir, seen)
    assert sorted(second) == [
        "db.a.b-045-050-000004.txt.gz.enc", "db.a.b-045-050-000005.txt.gz.enc"
    ]
    assert sorted(_S3StubHandler.heads) == [
        "exports/db.a.b-045-050-000004.txt.gz.enc",
        "exports/db.a.b-045-050-000005.txt.gz.enc",
    ]
    _S3StubHandler.heads.clear()
    assert ds.poll_arrivals(client, "bucket", "exports/", input_dir, seen) == []
    assert _S3StubHandler.heads == []


def test_poll_arrivals_reprobes_rejects_until_fixed(s3_stub, tmp_path):
    """Metadata-less objects are surfaced through the rejected list and
    RE-PROBED on every poll (O(standing rejects) HEADs — bounded, they are
    anomalies) so a producer re-uploading the same key with corrected
    metadata is picked up; delivered keys are never re-HEADed."""
    from snapshot_sender_spark.streaming import delivery_stream as ds

    client, objects = s3_stub
    input_dir = str(tmp_path / "landing")
    os.makedirs(input_dir)
    _put(objects, "exports/db.a.b-045-050-000001.txt.gz.enc", iv="iv1")
    _put(objects, "exports/db.a.b-045-050-000002.txt.gz.enc", iv=None)  # no meta
    seen: set = set()
    rejected: list = []
    new = ds.poll_arrivals(client, "bucket", "exports/", input_dir, seen, rejected)
    assert new == ["db.a.b-045-050-000001.txt.gz.enc"]
    assert rejected == ["exports/db.a.b-045-050-000002.txt.gz.enc"]
    # next poll: the delivered key is not re-HEADed; the reject is re-probed
    # (and re-reported) while still broken
    _S3StubHandler.heads.clear()
    # a PERSISTENT rejected list is not duplicated by the re-probe: still
    # exactly one entry after the second poll finds it still broken
    assert ds.poll_arrivals(client, "bucket", "exports/", input_dir, seen, rejected) == []
    assert rejected == ["exports/db.a.b-045-050-000002.txt.gz.enc"]
    assert _S3StubHandler.heads == ["exports/db.a.b-045-050-000002.txt.gz.enc"]
    # producer fixes the upload under the SAME key -> next poll signals it
    _put(objects, "exports/db.a.b-045-050-000002.txt.gz.enc", iv="iv2-fixed")
    rejected3: list = []
    assert ds.poll_arrivals(client, "bucket", "exports/", input_dir, seen, rejected3) == [
        "db.a.b-045-050-000002.txt.gz.enc"
    ]
    assert rejected3 == []
