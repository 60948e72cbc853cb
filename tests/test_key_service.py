"""DKS client behavior matrix (mirrors HttpKeyServiceTest: 200 → plaintext,
400 → permanent, 503 → retry then succeed/exhaust, caching) against an
in-process HTTP server, plus the full delivery pipeline wired through it."""

import base64
import json
import http.server
import threading

import pytest

from snapshot_sender_spark.plans.key_service import (
    DataKeyDecryptionException,
    DataKeyServiceUnavailableException,
    HttpKeyService,
)
from snapshot_sender_spark.sources import fixtures as fx


class _DKS(http.server.BaseHTTPRequestHandler):
    calls = []
    fail_next = 0
    status_for_400 = False

    def do_POST(self):
        cls = type(self)
        body = self.rfile.read(int(self.headers.get("Content-Length", 0))).decode()
        cls.calls.append((self.path, body))
        if cls.status_for_400:
            self.send_response(400)
            self.end_headers()
            return
        if cls.fail_next > 0:
            cls.fail_next -= 1
            self.send_response(503)
            self.end_headers()
            return
        # decrypt with the fixture's XOR master key — same contract as DKS
        plaintext = fx.decrypt_data_key(body)
        payload = json.dumps(
            {"dataKeyEncryptionKeyId": "cloudhsm:1,2", "plaintextDataKey": plaintext}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture()
def dks():
    _DKS.calls = []
    _DKS.fail_next = 0
    _DKS.status_for_400 = False
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _DKS)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_decrypt_roundtrip(dks):
    svc = HttpKeyService(dks, initial_delay_s=0.01)
    key = bytes(range(32))
    ct = fx.encrypt_data_key(key)
    assert svc.decrypt_key("cloudhsm:1,2", ct) == base64.b64encode(key).decode()
    assert "keyId=cloudhsm%3A1%2C2" in _DKS.calls[0][0]  # keyId URL-encoded


def test_cache_one_call_per_distinct_key(dks):
    svc = HttpKeyService(dks, initial_delay_s=0.01)
    ct = fx.encrypt_data_key(bytes(32))
    for _ in range(5):
        svc.decrypt_key("k1", ct)
    assert len(_DKS.calls) == 1  # memo cache (HttpKeyService.kt:48-50)
    svc.clear_cache()
    svc.decrypt_key("k1", ct)
    assert len(_DKS.calls) == 2


def test_400_is_permanent_no_retry(dks):
    _DKS.status_for_400 = True
    svc = HttpKeyService(dks, initial_delay_s=0.01)
    with pytest.raises(DataKeyDecryptionException):
        svc.decrypt_key("k1", "whatever")
    assert len(_DKS.calls) == 1  # no retry on 400 (HttpKeyService.kt:66-70)


def test_503_retries_then_succeeds(dks):
    _DKS.fail_next = 2
    svc = HttpKeyService(dks, initial_delay_s=0.01)
    ct = fx.encrypt_data_key(bytes(range(32)))
    svc.decrypt_key("k1", ct)
    assert len(_DKS.calls) == 3


def test_503_exhausts_retries(dks):
    _DKS.fail_next = 10**6
    svc = HttpKeyService(dks, max_attempts=3, initial_delay_s=0.01)
    with pytest.raises(DataKeyServiceUnavailableException):
        svc.decrypt_key("k1", "ct")
    assert len(_DKS.calls) == 3


def test_delivery_pipeline_through_dks(spark, tmp_path, dks):
    """End-to-end: the pipeline resolves its data keys via the HTTP key
    service — one call per distinct key regardless of file count."""
    from snapshot_sender_spark.plans import delivery

    f = fx.generate(str(tmp_path), n_files=6, records_per_file=4, seed=17)
    svc = HttpKeyService(dks, initial_delay_s=0.01)
    cfg = delivery.RunConfig(correlation_id="dks", topic_name=f.topic)
    result = delivery.build_decrypted(
        spark, f.input_dir, f.status_dir, cfg, key_lookup=svc.key_lookup
    )
    records = delivery.parse_records(result.delivered)
    assert records.count() == 6 * 4
    assert len(_DKS.calls) == 1  # 6 files, one distinct key → one DKS round trip
