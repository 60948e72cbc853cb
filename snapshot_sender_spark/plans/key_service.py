"""Data Key Service (DKS) client — the reference's HttpKeyService
(HttpKeyService.kt:43-95) re-expressed for the Spark plan.

Contract preserved:
  * POST the encrypted key to ``<url>/datakey/actions/decrypt?keyId=<id>``,
    body = cipherText; 2xx → JSON body with ``plaintextDataKey``.
  * 400 → permanent failure (DataKeyDecryptionException, :66-70) — no retry.
  * any other error → retryable (DataKeyServiceUnavailableException, :71-84)
    with 5 attempts, 1 s initial delay, ×2 backoff (:37-40).
  * memo cache keyed by (encryptedKey, keyId) (:48-50,73,101) — one round trip
    per distinct key per run.

In the Spark plan the cache is structural: the delivery pipeline calls the
lookup once per ``distinct()`` (keyId, cipherText) pair on the driver and
broadcasts the resolved map (plans/delivery.py step 5), so per-executor
caching is unnecessary — the reference needs the cache because it resolves
per file."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request


class DataKeyDecryptionException(Exception):
    """Permanent: the service says the key cannot be decrypted (HTTP 400)."""


class DataKeyServiceUnavailableException(Exception):
    """Transient: retries exhausted against an unavailable service."""


class HttpKeyService:
    def __init__(
        self,
        url: str,
        max_attempts: int = 5,
        initial_delay_s: float = 1.0,
        backoff_multiplier: float = 2.0,
        timeout_s: float = 30.0,
    ):
        self.url = url.rstrip("/")
        self.max_attempts = max_attempts
        self.initial_delay_s = initial_delay_s
        self.backoff_multiplier = backoff_multiplier
        self.timeout_s = timeout_s
        self._cache: dict[tuple[str, str], str] = {}

    def clear_cache(self) -> None:
        """KeyService.clearCache (KeyService.kt:11) — new broadcast per run."""
        self._cache.clear()

    def decrypt_key(self, key_id: str, encrypted_key: str) -> str:
        cache_key = (encrypted_key, key_id)
        if cache_key in self._cache:
            return self._cache[cache_key]
        endpoint = (
            f"{self.url}/datakey/actions/decrypt?keyId={urllib.parse.quote(key_id, safe='')}"
        )
        delay = self.initial_delay_s
        last_err: Exception | None = None
        for attempt in range(self.max_attempts):
            req = urllib.request.Request(
                endpoint, data=encrypted_key.encode(), method="POST"
            )
            req.add_header("Content-Type", "application/json")
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    body = json.loads(resp.read().decode())
                    plaintext = body["plaintextDataKey"]
                    self._cache[cache_key] = plaintext
                    return plaintext
            except urllib.error.HTTPError as e:
                if e.code == 400:
                    raise DataKeyDecryptionException(
                        f"DKS returned 400 for keyId={key_id}"
                    ) from e
                last_err = e
            except Exception as e:  # connection errors etc. → retryable
                last_err = e
            if attempt < self.max_attempts - 1:
                time.sleep(delay)
                delay *= self.backoff_multiplier
        raise DataKeyServiceUnavailableException(
            f"DKS unavailable after {self.max_attempts} attempts for keyId={key_id}"
        ) from last_err

    def key_lookup(self, pairs: list[tuple[str, str]]) -> list[tuple[str, str, str]]:
        """Adapter matching plans/delivery.py's key_lookup signature: resolve
        each distinct (keyId, cipherText) pair."""
        return [(kid, ct, self.decrypt_key(kid, ct)) for kid, ct in pairs]
