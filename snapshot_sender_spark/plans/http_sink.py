"""Per-file HTTP delivery sink — the reference's NiFi POST path
(HttpWriter.kt:39-119, headers NiFiUtility.kt:12-25) as a distributed
``foreachPartition`` sink.

Semantics preserved:
  * 12 routing headers per POST, including filename (renamed .txt.gz→.json.gz),
    database/collection/topic parsed from the filename, snapshot_type
    normalized (drift_testing_incremental→incremental, NiFiUtility.kt:27-32),
    export_date, correlation_id (HttpWriter.kt:60-71).
  * body = the still-gzipped decrypted bytes, unparsed (HttpWriter.kt:75).
  * non-2xx → retry with exponential backoff (the reference retries the whole
    chunk ×100, JobConfiguration.kt:46-50; here per-file retries inside the
    task + Spark task retries around it — same at-least-once contract).
  * a .finished marker after success (HttpWriter.kt:95-96) makes restarts
    idempotent via the upstream anti-join.

Scale: one POST per file from whichever task holds the file's row; no driver
involvement, no collect. Connection reuse per partition (one opener per task,
≡ the reference's pooled client, SecureHttpClientProvider.kt).
"""

from __future__ import annotations

import os
import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame

from ..functions.text import normalize_snapshot_type


def nifi_headers(
    filename: str,
    database: str,
    collection: str,
    topic: str,
    export_date: str,
    snapshot_type: str,
    correlation_id: str,
    status_table_name: str = "UCExportToCrownStatus",
    s3_prefix: str = "",
    shutdown_flag: str = "true",
    reprocess_files: str = "false",
    environment: str = "local",
) -> dict[str, str]:
    """The 12-header set (NiFiUtility.kt:12-25)."""
    return {
        "filename": filename,
        "environment": environment,
        "export_date": export_date,
        "database": database,
        "collection": collection,
        "snapshot_type": normalize_snapshot_type(snapshot_type),
        "topic": topic,
        "status_table_name": status_table_name,
        "correlation_id": correlation_id,
        "s3_prefix": s3_prefix,
        "shutdown_flag": shutdown_flag,
        "reprocess_files": reprocess_files,
    }


class DeliveryError(Exception):
    """Non-2xx after exhausting retries (≡ WriterException, HttpWriter.kt:84-88)."""


RECEIPT_SCHEMA = "fileName string, topic string, status_code int, attempts int, bytes_sent long"


def _ssl_context(tls: dict | None):
    """Build the task-local SSLContext from file paths (an SSLContext is not
    picklable, so the sink ships paths and constructs per task) — the
    reference's keystore config (SecureHttpClientProvider.kt:36-60:
    trust.keystore → cafile, identity.keystore → certfile/keyfile for mutual
    TLS)."""
    if not tls:
        return None
    import ssl

    ctx = ssl.create_default_context(cafile=tls.get("cafile"))
    if tls.get("certfile"):
        ctx.load_cert_chain(tls["certfile"], tls.get("keyfile"))
    if tls.get("check_hostname") is False:
        ctx.check_hostname = False
    return ctx


def http_deliver(
    decrypted: DataFrame,
    url: str,
    correlation_id: str,
    export_date: str,
    snapshot_type: str = "full",
    status_dir: str | None = None,
    max_retries: int = 5,
    backoff_s: float = 0.1,
    tls: dict | None = None,
) -> DataFrame:
    """POST each file's payload with routing headers; at-least-once with
    idempotent markers. Retries per file: ``max_retries`` attempts with ×2
    exponential backoff (HttpKeyService.kt:37-40's policy applied to delivery).

    Implemented as ``mapInPandas`` (not foreachPartition) so the sink stays in
    the SQL engine: it returns a *receipt* DataFrame (one row per delivered
    file) that composes with ``df.observe`` counters — RDD-level foreach
    actions never fire SQL observation metrics — and doubles as the delivery
    manifest for the status aggregation.

    The receipts are materialized exactly once here (eager ``localCheckpoint``)
    before being returned: a side-effecting transformation must not re-run on
    every downstream action (count-then-write, AQE stage retry, speculation),
    or every materialization would re-POST the partition. Downstream actions
    read the checkpointed partitions instead."""
    rows = decrypted.select(
        "fileName", "outputFileName", "database", "collection", "topic", "decrypted"
    )

    def post_batches(batches):
        import pandas as pd

        ctx = _ssl_context(tls)
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                headers = nifi_headers(
                    filename=row.outputFileName,
                    database=row.database,
                    collection=row.collection,
                    topic=row.topic,
                    export_date=export_date,
                    snapshot_type=snapshot_type,
                    correlation_id=correlation_id,
                )
                body = bytes(row.decrypted)
                delay = backoff_s
                status = None
                attempts = 0
                for attempt in range(max_retries):
                    attempts = attempt + 1
                    req = urllib.request.Request(url, data=body, method="POST")
                    for k, v in headers.items():
                        req.add_header(k, v)
                    req.add_header("Content-Type", "application/octet-stream")
                    try:
                        with urllib.request.urlopen(req, timeout=30, context=ctx) as resp:
                            # Only 200 counts as delivered (HttpWriter.kt:82-115
                            # retries everything else, including other 2xx).
                            if resp.status == 200:
                                status = resp.status
                                break
                            raise urllib.error.HTTPError(
                                url, resp.status, "non-200", resp.headers, None
                            )
                    except Exception:
                        if attempt == max_retries - 1:
                            raise DeliveryError(
                                f"delivery failed for {row.fileName} "
                                f"after {max_retries} attempts"
                            )
                        time.sleep(delay)
                        delay *= 2
                if status_dir:
                    marker = os.path.join(status_dir, row.fileName + ".finished")
                    with open(marker, "w") as fh:
                        fh.write(f"Finished {row.fileName}")
                out.append(
                    {
                        "fileName": row.fileName,
                        "topic": row.topic,
                        "status_code": status,
                        "attempts": attempts,
                        "bytes_sent": len(body),
                    }
                )
            yield pd.DataFrame(
                out, columns=["fileName", "topic", "status_code", "attempts", "bytes_sent"]
            )

    # Eager, replicated local checkpoint: runs the POSTs exactly once, now;
    # every later count/collect/write on the result reuses the stored rows.
    return rows.mapInPandas(post_batches, schema=RECEIPT_SCHEMA).localCheckpoint(eager=True)
