"""Continuous delivery: the flagship pipeline as a Structured Streaming
service.

The reference is a batch job per (correlation_id, topic) — rerun by an
external scheduler as exports land. Re-expressed as a stream, the same
declarative stages run continuously: a file-stream source watches the input
prefix, each micro-batch runs decrypt→validate→route, and foreachBatch
delivers with epoch-id idempotent commits (checkpoint + markers give
exactly-once delivery across restarts — the streaming generalization of the
reference's restart contract).

Local fixture layout (same as plans/delivery): encrypted objects + a
metadata sidecar. The metadata side is re-read per batch (it grows with the
prefix); at scale it is the driver-side listing delta.
"""

from __future__ import annotations

import json
import os
import time
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import crypto, text
from ..plans import delivery
from ..sources.listing import ENCRYPTION_META_SCHEMA
from ..util import local_strings_df


def read_encrypted_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-stream source over the encrypted prefix; binaryFile isn't a
    streaming source, so the stream carries (path, fileName) from the text
    listing of object names via the parquet-less 'binaryFile'... workaround:
    stream the metadata sidecar (one row per landed object) and join content
    per batch in foreachBatch. The sidecar IS the arrival signal — exactly the
    listing delta a scale deployment streams from S3 inventory/SQS events."""
    return (
        spark.readStream.schema(ENCRYPTION_META_SCHEMA)
        .json(os.path.join(input_dir, "meta_stream"))
    )


def poll_arrivals(
    s3_client, bucket: str, prefix: str, input_dir: str, seen: set,
    rejected: list | None = None,
) -> list[str]:
    """One poll of the arrival signal from a REAL S3 listing: page through
    ListObjectsV2 + per-object HEAD metadata (sources/s3.py — the reference's
    S3DirectoryReader contract over actual wire protocol) and append the NEW
    objects' metadata rows as one sidecar file under ``meta_stream/`` — the
    file-stream source then delivers them as the next micro-batch. This is
    the listing→signal bridge a deployment runs between scheduler ticks (or
    replaces with S3 inventory/SQS events); ``seen`` carries the listing
    delta state, O(names) driver-side. Each poll pays one paginated LIST
    (unavoidable without inventory/events) but HEADs only keys not yet
    SIGNALLED — per-poll request count is O(new arrivals + standing rejects),
    never O(corpus). Keys missing the encryption metadata triple are appended
    to ``rejected`` (if given) ONCE per key — a standing reject stays in the
    list, not duplicated every poll — and re-PROBED each poll: they are
    deliberately NOT marked seen, so a producer re-uploading the same key
    with corrected metadata IS picked up on the next poll; the bounded
    re-HEAD cost of standing rejects (anomalies, normally few) buys that
    recovery path. Returns the newly-signalled names."""
    from ..sources.s3 import list_objects_with_metadata

    new, newly_rejected = list_objects_with_metadata(
        s3_client, bucket, prefix, skip_names=seen
    )
    if newly_rejected and rejected is not None:
        known = set(rejected)
        rejected.extend(k for k in newly_rejected if k not in known)
    if not new:
        return []
    meta_dir = os.path.join(input_dir, "meta_stream")
    os.makedirs(meta_dir, exist_ok=True)
    path = os.path.join(meta_dir, f"arrival_{time.time_ns()}.json")
    with open(path, "w") as fh:
        for r in new:
            fh.write(json.dumps(r) + "\n")
    seen.update(r["fileName"] for r in new)
    return [r["fileName"] for r in new]


def read_batch_objects(spark: SparkSession, input_dir: str, names) -> DataFrame:
    """Read EXACTLY one micro-batch's encrypted objects as (fileName, content).

    The batch's file names are already known driver-side (the tiny metadata
    rows ARE the arrival signal), so the binaryFile source is given the
    explicit per-file path list — per-batch I/O is O(batch), never O(corpus).
    A `load(prefix)` + filter on the DERIVED fileName column cannot push down
    to the binaryFile source (it prunes only on raw path/length/modTime), so
    it would list AND read every object under a growing prefix each batch —
    quadratic total I/O over a continuous service's lifetime. The reference
    reads each object exactly once (S3DirectoryReader.kt:59-65: paginated
    listing, one GET per listed key); the explicit path list is the streaming
    equivalent of that contract.

    Signalled-but-absent files (deleted between the arrival signal and this
    replayed batch — ops TTL/cleanup) are probed out driver-side first
    (O(batch) existence probes ≡ one HEAD per batch file at S3 scale): an
    explicit `load` of a missing path raises, which would wedge the replaying
    epoch in a crash loop; the survivors still deliver, matching the old
    prefix-scan behavior. Deletion races are closed in two layers: a file
    vanishing between the probe and load-time path RESOLUTION still raises
    at `load` (verified: ignoreMissingFiles does NOT cover that sub-window),
    so the probe+load is retried with a re-probed list; one vanishing after
    resolution but before the executor's read is skipped by
    ``ignoreMissingFiles`` (the sub-window that option does cover)."""
    from pyspark.errors import AnalysisException

    last_err: Exception | None = None
    for _ in range(3):
        paths = [
            p
            for p in (os.path.join(input_dir, name) for name in sorted(names))
            if os.path.exists(p)
        ]
        if not paths:
            return spark.createDataFrame([], "fileName string, content binary")
        try:
            return (
                spark.read.format("binaryFile")
                .option("ignoreMissingFiles", "true")
                .load(paths)
                .select(
                    F.element_at(F.split(F.col("path"), "/"), -1).alias("fileName"),
                    F.col("content"),
                )
            )
        except AnalysisException as e:  # a probed path vanished pre-resolution
            last_err = e
    raise last_err


def run_streaming_delivery(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    status_dir: str,
    checkpoint_dir: str,
    key_lookup,
) -> list[int]:
    """Drive the continuous delivery to completion over currently-available
    input (Trigger.AvailableNow). Returns the list of processed epoch ids.

    foreachBatch body = the batch pipeline stages on the batch's file set:
    metadata rows → content join (read per batch) → grammar/topic → key
    broadcast → decrypt → the batch ``deliver()`` foreachPartition sink
    (per-file atomic rename + markers, fully distributed — decrypted bytes
    never reach the driver). Epoch-id marker makes redelivery of a replayed
    batch a no-op; the only driver-side collects are the metadata listing
    delta and the distinct-key set (both O(files-per-batch), not O(bytes))."""
    os.makedirs(output_dir, exist_ok=True)
    os.makedirs(status_dir, exist_ok=True)
    epochs: list[int] = []

    meta_stream = read_encrypted_stream(spark, input_dir)

    def deliver_batch(meta_df: DataFrame, epoch_id: int) -> None:
        epoch_marker = os.path.join(status_dir, f"_epoch_{epoch_id}.committed")
        rows = meta_df.collect()  # file-level metadata: tiny
        # order-insensitive batch fingerprint, computed driver-side from the
        # already-collected metadata (no extra job). Epoch ids restart at 0
        # under a fresh checkpoint, so a marker retained from a previous
        # checkpoint generation can collide with a batch of DIFFERENT files —
        # silently fast-skipping would drop the new arrivals. A mismatch is a
        # loud, actionable error instead (same contract as the ingestion-
        # dedup service's fingerprinted markers, which hash CONTENT): each
        # file's crc covers fileName + iv + cipherText, so a same-name batch
        # whose objects were re-uploaded with different encryption material
        # is detected too, not just a renamed one.
        fp = {"v": 2, "n": len(rows), "x": 0}
        legacy_fp = {"n": len(rows), "x": 0}  # v1 format: fileName-only XOR
        for r in rows:
            fp["x"] ^= zlib.crc32(
                b"\x00".join(
                    (r["fileName"].encode(), r["iv"].encode(), r["cipherText"].encode())
                )
            )
            legacy_fp["x"] ^= zlib.crc32(r["fileName"].encode())
        if os.path.exists(epoch_marker):
            with open(epoch_marker) as fh:
                committed = fh.read()
            if committed and committed != "committed":  # legacy empty/plain markers skip
                prev = json.loads(committed)
                # a marker written before the fingerprint covered iv/cipherText
                # has no "v" field — compare it against the v1 form so a
                # legitimate crash-replay across a code upgrade stays a no-op
                # instead of a false checkpoint-collision alarm
                want = fp if prev.get("v") == 2 else legacy_fp
                if prev != want:
                    raise RuntimeError(
                        f"epoch {epoch_id} marker exists but its committed batch "
                        f"fingerprint {prev} != this batch's {want}: epoch ids have "
                        "collided across checkpoint generations (fresh checkpoint "
                        "with retained status dir?). Refusing to silently skip "
                        "new arrivals — restore the matching checkpoint."
                    )
            return
        # the reference's already-processed filter (FinishedFilterProcessor
        # semantics): per-FILE idempotence — a replayed epoch whose marker was
        # lost re-delivers nothing that already has a .finished marker, the
        # same contract as the batch pipeline. Probed per batch file
        # driver-side (O(batch) existence checks ≡ the reference's per-key
        # probe; a HEAD per file against S3) — NOT a scan of the whole marker
        # dir, which would grow O(everything-ever-delivered) per batch.
        rows = [
            r
            for r in rows
            if not os.path.exists(os.path.join(status_dir, r["fileName"] + ".finished"))
        ]
        if rows:
            names = {r["fileName"] for r in rows}
            # explicit path list: this batch's bytes and ONLY this batch's
            # bytes are read — O(batch) I/O regardless of how large the
            # standing prefix has grown (see read_batch_objects)
            objects = read_batch_objects(spark, input_dir, names)
            # VALUES LocalRelation (util.local_strings_df): createDataFrame's
            # pickled-RDD scan would run a Python-worker stage on every
            # broadcast build of every micro-batch
            meta = local_strings_df(
                spark,
                [
                    (r["fileName"], r["iv"], r["dataKeyEncryptionKeyId"], r["cipherText"])
                    for r in rows
                ],
                [f.name for f in ENCRYPTION_META_SCHEMA.fields],
            )
            files = objects.join(F.broadcast(meta), "fileName")
            files = files.withColumn(
                "decryptedFileName", text.strip_enc_suffix(F.col("fileName"))
            )
            rejected = files.filter(
                ~text.filename_is_valid(F.col("decryptedFileName"))
            ).select("fileName")
            files = files.filter(text.filename_is_valid(F.col("decryptedFileName")))
            files = (
                files.withColumn("database", text.extract_database(F.col("decryptedFileName")))
                .withColumn("collection", text.extract_collection(F.col("decryptedFileName")))
                .withColumn(
                    "topic",
                    text.derive_topic(
                        F.col("decryptedFileName"), F.col("database"), F.col("collection")
                    ),
                )
            )
            # distinct-key collect IS the operator: one external key-service
            # call per distinct (keyId, cipherText) — O(keys), never O(bytes)
            pairs = [
                (r["dataKeyEncryptionKeyId"], r["cipherText"])
                for r in files.select("dataKeyEncryptionKeyId", "cipherText").distinct().collect()
            ]
            resolved = key_lookup(pairs)
            keys_df = local_strings_df(
                spark,
                [tuple(r) for r in resolved],
                ["dataKeyEncryptionKeyId", "cipherText", "plaintextKey"],
            )
            decrypted = (
                files.join(F.broadcast(keys_df), ["dataKeyEncryptionKeyId", "cipherText"])
                .withColumn(
                    "decrypted",
                    crypto.aes_ctr_decrypt(F.col("content"), F.col("plaintextKey"), F.col("iv")),
                )
                .withColumn("outputFileName", text.rename_output(F.col("decryptedFileName")))
            )
            # the batch sink: foreachPartition atomic write + markers — the
            # micro-batch is delivered by the executors, not the driver
            delivery.deliver(
                delivery.DeliveryResult(
                    delivered=decrypted,
                    rejected=rejected,
                    blocked=decrypted.select("fileName", "topic").limit(0),
                ),
                output_dir,
                status_dir,
            )
        with open(epoch_marker, "w") as fh:
            fh.write(json.dumps(fp))
        epochs.append(epoch_id)

    q = (
        meta_stream.writeStream.foreachBatch(deliver_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return epochs
