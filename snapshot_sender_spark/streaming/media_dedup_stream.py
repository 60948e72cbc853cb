"""Continuous MEDIA ingestion dedup service: a stream of (media_id, content)
binary blobs is perceptually deduped per micro-batch against the persisted
per-band signature index (operators/dedup.py:append_sig_index_epoch), and
each batch's surviving (novel) media are appended to BOTH the accepted
corpus and the index inside the same epoch — the media mirror of
streaming/dedup_stream.py, with 64-bit perceptual signatures playing the
role the shingle posting list plays for text.

Dedup semantics are SIGNATURE-level throughout: a within-batch pair inside
``max_hamming`` drops the higher id (exact duplicates land at hamming 0, so
a separate content-hash stage would be subsumed); a batch survivor within
``max_hamming`` of ANY accepted signature is dropped (the corpus is
already-kept history). Media bytes are decoded ONCE per epoch (the
signature stage's mapInPandas) and never re-decoded: the standing corpus
participates only as (id, sig, band) rows read bucket-aligned.

Scale shape: after the signature stage only (id, 8-byte sig) rows exist;
within-batch mining is the 4×16-bit banded self-join (exact for hamming ≤ 3
by pigeonhole) run over DISTINCT signatures only — the hot-band guard
(operators/dedup.py:banded_hamming_survivors) collapses identical
signatures to one representative first, so adversarial batches (millions of
blank pages / black frames / silence with ONE shared signature) cost a
sig-keyed aggregation, never a quadratic band join — and the cross-set
probe sort-merges against pre-sorted index band buckets in place — no
Exchange, no sort, no decode on the corpus side. The index itself stays
hot-band-free by construction: accepted signatures are pairwise more than
max_hamming apart, so no two index rows ever share a full signature.
Epoch markers + input fingerprints give the same replay-idempotence and
collision-detection contract as the text service; ``compact_after`` folds
committed epoch partitions into the reserved epoch=-1 partition.

Generalization beyond the reference: the reference never parses payloads
(HttpWriter.kt:75 ships bytes); this implements the north-star multimodal
dedup requirement as a first-class streaming service.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, index_lifecycle, multimodal
from .dedup_stream import _marker_path, committed_epochs  # shared marker scheme

MEDIA_SCHEMA = "media_id long, content binary"

__all__ = [
    "run_streaming_media_dedup",
    "run_streaming_video_dedup",
    "takedown_accepted_media",
    "takedown_accepted_video",
    "committed_epochs",
    "MEDIA_SCHEMA",
]


def _media_fingerprint(batch: DataFrame) -> dict:
    """Epoch-collision guard over (media_id, content) — the shared scheme
    lives in operators/index_lifecycle.py:batch_fingerprint."""
    return index_lifecycle.batch_fingerprint(batch, "media_id", "content")


def run_streaming_media_dedup(
    spark: SparkSession,
    input_dir: str,
    index_table: str,
    accepted_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    n_buckets: int = 8,
    max_files_per_trigger: int | None = None,
    compact_after: bool = False,
    signature=None,
) -> list[int]:
    """Drive media ingestion dedup to completion over currently-available
    input (Trigger.AvailableNow). Returns the processed epoch ids.

    Per micro-batch: (1) decode + signature once (``signature``: a callable
    DataFrame → (media_id, sig); default ``multimodal.image_ahash`` — real
    PNG/JPEG decode → 64-bit aHash); (2) within-batch near-dup (banded
    hamming pairs ≤ ``max_hamming``, drop the higher id of every pair);
    (3) cross-set probe of the survivors against the standing signature
    index with the CURRENT epoch excluded (crash between index append and
    marker must not self-match on replay — same exclusion the text service
    uses); (4) append accepted (media_id, sig) rows to ``accepted_dir`` and
    their band rows to the index, then commit the epoch marker. Replayed
    epochs fast-skip on the marker after verifying the input fingerprint."""
    sig_fn = signature if signature is not None else multimodal.image_ahash
    os.makedirs(accepted_dir, exist_ok=True)
    epochs_dir = os.path.join(accepted_dir, "_epochs")
    os.makedirs(epochs_dir, exist_ok=True)
    data_dir = os.path.join(accepted_dir, "data")
    epochs: list[int] = []

    def dedup_batch(batch: DataFrame, epoch_id: int) -> None:
        marker = _marker_path(epochs_dir, epoch_id)
        fp = _media_fingerprint(batch)
        if os.path.exists(marker):
            with open(marker) as fh:
                committed = fh.read()
            if committed:
                prev = json.loads(committed)
                if prev != fp:
                    raise RuntimeError(
                        f"epoch {epoch_id} marker exists but its committed input "
                        f"fingerprint {prev} != this batch's {fp}: epoch ids have "
                        "collided across checkpoint generations. Refusing to "
                        "silently skip new data or overwrite the committed epoch."
                    )
            return
        epochs.append(epoch_id)
        sess = batch.sparkSession
        # (1) ONE decode pass for the epoch: everything downstream works on
        # (id, sig) rows. Checkpointed — the within-batch join, the cross-set
        # probe, the corpus write and the index append all reuse it, and
        # without the checkpoint each would re-decode the batch's media.
        sigs = (
            sig_fn(batch)
            .select(F.col("media_id").alias("id"), "sig")
            .localCheckpoint()
        )
        # (2) within-batch near-dup: drop the higher id of every pair (the
        # text service's rule at signature granularity; hamming 0 ==
        # identical signature, so exact duplicates are subsumed). HOT-BAND
        # GUARDED (round 8): identical signatures collapse to their min-id
        # representative BEFORE banding, so a degenerate batch (10⁶ blank
        # pages / black frames / silent clips sharing ONE signature) costs
        # one sig-keyed aggregation instead of a quadratic band join —
        # result-identical to the unguarded rule (equivalence proof on
        # banded_hamming_dropped, pinned by tests/test_hotband.py).
        # Survivors carry DISTINCT signatures by construction, so the index
        # probe's batch side is already collapsed too.
        survivors = dedup.banded_hamming_survivors(sigs, max_hamming=max_hamming)
        # (3) cross-set vs the standing index (absent on the first epoch),
        # current epoch excluded for crash-replay safety
        if sess.catalog.tableExists(index_table):
            sess.catalog.refreshTable(index_table)
            dups = (
                dedup.banded_hamming_pairs_against_index(
                    sess, index_table, survivors, max_hamming=max_hamming,
                    exclude_epoch=epoch_id,
                )
                .select(F.col("batch_id").alias("id"))
                .distinct()
            )
            accepted = survivors.join(dups, "id", "left_anti")
        else:
            accepted = survivors
        # (4) publish replay-idempotently: overwrite the epoch's corpus dir,
        # dynamic-partition-overwrite the epoch's index partition, then
        # commit the marker (fast-skip only — the writes converge on replay
        # with or without it, exactly as in the text service)
        accepted = accepted.localCheckpoint()
        accepted.select(F.col("id").alias("media_id"), "sig").write.mode(
            "overwrite"
        ).parquet(os.path.join(data_dir, f"epoch={epoch_id}"))
        dedup.append_sig_index_epoch(
            sess, index_table, accepted, epoch=epoch_id, n_buckets=n_buckets
        )
        with open(marker, "w") as f:
            f.write(json.dumps(fp))

    reader = spark.readStream.schema(MEDIA_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    if spark.catalog.tableExists(index_table):
        spark.catalog.refreshTable(index_table)
        if compact_after:
            dedup.compact_sig_index(
                spark, index_table, committed_epochs(accepted_dir)
            )
    return epochs


def run_streaming_video_dedup(
    spark: SparkSession,
    input_dir: str,
    index_table: str,
    accepted_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    n_buckets: int = 8,
    max_files_per_trigger: int | None = None,
    compact_after: bool = False,
    frame_hashes=None,
) -> list[int]:
    """The SET-signature (posting) mode of the media ingestion-dedup
    service — VIDEO near-dup is set-Jaccard over per-frame fingerprints,
    not a single 64-bit signature, so it routes through the TEXT family's
    posting-index machinery (``append_dedup_index_epoch`` /
    ``incremental_jaccard_against_index``) with frame hashes playing the
    shingle role, exactly as the batch query ``dedup_video_index_epochs``
    does — this is its streaming-service form (round-8 verdict #6).

    Per micro-batch: (1) decode ONCE — ``frame_hashes`` (a callable
    DataFrame → (media_id, h): one row per DISTINCT frame fingerprint;
    default: real streamed H.264 I_PCM decode → per-frame luma aHash →
    xxhash64) produces the batch posting list, localCheckpointed so the
    within-batch join, the cross-set probe, the corpus write and the index
    append all reuse it; (2) within-batch near-dup — exact set-Jaccard ≥
    ``threshold`` via the frame-hash equi-join, drop the higher id of
    every pair (identical videos land at Jaccard 1.0, so exact dedup is
    subsumed); (3) cross-set — survivors probe the standing posting index
    with the CURRENT epoch excluded (crash between index append and marker
    must not self-match at Jaccard 1.0 on replay — the text service's
    exclusion contract verbatim); (4) publish replay-idempotently:
    overwrite the epoch's corpus dir with (media_id, n_frames), append the
    accepted posting rows per-epoch (dynamic partition overwrite), commit
    the marker. Replayed epochs fast-skip on the marker after verifying
    the input fingerprint. ``compact_after`` folds committed epochs via
    ``compact_dedup_index`` (postings + sizes tables).

    Scale shape: after the decode stage only (id, 8-byte frame hash) rows
    exist; the standing corpus participates as pre-sorted bucket-aligned
    posting rows read in place — videos are NEVER re-decoded after their
    ingest epoch."""
    if frame_hashes is None:
        def frame_hashes(df):  # real H.264 decode path
            return (
                multimodal.video_frame_ahash(df)
                .select("media_id", "ahash")
                .distinct()
                .select("media_id", F.xxhash64("ahash").alias("h"))
            )
    os.makedirs(accepted_dir, exist_ok=True)
    epochs_dir = os.path.join(accepted_dir, "_epochs")
    os.makedirs(epochs_dir, exist_ok=True)
    data_dir = os.path.join(accepted_dir, "data")
    epochs: list[int] = []

    def dedup_batch(batch: DataFrame, epoch_id: int) -> None:
        marker = _marker_path(epochs_dir, epoch_id)
        fp = _media_fingerprint(batch)
        if os.path.exists(marker):
            with open(marker) as fh:
                committed = fh.read()
            if committed:
                prev = json.loads(committed)
                if prev != fp:
                    raise RuntimeError(
                        f"epoch {epoch_id} marker exists but its committed input "
                        f"fingerprint {prev} != this batch's {fp}: epoch ids have "
                        "collided across checkpoint generations. Refusing to "
                        "silently skip new data or overwrite the committed epoch."
                    )
            return
        epochs.append(epoch_id)
        sess = batch.sparkSession
        # (1) ONE decode pass for the epoch
        posting = (
            frame_hashes(batch)
            .select(F.col("media_id").alias("id"), "h")
            .localCheckpoint()
        )
        # sizes derive from the BATCH ids, not the posting rows: media whose
        # frame stage yields zero fingerprints (header-only stream, custom
        # frame_hashes filtering) must still flow through accept/publish —
        # an empty set matches nothing (Jaccard undefined -> no pair), so
        # they are accepted with n_frames = 0 and index nothing, exactly as
        # the text service accepts shingle-less docs. Silently vanishing
        # would be data loss.
        sizes = (
            batch.select(F.col("media_id").alias("id"))
            .distinct()
            .join(posting.groupBy("id").agg(F.count("*").alias("s")), "id", "left")
            .fillna(0, subset=["s"])
        )
        # (2) within-batch set-Jaccard: drop the higher id of every pair
        a = posting.select(F.col("id").alias("id_a"), "h")
        c = posting.select(F.col("id").alias("id_b"), "h")
        inter = (
            a.join(c, "h")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_shared"))
        )
        sa = sizes.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
        jac = F.col("n_shared") / (F.col("sa") + F.col("sb") - F.col("n_shared"))
        near = (
            inter.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(jac >= threshold)
            .select(F.col("id_b").alias("id"))
            .distinct()
        )
        survivors = sizes.select("id", "s").join(near, "id", "left_anti")
        # (3) cross-set vs the standing posting index (absent on the first
        # epoch), current epoch excluded for crash-replay safety. The probe
        # uses the FULL batch posting list (already checkpointed) — a
        # within-batch-dropped id that also matches the corpus only adds a
        # drop-row the anti join below no longer carries, same as the text
        # service.
        if sess.catalog.tableExists(index_table):
            sess.catalog.refreshTable(index_table)
            sess.catalog.refreshTable(index_table + "_sizes")
            dups = (
                dedup.incremental_jaccard_against_index(
                    sess, index_table, None, "", "", threshold,
                    exclude_epoch=epoch_id, posting=posting,
                )
                .select(F.col("id_new").alias("id"))
                .distinct()
            )
            accepted = survivors.join(dups, "id", "left_anti")
        else:
            accepted = survivors
        # (4) publish replay-idempotently, then commit the marker
        accepted = accepted.localCheckpoint()
        accepted.select(
            F.col("id").alias("media_id"), F.col("s").cast("int").alias("n_frames")
        ).write.mode("overwrite").parquet(
            os.path.join(data_dir, f"epoch={epoch_id}")
        )
        accepted_posting = posting.join(accepted.select("id"), "id", "semi")
        dedup.append_dedup_index_epoch(
            sess, index_table, None, "", "", epoch_id,
            n_buckets=n_buckets, posting=accepted_posting,
        )
        with open(marker, "w") as f:
            f.write(json.dumps(fp))

    reader = spark.readStream.schema(MEDIA_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    if spark.catalog.tableExists(index_table):
        spark.catalog.refreshTable(index_table)
        spark.catalog.refreshTable(index_table + "_sizes")
        if compact_after:
            dedup.compact_dedup_index(
                spark, index_table, committed_epochs(accepted_dir)
            )
    return epochs


def takedown_accepted_media(
    spark: SparkSession,
    accepted_dir: str,
    index_table: str,
    ids: DataFrame,
) -> int:
    """Service-level TAKEDOWN (GDPR / data-removal): remove the given media
    ids from BOTH halves of the service's state — the persisted signature
    index (``dedup.takedown_sig_index``: only affected epoch partitions
    rewritten) and the accepted-corpus store (the epoch-partitioned parquet
    under ``accepted_dir/data``, rewritten per affected epoch). Returns
    corpus rows removed. Convergent on crash re-run — every step is
    delete-only; a crash between the index and corpus halves leaves the id
    unmatchable (index already clean) and the corpus re-run finishes the
    cleanup. Epoch markers are NOT touched: they fingerprint the INPUT
    batches (replay/collision protection), not the retained output, and a
    takedown must never make a crashed epoch replayable. After a takedown
    the same content re-submitted under a new id is accepted — the service
    semantics demanded by removal requests (pinned in test_takedown.py
    for the index half; the corpus half here keeps storage in step).
    A takedown arriving before ANY ingestion (no index table yet) is a
    no-op returning 0 — the unknown-id contract, not an error."""
    if spark.catalog.tableExists(index_table) and "sig" not in spark.table(
        index_table
    ).columns:
        raise ValueError(
            f"takedown_accepted_media expects the SIGNATURE-mode index "
            f"(id, sig, band); table {index_table!r} has no sig column — "
            "for a run_streaming_video_dedup (posting-mode) service use "
            "takedown_accepted_video, which also cleans the _sizes table"
        )
    dedup.takedown_sig_index(spark, index_table, ids)  # index half first
    return index_lifecycle.remove_ids_from_partitioned_dir(
        spark, os.path.join(accepted_dir, "data"), "media_id", ids
    )


def takedown_accepted_video(
    spark: SparkSession,
    accepted_dir: str,
    index_table: str,
    ids: DataFrame,
) -> int:
    """Service-level TAKEDOWN for the VIDEO (posting-mode) service: removes
    the given media ids from the posting index AND its ``_sizes`` side
    table (``dedup.takedown_dedup_index`` — the sig-mode wrapper would
    silently leave per-id size rows behind) and from the accepted-corpus
    store. Same contract as ``takedown_accepted_media``: delete-only,
    convergent on crash re-run, markers untouched, re-submission under a
    new id accepted afterwards. Returns corpus rows removed."""
    dedup.takedown_dedup_index(spark, index_table, ids)
    return index_lifecycle.remove_ids_from_partitioned_dir(
        spark, os.path.join(accepted_dir, "data"), "media_id", ids
    )
