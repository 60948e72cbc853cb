"""Continuous TAKEDOWN service (round 8): data-removal requests arrive as a
stream of (id) rows — the operational form of GDPR/right-to-be-forgotten
processing — and each micro-batch removes those ids from BOTH halves of a
dedup service's state (persisted index + accepted corpus) through the
round-8 takedown operators, then commits an AUDIT MANIFEST per batch.

Contract mirrors the ingestion services: per-batch markers under
``accepted_dir/_takedowns`` fast-skip replayed batches after verifying the
request fingerprint (epoch-collision guard), and the underlying removals
are delete-only and convergent — a crash anywhere re-runs to the same
state, so the marker is audit + fast-skip, never the only idempotence
guard. The manifest records what compliance needs: request count, request
fingerprint, and corpus rows actually removed (0 for ids that never
existed or were already removed — takedown of an unknown id is a no-op by
design, not an error, because removal requests routinely outlive the
data).

MANIFEST SCHEMA NOTE — ``corpus_rows_removed`` is REPLAY-SENSITIVE: it is
measured at commit-attempt time, so if the process crashes AFTER the
removals but BEFORE the marker write, the replayed batch re-runs against
already-cleaned state and commits 0 for a takedown that actually removed
rows. The REMOVAL itself is exactly-once-equivalent either way (delete-only
and convergent); only the audit COUNT can under-report under that crash
window. Counting matches before removing in the same run is inherently racy
(rows can be removed between the count and the delete), so instead every
manifest carries ``"rows_removed_semantics": "as-of-this-run"`` to make the
caveat machine-readable; auditors needing exact counts should reconcile
against the pre-takedown corpus snapshot.

Three kinds, matching the ingestion services:
  "docs"   text service   — posting index (+sizes), corpus keyed doc_id
  "media"  signature mode — per-band sig index, corpus keyed media_id
  "video"  posting mode   — posting index (+sizes), corpus keyed media_id
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index_lifecycle
from . import dedup_stream, media_dedup_stream

REQUEST_SCHEMA = "id long"

_KINDS = {
    "docs": lambda spark, acc, table, ids: dedup_stream.takedown_accepted_docs(
        spark, acc, table, ids
    ),
    "media": lambda spark, acc, table, ids: media_dedup_stream.takedown_accepted_media(
        spark, acc, table, ids
    ),
    "video": lambda spark, acc, table, ids: media_dedup_stream.takedown_accepted_video(
        spark, acc, table, ids
    ),
}

__all__ = ["run_streaming_takedown", "takedown_manifests", "REQUEST_SCHEMA"]


def takedown_manifests(accepted_dir: str) -> dict[int, dict]:
    """Committed takedown audit manifests by batch id."""
    tdir = os.path.join(accepted_dir, "_takedowns")
    if not os.path.isdir(tdir):
        return {}
    out = {}
    for name in sorted(os.listdir(tdir)):
        if name.startswith("batch_") and name.endswith(".json"):
            with open(os.path.join(tdir, name)) as fh:
                out[int(name[len("batch_"):-len(".json")])] = json.load(fh)
    return out


def run_streaming_takedown(
    spark: SparkSession,
    requests_dir: str,
    accepted_dir: str,
    index_table: str,
    checkpoint_dir: str,
    kind: str = "media",
    max_files_per_trigger: int | None = None,
) -> list[int]:
    """Drive takedown processing to completion over currently-available
    removal-request files (Trigger.AvailableNow). Returns processed batch
    ids. Each batch: verify-or-commit the request fingerprint, run the
    ``kind``'s service-level takedown (index + corpus, delete-only,
    convergent), write the audit manifest."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {sorted(_KINDS)}, got {kind!r}")
    takedown = _KINDS[kind]
    tdir = os.path.join(accepted_dir, "_takedowns")
    os.makedirs(tdir, exist_ok=True)
    batches: list[int] = []

    def process(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(tdir, f"batch_{int(batch_id)}.json")
        fp = index_lifecycle.batch_fingerprint(batch, "id")
        if os.path.exists(marker):
            with open(marker) as fh:
                committed = json.load(fh)
            prev = {"n": committed["n"], "x": committed["x"]}
            if prev != fp:
                raise RuntimeError(
                    f"takedown batch {batch_id} manifest exists but its request "
                    f"fingerprint {prev} != this batch's {fp}: batch ids have "
                    "collided across checkpoint generations. Refusing to skip "
                    "new removal requests or double-book the audit trail."
                )
            return
        batches.append(batch_id)
        sess = batch.sparkSession
        ids = batch.select("id").distinct().localCheckpoint()
        removed = takedown(sess, accepted_dir, index_table, ids)
        # ATOMIC commit (tmp + rename): a crash mid-write must leave either
        # no marker (replay re-runs the convergent removals) or a complete
        # one — a truncated marker would make every replay die in json.load
        # instead of taking the designed fingerprint-verify path
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "n": fp["n"],
                    "x": fp["x"],
                    "kind": kind,
                    "distinct_ids": ids.count(),
                    "corpus_rows_removed": int(removed),
                    # replay-sensitivity marker — see module docstring: a
                    # crash after the removals but before this write replays
                    # the batch against cleaned state and records 0 here
                    "rows_removed_semantics": "as-of-this-run",
                },
                fh,
            )
        os.replace(tmp, marker)

    reader = spark.readStream.schema(REQUEST_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(requests_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    if spark.catalog.tableExists(index_table):
        spark.catalog.refreshTable(index_table)
        if spark.catalog.tableExists(index_table + "_sizes"):
            spark.catalog.refreshTable(index_table + "_sizes")
    return batches
