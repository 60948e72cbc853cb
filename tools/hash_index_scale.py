"""Persisted hash-index epoch-probe scale measurement (round 7, SCALE.md).

``python tools/hash_index_scale.py <sf_dir> [span|chunk|both]``

Steady-state service shape, mirroring tools/service_scale.py's dedup mode:
the tier's documents split 90/10 by doc_id — the 90% becomes the standing
persisted distinct-hash index (UNTIMED setup: that cost is paid once per
epoch at ingest, not per probe), the 10% plays one incoming epoch. Timed,
cold + best-of-2 warm, forced end-to-end through the noop sink:

* ``index_probe``  — incremental_*_against_index: batch hashed once, corpus
  read as bucket-aligned 16-byte hashes (the round-7 path).
* ``text_rescan``  — the pre-round-7 form: the standing corpus arrives as
  TEXT and is re-shingled/re-chunked inside the probe.

The delta is exactly what persisting the index buys per epoch; the
index_probe row should stay near-flat across tiers while text_rescan grows
with corpus token mass. Prints ONE JSON line per family; results feed
SCALE.md's round-7 table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from snapshot_sender_spark.operators import dedup as D
from snapshot_sender_spark.session import get_spark


def _lap(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _timed(build):
    cold = _lap(build())
    warm = min(_lap(build()) for _ in range(2))
    return cold, warm


def measure(spark, sf_dir: str, family: str, fixed_batch: bool = False) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    if fixed_batch:
        # constant epoch across tiers (gen_scale offsets replicated copies'
        # doc_ids by 1e7, so ids < 1e7 are the original 1x slice): the corpus
        # still grows 10x/100x but the incoming epoch does not — isolates the
        # corpus-side cost, which is exactly what the index removes
        batch = batch.filter(F.col("doc_id") < 10_000_000)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    table = f"t_scale_{family}_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    t0 = time.perf_counter()
    if family == "span":
        hashes = D.substring_index_hashes(corpus, "text", "doc_id", k=5)
    else:
        hashes = D.chunk_index_hashes(corpus, "text", "doc_id", k=8)
    # one standing epoch: the build cost is reported but untimed in the
    # probe rows (a real service pays it incrementally, epoch by epoch)
    D.append_hash_index_epoch(spark, table, hashes, epoch=0, n_buckets=8)
    build_s = round(time.perf_counter() - t0, 3)
    index_rows = spark.table(table).count()

    if family == "span":
        probe = lambda: D.incremental_span_stats_against_index(  # noqa: E731
            spark, table, batch, "text", "doc_id", k=5, min_count=2
        )
        rescan = lambda: D.incremental_span_stats(  # noqa: E731
            batch, corpus, "text", "doc_id", k=5, min_count=2
        )
    else:
        probe = lambda: D.incremental_chunk_dedup_against_index(  # noqa: E731
            spark, table, batch, "text", "doc_id", k=8
        )
        rescan = lambda: D.incremental_chunk_dedup(  # noqa: E731
            batch, corpus, "text", "doc_id", k=8
        )

    probe_cold, probe_warm = _timed(probe)
    if os.environ.get("HASH_SCALE_RESCAN_COLD_ONLY"):
        # 1000x tier: the re-scan takes minutes per lap and only serves as
        # the pre-round-7 contrast — one cold lap is the honest (and
        # conservative: cold > warm) comparison point
        rescan_cold = _lap(rescan())
        rescan_warm = rescan_cold
    else:
        rescan_cold, rescan_warm = _timed(rescan)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    return {
        "family": family,
        "sf_dir": sf_dir,
        "corpus_docs": corpus.count(),
        "batch_docs": batch.count(),
        "index_rows": index_rows,
        "index_build_sec": build_s,
        "index_probe_cold_sec": probe_cold,
        "index_probe_warm_sec": probe_warm,
        "text_rescan_cold_sec": rescan_cold,
        "text_rescan_warm_sec": rescan_warm,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--fixed-batch"]
    fixed = "--fixed-batch" in sys.argv
    sf_dir = args[0]
    which = args[1] if len(args) > 1 else "both"
    spark = get_spark(app_name="hash_index_scale")
    spark.sparkContext.setLogLevel("ERROR")
    for family in ("span", "chunk") if which == "both" else (which,):
        out = measure(spark, sf_dir, family, fixed_batch=fixed)
        out["fixed_batch"] = fixed
        print(json.dumps(out))


if __name__ == "__main__":
    main()
