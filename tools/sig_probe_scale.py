"""Signature-index PROBE scale measurement (round 8, SCALE.md) — the media
analog of tools/hash_index_scale.py, at tiers up to 1000×.

``python tools/sig_probe_scale.py [tiers...]`` (default 9000 90000 900000
9000000)

The probe cost is independent of the decode stage (after ingest, a medium
is 8 bytes of signature), so corpora are synthesized directly as (id,
xxhash64 sig) rows — pseudo-random 64-bit signatures are pairwise far
apart, matching the service-built index's pairwise > max_hamming guarantee.
Per tier: build the persisted per-band index (UNTIMED — paid incrementally
at ingest), then time ``banded_hamming_pairs_against_index`` for a FIXED
1,000-signature batch (the fixed-epoch shape: only the corpus grows —
isolating the corpus-side cost). Half the batch is engineered to hit
(corpus sigs with 2 flipped bits → hamming 2), half is novel, so matched
pair counts verify the run. Cold + best-of-2 warm through the noop sink.
Prints ONE JSON line per tier.
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

BATCH = 1000
TABLE = "t_scale_sig_probe_idx"


def _lap(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def measure(spark, n_corpus: int) -> dict:
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    corpus = spark.range(n_corpus).select(
        F.col("id"), F.xxhash64(F.col("id")).alias("sig")
    )
    t0 = time.perf_counter()
    D.append_sig_index_epoch(spark, TABLE, corpus, epoch=0)
    build_s = round(time.perf_counter() - t0, 3)
    index_rows = spark.table(TABLE).count()
    # fixed 1k batch: 500 engineered hits (corpus sigs, bits 5 and 40
    # flipped -> hamming 2), 500 novel
    hits = spark.range(500).select(
        (F.col("id") + 2_000_000_000).alias("id"),
        F.xxhash64(F.col("id") * 7 % n_corpus)
        .bitwiseXOR(F.lit(1 << 5))
        .bitwiseXOR(F.lit(1 << 40))
        .alias("sig"),
    )
    novel = spark.range(500).select(
        (F.col("id") + 3_000_000_000).alias("id"),
        F.xxhash64(F.col("id") - 12_345_678).alias("sig"),
    )
    batch = hits.unionByName(novel).localCheckpoint()
    probe = lambda: D.banded_hamming_pairs_against_index(  # noqa: E731
        spark, TABLE, batch, max_hamming=3
    )
    cold = _lap(probe())
    warm = min(_lap(probe()) for _ in range(2))
    matched = probe().count()
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    return {
        "metric": "sig_index_probe",
        "corpus_sigs": n_corpus,
        "index_band_rows": index_rows,
        "index_build_sec": build_s,
        "batch_sigs": BATCH,
        "probe_cold_sec": cold,
        "probe_warm_sec": warm,
        "matched_pairs": matched,
    }


def main() -> None:
    tiers = [int(a) for a in sys.argv[1:]] or [9_000, 90_000, 900_000, 9_000_000]
    spark = get_spark(app_name="sig_probe_scale")
    spark.sparkContext.setLogLevel("ERROR")
    for n in tiers:
        print(json.dumps(measure(spark, n)))


if __name__ == "__main__":
    main()
