"""Takedown scale measurement (round 8, SCALE.md).

``python tools/takedown_scale.py [n_total] [n_epochs]`` (default 9M, 10)

Builds a signature index of ``n_total`` pseudo-random sigs as ``n_epochs``
equal epoch partitions, then measures ``takedown_sig_index`` wall time for
1,000 ids (a) all inside ONE epoch and (b) spread uniformly across ALL
epochs — the claim under test is that cost rides the AFFECTED PARTITIONS'
row mass (an epoch-partition rewrite), not the takedown's id count, so (a)
≈ 1/n_epochs of (b). Prints ONE JSON line.
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

TABLE = "t_scale_takedown_sig_idx"


def build(spark, n_total: int, n_epochs: int) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    per = n_total // n_epochs
    for k in range(n_epochs):
        sigs = spark.range(k * per, (k + 1) * per).select(
            F.col("id"), F.xxhash64("id").alias("sig")
        )
        D.append_sig_index_epoch(spark, TABLE, sigs, epoch=k)


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 9_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="takedown_scale")
    spark.sparkContext.setLogLevel("ERROR")
    per = n_total // n_epochs

    build(spark, n_total, n_epochs)
    one_epoch_ids = spark.range(1000)  # ids 0..999 all live in epoch 0
    t0 = time.perf_counter()
    removed_one = D.takedown_sig_index(spark, TABLE, one_epoch_ids)
    t_one = round(time.perf_counter() - t0, 3)

    build(spark, n_total, n_epochs)  # fresh index
    spread_ids = spark.range(1000).select((F.col("id") * (per // 100)).alias("id"))
    t0 = time.perf_counter()
    removed_spread = D.takedown_sig_index(spark, TABLE, spread_ids)
    t_spread = round(time.perf_counter() - t0, 3)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    print(
        json.dumps(
            {
                "metric": "sig_index_takedown",
                "corpus_sigs": n_total,
                "n_epochs": n_epochs,
                "ids_removed": 1000,
                "one_epoch_affected_sec": t_one,
                "one_epoch_band_rows_removed": removed_one,
                "all_epochs_affected_sec": t_spread,
                "all_epochs_band_rows_removed": removed_spread,
                "partition_locality_ratio": round(t_spread / t_one, 2)
                if t_one
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
