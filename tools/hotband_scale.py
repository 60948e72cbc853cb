"""Hot-band guard scale measurement (round 8, SCALE.md).

``python tools/hotband_scale.py [max_exp]``

Adversarial corpus: N media whose signatures collapse to ONE value (the
blank-page / black-frame / silence shape) plus 1,000 distinct background
signatures. Measures the within-batch keeper decision:

* ``guarded``   — banded_hamming_dropped: identical signatures collapse to
  their min-id representative BEFORE banding, so the band join sees
  (1 + 1000) signatures regardless of N.
* ``unguarded`` — the pre-round-8 form (banded_hamming_pairs → distinct
  id_b): the hot band stages ~N²/2 × 4 candidate rows, quadratic in the
  hot population. Measured cold+warm while cheap (N ≤ 10^4), ONE COLD LAP
  at N ≤ 10^5 (~2×10^10 staged candidates — the SCALE.md 89.7 s number is
  measured, not extrapolated), and skipped with a documented candidate
  estimate above that.

Timed cold + best-of-2 warm through the noop sink. Prints ONE JSON line
per tier; results feed SCALE.md's round-8 table.
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

UNGUARDED_MAX = 10_000
UNGUARDED_COLD_ONLY_MAX = 100_000


def _lap(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _timed(build):
    cold = _lap(build())
    warm = min(_lap(build()) for _ in range(2))
    return cold, warm


def _corpus(spark, n_hot: int):
    """n_hot members of ONE signature + 1000 distinct background sigs
    (pairwise far apart: distinct high-32-bit patterns)."""
    hot = spark.range(n_hot).select(
        F.col("id"), F.lit(0x00FF00FF00FF00FF).cast("long").alias("sig")
    )
    bg = spark.range(1000).select(
        (F.col("id") + 1_000_000_000).alias("id"),
        F.xxhash64(F.col("id") + 7).alias("sig"),
    )
    return hot.unionByName(bg).localCheckpoint()


def measure(spark, n_hot: int) -> dict:
    sigs = _corpus(spark, n_hot)
    g_cold, g_warm = _timed(lambda: D.banded_hamming_dropped(sigs, max_hamming=3))
    row = {
        "metric": "hotband_keeper_decision",
        "n_hot": n_hot,
        "n_background": 1000,
        "guarded_cold_sec": g_cold,
        "guarded_warm_sec": g_warm,
    }
    unguarded = lambda: (  # noqa: E731
        D.banded_hamming_pairs(sigs, max_hamming=3)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    if n_hot <= UNGUARDED_MAX:
        u_cold, u_warm = _timed(unguarded)
        row["unguarded_cold_sec"] = u_cold
        row["unguarded_warm_sec"] = u_warm
        row["speedup_warm"] = round(u_warm / g_warm, 1) if g_warm else None
    elif n_hot <= UNGUARDED_COLD_ONLY_MAX:
        # one cold lap only — the ~N²×4/2 staged candidates make warm laps
        # a pointless repeat of a minutes-long run
        row["unguarded_cold_sec"] = _lap(unguarded())
        row["speedup_cold"] = (
            round(row["unguarded_cold_sec"] / g_warm, 1) if g_warm else None
        )
    else:
        row["unguarded"] = (
            f"skipped: ~{(n_hot * n_hot // 2) * 4:.0e} staged candidates"
        )
    return row


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark()
    for exp in range(3, max_exp + 1):
        print(json.dumps(measure(spark, 10**exp)))


if __name__ == "__main__":
    main()
