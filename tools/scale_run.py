"""Scaling spot-run: time the most expensive headline queries across testdata
tiers and print per-tier wall-times + the fitted per-query scaling exponent
(log-log slope). ``python tools/scale_run.py <dir1> <dir2> [dir3...]`` — dirs
must be in increasing size order; results feed SCALE.md.

Method matches bench.py's frozen warm methodology: per tier, one untimed cold
pass (plan compile/JIT) then best-of-2 timed laps, forced end-to-end through
the noop sink.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from snapshot_sender_spark.queries import all_queries
from snapshot_sender_spark.session import get_spark

QUERIES = [
    "q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "join_inner_3way",
    "window_topk_per_group",
    "text_stats",
    "sim_cosine_topk",
    "stream_tumbling_counts",
    "dedup_exact",
    "dedup_minhash_banded",
    "dedup_ngram_jaccard_shuffle",
    "dedup_ngram_jaccard",
]


def rows_of(spark, d: str) -> int:
    return spark.read.parquet(f"{d}/lineitem.parquet").count()


def main() -> None:
    global QUERIES
    args = sys.argv[1:]
    if "--queries" in args:
        i = args.index("--queries")
        QUERIES = args[i + 1].split(",")
        args = args[:i] + args[i + 2 :]
    dirs = args
    spark = get_spark(app_name="scale_run")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    sizes = {d: rows_of(spark, d) for d in dirs}
    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for d in dirs:
        for q in QUERIES:
            registry[q].fn(spark, d).write.format("noop").mode("overwrite").save()  # cold
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                registry[q].fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[q][d] = round(best, 3)
            print(f"{q} @ {d}: {results[q][d]}s", file=sys.stderr)
    exponents = {}
    d0, dN = dirs[0], dirs[-1]
    for q in QUERIES:
        ratio_t = results[q][dN] / results[q][d0]
        ratio_n = sizes[dN] / sizes[d0]
        exponents[q] = round(math.log(ratio_t) / math.log(ratio_n), 3)
    print(json.dumps({"sizes": sizes, "times": results, "exponent": exponents}))


if __name__ == "__main__":
    main()
