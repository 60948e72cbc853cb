"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Numbers are STEADY-STATE: every headline query runs once
untimed (plan compilation, whole-stage codegen, Python-worker/numpy boot,
streaming state-store class load), then the timed run measures execution.
First-run plan-compile latency is a per-query constant that vanishes at real
data scale; at sf0.1 it would be 50-70% of every number and mostly measure
JIT noise, not the operators.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from snapshot_sender_spark.queries import all_queries  # noqa: E402
from snapshot_sender_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "join_inner_3way",
    "join_range_theta",
    "join_asof_last_click",
    "agg_rollup",
    "window_topk_per_group",
    "window_running_sum",
    "sort_topk_global",
    "json_funcs",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding_pairs",
    "sim_cosine_topk",
    "text_stats",
    "stream_tumbling_counts",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    # warmup pass: run every headline query once untimed — compiles plans,
    # JITs codegen, boots the reused Python workers (numpy import), loads
    # streaming state-store classes. The timed pass below measures execution.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()
    for name in HEADLINE:
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best of two timed laps: the machine is shared, and a single GC pause or
    # CPU-contention spike otherwise lands on one unlucky query per round
    timings = {}
    for _lap in range(2):
        for name in HEADLINE:
            qd = registry[name]
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    # The reference's own integration workload (100 files × 1,000 records,
    # s3_files.py:25-26): full pipeline — scan ⋈ metadata → anti-join → key
    # lookup → AES-CTR decrypt → gunzip → parse → per-file counts. The
    # reference ships this with 10 threads / chunk-size 1; this is the direct
    # architecture-class comparison from BASELINE.md §B.
    import shutil
    import tempfile

    from snapshot_sender_spark.plans import delivery as dlv
    from snapshot_sender_spark.sources import fixtures as fx

    from snapshot_sender_spark.util import write_once

    fixture_root = os.path.join(tempfile.gettempdir(), "bench_pipeline_100x1000_v1")
    write_once(
        fixture_root,
        lambda tmp: fx.generate(tmp, n_files=100, records_per_file=1000, seed=42),
        probe=os.path.join(fixture_root, "input", "metadata.sidecar.jsonl"),  # written last
    )
    status_dir = tempfile.mkdtemp(prefix="bench_status_")
    try:
        cfg = dlv.RunConfig(correlation_id="bench", topic_name="db.core.claimant",
                            reprocess_files=True)
        # warm the full path twice — file-status listing, decrypt-UDF worker
        # pool growth (cryptography import ×32 workers), from_json codegen:
        # measured, the second lap still pays one-time JIT/worker costs and
        # the third is steady state, which is what this number reports
        for _ in range(2):
            dlv.parse_records(
                dlv.build_decrypted(
                    spark, os.path.join(fixture_root, "input"), status_dir, cfg
                ).delivered
            ).count()
        for _lap in range(2):
            t0 = time.perf_counter()
            result = dlv.build_decrypted(
                spark, os.path.join(fixture_root, "input"), status_dir, cfg
            )
            n = dlv.parse_records(result.delivered).count()
            dt = round(time.perf_counter() - t0, 3)
            prev = timings.get("delivery_pipeline_100x1000")
            if prev is None or dt < prev:
                timings["delivery_pipeline_100x1000"] = dt
            assert n == 100 * 1000, n
    finally:
        shutil.rmtree(status_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
