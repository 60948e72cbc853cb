"""Per-query profiling for the optimization rounds: split each headline
query's warm lap into DataFrame-construction time (Python + analysis) vs
noop-sink execution time, and dump `explain('formatted')` to
plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/profile_bench.py [--plans-dir plans/r13] [--suffix before]
                                     [--laps 3] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--laps", type=int, default=3)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args.queries.split(",") if args.queries else HEADLINE

    spark = get_spark(app_name="profile_bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    # cold pass (warms codegen/workers) — not reported
    for name in names:
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for lap in range(args.laps):
        for name in names:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rec = out.setdefault(name, {"build": [], "exec": []})
            rec["build"].append(round(t1 - t0, 3))
            rec["exec"].append(round(t2 - t1, 3))
            if lap == 0 and args.plans_dir:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
                ) as fh:
                    fh.write(plan)
        spark.sparkContext.setJobDescription(None)

    print(f"{'query':32s} {'build_min':>9s} {'exec_min':>9s} {'total_min':>9s}")
    total_b = total_e = 0.0
    for name in names:
        b = min(out[name]["build"])
        e = min(out[name]["exec"])
        total_b += b
        total_e += e
        print(f"{name:32s} {b:9.3f} {e:9.3f} {b + e:9.3f}")
    print(f"{'TOTAL':32s} {total_b:9.3f} {total_e:9.3f} {total_b + total_e:9.3f}")
    with open("/tmp/profile_bench.json", "w") as fh:
        json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
