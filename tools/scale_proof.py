"""Scaling PROOF tier (r14, VERDICT item 4): every committed testdata parquet
is a single row group, so a scan is 1 task by physics and the bench's
32-vs-8-core ratios sit at ~1.0 no matter how parallel the plans are. This
tool manufactures a tier where parallelism is MEASURABLE — lineitem replicated
``--factor`` times (~4 GB, written as ``--files`` independent parquet files so
the default 128 MB splits yield 30+ scan tasks) — and times the scan-heavy
lineitem-only headline queries at two core counts in separate processes.

The point being proven: the r13 restoration of Spark's default split sizing
(``spark.sql.files.maxPartitionBytes=128m``) makes scan work scale with cores
on multi-row-group input, i.e. the engine's flat sf0.1 scaling curve is a
fixture artifact, not serial code.

Usage:
  python tools/scale_proof.py build  [--out DIR] [--factor 400] [--files 40]
  python tools/scale_proof.py time   DIR [--queries a,b] [--laps 3]   # honors SPARK_GRAFT_CPUS
  python tools/scale_proof.py run    [--out DIR] [--cpus 32,8] [--json OUT]

``run`` builds the tier if absent, then launches one ``time`` subprocess per
core count (a fresh JVM per count — local[N] is fixed at session start) and
prints the per-query ratios. Timing is bench methodology: noop sink, one cold
pass, min of ``--laps`` warm laps.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_OUT = "/tmp/scale_proof_tier_v2"
# scan+aggregate (lineitem, decode-bound) plus a compute-bound string query
# (documents): together they separate "does the plan parallelize" from
# "where does this box's scan path saturate"
DEFAULT_QUERIES = "q1_pricing_summary,tpch_q6_forecast_revenue,text_stats"
SCALED_TABLES = ("lineitem", "documents")
SRC_SF = "/root/testdata/sf0.1"


def cmd_build(out: str, factor: int, files: int) -> None:
    from pyspark.sql import functions as F

    from snapshot_sender_spark.session import get_spark

    done = os.path.join(out, "_BUILD_DONE")
    if os.path.exists(done):
        print(f"tier already built: {out}")
        return
    spark = get_spark(app_name="scale_proof_build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for table in SCALED_TABLES:
        src = spark.read.parquet(os.path.join(SRC_SF, f"{table}.parquet"))
        big = (
            src.crossJoin(
                F.broadcast(spark.range(factor).withColumnRenamed("id", "_rep"))
            )
            .drop("_rep")
            .repartition(files)
        )
        big.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    # the other tables are not scaled; symlinks keep the dir a complete
    # sf-tier for any table a query touches
    for name in os.listdir(SRC_SF):
        dst = os.path.join(out, name)
        if name not in [f"{t}.parquet" for t in SCALED_TABLES] and not os.path.exists(dst):
            os.symlink(os.path.join(SRC_SF, name), dst)
    with open(done, "w") as fh:
        fh.write(f"factor={factor} files={files} tables={','.join(SCALED_TABLES)}\n")
    for table in SCALED_TABLES:
        n = spark.read.parquet(os.path.join(out, f"{table}.parquet")).count()
        print(f"built {out}: {table} rows={n}, files={files}, factor={factor}")


def cmd_time(sf_dir: str, queries: list[str], laps: int) -> None:
    from snapshot_sender_spark.queries import all_queries
    from snapshot_sender_spark.session import get_spark

    spark = get_spark(app_name="scale_proof_time")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    out: dict = {
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "queries": {},
        "scan_tasks": {},
    }
    for q in queries:
        fn = registry[q].fn
        spark.sparkContext.setJobDescription(f"scale_proof:{q}:cold")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # cold
        best = float("inf")
        for lap in range(laps):
            spark.sparkContext.setJobDescription(f"scale_proof:{q}:warm{lap}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out["queries"][q] = round(best, 3)
    # scan-task count at this core count (the mechanism being proven)
    for table in SCALED_TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        out["scan_tasks"][table] = df.rdd.getNumPartitions()
    print("SCALEPROOF " + json.dumps(out, separators=(",", ":")))


def cmd_run(out: str, cpus_list: list[int], queries: list[str], laps: int,
            json_out: str | None, factor: int, files: int) -> None:
    if not os.path.exists(os.path.join(out, "_BUILD_DONE")):
        cmd_build(out, factor, files)
    results = {}
    for cpus in cpus_list:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "time", out,
             "--queries", ",".join(queries), "--laps", str(laps)],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("SCALEPROOF ")),
            None,
        )
        if line is None:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"time subprocess at cpus={cpus} printed no result")
        results[str(cpus)] = json.loads(line[len("SCALEPROOF "):])
    summary = {"tier": out, "laps": laps, "runs": results, "ratios": {}}
    counts = sorted(int(c) for c in results)
    lo, hi = str(counts[0]), str(counts[-1])
    for q in queries:
        t_lo, t_hi = results[lo]["queries"][q], results[hi]["queries"][q]
        summary["ratios"][q] = {
            f"c{lo}_sec": t_lo,
            f"c{hi}_sec": t_hi,
            "speedup_hi_over_lo": round(t_lo / t_hi, 2) if t_hi else None,
        }
    print(json.dumps(summary, indent=1))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(summary, fh, indent=1)
            fh.write("\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--out", default=DEFAULT_OUT)
    b.add_argument("--factor", type=int, default=400)
    b.add_argument("--files", type=int, default=40)
    t = sub.add_parser("time")
    t.add_argument("sf_dir")
    t.add_argument("--queries", default=DEFAULT_QUERIES)
    t.add_argument("--laps", type=int, default=3)
    r = sub.add_parser("run")
    r.add_argument("--out", default=DEFAULT_OUT)
    r.add_argument("--cpus", default="32,8")
    r.add_argument("--queries", default=DEFAULT_QUERIES)
    r.add_argument("--laps", type=int, default=3)
    r.add_argument("--json", default=None)
    r.add_argument("--factor", type=int, default=400)
    r.add_argument("--files", type=int, default=40)
    a = ap.parse_args()
    if a.cmd == "build":
        cmd_build(a.out, a.factor, a.files)
    elif a.cmd == "time":
        cmd_time(a.sf_dir, a.queries.split(","), a.laps)
    else:
        cmd_run(a.out, [int(c) for c in a.cpus.split(",")], a.queries.split(","),
                a.laps, a.json, a.factor, a.files)


if __name__ == "__main__":
    main()
