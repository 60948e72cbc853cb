"""Scale measurements for the transactional table format (operators/txlog.py).

``python tools/txlog_scale.py [sf_dir]`` replicates the sf0.1 events table
1×/10×/100× by key-offset (the gen_scale.py recipe, inlined so the run is
self-contained) and measures, per tier:

  * stats pruning — files planned for a 1-user-shard predicate vs total, and
    the wall-clock of the pruned read vs the full-scan filter (equal results
    asserted);
  * copy-on-write delete — fraction of files rewritten for a single-user
    takedown on a user-clustered layout, and its wall-clock;
  * incremental aggregate maintenance — folding ONE appended delta vs
    recomputing the aggregate from the whole table (equal results asserted);
  * commit metadata costs — 100 sequential appends, then the latest-snapshot
    replay time at 100 versions (O(versions) metadata, never data).

Prints one human table; used for the SCALE.md txlog section.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from snapshot_sender_spark.operators.txlog import TxTable
from snapshot_sender_spark.session import get_spark
from snapshot_sender_spark.tables import load


def build_events(spark, sf_dir: str, mult: int):
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    if mult == 1:
        return ev
    copies = spark.range(mult).withColumnRenamed("id", "copy")
    return (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * F.lit(10**9)).alias("event_id"),
            (F.col("user_id") + F.col("copy") * F.lit(10**5)).alias("user_id"),
            "event_type",
            "value",
        )
    )


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def run_tier(spark, sf_dir: str, mult: int, n_files: int = 64) -> dict:
    work = tempfile.mkdtemp(prefix=f"txlog_scale_{mult}x_")
    t = TxTable(spark, os.path.join(work, "events_tx"))
    ev = build_events(spark, sf_dir, mult)
    _, t_write = timed(lambda: t.append(ev.repartitionByRange(n_files, "user_id"), ts=1.0))
    total_files = len(t.snapshot().live_paths())
    total_rows = t.snapshot().total_rows()

    # --- stats pruning: one user shard ---------------------------------------
    lo, hi = 500, 520
    pruned_files = len(t.candidate_files(prune=[("user_id", lo, hi)]))
    agg = lambda df: df.where(F.col("user_id").between(lo, hi)).agg(
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]
    full_res, t_full = timed(lambda: agg(t.read()))
    pruned_res, t_pruned = timed(lambda: agg(t.read(prune=[("user_id", lo, hi)])))
    assert (full_res["n"], full_res["s"]) == (pruned_res["n"], pruned_res["s"]), (
        full_res, pruned_res,
    )

    # --- copy-on-write delete: single-user takedown ---------------------------
    before = set(t.snapshot().live_paths())
    _, t_del = timed(lambda: t.delete_where("user_id = 510", ts=2.0))
    after = set(t.snapshot().live_paths())
    rewritten = len(before - after)

    # --- incremental maintenance vs full recompute ----------------------------
    delta = build_events(spark, sf_dir, 1).limit(10_000).withColumn(
        "event_id", F.col("event_id") + F.lit(5 * 10**12)
    )
    v_before = t.latest_version()
    t.append(delta.coalesce(1), ts=3.0)
    snap = t.snapshot()

    def fold_delta():
        out = {}
        for _v, _op, added, removed in t.changes(v_before, snap.version):
            for rels, sign in ((added, 1), (removed, -1)):
                if not rels:
                    continue
                for r in (
                    t.read_files(rels, snap.schema())
                    .groupBy("event_type")
                    .agg(F.count("*").alias("c"))
                    .collect()
                ):
                    out[r["event_type"]] = out.get(r["event_type"], 0) + sign * r["c"]
        return out

    def recompute():
        return {
            r["event_type"]: r["c"]
            for r in t.read().groupBy("event_type").agg(F.count("*").alias("c")).collect()
        }

    inc, t_inc = timed(fold_delta)
    full, t_recompute = timed(recompute)
    # folded delta + (pre-append full state) must equal the recompute
    pre = {
        r["event_type"]: r["c"]
        for r in t.read(version=v_before)
        .groupBy("event_type")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    merged = {k: pre.get(k, 0) + inc.get(k, 0) for k in set(pre) | set(inc)}
    assert merged == full, (merged, full)

    shutil.rmtree(work, ignore_errors=True)
    return {
        "mult": mult,
        "rows": total_rows,
        "files": total_files,
        "t_write": t_write,
        "pruned_files": pruned_files,
        "t_full": t_full,
        "t_pruned": t_pruned,
        "rewritten": rewritten,
        "t_del": t_del,
        "t_inc": t_inc,
        "t_recompute": t_recompute,
    }


def commit_metadata_costs(spark) -> tuple[float, float]:
    work = tempfile.mkdtemp(prefix="txlog_scale_meta_")
    t = TxTable(spark, os.path.join(work, "meta_tx"))
    one = spark.range(0, 10).coalesce(1)
    t0 = time.monotonic()
    for i in range(100):
        t.append(one, ts=float(i))
    per_commit = (time.monotonic() - t0) / 100
    t0 = time.monotonic()
    snap = t.snapshot()
    replay = time.monotonic() - t0
    assert snap.version == 100 and len(snap.live_paths()) == 100
    shutil.rmtree(work, ignore_errors=True)
    return per_commit, replay


def stream_source_throughput(spark, sf_dir: str, mult: int = 10) -> None:
    """rows/s through the txlog_stream Python DataSource (AvailableNow full
    history into a file sink) — the Python-decode tradeoff documented the
    same way as the Avro source's."""
    from snapshot_sender_spark.sources.txlog_stream import register

    register(spark)
    work = tempfile.mkdtemp(prefix="txlog_stream_scale_")
    t = TxTable(spark, os.path.join(work, "tab"))
    ev = build_events(spark, sf_dir, mult)
    t.append(ev.repartition(32), ts=1.0)
    rows = t.snapshot().total_rows()
    t0 = time.monotonic()
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(work, "out"))
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    q.awaitTermination()
    dt = time.monotonic() - t0
    got = spark.read.parquet(os.path.join(work, "out")).count()
    assert got == rows, (got, rows)
    print(
        f"stream source: {rows:,} rows / 32 files in {dt:.1f}s "
        f"({rows/dt/1000:.0f}k rows/s, one partition per file)"
    )
    shutil.rmtree(work, ignore_errors=True)


def cdf_stream_throughput(spark, sf_dir: str, mult: int = 10) -> None:
    """CDF-mode vs base-mode stream throughput on an APPEND-HEAVY log (the
    round-12 vectorization check: insert partitions must decode at the base
    reader's Arrow speed — the r11 per-row-Python path was ~10×+ slower),
    plus one rewrite commit streamed through the bounded digest diff."""
    from snapshot_sender_spark.sources.txlog_stream import register

    register(spark)
    work = tempfile.mkdtemp(prefix="txlog_cdf_scale_")
    t = TxTable(spark, os.path.join(work, "tab"))
    ev = build_events(spark, sf_dir, mult)
    for i in range(4):  # append-heavy: 4 commits, 8 files each
        t.append(ev.where(F.col("event_id") % 4 == i).repartition(8), ts=float(i + 1))
    rows = t.snapshot().total_rows()

    def drain(sub: str, **opts) -> float:
        t0 = time.monotonic()
        r = spark.readStream.format("txlog_stream").option("path", t.path)
        for k, v in opts.items():
            r = r.option(k, v)
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", os.path.join(work, f"out_{sub}"))
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(work, f"ckpt_{sub}"))
            .start()
        )
        q.awaitTermination()
        return time.monotonic() - t0

    t_base = drain("base")
    t_cdf = drain("cdf", read_changes="true")
    got_base = spark.read.parquet(os.path.join(work, "out_base")).count()
    got_cdf = spark.read.parquet(os.path.join(work, "out_cdf")).count()
    assert got_base == rows and got_cdf == rows, (got_base, got_cdf, rows)
    print(
        f"append-heavy log ({rows:,} rows, 4 commits x 8 files):\n"
        f"  base stream  {t_base:.1f}s ({rows/t_base/1000:.0f}k rows/s)\n"
        f"  CDF stream   {t_cdf:.1f}s ({rows/t_cdf/1000:.0f}k rows/s)"
        f"  -> CDF/base = {t_cdf/t_base:.2f}x"
    )
    # one rewrite commit: COW-delete a slice, stream only the delta
    t.delete_where("event_id % 1000 = 0", ts=10.0, mode="cow")
    t0 = time.monotonic()
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", t.path).option("read_changes", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(work, "out_cdf"))
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work, "ckpt_cdf"))
        .start()
    )
    q.awaitTermination()
    t_diff = time.monotonic() - t0
    n_del = (
        spark.read.parquet(os.path.join(work, "out_cdf"))
        .where("_change_type = 'delete'").count()
    )
    print(
        f"rewrite commit (digest diff over {rows:,}-row table): {t_diff:.1f}s, "
        f"{n_del:,} deletes streamed"
    )
    shutil.rmtree(work, ignore_errors=True)


def commit_stats_tier(spark, sf_dir: str) -> None:
    """Commit control-plane cost vs FILE COUNT (round-12 verdict #6): the
    stats harvest runs as one distributed job past 16 files, so the
    post-write control plane (rename + footer stats + log write) should
    grow sublinearly in files, not as a serial O(files) driver loop. The
    same 1M rows are committed as 8 / 64 / 256 files; data-write cost is
    reported separately (identical bytes each tier) so the control-plane
    movement is attributable."""
    ev = build_events(spark, sf_dir, 10)
    print("| files | total append s | s/file |")
    print("|---|---|---|")
    for n_files in (8, 64, 256):
        work = tempfile.mkdtemp(prefix=f"txlog_cstats_{n_files}_")
        t = TxTable(spark, os.path.join(work, "tab"))
        _, dt = timed(lambda: t.append(ev.repartition(n_files), ts=1.0))
        assert len(t.snapshot().live_paths()) == n_files
        print(f"| {n_files} | {dt:.1f} | {dt/n_files*1000:.0f} ms |")
        shutil.rmtree(work, ignore_errors=True)


def merge_tier(spark, sf_dir: str, mult: int = 100, n_files: int = 64) -> None:
    """COW MERGE cost at 10M rows: update one user shard (~0.03% of keys,
    clustered into few files) and insert five deterministic new keys —
    rewritten file fraction + wall-clock; the updated-row and inserted-row
    counts are asserted EXACTLY (the source is deterministic: no LIMIT)."""
    work = tempfile.mkdtemp(prefix="txlog_merge_scale_")
    t = TxTable(spark, os.path.join(work, "tab"))
    ev = build_events(spark, sf_dir, mult)
    t.append(ev.repartitionByRange(n_files, "user_id"), ts=1.0)
    before = set(t.snapshot().live_paths())
    base = build_events(spark, sf_dir, 1)
    updates = base.where(F.col("user_id") == 510).withColumn(
        "value", F.lit(10**6).cast("double")
    )
    inserts = base.where(F.col("event_id") < 5).withColumn(
        "event_id", F.col("event_id") + F.lit(9 * 10**14)
    )
    n_upd, n_ins = updates.count(), inserts.count()
    _, dt = timed(lambda: t.merge(updates.union(inserts), keys=["event_id"], ts=2.0))
    after = set(t.snapshot().live_paths())
    rewritten = len(before - after)
    n_src = n_upd + n_ins
    got_upd = t.read().where(F.col("value") == 10**6).count()
    got_ins = t.read().where(F.col("event_id") >= 9 * 10**14).count()
    assert (got_upd, got_ins) == (n_upd, n_ins), (got_upd, n_upd, got_ins, n_ins)
    print(
        f"merge: {n_src} source rows into {t.snapshot().total_rows():,} rows — "
        f"{rewritten}/{n_files} files rewritten in {dt:.1f}s"
    )
    shutil.rmtree(work, ignore_errors=True)


def merge_mor_tier(spark, sf_dir: str, mult: int = 100, n_files: int = 64) -> None:
    """Hot-upsert cost at 10M rows, the two physical shapes × two key
    distributions. CLUSTERED source keys (one user shard) hit ~1 file —
    copy-on-write's rewrite is cheap and wins; SCATTERED keys (the realistic
    CDC stream: updates land anywhere) hit most files — COW rewrites a large
    fraction of the table for a handful of rows while merge-on-read's write
    cost stays one DV log entry + the source bytes. The post-merge full-scan
    read overhead (the DV anti-join toll) is reported alongside; results
    asserted equal between modes."""
    ev = build_events(spark, sf_dir, mult)
    base = build_events(spark, sf_dir, 1)
    clustered = base.where(F.col("user_id") == 510).withColumn(
        "value", F.lit(10**6).cast("double")
    )
    # ~70 keys spread uniformly across the REPLICATED id space -> most files
    scattered = ev.where(F.col("event_id") % 142001 == 3).withColumn(
        "value", F.lit(10**6).cast("double")
    )
    inserts = base.where(F.col("event_id") < 5).withColumn(
        "event_id", F.col("event_id") + F.lit(9 * 10**14)
    )
    work = tempfile.mkdtemp(prefix="txlog_merge_mor_scale_")
    for label, upd in (("clustered", clustered), ("scattered", scattered)):
        src = upd.union(inserts)
        n_src = src.count()
        results = {}
        for mode in ("mor", "cow"):
            t = TxTable(spark, os.path.join(work, f"tab_{label}_{mode}"))
            t.append(ev.repartitionByRange(n_files, "user_id"), ts=1.0)
            before = set(t.snapshot().live_paths())
            _, dt = timed(lambda: t.merge(src, keys=["event_id"], ts=2.0, mode=mode))
            rewritten = len(before - set(t.snapshot().live_paths()))
            agg, t_read = timed(
                lambda: t.read().agg(
                    F.count("*").alias("n"), F.sum("event_id").alias("s")
                ).collect()[0]
            )
            results[mode] = (agg["n"], agg["s"], dt, rewritten, t_read)
        assert results["mor"][:2] == results["cow"][:2], results  # identical answer
        for mode, (n, _s, dt, rewritten, t_read) in results.items():
            print(
                f"{label}/{mode}: merge {n_src} source rows into {n:,} in "
                f"{dt:.2f}s ({rewritten}/{n_files} files rewritten), "
                f"full-scan agg after: {t_read:.2f}s"
            )
    shutil.rmtree(work, ignore_errors=True)


def mor_tier(spark, sf_dir: str, mult: int = 100, n_files: int = 64) -> None:
    """Single-user takedown at 10M rows: merge-on-read (deletion vector)
    vs copy-on-write — write cost and read overhead, equal results asserted."""
    work = tempfile.mkdtemp(prefix="txlog_mor_scale_")
    ev = build_events(spark, sf_dir, mult)
    results = {}
    for mode in ("mor", "cow"):
        t = TxTable(spark, os.path.join(work, f"tab_{mode}"))
        t.append(ev.repartitionByRange(n_files, "user_id"), ts=1.0)
        before = set(t.snapshot().live_paths())
        _, dt = timed(lambda: t.delete_where("user_id = 510", ts=2.0, mode=mode))
        rewritten = len(before - set(t.snapshot().live_paths()))
        _, t_read = timed(
            lambda: t.read().agg(F.count("*"), F.sum("event_id")).collect()
        )
        results[mode] = (t.snapshot().total_rows(), dt, rewritten, t_read)
    assert results["mor"][0] == results["cow"][0], results
    for mode, (rows, dt, rewritten, t_read) in results.items():
        print(
            f"{mode}: delete in {dt:.2f}s ({rewritten}/{n_files} files rewritten), "
            f"{rows:,} rows live, full-scan agg after: {t_read:.2f}s"
        )
    shutil.rmtree(work, ignore_errors=True)


def sidecar_tier(spark, sf_dir: str, mult: int = 100, n_files: int = 64) -> None:
    """Takedown ABOVE the inline-vector cap at 10M rows: ~1.5M matched rows
    go to a SIDECAR deletion-vector parquet (distributed write, never through
    the driver) vs the copy-on-write rewrite — write cost, files rewritten,
    sidecar bytes, and the post-delete full-scan read tax; results asserted
    equal between modes."""
    ev = build_events(spark, sf_dir, mult)
    pred = "user_id % 100 < 15"  # ~15% of rows: far beyond MOR_MAX_INLINE_DV
    work = tempfile.mkdtemp(prefix="txlog_dvf_scale_")
    results = {}
    for mode in ("mor", "cow"):
        t = TxTable(spark, os.path.join(work, f"tab_{mode}"))
        t.append(ev.repartitionByRange(n_files, "user_id"), ts=1.0)
        before = set(t.snapshot().live_paths())
        _, dt = timed(lambda: t.delete_where(pred, ts=2.0, mode=mode))
        snap = t.snapshot()
        rewritten = len(before - set(snap.live_paths()))
        sidecars = sorted(snap.dvf_files())
        side_bytes = sum(
            os.path.getsize(os.path.join(t.path, f)) for f in sidecars
        )
        agg, t_read = timed(
            lambda: t.read().agg(
                F.count("*").alias("n"), F.sum("event_id").alias("s")
            ).collect()[0]
        )
        results[mode] = (agg["n"], agg["s"], dt, rewritten, len(sidecars), side_bytes, t_read)
    assert results["mor"][:2] == results["cow"][:2], results
    for mode, (n, _s, dt, rewritten, n_side, side_bytes, t_read) in results.items():
        print(
            f"{mode}: delete ~15% of 10M rows in {dt:.2f}s "
            f"({rewritten}/{n_files} files rewritten, {n_side} sidecar "
            f"vector file(s) = {side_bytes/1e6:.1f} MB), {n:,} rows live, "
            f"full-scan agg after: {t_read:.2f}s"
        )
    shutil.rmtree(work, ignore_errors=True)


def partition_tier(spark, sf_dir: str, mult: int = 100, n_files: int = 8) -> None:
    """Hive partition pruning at 10M rows: events partitioned by event_type
    (5 dirs × 8 user_id-clustered files) — a type+user predicate composes
    DIRECTORY elimination with footer stats; planned-file counts and the
    pruned-vs-full wall-clock are reported, equal results asserted."""
    ev = build_events(spark, sf_dir, mult)
    work = tempfile.mkdtemp(prefix="txlog_part_scale_")
    t = TxTable(spark, os.path.join(work, "tab"), partition_by=("event_type",))
    _, t_write = timed(
        lambda: t.append(ev.repartitionByRange(n_files, "user_id"), ts=1.0)
    )
    snap = t.snapshot()
    total = len(snap.live_paths())
    prune = [("event_type", "click", "click"), ("user_id", 500, 520)]
    part_only = len(t.candidate_files(prune=prune[:1], snap=snap))
    both = len(t.candidate_files(prune=prune, snap=snap))
    flt = (F.col("event_type") == "click") & F.col("user_id").between(500, 520)
    agg = lambda df: df.where(flt).agg(  # noqa: E731
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]
    full_res, t_full = timed(lambda: agg(t.read()))
    pruned_res, t_pruned = timed(lambda: agg(t.read(prune=prune)))
    assert (full_res["n"], full_res["s"]) == (pruned_res["n"], pruned_res["s"])
    print(
        f"partitioned write {t_write:.1f}s, {total} files in 5 event_type dirs; "
        f"partition prune -> {part_only}/{total} files, + user stats -> "
        f"{both}/{total}; full-scan filter {t_full:.2f}s vs pruned {t_pruned:.2f}s"
    )
    shutil.rmtree(work, ignore_errors=True)


def sql_scan_tier(spark, sf_dir: str, mult: int = 100) -> None:
    """Round-12 verdict #3 evidence: the ``USING txlog`` Python-source SQL
    scan (Arrow decode in Python workers) vs the NATIVE-mode view
    (``register_sql_views(native=True)`` → Spark's JVM parquet scan over
    the pinned file list), same query, results asserted identical — once
    on the clean table and once after a MOR delete (deletion vectors: the
    native path anti-joins, the source path applies positional Arrow
    masks). Run at ≥1M rows: ``python tools/txlog_scale.py --sql-scan``."""
    from snapshot_sender_spark.sources.txlog_batch import register_sql_views

    work = tempfile.mkdtemp(prefix="txlog_sqlscan_")
    try:
        ev = build_events(spark, sf_dir, mult)
        t = TxTable(spark, os.path.join(work, "tab"))
        t.append(ev.repartition(32), ts=1.0)
        q = (
            "SELECT event_type, COUNT(*) AS n, CAST(SUM(value * 100) AS BIGINT)"
            " AS cents FROM {v} GROUP BY event_type"
        )

        def measure(label):
            register_sql_views(spark, "scan_src", t.path)
            register_sql_views(spark, "scan_jvm", t.path, native=True)

            def run(view):
                return sorted(map(tuple, spark.sql(q.format(v=view)).collect()))

            run("scan_jvm")  # warm both paths (JVM scan JIT, Python workers)
            run("scan_src")
            a, t_src = timed(lambda: run("scan_src"))
            b, t_jvm = timed(lambda: run("scan_jvm"))
            assert a == b, "view modes disagree"
            n = t.snapshot().total_rows()
            print(
                f"| {label} | {n:,} | {t_src:.2f} | {t_jvm:.2f} "
                f"| {t_src / t_jvm:.1f}× |"
            )

        print("| scan | rows | python-source s | native s | native speedup |")
        print("|---|---|---|---|---|")
        measure("clean")
        t.delete_where("event_id % 5000 = 0", ts=2.0, mode="mor")
        measure("MOR-deleted")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def dml_tier(spark, sf_dir: str, mult: int = 100) -> None:
    """Round-13 DML ops at scale: UPDATE (cow vs mor) touching ~0.1% of a
    10M-row table, and a merge-shaped bulk DELETE from a 1k-key takedown
    list (mor). Reports wall-clock and the files-touched fraction — the
    scale claim is that DML cost tracks the MATCHED data, not the table.
    ``python tools/txlog_scale.py --dml``."""
    work = tempfile.mkdtemp(prefix="txlog_dml_")
    try:
        ev = build_events(spark, sf_dir, mult)
        t = TxTable(spark, os.path.join(work, "tab"))
        # cluster by event_id so a contiguous-key predicate hits few files
        t.append(ev.repartitionByRange(64, "event_id"), ts=1.0)
        n_files = len(t.snapshot().files)
        n_rows = t.snapshot().total_rows()
        print(f"table: {n_rows:,} rows, {n_files} files (range-clustered)")
        print("| op | mode | files touched | wall s |")
        print("|---|---|---|---|")

        def touched(before, after):
            """Files the op wrote or marked: new data files (cow rewrites /
            mor image appends) plus files that GAINED a deletion vector
            (mor's whole footprint is vectors, not rewrites)."""
            new_files = set(after.files) - set(before.files)
            new_dvs = (set(after.dv_map()) | set(after.dvf_map())) - (
                set(before.dv_map()) | set(before.dvf_map())
            )
            return len(new_files | new_dvs)

        # UPDATE ~0.1% (one contiguous key band; disjoint band per mode so
        # the second mode's predicate still matches live rows)
        lo = 5_000
        for mode in ("cow", "mor"):
            before = t.snapshot()
            _, dt = timed(lambda: t.update_where(
                {"value": "value + 1"},
                f"event_id >= {lo} AND event_id < {lo + n_rows // 1000}",
                mode=mode,
            ))
            after = t.snapshot()
            print(f"| update 0.1% | {mode} | {touched(before, after)}/{n_files} "
                  f"| {dt:.2f} |")
            lo += 2 * (n_rows // 1000)
        # merge-shaped bulk delete: ~1k-key takedown list sampled by hash
        # from the table's REAL ids (event_id is base+copy*1e9, not dense).
        # Distinct salt per mode so the second pass matches live rows.
        for salt, mode in ((17, "mor"), (23, "cow")):
            keys = (
                t.read()
                .select("event_id")
                .where(F.pmod(F.xxhash64("event_id", F.lit(salt)),
                              F.lit(n_rows // 1000)) == 0)
            )
            before = t.snapshot()
            _, dt = timed(lambda: t.delete_matching(keys, ["event_id"], mode=mode))
            after = t.snapshot()
            print(f"| delete 1k keys | {mode} | {touched(before, after)}/{n_files} "
                  f"| {dt:.2f} |")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def convert_tier(spark, sf_dir: str, mult: int = 100) -> None:
    """Round-13 CONVERT TO TXLOG at scale: adopt a 10M-row parquet
    directory (flat ×64 files, then hive ×(4 dirs × 16 files)) and report
    adoption wall-clock vs a full rewrite (append of the same data). The
    scale claim: conversion cost is O(files) footer reads + renames —
    distributed past 16 files — never O(bytes).
    ``python tools/txlog_scale.py --convert``."""
    work = tempfile.mkdtemp(prefix="txlog_cvt_")
    try:
        ev = build_events(spark, sf_dir, mult)
        print("| layout | files | adopt s | rewrite s |")
        print("|---|---|---|---|")
        for label, writer in (
            ("flat", lambda d: ev.repartition(64).write.parquet(d)),
            (
                "hive",
                lambda d: ev.withColumn("b", F.pmod("event_id", F.lit(4)))
                .repartition(16)
                .write.partitionBy("b")
                .parquet(d),
            ),
        ):
            src = os.path.join(work, f"src_{label}")
            writer(src)
            t = TxTable(spark, src)
            _, adopt_s = timed(lambda: t.convert_from_parquet())
            n_files = len(t.snapshot().files)
            rw = TxTable(spark, os.path.join(work, f"rw_{label}"))
            _, rewrite_s = timed(
                lambda: rw.append(spark.read.option("basePath", src).parquet(src))
            )
            print(f"| {label} | {n_files} | {adopt_s:.2f} | {rewrite_s:.2f} |")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = positional[0] if positional else "/root/testdata/sf0.1"
    spark = get_spark(app_name="txlog_scale")
    spark.sparkContext.setLogLevel("ERROR")
    if "--convert" in sys.argv:
        convert_tier(spark, sf_dir)
        return
    if "--dml" in sys.argv:
        dml_tier(spark, sf_dir)
        return
    if "--sql-scan" in sys.argv:
        sql_scan_tier(spark, sf_dir)
        return
    if "--stream" in sys.argv:
        stream_source_throughput(spark, sf_dir)
        return
    if "--cdf" in sys.argv:
        cdf_stream_throughput(spark, sf_dir)
        return
    if "--commit-stats" in sys.argv:
        commit_stats_tier(spark, sf_dir)
        return
    if "--merge" in sys.argv:
        merge_tier(spark, sf_dir)
        return
    if "--mor" in sys.argv:
        mor_tier(spark, sf_dir)
        return
    if "--merge-mor" in sys.argv:
        merge_mor_tier(spark, sf_dir)
        return
    if "--sidecar" in sys.argv:
        sidecar_tier(spark, sf_dir)
        return
    if "--partition" in sys.argv:
        partition_tier(spark, sf_dir)
        return
    print(f"| mult | rows | files | write s | pruned files | full-scan s | pruned s | COW rewritten | delete s | fold-delta s | recompute s |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for mult in (1, 10, 100):
        r = run_tier(spark, sf_dir, mult)
        print(
            f"| {r['mult']}× | {r['rows']:,} | {r['files']} | {r['t_write']:.1f} "
            f"| {r['pruned_files']}/{r['files']} | {r['t_full']:.2f} | {r['t_pruned']:.2f} "
            f"| {r['rewritten']}/{r['files']} | {r['t_del']:.2f} "
            f"| {r['t_inc']:.2f} | {r['t_recompute']:.2f} |"
        )
    per_commit, replay = commit_metadata_costs(spark)
    print(f"\ncommit metadata: {per_commit*1000:.0f} ms/commit over 100 appends; "
          f"100-version snapshot replay {replay*1000:.0f} ms")


if __name__ == "__main__":
    main()
