"""Storage/layout maintenance + persisted IVF index: compaction produces the
planned file count with identical data; the persisted index prunes bucket
partitions and full-probe equals the exact scan."""

import glob
import os

from pyspark.sql import functions as F

from snapshot_sender_spark.operators import layout, similarity
from snapshot_sender_spark.tables import load


def test_compact_parquet_reduces_files_preserves_data(spark, tmp_path):
    src = str(tmp_path / "many")
    dst = str(tmp_path / "compacted")
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.md5(F.col("id").cast("string")).alias("pad")
    )
    df.repartition(40).write.parquet(src)  # 40 small files
    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 40

    total = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(src, "*.parquet"))
    )
    out = layout.compact_parquet(spark, src, dst, target_file_bytes=-(-total // 4))
    n_out = len(glob.glob(os.path.join(dst, "*.parquet")))
    assert n_out == 4
    # identical content (order-insensitive)
    assert out.count() == 20_000
    assert out.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]
    assert out.select("pad").subtract(df.select("pad")).count() == 0


def test_compact_sorted_files_have_selective_stats(spark, tmp_path):
    """Sort-clustered compaction: each output file covers a disjoint id range,
    so a point predicate's min/max pruning touches one file."""
    import pyarrow.parquet as pq

    src = str(tmp_path / "many_s")
    dst = str(tmp_path / "sorted")
    spark.range(10_000).select(F.col("id"), (F.col("id") * 2).alias("v")).repartition(
        16
    ).write.parquet(src)
    layout.compact_parquet(spark, src, dst, target_file_bytes=10**12, sort_cols=["id"])
    files = glob.glob(os.path.join(dst, "*.parquet"))
    # single target file still sorts; force multiple ranges for the stats check
    layout.compact_parquet(
        spark,
        src,
        dst,
        target_file_bytes=sum(os.path.getsize(f) for f in glob.glob(os.path.join(src, "*.parquet"))) // 5,
        sort_cols=["id"],
    )
    files = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(files) >= 3
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        maxs = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        ranges.append((mins, maxs))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint id ranges → min/max pruning is selective


def test_ivf_index_persists_prunes_and_full_probe_is_exact(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    idx = str(tmp_path / "ivf_index")
    similarity.build_ivf_index(emb, "embedding", "vec_id", idx, n_centroids=8)

    # probing must prune bucket partitions at the scan
    res = similarity.ivf_search_index(spark, idx, q, k=10, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    # full probe == exact brute force (same quantized cosine, same tie-break)
    full = similarity.ivf_search_index(spark, idx, q, k=10, n_probe=8)
    exact = similarity.cosine_topk(emb, "embedding", "vec_id", q, k=10)
    got = [(r["id"], r["cosine"]) for r in full.collect()]
    want = [(r["vec_id"], r["cosine"]) for r in exact.collect()]
    assert got == want

    # partial probe keeps reasonable recall and is a subset of the corpus
    part_ids = {r["id"] for r in res.collect()}
    assert len(part_ids & {r[0] for r in want}) >= 3


def test_ivf_batch_near_dup_full_probe_exact_and_pruned(spark, sf_dir, tmp_path):
    """Batch-vs-index embedding near-dup: full probe equals the brute-force
    cross join on the quantized grid; partial probe is a subset with
    identical cosines; the scan is partition-pruned to probed buckets."""
    emb = load(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % 10 == 0)
    existing = emb.filter(F.col("vec_id") % 10 != 0)
    idx = str(tmp_path / "ivf_dedup_index")
    similarity.build_ivf_index(existing, "embedding", "vec_id", idx, n_centroids=8)

    full = similarity.ivf_batch_near_dup(
        spark, idx, new, "embedding", "vec_id", threshold=0.35, n_probe=8
    )
    got = {
        (r["id_new"], r["id_existing"]): round(r["cosine"], 12)
        for r in full.collect()
    }
    # brute-force cross-set reference on the same quantized grid
    a = existing.select(
        F.col("vec_id").alias("id_existing"), F.col("embedding").alias("e_old")
    )
    b = new.select(F.col("vec_id").alias("id_new"), F.col("embedding").alias("e_new"))
    qv = lambda c: F.transform(
        c, lambda x: F.floor(x.cast("double") * similarity.QUANT).cast("long")
    )
    n2 = lambda c: F.aggregate(c, F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    dot = F.aggregate(
        F.zip_with(qv(F.col("e_new")), qv(F.col("e_old")), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ref = (
        b.crossJoin(a)
        .select(
            "id_new",
            "id_existing",
            (
                dot.cast("double")
                / (
                    F.sqrt(n2(qv(F.col("e_new"))).cast("double"))
                    * F.sqrt(n2(qv(F.col("e_old"))).cast("double"))
                )
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
    )
    want = {
        (r["id_new"], r["id_existing"]): round(r["cosine"], 12)
        for r in ref.collect()
    }
    assert got == want and len(got) > 0

    part = similarity.ivf_batch_near_dup(
        spark, idx, new, "embedding", "vec_id", threshold=0.35, n_probe=2
    )
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    sub = {
        (r["id_new"], r["id_existing"]): round(r["cosine"], 12)
        for r in part.collect()
    }
    assert set(sub).issubset(set(got))
    assert all(got[k] == v for k, v in sub.items())


def test_compact_zorder_files_selective_on_both_columns(spark, tmp_path):
    """Z-order clustering: per-file min/max ranges must be selective on BOTH
    interleaved columns, where a linear sort is selective only on its leading
    column. Coverage = Σ_files (max−min+1) / (n_files · global_range); 1.0
    means every file spans the whole domain (no skipping possible)."""
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    n = 1 << 14
    # two independent uniform columns: x = low bits, y = bit-reversed (so a
    # linear sort on x leaves y unclustered in every file)
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        F.floor(F.col("id") / 128).alias("y"),
        F.col("id").alias("payload"),
    )
    df.repartition(16).write.parquet(src)

    def coverage(path, col):
        spans, lo_all, hi_all = [], [], []
        for p in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(p).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append(hi - lo + 1)
            lo_all.append(lo)
            hi_all.append(hi)
        domain = max(hi_all) - min(lo_all) + 1
        return sum(spans) / (len(spans) * domain)

    total = sum(os.path.getsize(p) for p in glob.glob(os.path.join(src, "*.parquet")))
    per16 = -(-total // 16)

    zdst = str(tmp_path / "zorder")
    out = layout.compact_parquet(
        spark, src, zdst, target_file_bytes=per16, zorder_cols=("x", "y")
    )
    assert out.count() == n and "x" in out.columns and "__zkey" not in out.columns
    sdst = str(tmp_path / "sorted")
    layout.compact_parquet(spark, src, sdst, target_file_bytes=per16, sort_cols=["x"])

    # linear sort: near-perfect on x, useless on y
    assert coverage(sdst, "x") < 0.3
    assert coverage(sdst, "y") > 0.8
    # z-order: selective on BOTH (16 files over a 2-D grid → ~quarter of each
    # axis per file ideally; allow generous slack)
    assert coverage(zdst, "x") < 0.55
    assert coverage(zdst, "y") < 0.55


def test_ivf_epoch_append_lifecycle(spark, sf_dir, tmp_path):
    """Epoch layout + append under frozen centroids (round 7): a replayed
    append replaces its own partitions (never double-appends), exclude_epoch
    prunes the in-flight epoch, centroids are untouched by appends, and the
    full-probe cross-set result over an appended index equals the
    brute-force quantized pairs — the same lifecycle contract as the text /
    signature indexes, for the last index family."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ep = (F.col("vec_id") % 3).cast("int")
    index_dir = str(tmp_path / "ivf_ep")
    similarity.build_ivf_index(
        emb.filter(ep == 0), "embedding", "vec_id", index_dir,
        n_centroids=4, epoch=0,
    )
    centroids_before = sorted(
        tuple(r) for r in spark.read.parquet(f"{index_dir}/centroids.parquet").collect()
    )
    n0 = spark.read.parquet(f"{index_dir}/vectors").count()
    batch1 = emb.filter(ep == 1)
    similarity.append_ivf_index_epoch(
        spark, index_dir, batch1, "embedding", "vec_id", epoch=1
    )
    n01 = spark.read.parquet(f"{index_dir}/vectors").count()
    assert n01 == n0 + batch1.count()
    # crash replay: same epoch appended again — partitions replaced, not doubled
    similarity.append_ivf_index_epoch(
        spark, index_dir, batch1, "embedding", "vec_id", epoch=1
    )
    assert spark.read.parquet(f"{index_dir}/vectors").count() == n01
    # frozen quantizer: appends never touch the centroid table
    centroids_after = sorted(
        tuple(r) for r in spark.read.parquet(f"{index_dir}/centroids.parquet").collect()
    )
    assert centroids_after == centroids_before

    # exclude_epoch prunes the in-flight epoch: a batch probing an index
    # that already holds its own vectors would self-match at cosine 1.0
    seen = similarity.ivf_batch_near_dup(
        spark, index_dir, batch1, "embedding", "vec_id",
        threshold=0.999, n_probe=4,
    )
    assert any(
        r["id_new"] == r["id_existing"] for r in seen.collect()
    )  # self-matches visible without exclusion
    hidden = similarity.ivf_batch_near_dup(
        spark, index_dir, batch1, "embedding", "vec_id",
        threshold=0.999, n_probe=4, exclude_epoch=1,
    )
    assert all(r["id_new"] != r["id_existing"] for r in hidden.collect())

    # full probe over the appended index == brute-force quantized pairs
    batch2 = emb.filter(ep == 2)
    got = {
        (r["id_new"], r["id_existing"], round(r["cosine"], 9))
        for r in similarity.ivf_batch_near_dup(
            spark, index_dir, batch2, "embedding", "vec_id",
            threshold=0.35, n_probe=4,
        ).collect()
    }
    corpus = emb.filter(ep < 2)
    # brute force via the exact cross-set: quantized cosine of every
    # (batch2, corpus) pair — computed with the same grid
    qv = lambda c: F.transform(  # noqa: E731
        c, lambda x: F.floor(x.cast("double") * similarity.QUANT).cast("long")
    )
    a = batch2.select(F.col("vec_id").alias("id_new"), qv("embedding").alias("qa"))
    b = corpus.select(F.col("vec_id").alias("id_existing"), qv("embedding").alias("qb"))
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n2 = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    brute = {
        (r["id_new"], r["id_existing"], round(r["cosine"], 9))
        for r in a.crossJoin(b)
        .select(
            "id_new", "id_existing",
            (dot.cast("double") / (F.sqrt(n2(F.col("qa")).cast("double"))
                                   * F.sqrt(n2(F.col("qb")).cast("double")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
        .collect()
    }
    assert got == brute
