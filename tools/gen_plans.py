"""Regenerate PLANS.md: formatted physical plans of representative queries
with scale-property annotations. Usage: python tools/gen_plans.py [sf_dir]"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from snapshot_sender_spark.queries import all_queries  # noqa: E402
from snapshot_sender_spark.session import get_spark  # noqa: E402

PICKS = [
    ("q1_pricing_summary", "TPC-H Q1: scan→partial agg→exchange→final agg. The scan reads only the 7 touched columns (ReadSchema) and the date filter is pushed (PushedFilters); the aggregate is two-phase, so only 4-group partials cross the exchange."),
    ("join_broadcast_enrich", "Dimension enrichment: every join is a BroadcastHashJoin — no shuffle of the fact side at any size ratio like this."),
    ("join_asof_last_click", "As-of join as composition: the range condition rides the user_id equi-join, then one WindowGroupLimit keeps the latest click per purchase — no CartesianProduct anywhere."),
    ("sort_topk_global", "Global top-k: TakeOrderedAndProject (per-partition heaps merged on the driver), never a total sort."),
    ("dedup_exact", "Exact dedup: only (128-bit hash, id) pairs shuffle; document text stays in place."),
    ("curation_source_cap", "Per-source cap: WindowGroupLimit keeps K rows per source inside each shuffle partition before the filter — the corpus is never fully sorted."),
    ("decontam_ngram_overlap", "Benchmark decontamination: the bench-gram set broadcasts; corpus grams are probed map-side."),
    ("sample_weighted_hash", "Weighted sampling: the integer-hash predicate is evaluated in the scan stage — whole-stage codegen, no exchange before the group-by of the tiny survivor set."),
    ("dedup_simhash_pairs", "SimHash near-dup mining: signatures from the vectorized Arrow kernel, then the 16-bit-band self-join — candidate pairs share a band (shuffle keyed on the band value), never an all-pairs product; the hamming filter runs on the already-tiny candidate set. Exact for hamming ≤ 3 by pigeonhole (oracle-checked)."),
    ("dedup_substring_spans", "Exact substring dedup (round 6): the positional-shingle stream (one row per token) exchanges only (16-byte binary md5, id, pos) — document text never shuffles; the duplicated-window groupBy is two-phase partial agg (Exchange 14 carries post-HAVING hashes only), and the islands pass is one per-doc window (Exchange 21). At this tier the small dup-hash set and per-doc stats BROADCAST (joins 19/32); at corpus scale AQE falls back to the same joins shuffled on the 16-byte key — either way the probe side never re-shuffles text because the text column was pruned at the scan."),
    ("dedup_chunk_level", "C4-style line/chunk dedup (round 6): the winner window partitions on the 16-byte binary chunk hash and row_number picks the first (id, pos) occurrence — and Spark inserts WindowGroupLimit on BOTH sides of the exchange (7 before, 10 after), so each map task forwards at most one candidate per chunk hash and the shuffle carries survivors, not the corpus. Chunk text crosses that exchange and the per-doc reassembly groupBy — exactly two text-bearing exchanges, no driver state."),
    ("table_txlog_stats_pruning", "Transactional-table stats pruning (round 10): the parquet scan in this plan enumerates ONLY the files whose footer min/max intersect the predicate — the txlog read resolved 16 range-clustered files down to the 1-2 overlapping [3,9] on user_id BEFORE Spark planned the scan, so the FileScan's file list (and at object-store scale, every LIST/GET for the other files) is already pruned; the residual filter still runs, so pruning can never change the answer."),
    ("dedup_image_near", "Perceptual image dedup (round 6): the synth and decode+aHash MapInPandas stages stack back-to-back with NO exchange between them (plan nodes 3-4) — image bytes move worker-locally between the Python runners and never cross an exchange; after the hash stage only (id, 8-byte sig) rows exist, and the band explode, band-equality join, and hamming filter are all JVM. The same shape serves the audio and video fingerprint miners."),
]

HEADER = [
    "# PLANS — physical plans of representative queries",
    "",
    "Generated with `df.explain('formatted')` at sf0.001 (plan shapes are",
    "size-independent; AQE may re-plan exchanges at runtime). Regression",
    "tests in `tests/test_plans.py` pin the load-bearing properties; the",
    "whole-surface audit (`test_declared_surface_plan_audit`) pins Python",
    "crossings and nested-loop usage for every declared query.",
    "",
    "The multi-epoch index/service queries execute a full lifecycle and",
    "return a parquet re-read, so their load-bearing plans are shown at the",
    "OPERATOR level below (built against a freshly-appended index, exactly",
    "the shape each epoch's probe executes inside the service loop).",
    "",
]


def _span_probe(spark, sf):
    from pyspark.sql import functions as F

    from snapshot_sender_spark.operators import dedup as D

    table = "t_plans_span_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    D.append_hash_index_epoch(
        spark, table, D.substring_index_hashes(corpus, "text", "doc_id", k=5), epoch=0
    )
    return D.incremental_span_stats_against_index(
        spark, table, batch, "text", "doc_id", k=5, min_count=2
    )


def _sig_probe(spark, sf):
    from pyspark.sql import functions as F

    from snapshot_sender_spark.operators import dedup as D

    table = "t_plans_sig_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    corpus = spark.range(1000).select(
        F.col("id"), F.xxhash64("id").alias("sig")
    )
    D.append_sig_index_epoch(spark, table, corpus, epoch=0)
    batch = spark.range(100).select(
        (F.col("id") + 10_000).alias("id"), F.xxhash64(F.col("id") + 7).alias("sig")
    )
    return D.banded_hamming_pairs_against_index(spark, table, batch, max_hamming=3)


def _hotband_keeper(spark, sf):
    from pyspark.sql import functions as F

    from snapshot_sender_spark.operators import dedup as D

    sigs = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 3 * 1024).cast("long").alias("sig")
    )
    return D.banded_hamming_dropped(sigs, max_hamming=3)


def _video_posting_probe(spark, sf):
    from pyspark.sql import functions as F

    from snapshot_sender_spark.operators import dedup as D

    table = "t_plans_vidpost_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_sizes")
    corpus_posting = spark.range(4000).select(
        (F.col("id") % 1000).alias("id"), F.xxhash64("id").alias("h")
    )
    D.append_dedup_index_epoch(
        spark, table, None, "", "", epoch=0, posting=corpus_posting
    )
    batch_posting = spark.range(400).select(
        ((F.col("id") % 100) + 10_000).alias("id"),
        F.xxhash64(F.col("id") + 3).alias("h"),
    )
    return D.incremental_jaccard_against_index(
        spark, table, None, "", "", threshold=0.5, posting=batch_posting
    )


def _bpe_tokenize_plan(spark, sf):
    from pyspark.sql import functions as F

    from snapshot_sender_spark.operators import bpe as B

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta doc"),
                 (F.col("id") % 97).cast("string")).alias("text"),
    )
    model = B.train_bpe(spark, docs, num_merges=20)
    return B.bpe_tokenize(spark, docs, model)


def _bpe_tokenize_shuffle_plan(spark, sf):
    from pyspark.sql import functions as F

    from snapshot_sender_spark.operators import bpe as B

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta doc"),
                 (F.col("id") % 97).cast("string")).alias("text"),
    )
    model = B.train_bpe(spark, docs, num_merges=20)
    # the above-cap route: same plan with the word join forced shuffle-hash
    return B.bpe_tokenize(spark, docs, model, broadcast_max_words=10)


def _txlog_sql_scan(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from snapshot_sender_spark.operators.txlog import TxTable
    from snapshot_sender_spark.sources.txlog_batch import register_sql_views

    work = tempfile.mkdtemp(prefix="plans_txlog_sql_")
    t = TxTable(spark, f"{work}/tab", partition_by=("g",))
    t.append(
        spark.range(0, 40).withColumn("g", (F.col("id") % 4).cast("int")).coalesce(1),
        ts=1.0,
    )
    register_sql_views(
        spark, "t_plans_txlog_sql", t.path, options={"filter_pushdown": "true"}
    )
    return spark.sql("SELECT id FROM t_plans_txlog_sql WHERE g = 2 AND id > 5")


# Operator-level picks: (name, note, builder). Builders may create their own
# t_plans_* tables (dropped on rerun) — the explain below never executes them.
OPERATOR_PICKS = [
    (
        "txlog SQL front-end scan (round 12)",
        "spark.sql over a txlog table registered USING txlog: the Filter node above the Python BatchScan is Spark RE-APPLYING every predicate (the reader returns all filters — pruning is planning-only, so results are exact no matter what the stats ladder eliminates), while pushFilters has already folded `g = 2` and `id > 5` into the candidate_files prune ladder, which eliminated 3 of 4 hive directories before any partition was planned (pinned: tests/test_txlog_sql.py, 4 dirs -> 1 planned partition). Pushdown is the filter_pushdown OPT-IN because Spark 4.1's PythonDataSourceV2.getOrCreateReadInfo reuses the LAST planned read for later filterless queries on a shared view relation — the cache-safe default prunes via the immutable view-level `prune` option instead (same ladder, no per-query state).",
        _txlog_sql_scan,
    ),
    (
        "incremental_span_stats_against_index (round 7 probe)",
        "Substring-index probe — the per-epoch service shape: every Exchange is BATCH-side — node 26 is the probe side of the anti join, partitioned on the 16-byte shingle_hash into exactly the index's 8 buckets; nodes 15/35 are batch-internal aggregations (within-batch dup counts, per-doc stats). The INDEX side (nodes 28-31) reaches the sort-merge join straight from the bucketed scan with NO Exchange (tests/test_hash_index.py pins Bucketed:true + the one-h-Exchange contract on the chunk sibling); the local Sort above the scan exists because Spark honors bucket sortedness only at one file per bucket and an epoch append leaves several — compaction's write_tasks=1 layout restores the one-file-per-bucket, sort-free scan. Corpus text is never re-read: the index stores only distinct 16-byte hashes.",
        _span_probe,
    ),
    (
        "banded_hamming_pairs_against_index (round 7 probe)",
        "Signature-index probe — the media service's cross-set stage: the batch explodes to 4 labelled 16-bit bands and exchanges once on the band key (node 6, the plan's only join-input Exchange); the index side (nodes 8-11) feeds the sort-merge join straight from the bucketed scan with NO Exchange (same local-Sort caveat as the span probe: multi-file buckets until compaction). Downstream only (batch_id, corpus_id, 8-byte sigs) rows exist; the hamming filter is JVM bit_count on the XOR.",
        _sig_probe,
    ),
    (
        "banded_hamming_dropped (round 8 hot-band guard)",
        "The guarded keeper decision: a sig-keyed HashAggregate (partial+final — map-side combine absorbs identical-signature floods) collapses the corpus to distinct signatures BEFORE the band explode, so the band self-join's input is bounded by distinct sigs regardless of hot-band population; non-representative members rejoin by sig equality (hash join), never through the band join. Result-identical to the unguarded rule (tests/test_hotband.py).",
        _hotband_keeper,
    ),
    (
        "bpe_tokenize (round 9 tokenizer, round 10 guarded join — broadcast form)",
        "REAL-token tokenization with Python bounded to the vocabulary: the corpus side posexplodes whitespace words fully JVM-side; the ONLY Python crossing is one MapInPandas sitting above the DISTINCT-word HashAggregate (partial+final), so Arrow ships each distinct word once, never the corpus; the encoded (word -> ids) table joins back via a COUNT-ROUTED strategy (operators/bpe.py join_encoded_words): below BROADCAST_MAX_WORDS it broadcasts (this plan), and per-doc order is restored by sort_array(collect_list(struct(wpos, ids))) inside a doc_id-keyed two-phase aggregate — no global sort. The final left join restores NULL/token-less docs. Plan gate: tests/test_bpe.py pins exactly one MapInPandas and zero BatchEvalPython.",
        _bpe_tokenize_plan,
    ),
    (
        "bpe_tokenize, above-cap shuffle form (round 10)",
        "The SAME tokenize with the distinct-word count above BROADCAST_MAX_WORDS (forced here with a tiny cap): the word join becomes a ShuffledHashJoin with the vocabulary side as the per-partition build — pinned with an explicit shuffle_hash hint because Catalyst's size estimate of the MapInPandas output derives from the tiny input estimate and was measured still choosing broadcast on a 3e6-distinct-word corpus. Result-identical to the broadcast form (equality test in tests/test_bpe.py); at web-corpus vocabulary (1e8-1e9 distinct words) this is the only surviving form.",
        _bpe_tokenize_shuffle_plan,
    ),
    (
        "incremental_jaccard_against_index, posting mode (round 8 video service)",
        "The streaming VIDEO service's cross-set stage: per-frame-hash posting rows (id, 8-byte h) play the shingle role; the batch posting exchanges once on h, the corpus posting + sizes tables scan bucket-aligned and sort-merge in place, and the pair counts aggregate two-phase. Video bytes never appear — the corpus was decoded once at its ingest epoch.",
        _video_posting_probe,
    ),
]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="gen_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def render(name, note, df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        return [f"## {name}", "", note, "", "```", tree.rstrip(), "```", ""]

    out = list(HEADER)
    for name, note in PICKS:
        out += render(name, note, qs[name].fn(spark, sf))
    out += ["# Operator-level plans (index probes and guards)", ""]
    for name, note, builder in OPERATOR_PICKS:
        out += render(name, note, builder(spark, sf))
    for t in ("t_plans_span_idx", "t_plans_sig_idx", "t_plans_vidpost_idx",
              "t_plans_vidpost_idx_sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(
        f"PLANS.md regenerated ({len(PICKS)} queries + {len(OPERATOR_PICKS)} operators)"
    )


if __name__ == "__main__":
    main()
