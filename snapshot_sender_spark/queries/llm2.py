"""LLM-data + pipeline surface, batch 3: embedding near-dup pairs (exact,
oracle-matched via integer quantization), quality filtering, salted skew
aggregation, the scalable as-of join, and the full delivery pipeline surfaced
as a driver-visible query."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import asof, similarity, skew
from ..tables import load
from . import query

# =============================================================================
# Embedding near-dup pairs — exact, oracle-matched
# =============================================================================


@query(
    "dedup_embedding_pairs",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(FLOOR(x * {similarity.QUANT}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, qv,
             list_sum(list_transform(qv, x -> x * x)) AS n2
      FROM q
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
             / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
             / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) >= 0.35
    """,
    category="llm-dedup",
)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via the blocked-GEMM kernel (exact,
    bit-identical to the declarative fold — operators/similarity.py; LSH
    bucketing is the corpus-scale candidate cut)."""
    return similarity.cosine_pairs_gemm(
        load(spark, sf_dir, "embeddings"), "embedding", "vec_id", threshold=0.35
    )


# =============================================================================
# Quality filtering (composite score → filter), the corpus-curation primitive
# =============================================================================


@query(
    "text_quality_filter",
    oracle="""
    SELECT doc_id, lang, n_chars, n_words, uniq_ratio
    FROM (
      SELECT doc_id, lang,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_words,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS uniq_ratio
      FROM documents
    )
    WHERE n_chars BETWEEN 120 AND 450
      AND n_words >= 25
      AND uniq_ratio >= 0.30
    """,
    category="llm-text",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents passing length / word-count / lexical-diversity gates —
    the standard pre-training corpus filter, pushed down as plain predicates."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    scored = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(words).alias("n_words"),
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias("uniq_ratio"),
    )
    return scored.filter(
        F.col("n_chars").between(120, 450)
        & (F.col("n_words") >= 25)
        & (F.col("uniq_ratio") >= 0.30)
    )


# =============================================================================
# Skewed aggregation via salting — result-identical to the plain GROUP BY
# =============================================================================


@query(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregation",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through 16 salt buckets (operators/skew.py): two
    shuffles of partials instead of funnelling every row of a hot key into one
    task. Same result as the plain GROUP BY — hence the shared oracle."""
    l = load(spark, sf_dir, "lineitem")
    out = skew.salted_agg(
        l,
        ["l_returnflag"],
        {
            "n": ("sum", F.count("*")),
            "total_qty": ("sum", F.sum(F.col("l_quantity").cast("decimal(12,2)"))),
        },
        n_salts=16,
    )
    return out.select("l_returnflag", F.col("n"), F.col("total_qty").cast("double"))


# =============================================================================
# Scalable as-of join + full pipeline, surfaced for the driver (rows-only)
# =============================================================================


@query("sim_ann_ivf", oracle=None, category="llm-similarity")
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: seeded k-means coarse quantizer, 4-of-16 bucket probe, exact
    re-rank (approximate → rows-only)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    q = [
        float(x)
        for x in load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    return similarity.ivf_topk(emb, "embedding", "vec_id", q, k=10)


@query(
    "asof_merge_events",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS asof_ts, c.value AS asof_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    category="join",
)
def asof_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(left+right) as-of join (cogroup + merge_asof): last click at or
    before each purchase, with the click's value carried over — checked
    against DuckDB's native ASOF LEFT JOIN. Equivalence with the declarative
    composition is also asserted in tests/test_operators.py."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    return asof.asof_join_merge(purchases, clicks, "user_id", "ts", "ts", value_cols=["value"])


@query("pipeline_delivery_e2e", oracle=None, category="pipeline")
def pipeline_delivery_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship delivery pipeline end-to-end on deterministic encrypted
    fixtures (seed=42): scan+metadata join → anti-join → key broadcast →
    AES-CTR decrypt → gunzip → parse → per-file record counts. DuckDB cannot
    decrypt AES-CTR, so this is rows-only; the per-file counts are fixed by the
    seed (8 files × 25 records)."""
    from ..plans import delivery
    from ..sources import fixtures as fx

    from ..util import write_once

    root = os.path.join(tempfile.gettempdir(), "pipeline_e2e_fixture_v1")
    write_once(
        root,
        lambda tmp: fx.generate(tmp, n_files=8, records_per_file=25, seed=42),
        probe=os.path.join(root, "input", "metadata.sidecar.jsonl"),  # written last
    )
    cfg = delivery.RunConfig(
        correlation_id="e2e", topic_name="db.core.claimant", reprocess_files=True
    )
    result = delivery.build_decrypted(spark, os.path.join(root, "input"), os.path.join(root, "status"), cfg)
    records = delivery.parse_records(result.delivered)
    return (
        records.groupBy("fileName", "topic")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct(F.col("record._id.citizenId")).alias("n_ids"),
            F.max(F.col("record._version")).alias("max_version"),
        )
    )
