"""Query batch 10: chained streaming window rollups, intra-document
repetition removal, deterministic MODE aggregation, and weighted hash
sampling.

Chained time-window aggregation generalizes the reference's periodic metric
rollup (PushGatewayServiceImpl.kt:22-26 pushes 20 s snapshots that Prometheus
re-aggregates at scrape resolution): the fine window feeds the coarse one in a
single streaming plan. The curation ops extend the LLM-pipeline family
(repetition removal is the intra-document counterpart of corpus-level dedup;
weighted sampling is quality-proportional corpus downsampling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import windows as sw
from ..tables import load
from . import query


@query(
    "stream_chained_window",
    oracle="""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
             COUNT(*) AS n
      FROM events
      GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL '6 hours', h) AS window_start, event_type,
           CAST(SUM(n) AS BIGINT) AS total_events,
           CAST(MAX(n) AS BIGINT) AS peak_hour_events
    FROM hourly
    WHERE time_bucket(INTERVAL '6 hours', h) < TIMESTAMP '2024-01-30 00:00:00'
    GROUP BY 1, 2
    """,
    category="streaming",
)
def stream_chained_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained time-window aggregations in ONE streaming query (Spark 4
    multiple-stateful-operator support): hourly counts per event_type feed a
    6-hour rollup via window(window_time(window)) — total and peak-hour counts
    per coarse window. Both levels run append-mode off a single watermark;
    the open tail window is excluded identically on both engines."""
    events = sw.read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    hourly = events.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n")
    )
    rolled = (
        hourly.groupBy(
            F.window(F.window_time("window"), "6 hours").alias("w6"), "event_type"
        )
        .agg(
            F.sum("n").alias("total_events"),
            F.max("n").alias("peak_hour_events"),
        )
        .select(
            F.col("w6.start").alias("window_start"),
            "event_type",
            "total_events",
            "peak_hour_events",
        )
    )
    out = sw.run_to_memory(rolled, "append")
    return out.filter(F.col("window_start") < F.lit("2024-01-30").cast("timestamp"))


@query(
    "text_repetition_removal",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    positioned AS (
      SELECT doc_id, ws[i] AS word, i AS pos
      FROM words, UNNEST(range(1, len(ws) + 1)) AS t(i)
    ),
    firsts AS (
      SELECT doc_id, word, MIN(pos) AS first_pos, COUNT(*) AS n_occ
      FROM positioned GROUP BY doc_id, word
    )
    SELECT doc_id,
           string_agg(word, ' ' ORDER BY first_pos) AS dedup_text,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(n_occ) AS BIGINT) AS n_total
    FROM firsts GROUP BY doc_id
    """,
    category="llm-curation",
)
def text_repetition_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal (the within-doc counterpart of corpus
    dedup, à la C4/Gopher cleanup): drop repeated tokens keeping the FIRST
    occurrence, preserving original order. posexplode → min(pos) per token →
    order-restoring re-assembly; only (doc_id, token, pos) triples shuffle,
    never full documents."""
    d = load(spark, sf_dir, "documents")
    positioned = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    )
    firsts = positioned.groupBy("doc_id", "word").agg(
        F.min("pos").alias("first_pos"), F.count("*").alias("n_occ")
    )
    return firsts.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("first_pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("dedup_text"),
        F.count("*").alias("n_unique"),
        F.sum("n_occ").alias("n_total"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH counted AS (
      SELECT event_type, user_id, COUNT(*) AS cnt
      FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
      SELECT event_type, user_id, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, user_id ASC) AS rn
      FROM counted
    )
    SELECT event_type, user_id AS modal_user, cnt AS modal_count
    FROM ranked WHERE rn = 1
    """,
    category="aggregation",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (Spark 4 ``mode(col, true)`` — ties break to the
    LOWEST value, so the result is engine-reproducible, unlike the default
    arbitrary-tie mode). The oracle states the same contract explicitly as a
    count-desc/value-asc argmax."""
    e = load(spark, sf_dir, "events")
    modal = e.groupBy("event_type").agg(
        F.expr("mode(user_id, true)").alias("modal_user")
    )
    counts = e.groupBy("event_type", "user_id").agg(F.count("*").alias("modal_count"))
    return modal.join(
        counts,
        (modal.event_type == counts.event_type) & (modal.modal_user == counts.user_id),
    ).select(modal.event_type, "modal_user", "modal_count")


@query(
    "sample_weighted_hash",
    oracle="""
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM documents
    WHERE ((doc_id % 1000) * 2654435761 + 97) % 1000
          < LEAST(800, n_chars * 3)
    GROUP BY source
    """,
    category="sampling",
)
def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic sampling: each document is kept with
    probability ∝ its length (permille threshold = min(800, 3·n_chars)),
    decided by a multiplicative hash of its id — integer-only, so ANY engine
    selects the same rows. The importance-/quality-weighted downsampling step
    of a corpus pipeline, with none of the seeded-RNG portability problems.
    doc_id is reduced mod 1000 before the multiply (same residue class, since
    (a mod m)·k ≡ a·k mod m) so the product can't overflow DuckDB's checked
    int64 at large scale factors."""
    d = load(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.pmod(F.col("doc_id").cast("bigint"), F.lit(1000))
        * F.lit(2654435761).cast("bigint")
        + F.lit(97),
        F.lit(1000),
    )
    permille = F.least(F.lit(800), F.col("n_chars") * 3)
    return (
        d.filter(bucket < permille)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("chars_kept"))
    )


@query(
    "curation_token_budget_mix",
    oracle="""
    WITH sized AS (
      SELECT doc_id, source, (n_chars + 3) // 4 AS toks,
             SUM((n_chars + 3) // 4) OVER (
               PARTITION BY source ORDER BY md5(text), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS tokens_used
    FROM sized WHERE cum_toks <= 300
    GROUP BY source
    """,
    category="llm-curation",
)
def curation_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing to a per-source TOKEN budget (the unit that matters for
    training-data recipes, vs curation_source_cap's document count): docs are
    taken in deterministic seedless-shuffle order (md5(text), doc_id) until
    each source's running token total hits the budget. Integer token proxy
    (ceil(chars/4)) keeps it engine-exact; the running sum is one window over
    the source-partitioned shuffle — no global sort, no collect."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = F.expr("(n_chars + 3) div 4")
    w = (
        Window.partitionBy("source")
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select("doc_id", "source", toks.alias("toks"), F.md5("text").alias("shuffle_key"))
        .withColumn("cum_toks", F.sum("toks").over(w))
        .filter(F.col("cum_toks") <= 300)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").alias("tokens_used"))
    )
