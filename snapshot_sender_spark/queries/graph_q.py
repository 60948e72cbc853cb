"""Query batch 5: near-dup connected components (iterative label propagation
vs a recursive-CTE oracle), stream-stream join, array higher-order functions,
and the interval/date-arithmetic family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, graph
from ..tables import load
from . import query

_EDGES_SQL = """
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    shingled AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] AS shingle
      FROM words, UNNEST(range(1, len(ws))) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shingled GROUP BY doc_id),
    pair_counts AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM shingled a JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM pair_counts
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_shared AS DOUBLE)
              / CAST(sa.set_size + sb.set_size - n_shared AS DOUBLE) >= 0.2
    )
"""


@query(
    "graph_near_dup_components",
    oracle=(
        _EDGES_SQL
        + """,
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON r.node = e.v
    )
    SELECT node, MIN(label) AS component FROM reach GROUP BY node
    """
    ).replace("WITH words", "WITH RECURSIVE words", 1),
    category="llm-dedup",
)
def graph_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: Jaccard≥0.2 candidate pairs merged into
    connected components by iterative min-label propagation
    (operators/graph.py) — fixpoint equals the recursive-CTE reachability
    closure, hence the shared oracle."""
    edges = dedup.ngram_jaccard_pairs_gemm(
        load(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.2
    ).select("id_a", "id_b")
    return graph.connected_components(edges)


@query(
    "graph_near_dup_components_star",
    oracle=(
        _EDGES_SQL
        + """,
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON r.node = e.v
    )
    SELECT node, MIN(label) AS component FROM reach GROUP BY node
    """
    ).replace("WITH words", "WITH RECURSIVE words", 1),
    category="llm-dedup",
)
def graph_near_dup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same near-dup clustering through the diameter-independent
    alternating large-star/small-star algorithm (Kiveris et al. SoCC'14,
    operators/graph.py::connected_components_star) — O(log n) rounds where
    label propagation needs O(diameter); the scale path for chain-shaped
    duplicate graphs. Identical fixpoint (component = min reachable id), so
    it shares the recursive-CTE oracle with graph_near_dup_components."""
    edges = dedup.ngram_jaccard_pairs_gemm(
        load(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.2
    ).select("id_a", "id_b")
    return graph.connected_components_star(edges)


@query(
    "stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL '1 hour' AND p.ts
    WHERE p.event_type = 'purchase'
    """,
    category="streaming",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks + a time-range condition
    (clicks within the hour before each purchase) — the stateful two-sided
    join; state bounded by the watermark on both sides."""
    from ..streaming import windows as sw

    purchases = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.c_ts <= purchases.p_ts),
        "inner",
    ).select("purchase_id", "click_id", "user_id")
    return sw.run_to_memory(joined, "append")


@query(
    "stream_stream_left_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL '30 minutes' AND p.ts
    WHERE p.event_type = 'purchase'
      AND p.ts < TIMESTAMP '2024-01-25 00:00:00'
    """,
    category="streaming",
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: purchases with no click in the prior 30
    minutes emit with a NULL click once the watermark passes — the
    unmatched-row semantics only watermarks make possible in streaming.

    The comparison is bounded to purchases well before the stream tail: null
    emission near the end of input depends on Spark's internal state-watermark
    arithmetic (event watermark minus join interval, with engine-version
    subtleties) — rows that old are guaranteed emitted, so the outer-join
    semantics stay oracle-checkable without modeling the tail."""
    from ..streaming import windows as sw

    purchases = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        sw.read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 30 MINUTES"))
        & (clicks.c_ts <= purchases.p_ts),
        "left_outer",
    ).select("purchase_id", "click_id", "user_id", "p_ts")
    out = sw.run_to_memory(joined, "append")
    return out.filter(F.col("p_ts") < F.lit("2024-01-25").cast("timestamp")).select(
        "purchase_id", "click_id", "user_id"
    )


@query(
    "array_higher_order",
    oracle="""
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT)
             AS total_word_len,
           len(list_filter(string_split(text, ' '), w -> length(w) > 4)) AS n_long_words,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        w -> CASE WHEN length(w) > 4 THEN 1 ELSE 0 END)) AS BIGINT)
             AS n_long_words2,
           array_to_string(list_transform(string_split(text, ' ')[1:3], w -> upper(w)), '-')
             AS first3_upper
    FROM documents WHERE doc_id < 50
    """,
    category="scalar-array",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: transform / filter / aggregate (fold) /
    slice — all JVM lambda expressions inside codegen, no Python."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("total_word_len"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long_words"),
        F.aggregate(
            F.transform(words, lambda w: F.when(F.length(w) > 4, 1).otherwise(0)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("n_long_words2"),
        F.array_join(F.transform(F.slice(words, 1, 3), lambda w: F.upper(w)), "-").alias(
            "first3_upper"
        ),
    )


@query(
    "date_interval_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3mo,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(make_date(CAST(year(o_orderdate) AS INT), 1, 1) AS TIMESTAMP) AS year_start,
           CAST(o_orderdate - INTERVAL 90 DAY AS TIMESTAMP) AS minus_90d
    FROM orders WHERE o_orderkey < 800
    """,
    category="scalar-date",
)
def date_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL arithmetic: add/subtract day-time and year-month intervals, timestamp differences — calendar-exact on both engines."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 800)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d.cast("date"), 3).cast("timestamp").alias("plus_3mo"),
        F.last_day(d.cast("date")).cast("timestamp").alias("month_end"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.make_date(F.year(d), F.lit(1), F.lit(1)).cast("timestamp").alias("year_start"),
        F.date_sub(d.cast("date"), 90).cast("timestamp").alias("minus_90d"),
    )


@query(
    "graph_pagerank_unrolled",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e AS (
      SELECT src, dst FROM raw
      UNION
      SELECT dst AS src, src AS dst FROM raw
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    s0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score FROM deg),
    i1 AS (
      SELECT e.dst AS node,
             150000 + (85 * SUM(s0.score // deg.d)) // 100 AS score
      FROM e JOIN s0 ON s0.node = e.src JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    i2 AS (
      SELECT e.dst AS node,
             150000 + (85 * SUM(i1.score // deg.d)) // 100 AS score
      FROM e JOIN i1 ON i1.node = e.src JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    i3 AS (
      SELECT e.dst AS node,
             150000 + (85 * SUM(i2.score // deg.d)) // 100 AS score
      FROM e JOIN i2 ON i2.node = e.src JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    )
    SELECT node, CAST(score AS BIGINT) AS score
    FROM i3 ORDER BY score DESC, node LIMIT 20
    """,
    category="graph",
)
def graph_pagerank_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trade graph, three synchronous
    iterations in *integer* arithmetic (scores scaled ×1e6, per-edge integer
    division) — deterministic on any engine and any partitioning because every
    reduction is an integer sum, so the whole iteration is oracle-checked
    (float PageRank can't be: summation order changes the bits).

    Scale shape: the classic iterative join-aggregate — edges shuffle-keyed by
    src once, each iteration is one shuffle on dst; scores (two longs/node)
    are the only iterating state. On a cluster the edge table is persisted
    across iterations and AQE handles hub-node skew."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    raw = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    e = raw.union(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    # iterating over a shared, persisted edge list: the loop re-joins e each
    # round, so materialize it once instead of recomputing the orders⋈lineitem
    e = e.persist()
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    edges = e.join(deg, "src")  # (src, dst, d) — the static join, reused each iter
    scores = deg.select(F.col("src").alias("node"), F.lit(1000000).cast("long").alias("score"))
    for _ in range(3):
        scores = (
            edges.join(scores, edges.src == scores.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(
                (F.lit(150000) + F.expr("85 * sum(score div d) div 100")).alias("score")
            )
            .select(F.col("node2").alias("node"), F.col("score").cast("long"))
        )
    return scores.orderBy(F.desc("score"), F.asc("node")).limit(20)
