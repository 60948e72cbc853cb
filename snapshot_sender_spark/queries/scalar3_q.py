"""Query batch 9: remaining scalar families — array set-algebra, sequence
generation, unpivot/stack, map higher-order transforms, and lag-gap-cumsum
sessionization in batch form."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load
from . import query
from .goldens import golden_oracle


@query(
    "array_set_algebra",
    oracle="""
    -- COALESCE: DuckDB's array_to_string([]) is NULL; Spark's array_join is ''
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_cat(string_split(text, ' ')[1:5], ['spark', 'table']))), ','), '') AS union_head,
           COALESCE(array_to_string(list_sort(list_intersect(
             list_distinct(string_split(text, ' ')), ['spark', 'table', 'row'])), ','), '') AS common,
           COALESCE(array_to_string(list_sort(list_filter(list_distinct(string_split(text, ' ')),
             w -> NOT list_contains(['the', 'a', 'of'], w))), ','), '') AS minus_stop,
           CASE WHEN len(list_intersect(list_distinct(string_split(text, ' ')),
                                        ['spark', 'query'])) > 0 THEN 1 ELSE 0 END AS overlaps
    FROM documents WHERE doc_id < 60
    """,
    category="scalar-array",
)
def array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union / intersect / except / overlap), canonicalized
    by sort+join for cross-engine order independence."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    words = F.split(F.col("text"), " ")
    dwords = F.array_distinct(words)
    return d.select(
        "doc_id",
        F.array_join(
            F.array_sort(F.array_union(F.slice(words, 1, 5), F.array(F.lit("spark"), F.lit("table")))),
            ",",
        ).alias("union_head"),
        F.array_join(
            F.array_sort(F.array_intersect(dwords, F.array(F.lit("spark"), F.lit("table"), F.lit("row")))),
            ",",
        ).alias("common"),
        F.array_join(
            F.array_sort(F.array_except(dwords, F.array(F.lit("the"), F.lit("a"), F.lit("of")))),
            ",",
        ).alias("minus_stop"),
        F.when(
            F.arrays_overlap(dwords, F.array(F.lit("spark"), F.lit("query"))), 1
        )
        .otherwise(0)
        .alias("overlaps"),
    )


@query(
    "sequence_generate",
    oracle="""
    SELECT n_nationkey,
           array_to_string(range(1, n_nationkey + 2), ',') AS seq_csv,
           len(range(1, n_nationkey + 2)) AS seq_len
    FROM nation
    """,
    category="scalar-array",
)
def sequence_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence() generation — 1..n per row (range is end-exclusive in DuckDB,
    end-inclusive in Spark; bounds aligned)."""
    n = load(spark, sf_dir, "nation")
    seq = F.sequence(F.lit(1), F.col("n_nationkey") + 1)
    return n.select(
        "n_nationkey",
        F.array_join(seq, ",").alias("seq_csv"),
        F.size(seq).alias("seq_len"),
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, value FROM (
      SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
    ) WHERE c_custkey < 200
    """,
    category="setop",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack(): wide columns → (metric, value) long form."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', CAST(c_acctbal AS DOUBLE), "
        "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)",
    )


@query(
    "map_transform_funcs",
    oracle="""
    SELECT event_id,
           map(['a', 'b'], [value, value * 2])['b'][1] AS doubled,
           array_to_string(map_values(map(['a', 'b'], ['x_' || event_type, 'y_' || event_type])), ',')
             AS tagged_values
    FROM events WHERE event_id < 80
    """,
    category="scalar-map",
)
def map_transform_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + transform_values — header-map manipulation
    (NiFiUtility.kt:12-25 generalized)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 80)
    m_num = F.create_map(F.lit("a"), F.col("value"), F.lit("b"), F.col("value") * 2)
    m_str = F.transform_values(
        F.create_map(F.lit("a"), F.lit("x"), F.lit("b"), F.lit("y")),
        lambda k, v: F.concat(v, F.lit("_"), F.col("event_type")),
    )
    return e.select(
        "event_id",
        F.element_at(m_num, "b").alias("doubled"),
        F.array_join(F.map_values(m_str), ",").alias("tagged_values"),
    )


@query(
    "sessionize_lag_cumsum",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL '45 minutes' THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
    category="window",
)
def sessionize_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by lag-gap flag + running sum — the window-function
    composition equivalent of session_window() (both forms exposed; this one
    carries an explicit session number)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: cast("long") truncates to seconds, which diverges
    # from the oracle's exact interval comparison at the gap boundary
    ts_us = F.unix_micros(F.col("ts"))
    gap = ts_us - F.lag(ts_us).over(w)
    new_s = F.when(gap.isNull() | (gap > 45 * 60 * 1_000_000), 1).otherwise(0)
    numbered = e.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(new_s).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("session_no"),
    )
    return numbered.groupBy("user_id", F.col("session_no").cast("bigint").alias("session_no")).agg(
        F.min("ts").alias("session_start"), F.count("*").alias("n_events")
    )


@query(
    "text_levenshtein_match",
    oracle="""
    SELECT s.s_suppkey AS entity_key,
           s.s_name, c.c_name,
           levenshtein(s.s_name, c.c_name) AS edit_dist,
           CASE WHEN levenshtein(s.s_name, c.c_name) <= 12 THEN 1 ELSE 0 END AS near_match
    FROM supplier s JOIN customer c ON c.c_custkey = s.s_suppkey
    """,
    category="llm-text",
)
def text_levenshtein_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity-resolution primitive) — JVM-side
    levenshtein over a keyed join, integer-exact on both engines."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    dist = F.levenshtein(F.col("s_name"), F.col("c_name"))
    return s.join(c, c.c_custkey == s.s_suppkey).select(
        F.col("s_suppkey").alias("entity_key"),
        "s_name",
        "c_name",
        dist.alias("edit_dist"),
        F.when(dist <= 12, 1).otherwise(0).alias("near_match"),
    )


@query(
    "try_arithmetic_null_safe",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN (o_orderkey % 5) = 0 THEN NULL
                ELSE CAST(o_orderkey * 1000 AS DOUBLE) / (o_orderkey % 5) END AS price_per,
           CASE WHEN (o_orderkey % 3) = 0 THEN NULL ELSE o_orderkey // (o_orderkey % 3) END AS key_div,
           COALESCE(CAST(CASE WHEN o_orderstatus = 'O' THEN NULL
                              ELSE o_orderkey END AS BIGINT), -1) AS safe_cast
    FROM orders WHERE o_orderkey < 500
    """,
    category="scalar-null",
)
def try_arithmetic_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide / try_cast: error-free arithmetic yields NULL instead of
    failing the job — the tolerant-pipeline arithmetic surface (division by
    zero → NULL, mirrored as CASE guards in ANSI SQL)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_orderkey") * 1000, F.col("o_orderkey") % 5).alias("price_per"),
        F.try_divide(F.col("o_orderkey"), F.col("o_orderkey") % 3).cast("bigint").alias("key_div"),
        F.coalesce(
            F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(F.col("o_orderkey")).cast("bigint"),
            F.lit(-1),
        ).alias("safe_cast"),
    )


@query(
    "agg_histogram_fixed_bins",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS bin_min,
           CAST(MAX(o_totalprice) AS DOUBLE) AS bin_max
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
    category="aggregation",
)
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor-division binning — the portable
    histogram primitive (engine histogram functions differ; the binning
    expression is exact on both)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("bin_min"),
            F.max("o_totalprice").cast("double").alias("bin_max"),
        )
        .orderBy("bin")
    )


# Shared soundex state-machine SQL (used by the string_soundex oracle AND the
# edge-case parity test, so the two can't drift): expects a names(rid, s)
# relation already in scope — rids must be unique — and yields sxt(rid, sx).
SOUNDEX_STATE_MACHINE_SQL = """
    chars AS (
      SELECT rid, s, CAST(i AS INT) AS i, substring(upper(s), CAST(i AS INT), 1) AS ch
      FROM names, UNNEST(range(1, length(s) + 1)) AS t(i)
    ),
    coded AS (
      SELECT rid, s, i,
        CASE WHEN regexp_matches(ch, '^[A-Z]$')
             THEN translate(ch, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                '01230127022455012623017202')
             ELSE '0' END AS code
      FROM chars
    ),
    st AS (
      SELECT rid, i, code,
        last_value(CASE WHEN code <> '7' THEN code END IGNORE NULLS)
          OVER (PARTITION BY rid ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
      FROM coded
    ),
    digits AS (
      SELECT rid,
        string_agg(code, '' ORDER BY i)
          FILTER (WHERE i > 1 AND code BETWEEN '1' AND '6'
                  AND (prev IS NULL OR code <> prev)) AS d
      FROM st GROUP BY rid
    ),
    sxt AS (
      SELECT n.rid,
        CASE WHEN NOT regexp_matches(substring(n.s, 1, 1), '^[A-Za-z]$') THEN n.s
             ELSE substring(upper(n.s), 1, 1)
                  || rpad(coalesce(substring(d.d, 1, 3), ''), 3, '0')
        END AS sx
      FROM names n LEFT JOIN digits d USING (rid)
    )
"""


@query(
    "string_soundex",
    # even/odd rids keep the two sources disjoint at ANY scale factor (a
    # fixed offset would collide once custkey grows past it)
    oracle=f"""
    WITH names AS (
      SELECT c_custkey * 2 AS rid, c_name AS s FROM customer
      UNION ALL
      SELECT p_partkey * 2 + 1 AS rid, p_name AS s FROM part
    ),
    {SOUNDEX_STATE_MACHINE_SQL}
    SELECT sx, COUNT(*) AS n FROM sxt GROUP BY sx ORDER BY sx
    """,
    category="string",
)
def string_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic codes over customer names (fuzzy-match blocking key)
    — EXACT oracle (upgraded round 5 from rows-only): American Soundex is a
    small state machine, fully expressible in SQL. The DuckDB side replays
    Spark's Soundex expression semantics, pinned empirically: first char not
    an ASCII letter → input returned unchanged; H/W are transparent (the
    previous code survives them, so codes separated only by H/W collapse);
    vowels AND embedded non-letters reset the previous code; mapping
    '01230127022455012623017202' for A-Z with '7' marking H/W. The
    last_value(... IGNORE NULLS) window is the 'previous effective code'
    register; the classic test vector (Robert/Rupert→R163, Ashcraft→A261,
    Tymczak→T522, Pfister→P236) stays pinned in tests/test_text.py, and
    tests/test_operators.py pins the SQL against F.soundex on the
    adversarial edge strings (BhB, B#B, Hxy, hw, Ångström…)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_name").alias("s"))
    p = load(spark, sf_dir, "part").select(F.col("p_name").alias("s"))
    return (
        c.unionAll(p)  # part names are varied multi-word strings — customer
        .select(F.soundex("s").alias("sx"))  # names alone collapse to 1 code
        .groupBy("sx")
        .agg(F.count("*").alias("n"))
        .orderBy("sx")
    )


@query(
    "agg_histogram_numeric",
    # GOLDEN-PINNED (goldens.py): the streaming-histogram centroid merge is
    # order-dependent, so the query canonicalizes its input first (orderBy
    # unique key + coalesce(1), the sample_deterministic trick) — updates are
    # then sequential in total key order and the centroids are machine- and
    # core-count-independent; the oracle replays the committed golden.
    oracle=golden_oracle("agg_histogram_numeric"),
    category="aggregation",
)
def agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive-bin histogram sketch (histogram_numeric — Ben-Haim/Tom-Tov
    style centroids). Canonical input order (see oracle comment) makes the
    sketch reproducible; its exact sibling is `agg_histogram_fixed_bins`, and
    tests additionally pin that centroid weights sum to the row count and
    centroids lie inside the data range. At cluster scale drop the
    canonicalization — the bins stay valid, just not bit-pinned."""
    o = load(spark, sf_dir, "orders").orderBy("o_orderkey").coalesce(1)
    return (
        o.select(F.col("o_totalprice").cast("double").alias("v"))
        .agg(F.expr("histogram_numeric(v, 8)").alias("bins"))
        .select(F.explode("bins").alias("b"))
        .select(F.col("b.x").alias("centroid"), F.col("b.y").alias("weight"))
    )
