"""Relational surface, batch 2: the SQL-API entry path (CTEs, correlated
subqueries, HAVING — Catalyst produces identical plans to the DataFrame API),
additional window frames, null-handling functions, exact percentiles, and the
remaining join/set-op variants. Same float policy as batch 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load, register_views
from . import query
from .goldens import golden_oracle
from .relational import SQL_DSUM, _money

# =============================================================================
# SQL API: CTE / subqueries / HAVING — same Catalyst plans as the DataFrame API
# =============================================================================


@query(
    "sql_cte_revenue",
    oracle=f"""
    WITH cust_orders AS (
      SELECT c.c_nationkey AS nk, o.o_totalprice AS price
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    )
    SELECT n.n_name, {SQL_DSUM('co.price')} AS revenue, COUNT(*) AS n_orders
    FROM cust_orders co JOIN nation n ON n.n_nationkey = co.nk
    GROUP BY n.n_name
    """,
    category="sql",
)
def sql_cte_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH common-table-expression feeding an aggregate — the named-subplan SQL surface."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH cust_orders AS (
          SELECT c.c_nationkey AS nk, o.o_totalprice AS price
          FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        )
        SELECT n.n_name, {SQL_DSUM('co.price')} AS revenue, COUNT(*) AS n_orders
        FROM cust_orders co JOIN nation n ON n.n_nationkey = co.nk
        GROUP BY n.n_name
        """
    )


@query(
    "sql_exists_correlated",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
    """,
    category="sql",
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join by Catalyst (the
    finished-filter idiom, FinishedFilterProcessor.kt:17-27, in SQL form)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
        )
        """
    )


@query(
    "sql_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    ) AND o_totalprice > 300000
    """,
    category="sql",
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — planned as a left semi join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        ) AND o_totalprice > 300000
        """
    )


@query(
    "sql_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                              / COUNT(*) FROM customer) * 1.8
    """,
    category="sql",
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in the projection — the 1-row broadcast pattern."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                                  / COUNT(*) FROM customer) * 1.8
        """
    )


@query(
    "sql_having",
    oracle=f"""
    SELECT l_suppkey, COUNT(*) AS n_items, {SQL_DSUM('l_extendedprice')} AS total
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 550
    """,
    category="sql",
)
def sql_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING — the post-aggregate filter."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_suppkey, COUNT(*) AS n_items, {SQL_DSUM('l_extendedprice')} AS total
        FROM lineitem
        GROUP BY l_suppkey
        HAVING COUNT(*) > 550
        """
    )


@query(
    "sql_distinct_multi",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey FROM lineitem
    """,
    category="sql",
)
def sql_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over multiple columns — dedup as an aggregate without measures."""
    l = load(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus", "l_suppkey").distinct()


@query(
    "sql_lateral_explode",
    oracle="""
    SELECT doc_id, pos, word FROM (
      SELECT doc_id, CAST(i - 1 AS INT) AS pos, ws[i] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 20),
           UNNEST(range(1, len(ws) + 1)) AS t(i)
    )
    """,
    category="sql",
)
def sql_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode / LATERAL VIEW — positional token stream (the record-number
    ordering the reference's payload encodes in _id.citizenId, s3_files.py:42)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    )


# =============================================================================
# More joins / set ops
# =============================================================================


@query(
    "join_right_outer",
    oracle="""
    SELECT n.n_nationkey, n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name
    """,
    category="join",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join — the mirrored preserve-right form."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_self_pairs",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_close_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND b.ts BETWEEN a.ts AND a.ts + INTERVAL '5 minutes'
    WHERE a.event_type = 'purchase' AND b.event_type = 'purchase'
    GROUP BY a.user_id
    """,
    category="join",
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with a time-band predicate (burst detection)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    a = e.select(F.col("user_id"), F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = e.select(
        F.col("user_id").alias("user_b"), F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b")
    )
    return (
        a.join(
            b,
            (a.user_id == b.user_b)
            & (F.col("id_a") < F.col("id_b"))
            & F.col("ts_b").between(F.col("ts_a"), F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_close_pairs"))
    )


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
    category="setop",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — bag union followed by the dedup shuffle."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


# =============================================================================
# Window frames: RANGE BETWEEN, first/last/nth
# =============================================================================


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM orders
    """,
    category="window",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: peers counted by value distance, not row position."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_in_band"),
    )


@query(
    "window_cume_dist",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           CUME_DIST() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS cd
    FROM supplier
    """,
    category="window",
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist: rows ≤ current / partition size — exact rational of small
    ints, identical double on both engines under a total order."""
    from pyspark.sql import Window as W2

    s = load(spark, sf_dir, "supplier")
    w = W2.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey", "s_nationkey", "s_acctbal", F.cume_dist().over(w).alias("cd")
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           FIRST_VALUE(s_suppkey) OVER w AS first_supp,
           LAST_VALUE(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_supp,
           NTH_VALUE(s_suppkey, 2) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_supp
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    category="window",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over ordered frames (frame-exact semantics on both engines)."""
    s = load(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return s.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.first("s_suppkey").over(w).alias("first_supp"),
        F.last("s_suppkey").over(w_full).alias("last_supp"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("second_supp"),
    )


# =============================================================================
# Null handling / conditionals / percentiles / string position family
# =============================================================================


@query(
    "null_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_flag,
           CASE WHEN NULLIF(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END AS tax_is_zero,
           LEAST(l_quantity, CAST(10 AS DOUBLE)) AS q_capped,
           GREATEST(l_discount, l_tax) AS max_rate
    FROM lineitem WHERE l_orderkey < 200
    """,
    category="scalar-null",
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL family (the reference's explicit-null payload fields,
    s3_files.py:51, SURVEY.md §1.2)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias("disc_or_flag"),
        F.when(F.nullif(F.col("l_tax"), F.lit(0.0)).isNull(), 1).otherwise(0).alias("tax_is_zero"),
        F.least(F.col("l_quantity"), F.lit(10).cast("double")).alias("q_capped"),
        F.greatest(F.col("l_discount"), F.col("l_tax")).alias("max_rate"),
    )


@query(
    "percentile_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(FLOOR(l_extendedprice * 100) AS BIGINT), 0.5) AS median_cents,
           quantile_cont(CAST(FLOOR(l_extendedprice * 100) AS BIGINT), 0.9) AS p90_cents,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregation",
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles over integer-quantized cents (interpolated
    halves/tenths of integers < 2^53 are exact in double on both engines —
    queries/__init__ float policy)."""
    l = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    return l.groupBy("l_returnflag").agg(
        F.percentile(cents, F.lit(0.5)).alias("median_cents"),
        F.percentile(cents, F.lit(0.9)).alias("p90_cents"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
    )


@query(
    "agg_rollup_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    category="aggregation",
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id() distinguishes genuine NULL group keys from rollup
    subtotal rows — required for correct totals consumption downstream."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("bigint").alias("gid"), F.count("*").alias("n")
    )


@query(
    "agg_approx_quantile",
    # GOLDEN-PINNED (goldens.py): GK summaries are merge-order-dependent, so
    # the query canonicalizes its input first (orderBy unique key +
    # coalesce(1), the sample_deterministic trick) — the sequential update
    # order is then total and the sketch output is machine- and
    # core-count-independent; the oracle replays the committed golden.
    oracle=golden_oracle("agg_approx_quantile"),
    category="aggregation",
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the mergeable-quantile
    path when the exact sort doesn't fit (the exact interpolated variant is
    `percentile_exact`). Canonical input order (see oracle comment) makes the
    sketch reproducible; at cluster scale drop the canonicalization and the
    estimates stay within the accuracy bound, just not bit-pinned."""
    l = (
        load(spark, sf_dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")  # unique key → total order
        .coalesce(1)  # one partition → merge-order-independent sketch
    )
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75, 0.99], 10000).alias(
            "price_quartiles"
        ),
        F.count("*").alias("n"),
    )


@query(
    "string_position_funcs",
    oracle="""
    SELECT p_partkey,
           strpos(p_name, 'e') AS pos_e,
           split_part(p_brand, '#', 1) AS brand_word,
           split_part(p_brand, '#', 2) AS brand_num,
           CAST(lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS VARCHAR) AS padded,
           reverse(p_brand) AS rev_brand,
           repeat('ab', 3) AS repeated
    FROM part WHERE p_partkey < 300
    """,
    category="scalar-string",
)
def string_position_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position/search string family: instr, locate, substring_index, lpad/rpad."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.instr(F.col("p_name"), "e").alias("pos_e"),
        F.substring_index(F.col("p_brand"), "#", 1).alias("brand_word"),
        F.substring_index(F.col("p_brand"), "#", -1).alias("brand_num"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded"),
        F.reverse(F.col("p_brand")).alias("rev_brand"),
        F.lit("ab" * 3).alias("repeated"),
    )


@query(
    "map_funcs",
    oracle="""
    SELECT event_id,
           map(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)])['type'][1] AS from_map_type,
           map(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)])['uid'][1] AS from_map_uid,
           array_to_string(map_keys(map(['type', 'uid'],
                                        [event_type, CAST(user_id AS VARCHAR)])), ',') AS keys_csv
    FROM events WHERE event_id < 100
    """,
    category="scalar-map",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (the reference's header/metadata maps NiFiUtility.kt:12-25,
    S3DirectoryReader.kt:82-84)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("from_map_type"),
        F.element_at(m, "uid").alias("from_map_uid"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@query(
    "udaf_grouped_median",
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.5) AS low_median,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
    category="aggregation",
)
def udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via a grouped-agg pandas UDF (the UDAF surface):
    exact lower median per group, computed vectorized over each group's
    Arrow batch. Lower median (sorted[(n-1)//2]) rather than interpolated:
    it's an element of the input, so the result is bit-identical to DuckDB's
    quantile_disc — interpolated medians differ in final-ulp rounding between
    engines.

    Scale shape: grouped-agg UDFs shuffle each group to one task (no partial
    aggregation) — correct for bounded group counts like this (5 priorities);
    for high-cardinality keys the built-in percentile/median stays the fast
    path (two-phase, JVM-side)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def low_median(v):
        s = v.sort_values().reset_index(drop=True)
        return float(s[(len(s) - 1) // 2])

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def group_n(v):
        return len(v)

    # Spark disallows mixing grouped-agg pandas UDFs with built-in aggregates
    # in one agg() — both metrics go through the UDAF path
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        low_median("o_totalprice").alias("low_median"),
        group_n("o_totalprice").alias("n"),
    )
