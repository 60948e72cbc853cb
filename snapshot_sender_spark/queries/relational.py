"""Relational operator surface (SURVEY.md §2B): scans, projection/filter,
every join flavor, aggregations (incl. rollup/cube/grouping sets), windows,
sort/top-k, set ops, and the scalar function families (string / date / math /
array / map / json / crypto-codec).

Each query exists because a reference behavior motivates the operator class —
citations in the per-query docstrings point at /root/reference.

Float policy: see package docstring — DECIMAL-exact sums cast to double,
no round() anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load, view
from . import query
from .goldens import golden_oracle

# ---- exact-arithmetic helpers (see queries/__init__ docstring) ---------------


def _money(c):
    """2-decimal money column → exact decimal."""
    return c.cast("decimal(12,2)")


def _factor(c):
    """Small 2-decimal factor (discount/tax) → exact decimal."""
    return c.cast("decimal(4,2)")


def _cents(c):
    """Exact integer cents of a 2-decimal column, entirely in double/long
    codegen (no per-value BigDecimal): for any column whose true values have
    ≤2 decimals, the stored double is within ~1e-10 of cents/100, so
    ``x*100 + 0.5`` always lands strictly inside ``(n, n+1)`` for the true
    cents value ``n`` — ``floor`` recovers ``n`` exactly, for negative values
    too (``floor(-846.69·100 + 0.5) = -84669``). Value-identical to the
    previous ``CAST(c AS DECIMAL(12,2))*100 → LONG`` kernel (which is the
    form the DuckDB oracles use) on every money column of the testdata at all
    three SFs — pinned by tests/test_cents_kernel.py; the decimal form's
    BigDecimal allocation per value made it ~1.7× slower on the single-task
    scan stage (r13 measurement). Precondition (documented, not checked):
    inputs are 2-decimal money values — an input at an exact half-cent
    (x = k + 0.005) would round HALF_UP in the decimal form and to-nearest
    here; no such value can exist in a 2-decimal column."""
    return F.floor(c * 100 + F.lit(0.5))


def _from_cents(sum_col, scale: int):
    """long Σcents·10^k → the identical double the DECIMAL-sum form yields:
    decimal(38,·)/10^k is exact (result scale ≥ k), so the final double cast
    is the single correct rounding — bit-equal to BigDecimal.doubleValue of
    the decimal sum. Caller bound (documented): |Σ| < 2^63, i.e. rows ×
    max-product < 9.2e18 — holds through sf100-scale sums; beyond that use
    the decimal form."""
    return (sum_col.cast("decimal(38,6)") / F.lit(10 ** scale)).cast("double")


def dsum(c):
    """Order-independent exact sum of a 2-decimal column, returned as double
    (integer-cents fast path, value-identical to SUM(DECIMAL(12,2))→DOUBLE)."""
    return _from_cents(F.sum(_cents(c)), 2)


def davg(c):
    return (_from_cents(F.sum(_cents(c)), 2) / F.count(c)).alias("davg")


# SQL-text forms of the integer-cents kernel (r13): one F.expr per aggregate
# instead of dozens of Column-method py4j round trips — q1's Python-side
# build went 0.19s -> 0.06s. The strings are analyzed to the EXACT same
# expressions as the Column helpers above (0.5D keeps the literal a double,
# matching F.lit(0.5)); tests/test_cents_kernel.py pins semanticHash equality
# between the two constructions so any drift fails loudly.
def _CENTS_SQL(col: str) -> str:
    return f"FLOOR({col} * 100 + 0.5D)"


def _FROM_CENTS_SQL(sum_expr: str, scale: int) -> str:
    return f"CAST(CAST({sum_expr} AS DECIMAL(38,6)) / {10 ** scale} AS DOUBLE)"


def _DSUM_SQL(col: str) -> str:
    return _FROM_CENTS_SQL(f"SUM({_CENTS_SQL(col)})", 2)


# SQL-side equivalents
def SQL_DSUM(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE)"


def SQL_DAVG(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE) / COUNT({expr}))"


# =============================================================================
# Scans / projection / filter / predicates
# =============================================================================


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM('l_quantity')} AS sum_qty,
           {SQL_DSUM('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
           {SQL_DAVG('l_quantity')} AS avg_qty,
           {SQL_DAVG('l_extendedprice')} AS avg_price,
           (CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount)) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    category="aggregation",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical grouped-aggregate plan
    (partial/map-side agg + final agg — Catalyst does the two-phase split).
    Motivated by the reference's per-collection counters
    (MetricsConfiguration.kt:20-93) generalized to full grouped aggregation."""
    # integer-cents kernel: products/sums in long (codegen fast path), the
    # exact-decimal division at the end — bit-equal to the DECIMAL-sum oracle
    # (see _CENTS_SQL). Built as ONE spark.sql text over the memoized view
    # (r14): the groupBy/agg Column chain still cost ~360 py4j round trips
    # per build — optimized-plan identity with the Column form pinned by
    # tests/test_cents_kernel.py::test_q1_expr_build_plan_identity and
    # tests/test_sqltext_builders.py.
    price_c = _CENTS_SQL("l_extendedprice")
    qty_c = _CENTS_SQL("l_quantity")
    disc_c = _CENTS_SQL("l_discount")
    disc_comp_c = f"100 - {disc_c}"  # ≡ cents(1 - d) for a 2-decimal d
    tax_comp_c = f"100 + {_CENTS_SQL('l_tax')}"
    lv = view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               {_DSUM_SQL('l_quantity')} AS sum_qty,
               {_DSUM_SQL('l_extendedprice')} AS sum_base_price,
               {_FROM_CENTS_SQL(f"SUM(({price_c}) * ({disc_comp_c}))", 4)} AS sum_disc_price,
               {_FROM_CENTS_SQL(f"SUM(({price_c}) * ({disc_comp_c}) * ({tax_comp_c}))", 6)} AS sum_charge,
               {_FROM_CENTS_SQL(f"SUM({qty_c})", 2)} / COUNT(l_quantity) AS avg_qty,
               {_FROM_CENTS_SQL(f"SUM({price_c})", 2)} / COUNT(l_extendedprice) AS avg_price,
               {_FROM_CENTS_SQL(f"SUM({disc_c})", 2)} / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM {lv}
        WHERE l_shipdate <= CAST('2000-09-02' AS TIMESTAMP)
        GROUP BY l_returnflag, l_linestatus
    """)


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus <> 'F'
      AND o_totalprice BETWEEN 10000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    category="filter",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate family =, <>, BETWEEN, IN, >= — the generalized form of the
    reference's denylist/equality filters (FilterBlockedTopicsUtils.kt:24).
    All push down to the parquet scan (PushedFilters in .explain)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") != "F")
        & F.col("o_totalprice").between(10000, 200000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "filter_like_null",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_name LIKE 'Customer#00000000%'
      AND c_acctbal IS NOT NULL
      AND (c_mktsegment = 'BUILDING' OR c_acctbal < 0)
    """,
    category="filter",
)
def filter_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IS NULL / boolean composition (reference regex-validate filter
    class, TextParsingUtility.kt:7-11)."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_name").like("Customer#00000000%")
        & F.col("c_acctbal").isNotNull()
        & ((F.col("c_mktsegment") == "BUILDING") | (F.col("c_acctbal") < 0))
    ).select("c_custkey", "c_name", "c_acctbal")


# =============================================================================
# Joins — every flavor (reference motivations in SURVEY.md §2B row "Joins")
# =============================================================================


@query(
    "join_inner_3way",
    oracle=f"""
    SELECT c.c_mktsegment,
           {SQL_DSUM('l.l_extendedprice')} AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_mktsegment
    """,
    category="join",
)
def join_inner_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-table inner equi-join chain (customer ⋈ orders ⋈ lineitem) — dims
    broadcast, fact never re-shuffles per join. Joins are written fact-first
    (r13): ``c.join(o).join(l)`` made Catalyst's size estimate pick the
    LINEITEM projection as the build side (600 k-row hash relation, and the
    fact side broadcast — backwards at any scale); streaming the fact and
    joining dims onto it keeps every build side a dimension."""
    # one SQL text over memoized views (r14) — optimized-plan-identical to
    # the Column chain, pinned by tests/test_sqltext_builders.py
    lv = view(spark, sf_dir, "lineitem")
    ov = view(spark, sf_dir, "orders")
    cv = view(spark, sf_dir, "customer")
    return spark.sql(f"""
        SELECT c_mktsegment, {_DSUM_SQL('l_extendedprice')} AS revenue,
               COUNT(*) AS n_items
        FROM {lv} l
        JOIN {ov} o ON l.l_orderkey = o.o_orderkey
        JOIN {cv} c ON o.o_custkey = c.c_custkey
        GROUP BY c_mktsegment
    """)


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    category="join",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving all left rows (the reference's status-table lookup shape)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(cs.nk, ss.nk) AS nationkey,
           COALESCE(cs.n_customers, 0) AS n_customers,
           COALESCE(ss.n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1) cs
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) ss
      ON cs.nk = ss.nk
    """,
    category="join",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: unmatched rows of both sides survive with NULL opposite columns."""
    cs = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    ss = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    # USING-style join key is already coalesced by Spark for full_outer
    return cs.join(ss, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    category="join",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers without orders — the reference's finished-marker anti-join
    pattern (FinishedFilterProcessor.kt:17-27) on relational data."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 250000)
    """,
    category="join",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — EXISTS as a join type; emits each left row at most once (the key-membership probe)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@query(
    "join_broadcast_enrich",
    oracle=f"""
    SELECT n.n_name, r.r_name,
           {SQL_DSUM('c.c_acctbal')} AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    category="join",
)
def join_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension enrichment via explicit broadcast — the reference's
    data-key memo cache (HttpKeyService.kt:48-73) is exactly a broadcast join
    of a tiny distinct-key lookup against a large fact side."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name", "r_name")
        .agg(dsum(F.col("c_acctbal")).alias("total_acctbal"), F.count("*").alias("n_customers"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    category="join",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (the one intentional cartesian in the surface) — tiny dims only."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_range_theta",
    oracle="""
    SELECT p.p_size, COUNT(*) AS n_matches,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM part p
    JOIN lineitem l
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
    GROUP BY p.p_size
    """,
    category="join",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: BETWEEN band on top of the key join.
    At scale the equi key carries the shuffle; the band predicate is a
    post-join filter — no nested-loop blowup."""
    # one SQL text over memoized views (r14) — optimized-plan-identical to
    # the Column chain, pinned by tests/test_sqltext_builders.py
    pv = view(spark, sf_dir, "part")
    lv = view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT p_size, COUNT(*) AS n_matches,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        FROM {pv} p
        JOIN {lv} l
          ON l.l_partkey = p.p_partkey
         AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
        GROUP BY p_size
    """)


@query(
    "join_asof_last_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           max(c.ts) AS last_click_ts,
           count(c.ts) AS n_clicks_before
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts
    """,
    category="join",
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest click at-or-before each purchase), composed from an
    inequality join + aggregate. The scale path (sort-merge per key via
    applyInPandas merge_asof) lives in operators/asof.py; this declarative form
    is the oracle-checkable semantics."""
    # one SQL text over the memoized view (r14; this was the single most
    # py4j-expensive headline builder at 814 round trips) — optimized-plan-
    # identical to the Column chain, pinned by tests/test_sqltext_builders.py
    ev = view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT event_id, user_id, ts,
               MAX(c_ts) AS last_click_ts,
               COUNT(c_ts) AS n_clicks_before
        FROM (SELECT event_id, user_id, ts FROM {ev}
              WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id AS c_user_id, ts AS c_ts FROM {ev}
                   WHERE event_type = 'click') c
          ON p.user_id = c.c_user_id AND c.c_ts <= p.ts
        GROUP BY event_id, user_id, ts
    """)


# =============================================================================
# Aggregations
# =============================================================================


@query(
    "agg_global_stats",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {SQL_DSUM('l_extendedprice')} AS total_price,
           {SQL_DAVG('l_extendedprice')} AS mean_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    """,
    category="aggregation",
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped global aggregate (count/sum/min/max/avg) — the 1-row final reduce."""
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.count("*").alias("n_rows"),
        dsum(F.col("l_extendedprice")).alias("total_price"),
        (F.sum(_money(F.col("l_extendedprice"))).cast("double") / F.count("l_extendedprice")).alias(
            "mean_price"
        ),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "agg_sent_counts",
    oracle="""
    SELECT o_custkey, COUNT(*) AS files_sent,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS files_finished
    FROM orders GROUP BY o_custkey
    """,
    category="aggregation",
)
def agg_sent_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commutative counter aggregation — the reference's FilesSent increment
    (DynamoDBExportStatusService.kt:38-44) re-expressed as groupBy count
    (deterministic under retries, unlike read-modify-write)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count("*").alias("files_sent"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("files_finished"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {SQL_DSUM('c.c_acctbal')} AS total_bal,
           COUNT(*) AS n
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    category="aggregation",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (group → subtotal → grand total) in one aggregation pass."""
    # one SQL text over memoized views (r14) — optimized-plan-identical to
    # the Column chain, pinned by tests/test_sqltext_builders.py (which also
    # pins the broadcast physical shape carried by the hints)
    cv = view(spark, sf_dir, "customer")
    nv = view(spark, sf_dir, "nation")
    rv = view(spark, sf_dir, "region")
    return spark.sql(f"""
        SELECT /*+ BROADCAST(n), BROADCAST(r) */
               r_name, n_name, {_DSUM_SQL('c_acctbal')} AS total_bal,
               COUNT(*) AS n
        FROM {cv} c
        JOIN {nv} n ON n.n_nationkey = c.c_nationkey
        JOIN {rv} r ON r.r_regionkey = n.n_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """)


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    category="aggregation",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two keys: all 4 grouping combinations in one pass (reference's per-label counter matrix, MetricsConfiguration.kt:20-93, generalized)."""
    l = load(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(_money(F.col("l_quantity"))).cast("double").alias("qty"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           {SQL_DSUM('o_totalprice')} AS total, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    category="aggregation",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: chosen rollup combinations only, with grouping() flags disambiguating the NULL rows."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus,
               {SQL_DSUM('o_totalprice')} AS total, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "agg_bool_all_any",
    oracle="""
    SELECT c_nationkey,
           bool_and(c_acctbal > 0) AS all_positive,
           bool_or(c_acctbal > 9000) AS any_rich,
           COUNT(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
    category="aggregation",
)
def agg_bool_all_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL/ANY-over-group — the reference's run-completion aggregate
    (DynamoDBExportStatusService.kt:79-102)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
        F.count("*").alias("n"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregation",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: groupBy + pivot(values) + agg — rows to columns with a declared value list (no extra scan to discover keys)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(_money(F.col("l_quantity"))).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
    )


@query(
    "agg_count_distinct_by",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    category="aggregation",
)
def agg_count_distinct_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group beside plain counts — the two-phase distinct aggregate (partial sets, final merge)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events")
    )


@query(
    "agg_approx_distinct",
    # GOLDEN-PINNED (goldens.py): HLL++ register merges are max-per-register
    # — commutative/associative — so the estimate is a pure function of the
    # data set on ANY partitioning (verified bit-stable across repartitionings
    # at all three tiers before pinning).
    oracle=golden_oracle("agg_approx_distinct"),
    category="aggregation",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB substitute for exact
    COUNT(DISTINCT) when the distinct set itself doesn't fit a shuffle.
    Oracle: committed golden of the order-independent estimate per tier."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count("*").alias("n"),
    )


# =============================================================================
# Window functions
# =============================================================================


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    category="window",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — file-sequence selection per topic generalized
    (reference orders files within a topic, S3DirectoryReader.kt:51-80)."""
    # one SQL text over the memoized view (r14) — optimized-plan-identical
    # to the Column chain, pinned by tests/test_sqltext_builders.py
    ov = view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM {ov}) t
        WHERE rn <= 3
    """)


@query(
    "window_rank_dense",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS drnk
    FROM supplier
    """,
    category="window",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank under ties (ordering keys chosen so tie groups are deterministic)."""
    s = load(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           value - LAG(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="window",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offsets with defaults — the adjacent-row comparison surface (file-sequence deltas in the reference's numbering)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS first_order
    FROM orders
    """,
    category="window",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running progress-over-run — the reference's cumulative FilesSent
    semantics (DynamoDBExportStatusService.kt:113-132) as a window aggregate."""
    # one SQL text over the memoized view (r14; 726 py4j round trips in the
    # Column chain) — optimized-plan-identical, pinned by
    # tests/test_sqltext_builders.py
    ov = view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_total,
               FIRST(o_orderkey) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS first_order
        FROM {ov}
    """)


@query(
    "window_ntile_percent",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    category="window",
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile buckets and percent_rank over a unique total order — engine-exact quantile assignment."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


# =============================================================================
# Sort / limit / top-k
# =============================================================================


@query(
    "sort_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    category="sort",
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps +
    driver merge, no total sort at 100 TB."""
    # one SQL text over the memoized view (r14) — optimized-plan-identical,
    # pinned by tests/test_sqltext_builders.py
    ov = view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM {ov}
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """)


@query(
    "sort_multi_col",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey
    LIMIT 50
    """,
    category="sort",
)
def sort_multi_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column global sort (mixed asc/desc, nulls placement) — range-partitioned total order."""
    s = load(spark, sf_dir, "supplier")
    return (
        s.select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy(F.asc("s_nationkey"), F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(50)
    )


# =============================================================================
# Set operations
# =============================================================================


@query(
    "set_union_all",
    oracle="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
    category="setop",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, no dedup shuffle."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionAll(s).groupBy("nk").agg(F.count("*").alias("n"))


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
    category="setop",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics) between two projections."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
    category="setop",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-vs-finished reconciliation pattern (integration set-equality
    assertions, SnapshotSenderIntegrationTest.kt:39-56)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)  # EXCEPT (distinct) semantics, unlike exceptAll


# =============================================================================
# Scalar function families
# =============================================================================


@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS low_brand,
           substring(p_name, 1, 5) AS name5,
           length(p_name) AS name_len,
           concat(p_brand, '/', p_type) AS brand_type,
           replace(p_brand, 'Brand#', 'B') AS brand_short,
           trim('  ' || p_type || ' ') AS trimmed,
           CASE WHEN p_brand LIKE 'Brand#1%' THEN 1 ELSE 0 END AS starts_b1
    FROM part
    """,
    category="scalar-string",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (reference renames/parses: HttpWriter.kt:58,
    DecryptionProcessor.kt:26, NiFiUtility.kt:28)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace(F.col("p_brand"), r"Brand#", "B").alias("brand_short"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
        F.when(F.col("p_brand").startswith("Brand#1"), 1).otherwise(0).alias("starts_b1"),
    )


@query(
    "string_regexp_filename",
    oracle=r"""
    SELECT fileName,
           regexp_extract(fileName, '^(?:\w+\.)?([\w-]+)\.([\w-]+)-\d{3}-\d{3}-\d+\.\w+\.\w+$', 1) AS db_name,
           regexp_extract(fileName, '^(?:\w+\.)?([\w-]+)\.([\w-]+)-\d{3}-\d{3}-\d+\.\w+\.\w+$', 2) AS coll_name,
           CASE WHEN regexp_matches(fileName, '^(?:\w+\.)?([\w-]+)\.([\w-]+)-\d{3}-\d{3}-\d+\.\w+\.\w+$')
                THEN 1 ELSE 0 END AS is_valid
    FROM (
      SELECT concat('db.core.', lower(substring(o_orderpriority, 1, 1)), 'claimant-045-050-',
                    lpad(CAST(o_orderkey AS VARCHAR), 6, '0'), '.txt.gz') AS fileName
      FROM orders WHERE o_orderkey < 500
    )
    """,
    category="scalar-string",
)
def string_regexp_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact filename grammar (TextParsingUtility.kt:11) run as
    a relational regexp_extract over synthesized names."""
    from ..functions.text import FILENAME_PATTERN

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    named = o.select(
        F.concat(
            F.lit("db.core."),
            F.lower(F.substring(F.col("o_orderpriority"), 1, 1)),
            F.lit("claimant-045-050-"),
            F.lpad(F.col("o_orderkey").cast("string"), 6, "0"),
            F.lit(".txt.gz"),
        ).alias("fileName")
    )
    return named.select(
        "fileName",
        F.regexp_extract("fileName", FILENAME_PATTERN, 1).alias("db_name"),
        F.regexp_extract("fileName", FILENAME_PATTERN, 2).alias("coll_name"),
        F.when(F.col("fileName").rlike(FILENAME_PATTERN), 1).otherwise(0).alias("is_valid"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dy,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           date_trunc('month', o_orderdate) AS month_start
    FROM orders WHERE o_orderkey < 1000
    """,
    category="scalar-date",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (reference date shapes: int yyyyMMdd + ISO-8601 with
    offset, s3_files.py:58-74; export_date handling NiFiUtility.kt:15)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dy"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        # timestamp output on both sides: DATE-typed results canonicalize
        # differently in pandas (date vs datetime64) across the two engines
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


@query(
    "date_int_yyyymmdd",
    oracle="""
    SELECT int_date,
           strptime(CAST(int_date AS VARCHAR), '%Y%m%d') AS parsed,
           COUNT(*) AS n
    FROM (
      SELECT CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
                  + day(o_orderdate) AS INT) AS int_date
      FROM orders
    ) GROUP BY int_date
    """,
    category="scalar-date",
)
def date_int_yyyymmdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int-encoded yyyyMMdd dates → DateType — the reference payload's
    effectiveDate.date field shape (s3_files.py:60, SURVEY.md §1.2)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            (
                F.year("o_orderdate") * 10000
                + F.month("o_orderdate") * 100
                + F.dayofmonth("o_orderdate")
            )
            .cast("int")
            .alias("int_date")
        )
        .groupBy("int_date")
        .agg(F.count("*").alias("n"))
        .select(
            "int_date",
            F.to_date(F.col("int_date").cast("string"), "yyyyMMdd")
            .cast("timestamp")
            .alias("parsed"),
            "n",
        )
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) + 1.5 AS plus,
           l_extendedprice / l_quantity AS unit_price,
           CAST(floor(l_extendedprice / 100) AS BIGINT) AS floor_h,
           CAST(ceil(l_extendedprice / 100) AS BIGINT) AS ceil_h,
           abs(l_discount - 0.05) AS abs_d,
           CAST(l_partkey % 7 AS BIGINT) AS pm7,
           sqrt(l_quantity) AS sq,
           CAST(power(l_quantity, 2) AS DOUBLE) AS qty_sq
    FROM lineitem WHERE l_orderkey < 300
    """,
    category="scalar-math",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic scalar family: +,-,*,/, pmod, abs, greatest/least, integer div — all JVM codegen."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity").cast("double") + 1.5).alias("plus"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.floor(F.col("l_extendedprice") / 100).alias("floor_h"),
        F.ceil(F.col("l_extendedprice") / 100).alias("ceil_h"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.pmod(F.col("l_partkey"), F.lit(7)).cast("long").alias("pm7"),
        F.sqrt("l_quantity").alias("sq"),
        F.pow(F.col("l_quantity"), 2).cast("double").alias("qty_sq"),
    )


@query(
    "array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           CASE WHEN list_contains(string_split(text, ' '), 'spark') THEN 1 ELSE 0 END AS has_spark,
           string_split(text, ' ')[1] AS first_word,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab
    FROM documents WHERE doc_id < 100
    """,
    category="scalar-array",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (reference: S3 metadata map S3DirectoryReader.kt:82-84,
    headers map NiFiUtility.kt:12-25 — generalized to array/map columns)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.when(F.array_contains(words, "spark"), 1).otherwise(0).alias("has_spark"),
        F.element_at(words, 1).alias("first_word"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("vocab"),
    )


@query(
    "explode_wordcount",
    oracle="""
    SELECT w AS word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w <> ''
    GROUP BY w
    ORDER BY n DESC, w
    LIMIT 20
    """,
    category="scalar-array",
)
def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical explode→groupBy word count over documents (shuffle carries (token, 1) pairs, not text)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    category="scalar-json",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family — the engine's schema-on-read surface for the reference's
    JSON-Lines payloads (s3_files.py:40-75; from_json parse in
    plans/delivery.py)."""
    # one SQL text over the memoized view (r14) — optimized-plan-identical,
    # pinned by tests/test_sqltext_builders.py
    ev = view(spark, sf_dir, "events")
    k = "CAST(get_json_object(props, '$.k') AS INT)"
    return spark.sql(f"""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM({k}) AS BIGINT) AS sum_k,
               MIN({k}) AS min_k,
               MAX({k}) AS max_k
        FROM {ev}
        GROUP BY event_type
    """)


@query(
    "json_from_json_struct",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, COUNT(*) AS n
    FROM events
    GROUP BY k
    """,
    category="scalar-json",
)
def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit StructType into typed columns — the declared-schema payload parse (s3_files.py:40-75 shapes)."""
    e = load(spark, sf_dir, "events")
    parsed = e.select(F.from_json(F.col("props"), "k INT").alias("p"))
    return parsed.groupBy(F.col("p.k").alias("k")).agg(F.count("*").alias("n"))


@query(
    "crypto_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           to_base64(encode(substring(text, 1, 12))) AS b64_prefix
    FROM documents WHERE doc_id < 50
    """,
    category="scalar-crypto",
)
def crypto_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/codec family (reference codecs: base64 key material
    S3DirectoryReader.kt:86-98; content hashing generalizes the dedup path)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.base64(F.substring(F.col("text"), 1, 12).cast("binary")).alias("b64_prefix"),
    )


# =============================================================================
# Control-plane semantics as relational queries (SURVEY.md §2A #12-14)
# =============================================================================


@query(
    "status_collection_decision",
    oracle="""
    SELECT collection, files_exported, files_sent,
           CASE WHEN files_exported = files_sent AND files_sent > 0 THEN 'Sent'
                WHEN files_exported = 0 THEN 'Received'
                ELSE 'In_Progress' END AS collection_status
    FROM (
      SELECT o_orderpriority AS collection,
             COUNT(*) AS files_exported,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS files_sent
      FROM orders GROUP BY o_orderpriority
    )
    """,
    category="control-plane",
)
def status_collection_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's collection-status CASE decision
    (DynamoDBExportStatusService.kt:113-141) over derived exported/sent counts."""
    o = load(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderpriority").alias("collection")).agg(
        F.count("*").alias("files_exported"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("files_sent"),
    )
    return agg.select(
        "collection",
        "files_exported",
        "files_sent",
        F.when(
            (F.col("files_exported") == F.col("files_sent")) & (F.col("files_sent") > 0), "Sent"
        )
        .when(F.col("files_exported") == 0, "Received")
        .otherwise("In_Progress")
        .alias("collection_status"),
    )


@query(
    "status_completion_allany",
    oracle="""
    SELECT yr,
           CASE WHEN bool_and(ok) THEN 'COMPLETED_SUCCESSFULLY'
                WHEN bool_or(failed) THEN 'COMPLETED_UNSUCCESSFULLY'
                ELSE 'NOT_COMPLETED' END AS completion_status,
           COUNT(*) AS n_collections
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             o_orderstatus IN ('F', 'O') AS ok,
             o_orderstatus = 'P' AS failed
      FROM orders
    )
    GROUP BY yr
    """,
    category="control-plane",
)
def status_completion_allany(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-completion ALL/ANY (DynamoDBExportStatusService.kt:79-102) as
    bool_and/bool_or + CASE."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderstatus").isin("F", "O").alias("ok"),
        (F.col("o_orderstatus") == "P").alias("failed"),
    )
    return base.groupBy("yr").agg(
        F.when(F.bool_and("ok"), "COMPLETED_SUCCESSFULLY")
        .when(F.bool_or("failed"), "COMPLETED_UNSUCCESSFULLY")
        .otherwise("NOT_COMPLETED")
        .alias("completion_status"),
        F.count("*").alias("n_collections"),
    )
