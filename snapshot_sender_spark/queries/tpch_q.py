"""Classic TPC-H-shaped queries (the subset expressible over the driver's
column set — no partsupp/commitdate/receiptdate in the testdata): Q3 shipping
priority, Q5 local-supplier volume, Q6 forecast revenue, Q10 returned-item
reporting. Decimal-exact revenue sums per the package float policy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load, view
from . import query
from .relational import (
    _CENTS_SQL,
    _FROM_CENTS_SQL,
    _cents,
    _factor,
    _from_cents,
    _money,
)

REV = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)"


def _rev_col():
    # integer-cents kernel (relational._cents): value-identical to the
    # DECIMAL-product sum in the REV oracle, ~2× faster (long codegen path)
    return _from_cents(
        F.sum(_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))), 4
    ).alias("revenue")


# SQL-text twin of _rev_col (r14): the headline TPC-H builders are assembled
# as ONE spark.sql() text over memoized temp views instead of a Column-method
# chain — the chain costs one synchronous py4j round trip per helper call
# (measured: q5 896 trips ≈ 0.1 s of pure socket latency per build, every
# lap). Optimized-plan identity with the Column form is pinned per query by
# tests/test_sqltext_builders.py (optimizedPlan().sameResult both ways).
REV_CENTS_SQL = _FROM_CENTS_SQL(
    f"SUM({_CENTS_SQL('l_extendedprice')} * (100 - {_CENTS_SQL('l_discount')}))", 4
)


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey, {REV} AS revenue, o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    category="tpch",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: top unshipped BUILDING-segment orders by revenue — selective dim
    filters broadcast into the lineitem scan; decimal-exact revenue sum.
    Fact-first join order (r13): stream lineitem, build the filtered dims —
    written dim-first, the size estimate picked the lineitem projection as a
    build side (fact broadcast — backwards at scale, slower locally). Built
    as one SQL text (r14, see REV_CENTS_SQL) — optimized-plan-identical to
    the Column chain, pinned by tests/test_sqltext_builders.py."""
    lv = view(spark, sf_dir, "lineitem")
    ov = view(spark, sf_dir, "orders")
    cv = view(spark, sf_dir, "customer")
    return spark.sql(f"""
        SELECT l_orderkey, {REV_CENTS_SQL} AS revenue, o_orderdate, o_orderpriority
        FROM {lv} l
        JOIN {ov} o ON l.l_orderkey = o.o_orderkey
        JOIN {cv} c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < CAST('1998-03-15' AS TIMESTAMP)
          AND l.l_shipdate > CAST('1998-03-15' AS TIMESTAMP)
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
    """)


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {REV} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    category="tpch",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue from orders whose customer and supplier share an ASIA
    nation — the 6-table join; every dimension side broadcasts. Fact-first
    join order (r13): lineitem streams through every join; the dim-first
    spelling made the size estimate broadcast the lineitem projection
    (600 k-row build side — backwards at any scale). Built as one SQL text
    (r14) — optimized-plan-identical to the Column chain (pinned by
    tests/test_sqltext_builders.py, which also pins the all-broadcast
    physical shape the BROADCAST hints carry)."""
    lv = view(spark, sf_dir, "lineitem")
    ov = view(spark, sf_dir, "orders")
    cv = view(spark, sf_dir, "customer")
    sv = view(spark, sf_dir, "supplier")
    nv = view(spark, sf_dir, "nation")
    rv = view(spark, sf_dir, "region")
    return spark.sql(f"""
        SELECT /*+ BROADCAST(n), BROADCAST(r) */
               n_name, {REV_CENTS_SQL} AS revenue
        FROM {lv} l
        JOIN {ov} o ON l.l_orderkey = o.o_orderkey
        JOIN {cv} c ON o.o_custkey = c.c_custkey
        JOIN {sv} s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        JOIN {nv} n ON n.n_nationkey = s.s_nationkey
        JOIN {rv} r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
          AND o.o_orderdate < CAST('1998-01-01' AS TIMESTAMP)
        GROUP BY n_name
    """)


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    category="tpch",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: one-pass filtered global aggregate — every predicate reaches the
    parquet scan (PushedFilters), no shuffle beyond the 1-row final agg.
    Built as one SQL text (r14; the 0.03D/0.07D suffixes keep the literals
    DOUBLE, matching the Python floats — bare SQL decimals would parse as
    DECIMAL and change the comparison type)."""
    lv = view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM {lv}
        WHERE l_shipdate >= CAST('1997-01-01' AS TIMESTAMP)
          AND l_shipdate < CAST('1998-01-01' AS TIMESTAMP)
          AND l_discount BETWEEN 0.03D AND 0.07D
          AND l_quantity < 24
    """)


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    category="tpch",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 adapted (no commitdate column → late = shipped >90 days after
    order): priority counts over orders with at least one late line — the
    EXISTS plans as a left-semi join."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))
                    ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS promo_share,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    category="tpch",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 adapted (p_type is a plain category here): promo revenue share —
    conditional aggregate ratio over a broadcast-dimension join."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = _money(F.col("l_extendedprice")) * _factor(1 - F.col("l_discount"))
    joined = l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(16,4)")))
            .cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_share"),
        F.count("*").alias("n"),
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
    category="tpch",
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers whose orders exceed a total-quantity threshold — the
    HAVING subquery plans as an aggregate + semi join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_money(F.col("l_quantity"))).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    # fact-first join order (r13) — see tpch_q3; lineitem streams, dims build
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(big.withColumnRenamed("l_orderkey", "big_key"), F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(_money(F.col("l_quantity"))).cast("double").alias("total_qty"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {REV} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             l.l_extendedprice, l.l_discount
      FROM supplier s
      JOIN lineitem l ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1998-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    category="tpch",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between a nation pair, by year and direction."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1998-12-31").cast("timestamp")
        )
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        s.join(l, l.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("nk1") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("nk2") == c.c_nationkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(_rev_col())


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    category="tpch",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: order-count-per-customer distribution (left join keeps the
    zero-order bucket — adapted filter on priority instead of comment)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {REV} AS revenue, c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    category="tpch",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: revenue lost to returned items per customer over a quarter —
    top-k by a decimal-exact aggregate over the return-flag filter."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    # fact-first join order (r13) — see tpch_q3; lineitem streams, dims build
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_col())
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
