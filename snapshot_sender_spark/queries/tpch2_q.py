"""The remaining TPC-H-shaped queries (Q2, Q8, Q9, Q11, Q12, Q15, Q16, Q17,
Q19, Q20, Q21, Q22), adapted to the driver's column set: the testdata has no
partsupp table and no commitdate/receiptdate/shipmode/container/phone columns,
so supply cost derives from lineitem prices, lateness from shipdate vs
orderdate, and customer segmentation from nationkey. Each adaptation keeps the
original query's *plan shape* (the correlated subquery, the anti/semi join,
the disjunctive predicate, the scalar aggregate threshold) — that is what the
operator surface is exercising. Decimal-exact money sums per the package
float policy (queries/__init__ docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load
from . import query
from .relational import _factor, _money
from .tpch_q import REV, _rev_col


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT c.l_partkey, c.supply_cost, s.s_acctbal, s.s_name, n.n_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey,
           CAST(eu.supply_cost AS DOUBLE) AS supply_cost
    FROM eu JOIN part p ON p.p_partkey = eu.l_partkey
    WHERE p.p_size BETWEEN 10 AND 20
      AND eu.supply_cost = (SELECT MIN(e2.supply_cost) FROM eu e2
                            WHERE e2.l_partkey = eu.l_partkey)
    ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
    LIMIT 100
    """,
    category="tpch",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 adapted (no partsupp → supply cost = min observed line price per
    (part, supplier)): cheapest EUROPE supplier per mid-size part. The
    correlated MIN subquery plans as a window min + filter — one shuffle,
    no self-join."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(F.col("p_size").between(10, 20))
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_money(F.col("l_extendedprice"))).alias("supply_cost")
    )
    eu = (
        cost.join(s, s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("l_partkey", "supply_cost", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        eu.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY o_year
    """,
    category="tpch",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_1's share of AMERICA's ECONOMY-part volume per year —
    conditional-aggregate ratio over a 7-table join (dims broadcast)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = _money(F.col("l_extendedprice")) * _factor(1 - F.col("l_discount"))
    joined = (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("nk1") == c.c_nationkey)
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("rk1"))
        .join(F.broadcast(n2), F.col("nk2") == s.s_nationkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(17,4)")
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
           - CAST(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS INT)) AS DOUBLE) * 0.1
             AS profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'STANDARD'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
    """,
    category="tpch",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adapted (no ps_supplycost → cost = 10% of retail price × quantity):
    profit on STANDARD parts per supplier nation per year. Revenue and cost
    are separate exact decimal sums; the 0.1 scaling and subtraction happen
    once on the final doubles (same-op on both engines → bit-identical)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    rev = _money(F.col("l_extendedprice")) * _factor(1 - F.col("l_discount"))
    cost = _money(F.col("p_retailprice")) * F.col("l_quantity").cast("int")
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.sum(rev).cast("double") - F.sum(cost).cast("double") * F.lit(0.1)).alias("profit")
        )
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS part_value
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) >
      (SELECT CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 0.001
       FROM lineitem l2
       JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
       JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
       WHERE n2.n_name = 'NATION_3')
    ORDER BY part_value DESC, l_partkey
    """,
    category="tpch",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 adapted (no partsupp → stock value = shipped line value): parts
    holding > 0.1% of NATION_3's total shipped value. The scalar-subquery
    threshold is a cross-join of a 1-row aggregate (Catalyst broadcasts it);
    the grouped and global sums reuse one shuffled base."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    base = (
        l.join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("l_partkey", _money(F.col("l_extendedprice")).alias("value"))
    )
    per_part = base.groupBy("l_partkey").agg(F.sum("value").cast("double").alias("part_value"))
    total = base.agg((F.sum("value").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "tpch_q12_late_lines_by_status",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    """,
    category="tpch",
)
def tpch_q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 adapted (no shipmode/commitdate → group by linestatus, late =
    shipped >90 days after order): priority mix of late 1997 lines."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    category="tpch",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum Q1-1997 revenue — scalar-max
    subquery over a reusable aggregated view. The revenue aggregate is
    computed once (cached plan branch) and both the max and the equality
    filter read it."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_money(F.col("l_extendedprice")) * _factor(1 - F.col("l_discount")))
        .cast("double")
        .alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(s, s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_supplier_part_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    category="tpch",
)
def tpch_q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 adapted (no partsupp → supplier-part pairs from lineitem; the
    complaint-supplier exclusion keys on negative balance): distinct supplier
    count per (brand, type, size). The NOT IN plans as a left-anti join."""
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), bad.s_suppkey == l.l_suppkey, "left_anti")
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
    category="tpch",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost to small-quantity orders of Brand#23 parts — the
    correlated per-part average plans as an aggregate + broadcast join back
    (quantities are integral, so the average is exact on both engines)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_q = l.groupBy(F.col("l_partkey").alias("ap")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast("bigint")).cast("double") / F.count("*"))
        ).alias("threshold")
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(avg_q, F.col("ap") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(_money(F.col("l_extendedprice"))).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT {REV} AS revenue, COUNT(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    category="tpch",
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 adapted (container/shipmode → size/quantity bands): disjunctive
    multi-band predicate over a broadcast part join — one pass, the OR is a
    single filter, not a union of three scans."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .filter(band)
        .agg(_rev_col(), F.count("*").alias("n"))
    )


@query(
    "tpch_q20_promotion_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 50
      )
    ORDER BY s.s_name
    """,
    category="tpch",
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 adapted (no partsupp availqty → threshold on shipped quantity):
    NATION_3 suppliers who moved >50 units of PROMO parts in 1997. The IN
    plans as an aggregate + left-semi join."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    movers = (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(movers, movers.l_suppkey == s.s_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    category="tpch",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 adapted (no commitdate/receiptdate → the line others waited on =
    the one with the latest shipdate): suppliers holding up multi-supplier
    failed orders. EXISTS → left-semi, NOT EXISTS → left-anti, both on
    non-equi conditions."""
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    l1 = l.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_suppkey").alias("sk1"),
        F.col("l_shipdate").alias("d1"),
    )
    l2 = l.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = l.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("d3"),
    )
    base = (
        l1.join(o, o.o_orderkey == F.col("k1"))
        .join(s, s.s_suppkey == F.col("sk1"))
        .select("k1", "sk1", "d1", "s_name")
    )
    multi = base.join(
        l2, (F.col("k2") == F.col("k1")) & (F.col("sk2") != F.col("sk1")), "left_semi"
    )
    last = multi.join(
        l3,
        (F.col("k3") == F.col("k1"))
        & (F.col("sk3") != F.col("sk1"))
        & (F.col("d3") > F.col("d1")),
        "left_anti",
    )
    return (
        last.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT c.c_nationkey, c.c_custkey,
             CAST(c.c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer c
      WHERE c.c_nationkey IN (1, 3, 5, 7)
        AND c.c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
          FROM customer c2
          WHERE c2.c_nationkey IN (1, 3, 5, 7) AND c2.c_acctbal > 0.0
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(bal) AS DOUBLE) AS totacctbal
    FROM eligible
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    category="tpch",
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adapted (no phone → country selection by nationkey; "never
    ordered" → lapsed, no orders in the data's final year): well-funded
    customers in four nations with no recent orders. The scalar avg
    threshold is a broadcast 1-row aggregate; NOT EXISTS plans as a
    left-anti join against orders (decimal-exact average and totals)."""
    keys = [1, 3, 5, 7]
    c = load(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(keys))
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_money(F.col("c_acctbal"))).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, o.o_custkey == c.c_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_money(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
