"""SQL-surface pack 2: recursive CTEs (Spark 4), aggregate FILTER clauses,
bitwise aggregates, lateral column aliases, ordered LISTAGG, and from_csv.

These round out the declarative surface a reference user writing plain SQL
against the engine would expect; each is stock Catalyst (no custom code), the
coverage claim is the DuckDB hash match."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load, register_views
from . import query
from .relational import SQL_DSUM, _cents, _from_cents


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT 1
      UNION ALL
      SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT m.m AS month,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE(SUM(o.o_orderkey), 0) AS key_sum
    FROM months m
    LEFT JOIN orders o ON CAST(month(o.o_orderdate) AS INT) = m.m
    GROUP BY m.m
    """,
    category="sql",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 recursive CTEs): a recursively generated month
    spine LEFT JOINed to orders — the gaps-preserving calendar pattern where
    empty months still appear (a plain GROUP BY month drops them). Identical
    syntax on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT 1
          UNION ALL
          SELECT m + 1 FROM months WHERE m < 12
        )
        SELECT m.m AS month,
               COUNT(o.o_orderkey) AS n_orders,
               COALESCE(SUM(o.o_orderkey), 0) AS key_sum
        FROM months m
        LEFT JOIN orders o ON CAST(month(o.o_orderdate) AS INT) = m.m
        GROUP BY m.m
        """
    )


@query(
    "sql_agg_filter_clause",
    oracle=f"""
    SELECT l_linestatus,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS hi_disc_price,
           COUNT(DISTINCT l_suppkey) FILTER (WHERE l_quantity >= 30) AS big_suppliers
    FROM lineitem
    GROUP BY l_linestatus
    """,
    category="sql",
)
def sql_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clauses — per-aggregate predicates in one
    scan instead of N self-joined subqueries (the reference's per-label metric
    counters, MetricsConfiguration.kt:20-93, are exactly per-predicate counts
    over one pass)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_linestatus,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS hi_disc_price,
               COUNT(DISTINCT l_suppkey) FILTER (WHERE l_quantity >= 30) AS big_suppliers
        FROM lineitem
        GROUP BY l_linestatus
        """
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_orderkey) AS key_and,
           bit_or(o_orderkey) AS key_or,
           bit_xor(o_orderkey) AS key_xor
    FROM orders
    GROUP BY o_orderstatus
    """,
    category="aggregation",
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — commutative/associative, so Catalyst
    runs them two-phase like sum; XOR over ids is the classic set-difference
    fingerprint (two snapshots XOR to the ids that differ)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
    )


@query(
    "sql_lateral_column_alias",
    oracle=f"""
    SELECT l_orderkey,
           {SQL_DSUM('l_extendedprice')} AS gross,
           gross * 0.9 AS discounted,
           discounted * 1.08 AS taxed
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY taxed DESC, l_orderkey
    LIMIT 25
    """,
    category="sql",
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: later select items reference earlier aliases in
    the same SELECT (gross → discounted → taxed) — no nested subquery per
    derivation step. Same-input/same-op float chain is bit-identical across
    engines."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_orderkey,
               {SQL_DSUM('l_extendedprice')} AS gross,
               gross * 0.9 AS discounted,
               discounted * 1.08 AS taxed
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY taxed DESC, l_orderkey
        LIMIT 25
        """
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation
    GROUP BY n_regionkey
    """,
    category="aggregation",
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: LISTAGG ... WITHIN GROUP (ORDER BY ...) —
    deterministic concatenation (unordered collect_list is not reproducible
    across partitionings; the explicit sort order is what makes this a stable
    engine surface). DuckDB spells it string_agg(x, sep ORDER BY x)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        FROM nation
        GROUP BY n_regionkey
        """
    )


@query(
    "csv_from_csv_roundtrip",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n, {SQL_DSUM('p_retailprice')} AS total_price
    FROM part
    GROUP BY p_brand
    """,
    category="source",
)
def csv_from_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_csv — per-value CSV decode (the embedded-CSV-column case, distinct
    from the file-level CSV scan in source_csv_roundtrip): rows serialized
    with to_csv, parsed back against an explicit schema, aggregated. Raw-column
    oracle proves the round-trip is lossless."""
    p = load(spark, sf_dir, "part")
    line = p.select(
        F.to_csv(F.struct("p_partkey", "p_brand", "p_retailprice")).alias("line")
    )
    parsed = line.select(
        F.from_csv(
            "line", "p_partkey bigint, p_brand string, p_retailprice double"
        ).alias("r")
    ).select("r.*")
    return parsed.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        _from_cents(F.sum(_cents(F.col("p_retailprice"))), 2).alias("total_price"),
    )
