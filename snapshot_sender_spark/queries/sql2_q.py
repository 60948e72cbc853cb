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
           CAST(COALESCE(SUM(o.o_orderkey), 0) AS BIGINT) AS key_sum
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


@query(
    "set_union_by_name",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT) AS cust_sum,
           CAST(COALESCE(SUM(prio_len), 0) AS BIGINT) AS prio_len_sum
    FROM (
      SELECT o_orderstatus, o_custkey, NULL::BIGINT AS prio_len
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL BY NAME
      SELECT length(o_orderpriority) AS prio_len, o_orderstatus
      FROM orders WHERE o_orderkey % 3 = 1
    )
    GROUP BY o_orderstatus
    """,
    category="set",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: unionByName(allowMissingColumns=True) aligns by
    column NAME and null-fills what either side lacks — how generations of a
    dataset with drifted schemas append at scale (positional UNION would
    silently mis-bind). DuckDB spells it UNION ALL BY NAME."""
    o = load(spark, sf_dir, "orders")
    gen1 = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderstatus", "o_custkey")
    gen2 = o.filter(F.col("o_orderkey") % 3 == 1).select(
        F.length("o_orderpriority").cast("long").alias("prio_len"), "o_orderstatus"
    )
    both = gen1.unionByName(gen2, allowMissingColumns=True)
    return both.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("o_custkey"), F.lit(0)).alias("cust_sum"),
        F.coalesce(F.sum("prio_len"), F.lit(0)).alias("prio_len_sum"),
    )


@query(
    "source_schema_merge",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n,
           CAST(COALESCE(SUM(s_suppkey), 0) AS BIGINT) AS key_sum,
           CAST(COALESCE(SUM(extra_len), 0) AS BIGINT) AS extra_sum
    FROM (
      SELECT s_nationkey, s_suppkey, NULL::BIGINT AS extra_len
      FROM supplier WHERE s_suppkey % 2 = 0
      UNION ALL BY NAME
      SELECT s_nationkey, s_suppkey, length(s_name) AS extra_len
      FROM supplier WHERE s_suppkey % 2 = 1
    )
    GROUP BY s_nationkey
    """,
    category="source",
)
def source_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution on scan: two file generations (the newer adds
    an extra_len column) read as ONE dataset with mergeSchema=true — old files
    surface NULL for the added column. At 100 TB schema drift is permanent;
    merge-on-read beats rewriting history. The oracle reconstructs the same
    union from the base table."""
    import os
    import tempfile

    from ..util import write_once

    s = load(spark, sf_dir, "supplier")
    d = os.path.join(
        tempfile.gettempdir(),
        "schema_merge_" + __import__("hashlib").md5(sf_dir.encode()).hexdigest()[:8],
    )

    def build(tmp):
        s.filter(F.col("s_suppkey") % 2 == 0).select(
            "s_nationkey", "s_suppkey"
        ).write.parquet(os.path.join(tmp, "gen=1"))
        s.filter(F.col("s_suppkey") % 2 == 1).select(
            "s_nationkey",
            "s_suppkey",
            F.length("s_name").cast("long").alias("extra_len"),
        ).write.parquet(os.path.join(tmp, "gen=2"))

    write_once(d, build, probe=os.path.join(d, "gen=2", "_SUCCESS"))
    merged = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "false"
    ).parquet(os.path.join(d, "gen=1"), os.path.join(d, "gen=2"))
    return merged.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("s_suppkey"), F.lit(0)).alias("key_sum"),
        F.coalesce(F.sum("extra_len"), F.lit(0)).alias("extra_sum"),
    )
