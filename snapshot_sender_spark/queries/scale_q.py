"""Scale-pattern operators: space-filling-curve data layout and salted
fact-fact joins.

Both patterns exist purely for the 100 TB deployment (SCALE.md): Z-order
clustering decides how a petabyte table is laid out on disk so multi-column
range scans prune files; salting decides how a skewed join key is spread so
one hot key doesn't serialize a 4,000-core cluster onto one task. Locally
they are verified exactly — the layout key is pure integer bit-math and the
salted join must be bit-identical to the plain join it replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


def _morton16(xexpr: str, yexpr: str) -> str:
    """Bit-interleave two 16-bit integer expressions into a 32-bit Morton
    (Z-order) key, as portable SQL text (only >>, &, << and + on BIGINT —
    identical semantics on Spark and DuckDB; the summed terms occupy disjoint
    bits, so + is |)."""
    terms = []
    for i in range(16):
        terms.append(f"((({xexpr}) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({yexpr}) >> {i}) & 1) << {2 * i + 1}")
    return " + ".join(f"({t})" for t in terms)


_ZKEY = _morton16("l_partkey % 65536", "l_suppkey % 65536")


@query(
    "layout_zorder_cluster",
    oracle=f"""
    SELECT zkey >> 16 AS zbucket,
           COUNT(*) AS n,
           MIN(zkey) AS zmin,
           MAX(zkey) AS zmax,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM (SELECT l_partkey, l_suppkey, {_ZKEY} AS zkey FROM lineitem)
    GROUP BY 1
    """,
    category="layout",
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey): the
    space-filling-curve layout used to co-locate rows that are close in BOTH
    dimensions, so min/max file statistics prune multi-column range predicates
    (a sort on either single column only prunes that column). At 100 TB this
    key feeds repartitionByRange(zkey).sortWithinPartitions(zkey) at write
    time; here the bucket profile (count + zkey span + per-bucket distinct
    keys) is hash-checked against DuckDB computing the identical bit-interleave
    — pure integer bit-math, exact on both engines."""
    li = load(spark, sf_dir, "lineitem")
    z = li.select("l_partkey", "l_suppkey", F.expr(_ZKEY).alias("zkey"))
    return z.groupBy(F.shiftright("zkey", 16).alias("zbucket")).agg(
        F.count("*").alias("n"),
        F.min("zkey").alias("zmin"),
        F.max("zkey").alias("zmax"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


_SALT_BUCKETS = 8


@query(
    "join_skew_salted",
    oracle="""
    WITH fact AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 0 ELSE event_id % 97 END AS k,
             event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    dim AS (SELECT range AS k, range * 7 + 3 AS weight FROM range(97))
    SELECT f.event_type,
           COUNT(*) AS n,
           CAST(SUM(f.cents * d.weight) AS BIGINT) AS weighted_cents,
           CAST(SUM(CASE WHEN f.k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS hot_rows
    FROM fact f JOIN dim d ON f.k = d.k
    GROUP BY f.event_type
    """,
    category="join",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join for a skewed key: half of all events share key 0, so a
    plain shuffle join funnels 50% of the table through one reducer task. The
    salted form appends salt = pmod(hash(event_id), 8) to the fact side and
    replicates the dim side 8×, spreading the hot key across 8 tasks; the
    join on (k, salt) then produces exactly the plain join's rows. The oracle
    is the UNsalted join — equality proves salting is a pure physical rewrite.
    (AQE's skew-join split handles sort-merge cases adaptively; explicit
    salting is the form that also covers aggregates and survives plan
    pinning — SCALE.md.)"""
    ev = load(spark, sf_dir, "events")
    fact = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("event_id"), F.lit(97)))
        .cast("long")
        .alias("k"),
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.pmod(F.hash("event_id"), F.lit(_SALT_BUCKETS)).alias("salt"),
    )
    dim = (
        spark.range(97)
        .select(F.col("id").alias("k"), (F.col("id") * 7 + 3).alias("weight"))
        .withColumn(
            "salt",
            F.explode(F.array([F.lit(i) for i in range(_SALT_BUCKETS)])),
        )
    )
    joined = fact.join(dim, ["k", "salt"])
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents") * F.col("weight")).alias("weighted_cents"),
        F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).alias("hot_rows"),
    )
