"""Query batch 6: byte/bit codec family (hex/unhex/ascii/chr/bit ops — the
reference's codec surface around key material, S3DirectoryReader.kt:86-98),
explode_outer null-preservation, and deterministic-sample (rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "codec_hex_bits",
    oracle="""
    SELECT p_partkey,
           lower(hex(p_brand)) AS brand_hex,
           decode(unhex('414243')) AS abc_text,
           ascii(substring(p_name, 1, 1)) AS first_code,
           chr(65 + CAST(p_partkey % 26 AS INT)) AS letter,
           bit_count(CAST(p_partkey AS BIGINT)) AS popcount,
           xor(CAST(p_partkey AS BIGINT), 255) AS xored,
           CAST(p_partkey AS BIGINT) & 15 AS low_nibble,
           CAST(p_partkey AS BIGINT) | 1 AS odd_or
    FROM part WHERE p_partkey < 400
    """,
    category="scalar-codec",
)
def codec_hex_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec scalars: hex/unhex round-trip, bit ops, conv base conversion — the byte-plumbing family under the delivery payloads."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    pk = F.col("p_partkey").cast("long")
    return p.select(
        "p_partkey",
        F.lower(F.hex(F.col("p_brand"))).alias("brand_hex"),
        # string output rather than raw binary: bytes canonicalize differently
        # across the two engines' pandas bridges (bytes vs bytearray)
        F.unhex(F.lit("414243")).cast("string").alias("abc_text"),
        F.ascii(F.substring("p_name", 1, 1)).alias("first_code"),
        F.char(F.lit(65) + F.pmod(pk, F.lit(26)).cast("int")).alias("letter"),
        F.bit_count(pk).alias("popcount"),
        pk.bitwiseXOR(F.lit(255)).alias("xored"),
        pk.bitwiseAND(F.lit(15)).alias("low_nibble"),
        pk.bitwiseOR(F.lit(1)).alias("odd_or"),
    )


@query(
    "explode_outer_preserves",
    oracle="""
    SELECT o_orderkey, tag FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN []
                  ELSE string_split(o_orderpriority, '-') END AS tags
      FROM orders WHERE o_orderkey < 400
    ) LEFT JOIN UNNEST(tags) AS u(tag) ON TRUE
    """,
    category="scalar-array",
)
def explode_outer_preserves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive as NULL — the reference's
    explicit-null payload semantics (s3_files.py:51) at array granularity."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    tags = F.when(F.col("o_orderstatus") == "P", F.array().cast("array<string>")).otherwise(
        F.split(F.col("o_orderpriority"), "-")
    )
    return o.select("o_orderkey", F.explode_outer(tags).alias("tag"))


@query(
    "sample_deterministic",
    # GOLDEN-PINNED, not cross-engine (documented honestly): Spark's seeded
    # Bernoulli RNG is engine-specific, so no SQL derivation of the sampled
    # rows exists — but it IS deterministic within Spark once the input's
    # partitioning is pinned. The RNG is seeded per PARTITION, and file
    # split sizes depend on core count (maxPartitionBytes vs
    # bytes/defaultParallelism), so the query first canonicalizes to ONE
    # partition in total key order (orderBy unique key + coalesce(1)) —
    # the sample is then machine- and core-count-independent. The oracle
    # replays a COMMITTED golden of that canonical output, frozen per known
    # sf tier and keyed by the table's row count, so the driver's hash
    # compare becomes a true reproducibility check instead of a rows-only
    # count. An unknown tier yields zero golden rows → a loud mismatch,
    # never a silent pass.
    oracle="""
    WITH golden(tier_rows, l_returnflag, n_sampled) AS (VALUES
      (6000,   'A', 209),   (6000,   'N', 236),   (6000,   'R', 197),
      (60000,  'A', 2048),  (60000,  'N', 2001),  (60000,  'R', 1922),
      (600000, 'A', 20274), (600000, 'N', 19807), (600000, 'R', 19823)
    )
    SELECT l_returnflag, CAST(n_sampled AS BIGINT) AS n_sampled
    FROM golden WHERE tier_rows = (SELECT COUNT(*) FROM lineitem)
    """,
    category="sampling",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed. The oracle is a committed golden
    of Spark's deterministic output per sf tier (see the oracle comment) —
    reproducible training-data splits are the point of seeding, and the
    golden pins exactly that."""
    l = (
        load(spark, sf_dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")  # unique key → total order
        .coalesce(1)  # one partition → partition-index-independent RNG
    )
    return (
        l.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"))
    )


@query(
    "sample_systematic_hash",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_sampled,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE ((l_orderkey % 100) * 2654435761 + l_linenumber * 40503) % 100 < 10
    GROUP BY l_returnflag
    """,
    category="sampling",
)
def sample_systematic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable ~10% systematic sample: a Knuth multiplicative hash of
    the row key mod 100 — the same rows are selected by ANY engine (unlike
    seeded Bernoulli RNGs), which is what reproducible training-data splits
    need. The key is reduced mod 100 before the multiply (same residue class)
    so the product stays in exact, overflow-checked BIGINT range at any
    scale factor."""
    l = load(spark, sf_dir, "lineitem")
    bucket = F.pmod(
        F.pmod(F.col("l_orderkey").cast("bigint"), F.lit(100))
        * F.lit(2654435761).cast("bigint")
        + F.col("l_linenumber").cast("bigint") * F.lit(40503),
        F.lit(100),
    )
    return (
        l.filter(bucket < 10)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias("sum_price"),
        )
    )


@query(
    "sql_tablesample",
    # GOLDEN-PINNED like sample_deterministic above (same canonical
    # one-partition total-order input, so the golden is core-count
    # independent): TABLESAMPLE REPEATABLE is deterministic within Spark but
    # its RNG is engine-specific, so the oracle replays the committed
    # per-tier golden of Spark's own output (keyed by the orders row count;
    # unknown tier → zero rows → loud fail).
    oracle="""
    WITH golden(tier_rows, o_orderstatus, n) AS (VALUES
      (1500,   'F', 56),   (1500,   'O', 54),   (1500,   'P', 59),
      (15000,  'F', 486),  (15000,  'O', 557),  (15000,  'P', 542),
      (150000, 'F', 4976), (150000, 'O', 4861), (150000, 'P', 5048)
    )
    SELECT o_orderstatus, CAST(n AS BIGINT) AS n
    FROM golden WHERE tier_rows = (SELECT COUNT(*) FROM orders)
    """,
    category="sampling",
)
def sql_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL TABLESAMPLE surface (REPEATABLE seed → deterministic within
    Spark; oracle = committed golden of that deterministic output per tier,
    over the canonical single-partition key order)."""
    (
        load(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .coalesce(1)
        .createOrReplaceTempView("orders_ts")
    )
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders_ts TABLESAMPLE (10 PERCENT) REPEATABLE (42)
        GROUP BY o_orderstatus
        """
    )
