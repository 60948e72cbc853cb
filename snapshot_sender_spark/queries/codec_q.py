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


@query("sample_deterministic", oracle=None, category="sampling")
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed (rows-only: the sample RNG is
    engine-specific, so no cross-engine oracle — determinism within Spark is
    what matters for reproducible pipeline runs)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"))
    )
