"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k against a query vector. The dot
  product is integer-quantized (floor(x·1e6)) so scores are bit-identical
  across engines (all intermediates are integers < 2^53 — exact in either
  integer or float arithmetic, order-independent). JVM-side higher-order
  functions only; Catalyst constant-folds the query-vector literal.

* ``lsh_ann_topk`` — the scale path: BucketedRandomProjectionLSH buckets, then
  exact re-rank inside candidate buckets. Sub-linear candidate set at 100 TB;
  brute force stays as the recall baseline.

* ``ivf_topk`` — IVF-style: k-means-ish coarse centroids (here: LSH bucket ids
  as the coarse quantizer stand-in), probe nearest buckets only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000  # 1e6 quantization — see module docstring


def _quant_dot_literal(vec_col, q: list[float]):
    """Σ floor(a_i·1e6)·floor(q_i·1e6) as exact integers."""
    qints = [int(math.floor(float(x) * QUANT)) for x in q]
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(v) for v in qints]),
            lambda a, qv: F.floor(a.cast("double") * QUANT).cast("long") * qv.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _quant_norm2(vec_col):
    return F.aggregate(
        vec_col,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * QUANT).cast("long")
        * F.floor(x.cast("double") * QUANT).cast("long"),
    )


def cosine_scores(df: DataFrame, vec_col: str, query: list[float]) -> DataFrame:
    """All rows scored: cosine = qdot / (sqrt(qnorm2)·sqrt(norm2)) on the
    quantized grid — deterministic to the bit."""
    qn2 = sum(int(math.floor(float(x) * QUANT)) ** 2 for x in query)
    return df.withColumn(
        "cosine",
        _quant_dot_literal(F.col(vec_col), query).cast("double")
        / (F.sqrt(_quant_norm2(F.col(vec_col)).cast("double")) * F.lit(math.sqrt(qn2))),
    )


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Exact brute-force top-k (TakeOrderedAndProject — per-partition heaps,
    no global sort)."""
    return (
        cosine_scores(df, vec_col, query)
        .select(F.col(id_col), F.col("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(df: DataFrame, vec_col: str, id_col: str, threshold: float) -> DataFrame:
    """All-pairs cosine ≥ threshold on the quantized integer grid (embedding
    near-dup dedup). O(n²) exact baseline — the LSH bucketing below is the
    corpus-scale path; per-element products stay < 2^53 so the fold is exact
    and order-free on any engine."""
    quant = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * QUANT).cast("long")).alias(
            "qv"
        ),
    ).withColumn(
        "n2", F.aggregate("qv", F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    )
    a = quant.select(F.col("id").alias("id_a"), F.col("qv").alias("qv_a"), F.col("n2").alias("n2_a"))
    b = quant.select(F.col("id").alias("id_b"), F.col("qv").alias("qv_b"), F.col("n2").alias("n2_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("qv_a", "qv_b", lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            (dot.cast("double") / (F.sqrt(F.col("n2_a").cast("double")) * F.sqrt(F.col("n2_b").cast("double")))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN via random-projection LSH; exact cosine re-rank on the
    candidate set. Returns (id, cosine) — approximate recall, deterministic
    given the seed."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feats = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("arr")
    ).withColumn("features", array_to_vector(F.col("arr").cast("array<double>")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feats)
    qv = Vectors.dense([float(x) for x in query])
    candidates = model.approxNearestNeighbors(feats, qv, max(k * 4, 40))
    rescored = cosine_scores(candidates.select("id", F.col("arr")), "arr", query)
    return rescored.select("id", "cosine").orderBy(F.desc("cosine"), F.asc("id")).limit(k)
