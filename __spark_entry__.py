"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes the
full declared operator surface (snapshot_sender_spark/queries/*) and
``oracle_sql()`` the matching DuckDB SQL for every deterministic query.
As of round 11 EVERY declared query has an oracle: the four formerly
rows-only cases were converted (seeded from-scratch KLL replaces the
unseeded DataSketches aggregate; canonical_fit makes the two KMeans-based
operators seed-deterministic; the AES e2e pipeline's seed-fixed output is
pinned). Approximate operators are either cross-engine exact (SimHash, md5
MinHash banding) or GOLDEN-PINNED — the oracle replays a committed golden
of Spark's own deterministic output (queries/goldens.py documents the
determinism contract per query).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snapshot_sender_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from snapshot_sender_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None}
