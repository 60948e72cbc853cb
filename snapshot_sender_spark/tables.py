"""Loaders for the driver-provided testdata tables (TESTDATA.md / FIXTURES.md §B)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pin_session_confs(spark: SparkSession) -> None:
    """Correctness-critical dynamic confs, pinned here because the verifying
    driver builds its own SparkSession: UTC session timezone (timestamps must
    canonicalize identically to DuckDB's UTC-naive values) and Arrow for the
    pandas-UDF crossings."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


# (sf_dir, name) -> (session, analyzed base DataFrame). A DataFrame here is
# an immutable LOGICAL PLAN handle, not data: memoizing it skips the repeated
# `spark.read.parquet` footer/schema round trip (~100-140 ms per call measured
# on local[32] — the dominant cost of building a multi-table query), while
# every execution still scans the parquet files. A hit requires the cached
# entry's session to BE (identity) the caller's session: two live sessions can
# never alias, and a handle bound to a stopped session is simply replaced the
# next time the table is loaded from a new session. The testdata tables are
# read-only fixtures, so the file listing captured at first load cannot go
# stale within a session.
_LOAD_CACHE: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None and cached[0] is spark:
        return cached[1]
    _pin_session_confs(spark)
    df = _load_uncached(spark, sf_dir, name)
    if len(_LOAD_CACHE) >= 512:
        _LOAD_CACHE.clear()
    _LOAD_CACHE[key] = (spark, df)
    return df


def _load_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has stored ts either as TIMESTAMP(NANOS) (which the
        # Spark parquet reader rejects unless read as long and converted) or,
        # in newer generations, as plain TIMESTAMP(MICROS). Handle both.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if isinstance(raw.schema["ts"].dataType, T.LongType):
            raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(raw.schema["ts"].dataType, T.TimestampNTZType):
            # session tz is pinned UTC, so this cast is value-preserving; it
            # keeps every downstream query's output type stable (TIMESTAMP)
            raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL API surface)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
