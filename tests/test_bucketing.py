"""Bucketed tables: co-located joins without a shuffle — the 100 TB strategy
for repeated joins on the same key (SURVEY.md §2B partitioning row)."""

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.tables import load


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # warehouse dir is a static conf, set by the session fixture (conftest)
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "b_orders"
    )
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "b_lineitem"
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed):
    orders, lineitem = bucketed
    # disable auto-broadcast so the join strategy is decided by bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides bucketed on the join key → SortMergeJoin with NO exchange
        # before it (only the post-join aggregation shuffles)
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # result still correct
        got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
        exp_df = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        exp = {r["o_orderpriority"]: r["count"] for r in exp_df.collect()}
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")


def test_bucket_pruning_scan(spark, bucketed):
    orders, _ = bucketed
    # the planner auto-disables bucketed scans it deems unhelpful; force it on
    # to observe bucket pruning for the point lookup
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            spark.table("b_orders")
            .filter(F.col("o_orderkey") == 42)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # bucket pruning: point lookup touches 1 of 8 buckets
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
