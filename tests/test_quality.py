"""Data-quality expectation suite (operators/quality.py)."""

from pyspark.sql import functions as F

from snapshot_sender_spark.operators.quality import (
    ForeignKey,
    completeness,
    compliance,
    primary_key,
    run_expectations,
    value_in_range,
)


def _report(spark, df, checks, fks=()):
    rows = run_expectations(spark, df, checks, fks).collect()
    return {r["check_name"]: r for r in rows}


def test_completeness_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "id int, v string"
    )
    rep = _report(
        spark,
        df,
        [
            completeness("strict", "v"),  # 3/4 < 1.0
            completeness("lenient", "v", min_ratio=0.7),
            completeness("ids", "id"),
        ],
    )
    assert (rep["strict"]["observed"], rep["strict"]["total"]) == (3, 4)
    assert not rep["strict"]["passed"]
    assert rep["lenient"]["passed"]
    assert rep["ids"]["passed"]


def test_compliance_null_predicate_is_noncompliant(spark):
    df = spark.createDataFrame([(1,), (50,), (None,)], "q int")
    rep = _report(
        spark,
        df,
        [
            compliance("all_in_range", "q BETWEEN 1 AND 50"),
            compliance("two_thirds", "q BETWEEN 1 AND 50", min_ratio=0.66),
        ],
    )
    assert (rep["all_in_range"]["observed"], rep["all_in_range"]["total"]) == (2, 3)
    assert not rep["all_in_range"]["passed"]  # NULL counts as non-compliant
    assert rep["two_thirds"]["passed"]


def test_value_in_range_bounds_and_null(spark):
    df = spark.createDataFrame([(5,), (9,)], "x int")
    rep = _report(
        spark,
        df,
        [
            value_in_range("min_ok", "MIN(x)", lo=5),
            value_in_range("max_bad", "MAX(x)", hi=8),
            value_in_range("exact_distinct", "COUNT(DISTINCT x)", lo=2, hi=2),
        ],
    )
    assert rep["min_ok"]["passed"] and rep["min_ok"]["observed"] == 5
    assert not rep["max_bad"]["passed"]
    assert rep["exact_distinct"]["passed"]
    # aggregate over zero rows -> NULL observed -> failed, not crashed
    empty = spark.createDataFrame([], "x int")
    rep = _report(spark, empty, [value_in_range("min_null", "MIN(x)", lo=0)])
    assert rep["min_null"]["observed"] is None and not rep["min_null"]["passed"]


def test_compliance_on_empty_input_reports_instead_of_crashing(spark):
    empty = spark.createDataFrame([], "q int")
    rep = _report(spark, empty, [compliance("c", "q > 0")])
    assert (rep["c"]["observed"], rep["c"]["total"]) == (0, 0)
    assert rep["c"]["passed"]  # vacuously compliant, like completeness


def test_primary_key_duplicates_and_nulls(spark):
    ok = spark.createDataFrame([(1, 1), (1, 2), (2, 1)], "a int, b int")
    rep = _report(spark, ok, [primary_key("pk", "a", "b")])
    assert rep["pk"]["passed"]
    dup = spark.createDataFrame([(1, 1), (1, 1)], "a int, b int")
    rep = _report(spark, dup, [primary_key("pk", "a", "b")])
    assert (rep["pk"]["observed"], rep["pk"]["total"]) == (1, 2)
    assert not rep["pk"]["passed"]
    # a NULL key component breaks uniqueness (distinct drops it)
    withnull = spark.createDataFrame([(1, 1), (None, 2)], "a int, b int")
    rep = _report(spark, withnull, [primary_key("pk", "a", "b")])
    assert not rep["pk"]["passed"]


def test_foreign_key_orphans_and_match_simple_nulls(spark):
    fact = spark.createDataFrame(
        [(1, "x"), (2, "y"), (99, "z"), (None, "w")], "k int, v string"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    rep = _report(
        spark, fact, [], [ForeignKey("fk", ("k",), dim, ("pk",))]
    )
    # NULL fk satisfies MATCH SIMPLE: probed total is 3, one orphan (99)
    assert (rep["fk"]["observed"], rep["fk"]["total"]) == (1, 3)
    assert not rep["fk"]["passed"]
    clean = fact.where("k IS NULL OR k < 50")
    rep = _report(spark, clean, [], [ForeignKey("fk", ("k",), dim, ("pk",))])
    assert rep["fk"]["passed"] and rep["fk"]["observed"] == 0


def test_single_pass_for_all_agg_checks(spark, sf_dir):
    """All single-table checks share ONE metrics frame = ONE scan of the
    input, however many checks ride it."""
    from snapshot_sender_spark.operators.quality import metrics_frame
    from snapshot_sender_spark.tables import load

    df = load(spark, sf_dir, "lineitem")
    mf = metrics_frame(
        df,
        [
            completeness("c1", "l_returnflag"),
            compliance("c2", "l_quantity >= 0"),
            value_in_range("c3", "MIN(l_linenumber)", lo=0),
            primary_key("c4", "l_orderkey", "l_linenumber"),
        ],
    )
    plan = mf._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1  # one scan feeds every metric
    row = mf.collect()[0].asDict()
    assert row["c2__tot"] == df.count()


def test_report_order_matches_declaration(spark):
    df = spark.createDataFrame([(1,)], "x int")
    rep = run_expectations(
        spark,
        df,
        [completeness("b_first", "x"), value_in_range("a_second", "MIN(x)", lo=0)],
    ).collect()
    assert [r["check_name"] for r in rep] == ["b_first", "a_second"]
