"""Pin the round-13 integer-cents kernel swap (queries/relational._cents):
``floor(x*100 + 0.5)`` must be value-identical to the decimal-cast form
``CAST(x AS DECIMAL(12,2))*100 → LONG`` (the shape the DuckDB oracles use)
on every money column the queries feed it, at every testdata SF — including
the negative-balance rows of customer.c_acctbal.

If a future testdata generation ever introduces a value with more than two
decimals, this test is the tripwire: the kernels diverge only at exact
half-cents, which cannot exist in a 2-decimal column.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snapshot_sender_spark.queries.relational import _cents

MONEY_COLUMNS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "customer": ["c_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
}

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_cents_kernel_matches_decimal_cast(spark, sf_dir):
    for tbl, cols in MONEY_COLUMNS.items():
        df = spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet"))
        for c in cols:
            dec = (F.col(c).cast("decimal(12,2)") * 100).cast("long")
            bad = df.filter(~dec.eqNullSafe(_cents(F.col(c)))).count()
            assert bad == 0, f"{sf_dir}/{tbl}.{c}: {bad} divergent rows"


def test_cents_kernel_negative_and_edge_values(spark):
    # representative 2-decimal doubles, both signs, magnitudes around the
    # money ranges; floor(x*100+0.5) must equal the decimal-cast cents
    vals = [0.0, 0.01, -0.01, 0.05, -0.05, 0.1, 999.99, -999.85, -846.69,
            104999.91, 9999.8, 1.0, 50.0, 0.07, -0.07, 123456.78, -123456.78]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    dec = (F.col("x").cast("decimal(12,2)") * 100).cast("long")
    rows = df.select(dec.alias("d"), _cents(F.col("x")).alias("g")).collect()
    for r in rows:
        assert r["d"] == r["g"], r

    # output type must stay LONG (the downstream _from_cents contract)
    assert dict(df.select(_cents(F.col("x")).alias("c")).dtypes)["c"] == "bigint"


def test_q1_expr_build_plan_identity(spark):
    """q1_pricing_summary builds its aggregates as SQL expression text (one
    py4j round trip each) — this pins that the text analyzes to the EXACT
    same plan as the reference Column-method construction (semanticHash over
    the analyzed plan), so a parser-typing drift (e.g. a decimal literal
    where a double is meant) fails loudly instead of silently changing
    results."""
    from snapshot_sender_spark.queries.relational import (
        _cents,
        _from_cents,
        dsum,
        q1_pricing_summary,
    )
    from snapshot_sender_spark.tables import load

    sf_dir = SF_DIRS[0]
    price_c = _cents(F.col("l_extendedprice"))
    disc_comp_c = 100 - _cents(F.col("l_discount"))
    tax_comp_c = 100 + _cents(F.col("l_tax"))
    reference = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _from_cents(F.sum(price_c * disc_comp_c), 4).alias("sum_disc_price"),
            _from_cents(F.sum(price_c * disc_comp_c * tax_comp_c), 6).alias("sum_charge"),
            (_from_cents(F.sum(_cents(F.col("l_quantity"))), 2) / F.count("l_quantity")).alias(
                "avg_qty"
            ),
            (_from_cents(F.sum(price_c), 2) / F.count("l_extendedprice")).alias("avg_price"),
            (_from_cents(F.sum(_cents(F.col("l_discount"))), 2) / F.count("l_discount")).alias(
                "avg_disc"
            ),
            F.count("*").alias("count_order"),
        )
    )
    built = q1_pricing_summary(spark, sf_dir)
    assert built.schema == reference.schema
    assert built.semanticHash() == reference.semanticHash()
