"""Pin the self-check harness itself (tools/check_oracle.py).

Round-9 driver hash-fail: a DuckDB HUGEINT final column reaches pandas as
float64 while Spark's equivalent stays int64; normalize()'s integral-float
canonicalization made values compare equal, so SELFCHECK was structurally
blind to the exact class the driver's hasher fails on. dtype_family /
dtype_divergence close that hole — these tests pin both the synthetic
HUGEINT reproduction and the documented exemptions (symmetric nullable-int
widening, date-vs-datetime64 representation).
"""

import datetime
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, ".")

from tools.check_oracle import dtype_divergence, dtype_family, normalize  # noqa: E402


def test_hugeint_reaches_pandas_as_float64():
    # the environmental fact the r9 failure rests on: SUM(BIGINT) window ->
    # HUGEINT -> float64 in fetchdf (if a duckdb upgrade ever changes this,
    # the dtype gate below is what keeps us honest either way)
    con = duckdb.connect()
    df = con.execute(
        "SELECT SUM(x) OVER () AS s FROM (SELECT CAST(162 AS BIGINT) AS x)"
    ).fetchdf()
    assert df["s"].dtype == "float64"
    assert df["s"].iloc[0] == 162.0


def test_synthetic_hugeint_case_is_flagged():
    spark_side = pd.DataFrame({"k": ["a", "b"], "start_pos": [162, 0]})
    assert spark_side["start_pos"].dtype == "int64"
    con = duckdb.connect()
    oracle_side = con.execute(
        """
        SELECT k, COALESCE(SUM(v) OVER (PARTITION BY k), 0) AS start_pos
        FROM (VALUES ('a', CAST(162 AS BIGINT)), ('b', CAST(0 AS BIGINT))) t(k, v)
        """
    ).fetchdf()
    # values canonicalize equal — the pre-r10 checker called this a match
    scols, srows = normalize(spark_side)
    ocols, orows = normalize(oracle_side)
    assert srows == orows
    # ...but the dtype gate sees what the driver's hasher sees
    div = dtype_divergence(spark_side, oracle_side)
    assert div == ["start_pos: spark=int oracle=float"]
    # and the BIGINT cast (the r10 oracle fix) clears it
    fixed = con.execute(
        """
        SELECT k, CAST(COALESCE(SUM(v) OVER (PARTITION BY k), 0) AS BIGINT) AS start_pos
        FROM (VALUES ('a', CAST(162 AS BIGINT)), ('b', CAST(0 AS BIGINT))) t(k, v)
        """
    ).fetchdf()
    assert dtype_divergence(spark_side, fixed) == []


def test_symmetric_nullable_widening_is_exempt():
    # a nullable int column widens to float64 on BOTH sides (Spark toPandas
    # and duckdb fetchdf) — same family, no divergence
    a = pd.DataFrame({"n": [1.0, None]})
    b = pd.DataFrame({"n": [1.0, None]})
    assert dtype_divergence(a, b) == []


def test_decimal_vs_float_is_flagged():
    import decimal

    a = pd.DataFrame({"w": [8.0]})
    b = pd.DataFrame({"w": [decimal.Decimal("8.0")]})
    assert dtype_divergence(a, b) == ["w: spark=float oracle=decimal"]


def test_date_object_vs_datetime64_is_exempt():
    # Spark DATE -> object-of-datetime.date; DuckDB DATE -> datetime64[ns]:
    # same family ("datetime"), values canon identically, not a divergence
    a = pd.DataFrame({"d": [datetime.date(2023, 1, 1)]})
    b = pd.DataFrame({"d": pd.to_datetime(["2023-01-01"])})
    assert dtype_family(a["d"]) == "datetime"
    assert dtype_family(b["d"]) == "datetime"
    assert dtype_divergence(a, b) == []


def test_all_null_column_matches_anything():
    a = pd.DataFrame({"x": [None, None]})
    b = pd.DataFrame({"x": [1, 2]})
    assert dtype_divergence(a, b) == []


@pytest.mark.parametrize(
    "values,family",
    [
        ([1, 2], "int"),
        ([1.5], "float"),
        (["s"], "str"),
        ([b"\x00"], "bytes"),
        ([[1, 2]], "array"),
        ([True, False], "bool"),
    ],
)
def test_dtype_family_table(values, family):
    assert dtype_family(pd.Series(values, dtype=object)) == family


def test_no_hugeint_or_decimal_final_columns_in_any_oracle():
    """Regression gate for the round-9 driver hash-fail class: DESCRIBE every
    committed oracle on DuckDB and assert no final column is HUGEINT/
    UHUGEINT/DECIMAL (the types pandas renders as float64/Decimal while
    Spark emits int64/double — value-equal, hash-different). DESCRIBE binds
    the parquet views but moves no data, so this sweeps all ~310 oracles in
    seconds."""
    import duckdb

    import __spark_entry__ as entrymod
    from snapshot_sender_spark.tables import TABLE_NAMES

    sf_dir = "/root/testdata/sf0.001"
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    flagged = []
    for name in sorted(oracles):
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception:
            continue  # non-DESCRIBE-able oracles run live in check_oracle
        for col, typ, *_ in desc:
            u = str(typ).upper()
            if u.startswith(("HUGEINT", "UHUGEINT", "DECIMAL")):
                flagged.append(f"{name}.{col}: {u}")
    assert flagged == [], flagged
