"""Data-quality expectation suite (Deequ-style) — declarative checks over a
DataFrame, computed in ONE aggregate pass.

The reference validates inputs record-by-record with its filename grammar and
routes rejects (TextParsingUtility.kt:7-11, ValidatorService); a 100 TB
training-data pipeline additionally needs TABLE-level expectations — is the
key unique, is the measure in range, did a column go null, does every fact row
join a dimension — asserted per ingest batch before the data is trusted. This
operator provides that layer, modeled on the public Amazon Deequ design
(single-pass metric computation + declarative assertions) re-expressed as one
Spark aggregate:

  * every single-table check contributes conditional-aggregate expressions to
    ONE ``df.agg(...)`` job (map-side partials, no shuffle beyond the final
    reduce — the cost of auditing 100 TB is one scan, not one scan per check);
  * referential-integrity checks each add one LEFT ANTI join count (the only
    check class that genuinely needs a second relation);
  * metrics are exact integers (counts, bigint-cast extrema) so reports are
    bit-deterministic and cross-engine verifiable.

Report row: (check_name, observed, total, passed) — ``observed``/``total`` are the
check's numerator/denominator (total NULL where a plain value is observed,
e.g. min/max bounds).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    check: str
    observed: int | None
    total: int | None
    passed: bool


@dataclass(frozen=True)
class _AggCheck:
    name: str
    exprs: dict[str, Column]  # alias -> aggregate expression (bigint)
    verdict: Callable[[dict], CheckResult]


def completeness(name: str, col: str, min_ratio: float = 1.0) -> _AggCheck:
    """non-null fraction of ``col`` must be >= min_ratio."""
    nn, tot = f"{name}__nn", f"{name}__tot"
    return _AggCheck(
        name,
        {nn: F.count(col).cast("bigint"), tot: F.count(F.lit(1)).cast("bigint")},
        lambda r: CheckResult(name, r[nn], r[tot], r[nn] >= min_ratio * r[tot]),
    )


def compliance(name: str, predicate_sql: str, min_ratio: float = 1.0) -> _AggCheck:
    """fraction of rows satisfying the predicate must be >= min_ratio
    (NULL predicate counts as non-compliant, the SQL CHECK convention)."""
    ok, tot = f"{name}__ok", f"{name}__tot"
    cond = F.coalesce(F.expr(predicate_sql), F.lit(False)).cast("int")

    def verdict(r: dict) -> CheckResult:
        n_ok = r[ok] or 0  # SUM over zero rows is NULL: empty input complies
        return CheckResult(name, n_ok, r[tot], n_ok >= min_ratio * r[tot])

    return _AggCheck(
        name,
        {ok: F.sum(cond).cast("bigint"), tot: F.count(F.lit(1)).cast("bigint")},
        verdict,
    )


def value_in_range(
    name: str, expr_sql: str, lo: int | None = None, hi: int | None = None
) -> _AggCheck:
    """an integer-valued aggregate (e.g. MIN(x), MAX(x), COUNT(DISTINCT x))
    must land inside [lo, hi] (inclusive; None = unbounded)."""
    val = f"{name}__val"

    def verdict(r: dict) -> CheckResult:
        v = r[val]
        ok = v is not None and (lo is None or v >= lo) and (hi is None or v <= hi)
        return CheckResult(name, v, None, ok)

    return _AggCheck(name, {val: F.expr(expr_sql).cast("bigint")}, verdict)


def primary_key(name: str, *cols: str) -> _AggCheck:
    """(cols) identify rows uniquely: COUNT(DISTINCT cols) == COUNT(*).
    NULL keys break uniqueness by definition, so they are counted as
    violations too (distinct ignores them, the comparison then fails)."""
    dist, tot = f"{name}__dist", f"{name}__tot"
    return _AggCheck(
        name,
        {
            dist: F.count_distinct(*[F.col(c) for c in cols]).cast("bigint"),
            tot: F.count(F.lit(1)).cast("bigint"),
        },
        lambda r: CheckResult(name, r[dist], r[tot], r[dist] == r[tot]),
    )


@dataclass(frozen=True)
class ForeignKey:
    """every non-null (fk_cols) value must exist in dim[pk_cols]."""

    name: str
    fk_cols: tuple[str, ...]
    dim: DataFrame
    pk_cols: tuple[str, ...]


def metrics_frame(df: DataFrame, checks: list[_AggCheck]) -> DataFrame:
    """The one-row metrics DataFrame all single-table checks share: a single
    df.agg over every check's expressions — one scan of the input however
    many checks ride it (the plan-shape test pins this)."""
    exprs = []
    for c in checks:
        for alias, e in c.exprs.items():
            exprs.append(e.alias(alias))
    return df.agg(*exprs)


def run_expectations(
    spark: SparkSession,
    df: DataFrame,
    checks: list[_AggCheck],
    foreign_keys: list[ForeignKey] = (),
) -> DataFrame:
    """Evaluate all expectations; returns the report DataFrame
    (check_name string, observed bigint, total bigint, passed boolean), ordered as
    declared. One aggregate job covers every _AggCheck; each ForeignKey adds
    one anti-join count."""
    results: list[CheckResult] = []
    if checks:
        row = metrics_frame(df, checks).collect()[0].asDict()
        results.extend(c.verdict(row) for c in checks)
    for fk in foreign_keys:
        # SQL MATCH SIMPLE: a row with ANY null component trivially satisfies
        # the constraint — only fully-non-null keys are probed
        all_non_null = F.lit(True)
        for c in fk.fk_cols:
            all_non_null = all_non_null & F.col(c).isNotNull()
        probe = df.where(all_non_null).select(
            *[F.col(c).alias(p) for c, p in zip(fk.fk_cols, fk.pk_cols)]
        )
        dim_keys = fk.dim.select(*fk.pk_cols).distinct().withColumn("__hit", F.lit(1))
        row = (
            probe.join(dim_keys, on=list(fk.pk_cols), how="left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("total"),
                F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("orphans"),
            )
            .collect()[0]
        )
        orphans = row["orphans"] if row["orphans"] is not None else 0
        results.append(CheckResult(fk.name, orphans, row["total"], orphans == 0))
    return spark.createDataFrame(
        [(r.check, r.observed, r.total, r.passed) for r in results],
        "check_name string, observed bigint, total bigint, passed boolean",
    )
