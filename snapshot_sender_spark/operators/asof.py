"""As-of join: for each left row, the most recent right row with
right.ts <= left.ts within the same key.

Two implementations with different scale profiles:

* ``asof_join_agg`` — declarative composition (inequality join + max/aggregate
  back-join). Oracle-checkable, but the inequality join materializes O(matches)
  intermediate rows; fine when right-per-key history is short.

* ``asof_join_merge`` — the 100 TB path: co-partition both sides by key
  (single shuffle each), then a per-key vectorized ``pd.merge_asof`` inside
  ``applyInPandas``. Intermediate size is O(left + right), never O(matches).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join_agg(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Composed as-of: left joined with max(right.ts <= left.ts) per left row.
    Returns left columns + ``asof_ts``; join value columns back via that pair."""
    r = right.select(
        F.col(key).alias("__r_key"), F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in (value_cols or [])],
    )
    matched = left.join(
        r, (left[key] == F.col("__r_key")) & (F.col("__r_ts") <= left[left_ts]), "left"
    )
    group_cols = left.columns
    agg = matched.groupBy(*group_cols).agg(F.max("__r_ts").alias("asof_ts"))
    return agg


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Scale path: one shuffle per side on ``key``, merge_asof per group.

    ``applyInPandas`` over a cogroup gives each key's left and right slices to
    pandas already sorted-by-nothing; merge_asof needs sort by ts which is
    O(n log n) per key in memory — bounded by per-key history size, not total."""
    value_cols = value_cols or []
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields)
        + f", asof_ts timestamp"
        + "".join(f", asof_{c} {dict((f.name, f.dataType.simpleString()) for f in right.schema.fields)[c]}" for c in value_cols)
    )

    lcols = list(left.columns)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            return pd.DataFrame(columns=lcols + ["asof_ts"] + [f"asof_{c}" for c in value_cols])
        l_sorted = l_pdf.sort_values(left_ts)
        r_sorted = r_pdf.sort_values(right_ts)[[right_ts] + value_cols].rename(
            columns={right_ts: "asof_ts", **{c: f"asof_{c}" for c in value_cols}}
        )
        if r_sorted.empty:
            out = l_sorted.copy()
            out["asof_ts"] = pd.NaT
            for c in value_cols:
                out[f"asof_{c}"] = None
            return out
        return pd.merge_asof(
            l_sorted, r_sorted, left_on=left_ts, right_on="asof_ts", direction="backward"
        )

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(lambda lk, rk: merge(lk, rk), schema=out_schema)
    )
