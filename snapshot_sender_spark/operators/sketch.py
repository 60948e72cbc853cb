"""Seeded KLL quantile sketch — mergeable streaming quantiles with bounded
rank error and FULLY REPRODUCIBLE output.

Implements the KLL sketch of Karnin, Lang & Liberty, "Optimal Quantile
Approximation in Streams" (FOCS 2016) from the paper's public description:
a ladder of compactor buffers where level ``h`` holds items of weight
``2**h``; when the ladder overflows, the lowest over-capacity level is
sorted and a random half (even or odd positions) is promoted one level up.
Rank error is O(1/k) of n with high probability at O(k·log log n) space.

Why not Spark's built-in ``kll_sketch_agg_double``: the Apache DataSketches
implementation draws its compaction coin from an UNSEEDED RNG, so two runs
over identical input produce different estimates — correct within error
bounds, but impossible to attest with a hash-comparing oracle. This
implementation differs in exactly one design decision: the compaction coin
comes from a caller-seeded ``random.Random``, so the sketch is a pure
function of (seed, update sequence). Combined with a canonical total input
order per group (sort by a unique key inside the applyInPandas UDF), the
estimate is bit-stable across partitionings, core counts and runs — the
"seeded randomness + order canonicalization" determinism lane of
queries/goldens.py.

Weight exactness: a compaction promotes the even-length prefix's
every-other element at doubled weight (2m·w in, m·2w out) and leaves the
odd leftover at its level, so total retained weight equals n EXACTLY at all
times — ``n`` is exact, only quantile positions are approximate. Quantile
queries SELECT one of the ingested values (no float arithmetic), so pinned
goldens cannot drift across containers via libm differences.

Scale shape: ``update_many`` ingests numpy chunks with O(n/k · log(n/k))
small sorts; ``merge`` concatenates ladders level-wise and re-compacts, so
the distributed form (per-partition sketches → tree merge) works at any
scale. The merged result depends on merge ORDER (like every KLL), which is
why the oracle-checked query path canonicalizes to one ordered stream per
group instead — reproducibility lane and scale lane, same structure.

Reference anchor: the reference has no sketch aggregates at all (its only
aggregation is the sent-count increment, HttpWriterKt/UCExportToCrownStatus);
this operator exists for the generalized engine surface (SURVEY.md §2B
aggregations).
"""

from __future__ import annotations

import math
import random

import numpy as np

from pyspark.sql import DataFrame

_C = 2.0 / 3.0  # per-level capacity decay from the KLL paper
_MIN_CAP = 8


class SeededKLL:
    """One KLL sketch; deterministic given (k, seed, update sequence)."""

    def __init__(self, k: int = 200, seed: int = 42):
        if k < _MIN_CAP:
            raise ValueError(f"k must be >= {_MIN_CAP}")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._rng = random.Random(seed)

    # -- capacity ladder -----------------------------------------------------

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(_MIN_CAP, int(math.ceil(self.k * (_C ** depth))))

    def _size(self) -> int:
        return sum(len(b) for b in self.levels)

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.levels)))

    # -- updates -------------------------------------------------------------

    def update(self, v: float) -> None:
        self.levels[0].append(float(v))
        self.n += 1
        self._compress_if_needed()

    def update_many(self, values: np.ndarray) -> None:
        """Bulk ingest, EXACTLY equivalent to per-item update() under any
        chunking: append until the ladder first overflows (the point where
        a sequential update would compact — no intermediate state differs),
        compress, repeat. Per-item Python cost collapses to O(n/k) sorts."""
        arr = np.asarray(values, dtype=np.float64)
        i = 0
        while i < len(arr):
            space = self._total_capacity() - self._size()
            take = min(max(space, 0) + 1, len(arr) - i)
            self.levels[0].extend(arr[i : i + take].tolist())
            self.n += take
            i += take
            self._compress_if_needed()

    def _compress_if_needed(self) -> None:
        while self._size() > self._total_capacity():
            for lvl in range(len(self.levels)):
                if len(self.levels[lvl]) >= self._capacity(lvl):
                    self._compact_level(lvl)
                    break
            else:
                break  # nothing compactable: ladder is legal as-is

    def _compact_level(self, lvl: int) -> None:
        buf = sorted(self.levels[lvl])
        odd_leftover = [buf.pop()] if len(buf) % 2 == 1 else []
        offset = self._rng.getrandbits(1)  # THE seeded coin
        promoted = buf[offset::2]
        self.levels[lvl] = odd_leftover
        if lvl + 1 == len(self.levels):
            self.levels.append([])
        self.levels[lvl + 1].extend(promoted)

    # -- merge ---------------------------------------------------------------

    def merge(self, other: "SeededKLL") -> "SeededKLL":
        """Fold ``other`` into self (level-wise concatenation, then
        re-compact). Deterministic given both states and self's coin
        stream; the RESULT depends on merge order, like every KLL."""
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for lvl, buf in enumerate(other.levels):
            self.levels[lvl].extend(buf)
        self.n += other.n
        self._compress_if_needed()
        return self

    # -- queries -------------------------------------------------------------

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for h, buf in enumerate(self.levels):
            vals.extend(buf)
            weights.extend([1 << h] * len(buf))
        v = np.asarray(vals, dtype=np.float64)
        w = np.asarray(weights, dtype=np.int64)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Smallest retained value whose cumulative weight reaches rank
        q·n. Selects an ingested value — no float arithmetic on values."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        if self.n == 0:
            raise ValueError("empty sketch")
        v, w = self._weighted_items()
        target = max(1, int(math.ceil(q * self.n)))
        cum = np.cumsum(w)
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, len(v) - 1)])


def kll_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    order_cols: list[str],
    qs: dict[str, float],
    k: int = 200,
    seed: int = 42,
) -> DataFrame:
    """Per-group KLL quantile estimates, bit-reproducible.

    Each group is assembled by ``applyInPandas`` (whole group, one pandas
    frame), canonically ordered by ``order_cols`` (must be a total order —
    include a unique key), and streamed through one SeededKLL — so the
    output is a pure function of the data SET, independent of partitioning.
    NULL values are skipped (SQL aggregate convention); ``n`` is the exact
    non-null count. Output: group_cols + n + one double column per entry in
    ``qs``. Scale lane: swap the canonical stream for per-partition
    sketches + merge() when reproducibility is not required.
    """
    import pandas as pd

    group_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (
        ", ".join(f"{c} {group_types[c]}" for c in group_cols)
        + ", n bigint, "
        + ", ".join(f"{name} double" for name in qs)
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        sk = SeededKLL(k=k, seed=seed)
        sk.update_many(vals)
        row = {c: pdf.iloc[0][c] for c in group_cols}
        row["n"] = sk.n
        for name, q in qs.items():
            row[name] = sk.quantile(q) if sk.n else None
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(fn, schema=out_schema)
