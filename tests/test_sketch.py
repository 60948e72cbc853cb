"""Seeded KLL quantile sketch (operators/sketch.py): accuracy within the
paper's rank-error bound, exact n, merge mechanics, and the determinism
contract the golden-pinned query relies on."""

import numpy as np
import pytest

from snapshot_sender_spark.operators.sketch import SeededKLL, kll_group_quantiles


def _rank_err(data: np.ndarray, est: float, q: float) -> float:
    return abs(np.searchsorted(np.sort(data), est) / len(data) - q)


def test_kll_accuracy_and_exact_n():
    rng = np.random.default_rng(11)
    data = rng.lognormal(3, 1, 100_000)
    sk = SeededKLL(k=200, seed=42)
    sk.update_many(data)
    assert sk.n == len(data)  # weight-exact compaction: n is never estimated
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        assert _rank_err(data, sk.quantile(q), q) < 0.02, q
    # quantiles SELECT ingested values (golden-safety: no float arithmetic)
    vals = set(data.tolist())
    assert all(sk.quantile(q) in vals for q in (0.1, 0.5, 0.9))


def test_kll_chunking_invariance_and_determinism():
    """update_many under ANY chunking equals per-item update(), and two
    sketches with the same (seed, update sequence) are state-identical —
    the property that makes the canonicalized query partitioning-proof."""
    rng = np.random.default_rng(5)
    data = rng.normal(0, 1, 20_000)
    whole = SeededKLL(k=128, seed=7)
    whole.update_many(data)
    chunked = SeededKLL(k=128, seed=7)
    for chunk in np.array_split(data, 113):
        chunked.update_many(chunk)
    single = SeededKLL(k=128, seed=7)
    for v in data[:3_000]:
        single.update(v)
    single_bulk = SeededKLL(k=128, seed=7)
    single_bulk.update_many(data[:3_000])
    assert whole.levels == chunked.levels
    assert single.levels == single_bulk.levels
    # a different seed draws different compaction coins -> different ladder
    other = SeededKLL(k=128, seed=8)
    other.update_many(data)
    assert other.levels != whole.levels


def test_kll_merge_accuracy_and_exact_n():
    rng = np.random.default_rng(3)
    data = rng.uniform(-50, 50, 80_000)
    merged = SeededKLL(k=200, seed=1)
    for i, part in enumerate(np.array_split(data, 16)):
        s = SeededKLL(k=200, seed=100 + i)
        s.update_many(part)
        merged.merge(s)
    assert merged.n == len(data)
    for q in (0.1, 0.5, 0.9):
        assert _rank_err(data, merged.quantile(q), q) < 0.02, q


def test_kll_edge_cases():
    sk = SeededKLL(k=16, seed=0)
    with pytest.raises(ValueError):
        sk.quantile(0.5)  # empty
    sk.update(3.0)
    assert sk.quantile(0.0) == 3.0 and sk.quantile(1.0) == 3.0
    with pytest.raises(ValueError):
        sk.quantile(1.5)
    with pytest.raises(ValueError):
        SeededKLL(k=2)
    # small streams are EXACT (no compaction below capacity)
    sk2 = SeededKLL(k=64, seed=0)
    sk2.update_many(np.arange(10, dtype=float))
    assert sk2.quantile(0.5) == 4.0  # ceil(0.5*10)=5th of 0..9


def test_kll_group_quantiles_partitioning_invariance(spark):
    """The applyInPandas wrapper is a pure function of the data set: any
    input partitioning, same output; NULLs skipped; n exact."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "g": ["a"] * 500 + ["b"] * 300,
            "k": list(range(800)),
            "v": list(np.linspace(0, 100, 500)) + list(np.linspace(-5, 5, 300)),
        }
    )
    pdf.loc[10, "v"] = None
    df = spark.createDataFrame(pdf)
    out1 = sorted(
        map(
            tuple,
            kll_group_quantiles(
                df.repartition(13, "k"), ["g"], "v", ["v", "k"], {"p50": 0.5}, 64, 9
            ).collect(),
        )
    )
    out2 = sorted(
        map(
            tuple,
            kll_group_quantiles(
                df.coalesce(1), ["g"], "v", ["v", "k"], {"p50": 0.5}, 64, 9
            ).collect(),
        )
    )
    assert out1 == out2
    byg = dict((g, (n, p)) for g, n, p in out1)
    assert byg["a"][0] == 499  # one NULL skipped
    assert byg["b"][0] == 300
