"""bench.py output contract: the single printed JSON line must fit the
driver's ~2 KB tail capture (BENCH_r05.json was "parsed": null because the
round-5 line carried raw laps + loadavg samples and outgrew it)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _fake_timings():
    # The real headline set plus the delivery pipeline — same key lengths the
    # real run produces.
    names = bench.HEADLINE + ["delivery_pipeline_100x1000"]
    return {n: 12.345 for n in names}


def test_compact_line_fits_tail_budget():
    med = _fake_timings()
    best = {n: v - 2.0 for n, v in med.items()}  # min <= median by construction
    line = bench.format_line(med, best, med, 0.1)
    assert len(line) < 1024, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_sec"
    assert parsed["unit"] == "sec"
    assert parsed["detail"] == "BENCH_DETAIL.json"
    assert set(parsed["queries"]) == set(best)
    # round-7 methodology: the headline value IS the best-of-laps total
    assert parsed["value"] == round(sum(best.values()), 3)
    assert parsed["value"] == parsed["best_total_sec"]
    assert parsed["median_total_sec"] == round(sum(med.values()), 3)


def test_oversized_medians_fall_back_to_totals_only():
    # Pathological: hundreds of long query names — the guard must drop the
    # per-query dict rather than breach the budget.
    t = {f"query_with_a_very_long_name_{i:04d}": 1.0 for i in range(300)}
    line = bench.format_line(t, t, t, 0.1)
    assert len(line) < 1024
    parsed = json.loads(line)
    assert "queries" not in parsed
    assert parsed["value"] == 300.0


def test_line_is_single_line_json():
    t = _fake_timings()
    line = bench.format_line(t, t, t, 0.01)
    assert "\n" not in line
    json.loads(line)  # round-trips
