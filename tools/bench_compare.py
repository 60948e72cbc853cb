"""Compare two bench JSON outputs (BENCH_r{N}.json or raw bench.py lines):
per-query delta, flagged regressions.

Usage: python tools/bench_compare.py BENCH_r01.json BENCH_r02.json [threshold]
Threshold is the relative slowdown that counts as a regression (default 0.3).
Accepts either the driver's wrapper JSON ({"parsed": {...}}) or bench.py's
own single-line output.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    return doc.get("parsed", doc)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    qa, qb = a.get("queries", {}), b.get("queries", {})
    regressions = []
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for name in sorted(set(qa) | set(qb)):
        old, new = qa.get(name), qb.get(name)
        if old is None or new is None:
            print(f"{name:40s} {old or '-':>8} {new or '-':>8} {'(new)' if old is None else '(gone)':>8s}")
            continue
        rel = (new - old) / old if old else 0.0
        print(f"{name:40s} {old:8.3f} {new:8.3f} {rel:+7.0%}")
        if rel > thresh:
            regressions.append((name, old, new, rel))
    print(f"\ntotal: {a.get('value')} -> {b.get('value')}")
    if regressions:
        print(f"REGRESSIONS (> {thresh:.0%}):")
        for name, old, new, rel in regressions:
            print(f"  {name}: {old:.3f}s -> {new:.3f}s ({rel:+.0%})")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
