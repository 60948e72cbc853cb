"""Diff two bench JSON lines (e.g. BENCH_r1.json vs BENCH_r2.json):
per-query delta and regression flags.

Usage: python tools/compare_bench.py old.json new.json [--threshold 1.25]
"""

from __future__ import annotations

import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[4]) if len(sys.argv) > 4 else 1.25
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    regressions = []
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            print(f"{name:40s} {a or '-':>8} {b or '-':>8}   (added/removed)")
            continue
        ratio = b / a if a else float("inf")
        flag = "  <-- REGRESSION" if ratio > threshold else ""
        if flag:
            regressions.append(name)
        print(f"{name:40s} {a:8.2f} {b:8.2f} {ratio:6.2f}x{flag}")
    print(f"\ntotal: {old['value']:.2f} -> {new['value']:.2f} "
          f"({new['value']/old['value']:.2f}x); {len(regressions)} regression(s)")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
