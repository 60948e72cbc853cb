"""Measure connected-components scaling on chain graphs (worst-case diameter):
min-label propagation is O(diameter) rounds, alternating large/small-star is
O(log n). Produces the SCALE.md graph table.

Usage: python tools/graph_scale.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from snapshot_sender_spark.session import get_spark  # noqa: E402
from snapshot_sender_spark.operators.graph import (  # noqa: E402
    connected_components,
    connected_components_star,
)


def chain(spark, n):
    return spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")


def run(fn, edges, n, **kw):
    t0 = time.monotonic()
    out = fn(edges, **kw)
    n_comp = out.selectExpr("count(distinct component) c").first()["c"]
    n_nodes = out.count()
    dt = time.monotonic() - t0
    assert n_comp == 1 and n_nodes == n + 1, (n_comp, n_nodes)
    return dt


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM paths once
    run(connected_components, chain(spark, 8), 8)
    run(connected_components_star, chain(spark, 8), 8)

    print("| chain edges | propagation (O(diameter) rounds) | star (O(log n) rounds) |")
    print("|---|---|---|")
    for n in (64, 256, 1024, 4096, 65536):
        star_t = run(connected_components_star, chain(spark, n), n, max_iter=60)
        if n <= 256:
            prop_t = run(connected_components, chain(spark, n), n, max_iter=n + 2)
            prop = f"{prop_t:.1f} s ({n + 1} rounds)"
        else:
            prop = "— (one shuffle round per hop: linear in n, minutes+)"
        print(f"| {n} | {prop} | {star_t:.1f} s |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
