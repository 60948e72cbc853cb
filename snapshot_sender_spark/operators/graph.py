"""Connected components over a pair graph (near-duplicate clustering: merge
MinHash/Jaccard candidate pairs into document clusters).

Two algorithms behind one contract — (node, component = min reachable id),
deterministic regardless of scheduling, so both share a recursive-CTE oracle:

1. ``connected_components`` — iterative minimum-label propagation to fixpoint.
   Each round is one shuffle keyed by node (edges ⋈ labels, then min-agg);
   rounds needed = graph DIAMETER. Right for near-dup graphs (duplicate
   clusters are cliques-ish, diameter ≤ ~3); wrong for chain-shaped graphs.
2. ``connected_components_star`` — alternating large-star/small-star
   (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14).
   Each half-round is one window shuffle over the edge list; the edge list
   contracts toward a star forest in O(log n) rounds INDEPENDENT of diameter
   (a 65k-hop chain converges in ~10 rounds where propagation needs 65k).

``connected_components_auto`` routes: run propagation for a few cheap probe
rounds (each is ~half the cost of a star round); if the fixpoint isn't reached
the graph is deep, restart with the star variant. `localCheckpoint` truncates
the growing lineage in all paths so round N doesn't replan rounds 1..N-1."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _propagate(sym: DataFrame, max_iter: int) -> tuple[DataFrame, bool]:
    """Min-label propagation over a symmetrized edge list ``(u, v)``.
    Returns (labels, converged) — converged=False means max_iter was hit with
    labels still moving (the graph is deeper than max_iter)."""
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))
    converged = True
    for _ in range(max_iter):
        # neighbor labels: for each node u, the labels of its neighbors v
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # truncate lineage between rounds
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        converged = False
    return labels, converged


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """Returns (node, component) where component = min node id reachable.
    ``edges`` is undirected input (each pair listed once). O(diameter) rounds —
    see ``connected_components_star`` for deep graphs."""
    sym = _symmetrize(edges, src, dst)
    labels, _ = _propagate(sym, max_iter)
    return labels


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return fwd.union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round over a SYMMETRIC edge list: every neighbor v > u
    is re-pointed at m = min(Γ(u) ∪ {u}). One window shuffle keyed by u."""
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    return (
        sym.select("u", "v", m.alias("m"))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """One small-star round: edges oriented large→small, every node in
    Γ(u) ∪ {u} except the minimum m is pointed at m. Output is oriented
    (node > its new parent) and self-loop-free."""
    oriented = (
        sym.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
    )
    w = Window.partitionBy("u")
    m = F.min("v").over(w)  # all v ≤ u here, so min(Γ(u) ∪ {u}) = min(v)
    with_m = oriented.select("u", "v", m.alias("m"))
    from_neighbors = with_m.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    from_center = with_m.select(F.col("u"), F.col("m").alias("v"))
    return from_neighbors.union(from_center).distinct()


def connected_components_star(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et al.
    SoCC'14): O(log n) rounds regardless of graph diameter — the scale path
    for chain-shaped graphs where label propagation needs O(diameter)
    shuffles. Same contract as ``connected_components``: (node, component)
    with component = min reachable node id.

    Each round contracts the edge list toward a star forest (every surviving
    edge points a node at its component minimum). Convergence is detected by
    an order-independent fingerprint (count + sum of per-edge hashes) going
    stable. The fingerprint job has a fixed scheduling floor (~0.5 s at local
    scale) that dominated chain-graph runs, so it is sampled every SECOND
    alternation: the alternation operator is deterministic and strictly
    decreases the Kiveris potential until fixpoint (no 2-cycles exist), so
    equal fingerprints two alternations apart imply the fixpoint was reached.
    Worst case this runs up to TWO extra already-contracted alternations
    (fixpoint at alternation c is detected at the first sampled index ≥
    c+2) while halving the per-round action overhead — a trade aimed at
    DEEP graphs, where alternations are many; tiny already-star inputs pay
    the extra alternations, but those graphs route through propagation via
    ``connected_components_auto`` anyway."""
    nodes = (
        _symmetrize(edges, src, dst)
        .select(F.col("u").alias("node"))
        .distinct()
        .localCheckpoint()
    )
    # working edge list stays oriented u > v (self-loop-free, deduped)
    star = (
        _symmetrize(edges, src, dst)
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_fp = None
    for i in range(max_iter):
        # one alternation: large-star re-points every larger neighbor at the
        # neighborhood minimum (needs the symmetric view), small-star then
        # contracts the small side. Both emit strictly-oriented u > v edges.
        sym = star.union(star.select(F.col("v").alias("u"), F.col("u").alias("v")))
        star = _small_star(_large_star(sym)).localCheckpoint()
        if i % 2 == 0:  # sample every 2nd alternation (see docstring)
            continue
        row = star.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("h"),
        ).first()
        fp = (row["n"], row["h"])
        if fp == prev_fp:
            break
        prev_fp = fp
    # star forest: (u, v) = node → component min. Roots carry their own id.
    labels = star.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = nodes.join(
        labels.select("node").distinct(), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return labels.distinct().union(roots)


def connected_components_auto(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    probe_rounds: int = 4,
    max_iter: int = 50,
) -> DataFrame:
    """Route by an empirical diameter probe: run min-label propagation for
    ``probe_rounds`` (near-dup graphs are cliquey — they converge in ≤3, and
    each probe round is ~half the cost of a star round). If the fixpoint
    isn't reached the graph is deep; restart with the diameter-independent
    star variant rather than paying O(diameter) shuffles."""
    sym = _symmetrize(edges, src, dst)
    labels, converged = _propagate(sym, probe_rounds)
    if converged:
        return labels
    return connected_components_star(edges, src, dst, max_iter=max_iter)
