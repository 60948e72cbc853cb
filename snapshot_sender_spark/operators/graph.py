"""Connected components over a pair graph (near-duplicate clustering: merge
MinHash/Jaccard candidate pairs into document clusters).

Algorithm: iterative minimum-label propagation to fixpoint — each node starts
labeled with itself; every round, each node takes the min label over itself and
its neighbors; stop when a round changes nothing. The fixpoint (min node id of
each component) is deterministic regardless of scheduling, so it shares an
oracle with a recursive-CTE reachability query.

Scale: each round is one shuffle keyed by node (edges ⋈ labels, then min-agg);
rounds needed = graph diameter (near-dup graphs are shallow — duplicate
clusters are cliques-ish). `localCheckpoint` truncates the growing lineage so
round N doesn't replan rounds 1..N-1."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """Returns (node, component) where component = min node id reachable.
    ``edges`` is undirected input (each pair listed once)."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))

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
    return labels
