"""Distributed connected components — the clustering step of near-duplicate
deduplication (pairs → duplicate groups → one canonical id per group).

Iterative min-label propagation: every vertex repeatedly adopts the minimum
label among itself and its neighbors; the fixpoint labels each vertex with
its component's minimum vertex id. Each round is two key-partitioned hash
joins plus one aggregation — no driver-side data, no crossJoin — so the same
plan runs per round at any graph size. Round count = graph diameter;
near-dup graphs are dense small-diameter clusters, so a handful of rounds
converges (for adversarial long chains the large-star/small-star algorithm
[Kiveris et al., MapReduce and Beyond] halves the diameter per round — noted
as the escalation path, not needed for dedup workloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Label each vertex of the undirected graph given by ``pairs`` with its
    component's minimum vertex id.

    Returns a DataFrame (id, component_id) covering every vertex that appears
    in at least one pair. Deterministic: the labeling is a pure function of
    the edge set. Stops early as soon as a round changes no label; raises if
    ``max_iterations`` rounds don't converge (diameter larger than expected —
    switch to large-star/small-star rather than silently truncating).
    """
    half = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least("label", "nbr_label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    return labels.select("id", F.col("label").alias("component_id"))
