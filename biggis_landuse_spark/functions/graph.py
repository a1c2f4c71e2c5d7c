"""Connected components over an edge DataFrame — the transitive
closure step of near-duplicate resolution.

Band-level resolution (functions/dedup.lsh_dropped_ids) keeps the
minimum id per LSH bucket, which is NOT transitive: with candidate
pairs (a,b) and (b,c) from different buckets, c survives even though
it is chained to a's cluster through b. Training-data dedup pipelines
resolve the full clusters; that is a connected-components computation.

Implementation: iterative min-label propagation (each node adopts the
smallest label among itself and its neighbors until fixpoint) —
every iteration is one equi-join + one min-aggregate, both
partial-aggregated; iteration count = cluster diameter, which for
near-dup graphs is small. Scale notes:
- labels are ``localCheckpoint``-ed each round so the lineage (and the
  replayed shuffle DAG) doesn't grow with iterations — without this an
  iterative DataFrame loop re-executes every prior round per action;
- convergence is detected with a cheap count of changed labels;
- for adversarial long-chain graphs, swap in the large-star/small-star
  contraction (same join/agg primitives, O(log n) rounds); diameter
  loops are the right default for dedup clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label each node with the minimum node id of its component.

    ``edges`` is an undirected edge list (each pair once is enough).
    Returns (node, component). Isolated nodes absent from ``edges``
    are absent from the result — union the full node set downstream
    if needed (absent node ⇒ its own singleton component).
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.where(F.col("a") != F.col("b")).distinct().localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # each node offers its label to every neighbor; adopt the min
        offers = sym.join(
            labels, sym.a == labels.node
        ).select(F.col("b").alias("node"), "component")
        # pointer jumping: also follow the label's own label, which
        # halves chain lengths every round → O(log diameter) rounds
        # instead of O(diameter)
        jump = (
            labels.alias("l1")
            .join(
                labels.alias("l2"),
                F.col("l1.component") == F.col("l2.node"),
            )
            .select(F.col("l1.node").alias("node"), F.col("l2.component"))
        )
        new_labels = (
            labels.select("node", "component")
            .union(offers)
            .union(jump)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", "component")
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "raise max_iter (rounds needed ≈ log2 of the largest cluster "
        "diameter with pointer jumping)"
    )
