"""Connected components over a pair/edge DataFrame — the canonicalization
step of near-dup dedup (X2): every document in a duplicate cluster maps to
the cluster's minimum doc id.

No reference analog (the reference has no iterative operators); this is the
north-star dedup closer.  Implementation: iterative min-label propagation —
each round every node adopts the smallest label among itself and its
neighbors; converges in O(diameter) rounds (dup clusters are tiny, so 2-4
rounds in practice).

Scale notes: each round is one shuffle (groupBy node); labels are
localCheckpoint'ed per round to truncate lineage — without that, the plan
doubles every iteration and the driver dies at round ~20.  For planet-scale
graphs you'd switch to the large-star/small-star algorithm (same loop
skeleton, fewer rounds); for dedup clusters this propagation is optimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 20


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node id
    reachable via undirected edges."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(MAX_ROUNDS):
        # candidate label for each node = min over neighbors' labels
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Never return silently-unconverged labels: a component with
        # diameter > MAX_ROUNDS would mismatch the transitive-closure oracle.
        # (Dup clusters converge in 2-4 rounds; hitting this means the edge
        # set isn't a dedup graph — switch to large-star/small-star, which
        # converges in O(log n) rounds.)
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ROUNDS} rounds; "
            "component diameter exceeds the propagation budget"
        )
    return labels
