"""Connected components over the verified-pairs edge list (G5).

Iterative min-label propagation in the DataFrame API: each round every
vertex takes the minimum label among itself and its neighbors; fixpoint
when no label changes. Duplicate clusters are small and dense (diameter
a few hops), so convergence is fast; ``localCheckpoint`` each round cuts
the join lineage (SURVEY §4.3). Cluster id = lexicographic min member —
deterministic, unlike the reference's HashMap-order consensus ties
(src/sketchy.rs:408).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class ConvergenceError(RuntimeError):
    pass


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint_every: int = 1
) -> DataFrame:
    """edges(a_id, b_id) -> (file_id, cluster_id) for every vertex that
    appears in an edge. Labels are file_id strings; min is lexicographic.
    """
    sym = edges.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(
        edges.select(
            F.col("b_id").alias("src"), F.col("a_id").alias("dst")
        )
    ).distinct().localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )

    for it in range(max_iter):
        neigh = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels["id"] == neigh["dst"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nlabel", "label")
                ).alias("label"),
                (F.coalesce("nlabel", "label") < F.col("label")).alias("chg"),
            )
        )
        if checkpoint_every and it % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
        changed = new_labels.where("chg").count()
        labels = new_labels.drop("chg")
        if changed == 0:
            return labels.select(
                F.col("id").alias("file_id"), F.col("label").alias("cluster_id")
            )
    raise ConvergenceError(f"no fixpoint after {max_iter} iterations")


def assign_clusters(
    signatures: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """All files -> cluster assignment; files in no edge are singleton
    clusters labeled by their own file_id."""
    cc = connected_components(edges, max_iter=max_iter)
    return (
        signatures.select("file_id")
        .join(cc, "file_id", "left")
        .select(
            "file_id",
            F.coalesce("cluster_id", "file_id").alias("cluster_id"),
        )
    )
