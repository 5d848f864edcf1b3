"""Vertex-labeling graph operators shared by the registry queries:
semi-supervised label spreading (majority vote) over an edge list.

Kept separate from `dedup_groups` (connected components) because the
iteration contract differs: spreading runs a FIXED number of rounds
(the plan stays finite and oracle-unrollable) rather than to a
convergence fixpoint, and labeled vertices are immutable seeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["spread_labels"]


def spread_labels(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "vec_id",
    label_col: str = "lab",
) -> DataFrame:
    """Majority-vote label spreading: ``seeds`` holds one row per vertex
    with ``label_col`` set for seed vertices and NULL otherwise; each of
    ``iters`` rounds, every unlabeled vertex adopts the most common
    label among its labeled in-neighbors (ties: most votes, then
    smallest label). Labeled vertices never change — seeds are ground
    truth, and spread labels freeze so the result is
    iteration-monotone and deterministic.

    Votes are exact integer counts (no damping floats), so the result
    is bit-reproducible across partitionings — the property that lets
    the registry query hash-match an unrolled recursive SQL oracle.

    ``edges`` should be symmetrized by the caller if spreading is
    undirected, and localCheckpoint-ed when its lineage is expensive
    (each round references it once).
    """
    labels = seeds.select(id_col, label_col)
    for _ in range(iters):
        votes = (
            edges.join(
                labels.where(F.col(label_col).isNotNull()),
                edges[src] == labels[id_col],
            )
            .groupBy(F.col(dst).alias("__v"), label_col)
            .agg(F.count("*").alias("__c"))
        )
        w = Window.partitionBy("__v").orderBy(F.desc("__c"), F.asc(label_col))
        pick = (
            votes.select(
                "__v",
                F.col(label_col).alias("__p"),
                F.row_number().over(w).alias("__rn"),
            )
            .where(F.col("__rn") == 1)
        )
        labels = labels.join(
            pick, labels[id_col] == pick["__v"], "left"
        ).select(
            id_col, F.coalesce(label_col, "__p").alias(label_col)
        )
    return labels
