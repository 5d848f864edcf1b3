"""Near-dup pair resolution: connected components -> canonical survivors.

Pair detectors (ngram_jaccard / minhash / simhash / embedding cosine)
emit EDGES; an LLM training pipeline must then drop all-but-one per
duplicate CLUSTER, not per pair (a~b, b~c means {a,b,c} is one group even
if (a,c) was never emitted). This is small-diameter connected components:

- label propagation over the edge list: every vertex starts labeled with
  its own id; each round adopts the min label among itself and its
  neighbors; converges in O(component diameter) rounds — near-dup
  clusters are shallow (dozens of docs), so a handful of joins.
- each round is one shuffle on fixed-width (id, label) pairs;
  ``localCheckpoint`` truncates the lineage so plans don't deepen
  geometrically across iterations (a 100-iteration chained plan would
  stall the optimizer long before the data hurts).

The same loop is the standard Spark CC pattern (GraphX/GraphFrames do the
equivalent under the hood); no external graph library needed.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, group_id) for every vertex appearing in ``pairs``;
    group_id = min doc id in the component (deterministic canonical)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["a"] == labels["id"])
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("new_label"),
                "label",
            )
        ).localCheckpoint()
        changed = updated.where(F.col("new_label") != F.col("label")).count()
        labels = updated.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        # Partially-converged labels would silently keep >1 "canonical"
        # doc per cluster downstream; near-dup components are shallow, so
        # hitting this means max_iter is badly undersized for the graph.
        log.warning(
            "connected_components: %d labels still changing after max_iter=%d "
            "rounds; components with diameter > max_iter are split and "
            "resolve_duplicates may keep extra survivors",
            changed,
            max_iter,
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("group_id"))


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """Keep one canonical document per duplicate cluster (min id) plus
    every document not implicated in any pair. Output = deduplicated
    corpus with the original columns."""
    groups = connected_components(pairs, src=src, dst=dst)
    survivors = groups.where(F.col("doc_id") == F.col("group_id")).select("doc_id")
    implicated = groups.select("doc_id")
    untouched = docs.join(implicated, docs[id_col] == implicated["doc_id"], "left_anti")
    kept = docs.join(survivors, docs[id_col] == survivors["doc_id"], "left_semi")
    return untouched.unionByName(kept)
