"""Connected components over a candidate-pair edge list — the cluster
resolution step that turns near-dup *pairs* (MinHash/LSH, SimHash,
Jaccard — SURVEY.md north-star dedup family) into dedup *clusters*
with one canonical representative per cluster.

Spark-first design: iterative min-label propagation expressed as
joins + hash aggregates (all shuffle on the node key, partial
aggregation map-side). Each sweep halves the distance between a node
and its component minimum roughly geometrically on real candidate
graphs (LSH components are short-diameter); convergence is detected
with a distributed ``ANY(changed)`` aggregate, never a collect of the
labels themselves. Lineage is truncated every sweep with
``localCheckpoint`` so the plan does not grow with the iteration
count (the classic iterative-algorithm trap on 100 TB inputs).

For adversarial graphs (long chains) the sweep count is bounded by
the graph diameter; the standard remedy — large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond") —
uses the same join/agg primitives and can replace the propagation
loop without changing this module's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns ``(node, comp)`` where ``comp`` is the minimum node id
    reachable from ``node`` (the canonical representative). Isolated
    nodes absent from ``pairs`` are the caller's concern — a dedup
    pipeline unions them back as their own singleton clusters.
    """
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        # Each node offers its current label to every neighbor; a node
        # keeps the minimum of its own label and all offered labels.
        # The changed flag rides along in the same pass, so one job per
        # sweep both advances the labels (materializing the lazy
        # checkpoint, which truncates lineage) and tests convergence.
        nbr_min = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least("comp", F.coalesce("nbr_min", "comp")).alias("comp"),
                (F.coalesce("nbr_min", "comp") < F.col("comp")).alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where("_chg").limit(1).count()
        labels = new_labels.select("node", "comp")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Connected components + cluster metadata for dedup decisions:
    ``(doc_id, cluster_id, cluster_size, is_canonical)``. The minimum
    doc_id in each component is the canonical survivor (deterministic,
    engine-independent); everything else is droppable."""
    labels = connected_components(pairs, src=src, dst=dst)
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            F.col("cluster_size"),
            (F.col("node") == F.col("comp")).alias("is_canonical"),
        )
    )
