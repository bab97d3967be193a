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

Two interchangeable algorithms share the (node, comp) contract:

- ``connected_components`` — min-label propagation; sweeps bounded by
  graph DIAMETER. Fast on the short-diameter components LSH emits,
  but adversarial long chains exhaust ``max_iter`` (now an error, not
  silently-wrong labels).
- ``large_small_star_components`` — alternating large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond", MR'14): converges in O(log² n) rounds REGARDLESS of
  diameter, same join/agg primitives. The default for
  ``dedup_clusters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an undirected edge list into components by min-label
    propagation.

    Returns ``(node, comp)`` where ``comp`` is the minimum node id
    reachable from ``node`` (the canonical representative). Isolated
    nodes absent from ``pairs`` are the caller's concern — a dedup
    pipeline unions them back as their own singleton clusters.

    Raises ``RuntimeError`` if ``max_iter`` sweeps did not reach a
    fixed point (graph diameter > max_iter) — returning non-converged
    labels would silently split true clusters. Long-diameter graphs
    should use ``large_small_star_components`` instead.
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
    converged = False
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
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} sweeps "
            "(graph diameter exceeds max_iter); use "
            "large_small_star_components for long-chain graphs"
        )
    return labels


def large_small_star_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., MR'14) — O(log² n) rounds independent of graph
    diameter, so adversarial long chains cost the same as the short
    LSH components. Same contract as ``connected_components``:
    returns ``(node, comp)`` with ``comp`` the component-minimum id.

    Each round is two window-min passes over the current edge set;
    edges strictly contract toward stars rooted at component minima,
    and the fixed point (edge set unchanged) IS the converged star
    forest. Lineage is cut per round with ``localCheckpoint``.
    """
    # Canonical directed form: every edge points big → small, no loops.
    a, b = F.col(src), F.col(dst)
    edges = (
        pairs.where(a != b)
        .select(F.greatest(a, b).alias("u"), F.least(a, b).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )

    converged = False
    prev_count = -1
    wu = Window.partitionBy("u")
    for _ in range(max_rounds):
        # large-star(u): every strictly-larger neighbor of u re-attaches
        # to min(N(u) ∪ {u}). Needs the symmetric adjacency. The min is
        # a window over the SAME partition key the old groupBy+self-join
        # pair used — one exchange per star instead of two (r13; guide
        # §2.4 window-shares-the-aggregation-shuffle), identical rows.
        sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lsw = sym.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
        ls = (
            lsw.where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # small-star(u): u and its smaller neighbors all re-attach to
        # the minimum of that set. ls is already big→small per edge;
        # the (u, m) root rows repeat once per edge and collapse in the
        # final distinct (same rows the old smins union emitted).
        ssw = ls.withColumn("m", F.min("v").over(wu))
        ss = (
            ssw.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(ssw.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # Convergence = edge set unchanged. Counting is one cheap job on
        # the checkpointed set; only when counts match do we pay the
        # exact one-sided subtract (equal-cardinality distinct sets with
        # empty difference ARE equal).
        cur_count = ss.count()
        if cur_count == prev_count and ss.subtract(edges).limit(1).count() == 0:
            converged = True
            edges = ss
            break
        prev_count = cur_count
        edges = ss
    if not converged:
        raise RuntimeError(
            f"large_small_star_components did not converge in {max_rounds} rounds"
        )
    # Fixed point is a star forest: every edge points leaf → root.
    labels = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        .unionByName(edges.select(F.col("v").alias("node"), F.col("v").alias("comp")))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )
    # Nodes whose every edge collapsed to a self-loop mid-contraction
    # (isolated after dedup of parallel edges) label themselves.
    out = (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("comp", F.col("node")).alias("comp"))
    )
    nodes.unpersist()
    return out


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    algorithm: str = "star",
) -> DataFrame:
    """Connected components + cluster metadata for dedup decisions:
    ``(doc_id, cluster_id, cluster_size, is_canonical)``. The minimum
    doc_id in each component is the canonical survivor (deterministic,
    engine-independent); everything else is droppable.

    ``algorithm``: 'star' (default — diameter-independent) or
    'propagation' (min-label; cheaper per sweep on the short-diameter
    graphs LSH candidate generation emits)."""
    if algorithm == "star":
        labels = large_small_star_components(pairs, src=src, dst=dst)
    elif algorithm == "propagation":
        labels = connected_components(pairs, src=src, dst=dst)
    else:
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    # cluster size as a count window over the labels — shares the
    # by-comp shuffle instead of aggregate-then-rejoin (which planned
    # the labels subtree twice; r13, guide §2.4)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.count(F.lit(1)).over(Window.partitionBy("comp")).alias("cluster_size"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )
