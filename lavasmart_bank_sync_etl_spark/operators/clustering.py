"""Mini-batch-free Lloyd k-means over the embedding column — the
iterative-ML shape (IVF coarse-quantizer training, corpus topic
bucketing) expressed as pure DataFrame ops.

Determinism contract (what makes this oracle-checkable cross-engine):
- seeds are fixed rows (lowest ``k`` vec_ids), not random;
- distances are left folds over the dimension order, so Spark's
  ``aggregate`` and DuckDB's ``list_reduce`` produce bitwise-identical
  doubles;
- centroid updates average in integer fixed-point (×1e7): integer
  sums are order-independent, so shuffle order can't perturb the next
  iteration's centroids;
- argmin ties break on centroid id.

Scale shape: the vectors table is never collected; each iteration is
one broadcast join (k centroid rows) + one hash aggregate over
(cluster, dim) — k·dims rows of shuffle regardless of corpus size.
Iteration count is a fixed hyperparameter (no convergence collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FIXED_POINT = 10_000_000


def _as_double_array(col):
    return F.transform(col, lambda x: x.cast("double"))


def _sqdist(v, c):
    """Σ (v_i - c_i)² as a left fold in array order."""
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from deterministic seeds (the
    ``k`` lowest ids) and return ``(id, cluster, n_members)`` for the
    final assignment."""
    vecs = df.select(
        F.col(id_col).alias("vid"), _as_double_array(F.col(vec_col)).alias("v")
    )
    centroids = (
        vecs.orderBy("vid")
        .limit(k)
        .select(F.row_number().over(Window.orderBy("vid")).alias("cid"), F.col("v").alias("c"))
        .withColumn("cid", F.col("cid") - 1)
    )
    for step in range(iters):
        assigned = (
            vecs.crossJoin(F.broadcast(centroids))
            .withColumn("d", _sqdist(F.col("v"), F.col("c")))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("vid").orderBy(F.col("d").asc(), F.col("cid").asc())
                ),
            )
            .where(F.col("rn") == 1)
            .select("vid", "v", F.col("cid").alias("cluster"))
        )
        if step == iters - 1:
            sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
            return (
                assigned.join(sizes, "cluster")
                .select(F.col("vid").alias(id_col), "cluster", "n_members")
            )
        # Fixed-point mean per (cluster, dim): integer sums are
        # order-independent → identical centroids on any engine.
        exploded = assigned.select(
            "cluster", F.posexplode("v").alias("dim", "val")
        ).select(
            "cluster", "dim",
            F.round(F.col("val") * FIXED_POINT).cast("long").alias("fx"),
        )
        means = exploded.groupBy("cluster", "dim").agg(
            (F.sum("fx") / float(FIXED_POINT) / F.count(F.lit(1))).alias("m")
        )
        centroids = (
            means.groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .select(F.col("cluster").alias("cid"), "c")
        )
    raise AssertionError("unreachable: iters >= 1")
