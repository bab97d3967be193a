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
    # Seed row: the k lowest-vid vectors collapse straight into the
    # one-row cid-sorted centroid array — cid = position in vid order
    # via the indexed-transform, no row_number window, no per-iteration
    # re-collect (r13: the old centroids-table + groupBy().collect pair
    # cost one extra Exchange per iteration).
    cent_row = (
        vecs.orderBy("vid")
        .limit(k)
        .agg(F.array_sort(F.collect_list(F.struct("vid", "v"))).alias("sv"))
        .select(
            F.transform(
                "sv",
                lambda x, i: F.struct(i.cast("int").alias("cid"), x["v"].alias("c")),
            ).alias("cents")
        )
    )
    for step in range(iters):
        # Assignment is a pure projection, not a shuffle: the k
        # centroids collapse into ONE broadcast row holding a
        # cid-sorted array, each vector computes its k distances with
        # `transform`, and `array_min` over (d, cid) structs picks the
        # argmin with the exact orderBy(d asc, cid asc) tie-break the
        # previous row_number window applied. The window form expanded
        # every vector k-fold and then shuffled+sorted those k·N rows
        # by vid just to keep one — guide §2.4 (remove shuffles
        # outright): per iteration this drops one Exchange and one
        # WindowExec over k·N rows while computing bitwise-identical
        # distances (`_sqdist` unchanged, applied to the same doubles).
        assigned = (
            vecs.crossJoin(F.broadcast(cent_row))
            .withColumn(
                "best",
                F.array_min(
                    F.transform(
                        "cents",
                        lambda ct: F.struct(
                            _sqdist(F.col("v"), ct["c"]).alias("d"),
                            ct["cid"].alias("cid"),
                        ),
                    )
                ),
            )
            # empty input => empty `cents` => null best; dropping the
            # row preserves the no-centroids behavior of the join form
            .where(F.col("best").isNotNull())
            .select("vid", "v", F.col("best.cid").alias("cluster"))
        )
        if step == iters - 1:
            # n_members as a count window over the final assignment:
            # the aggregate-then-self-join form planned the ENTIRE
            # iteration subtree twice (once per join side — Spark does
            # no cross-consumer subtree reuse), so one window exchange
            # here halves the whole plan. Consumers that drop
            # n_members (dd12) get the window pruned away entirely.
            return assigned.select(
                F.col("vid").alias(id_col),
                "cluster",
                F.count(F.lit(1))
                .over(Window.partitionBy("cluster"))
                .alias("n_members"),
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
        # Next centroid row in ONE global aggregation over the k·dims
        # mean rows: sort by (cluster, dim), slice per cluster with
        # higher-order functions. Fuses the old per-cluster groupBy +
        # global collect pair (two consecutive exchanges) into one
        # single-partition exchange per iteration (r13, guide §2.4);
        # identical doubles, identical cid order.
        cent_row = (
            means.agg(
                F.array_sort(F.collect_list(F.struct("cluster", "dim", "m"))).alias("s")
            )
            .select(
                F.transform(
                    F.array_distinct(F.transform("s", lambda x: x["cluster"])),
                    lambda cl: F.struct(
                        cl.alias("cid"),
                        F.transform(
                            F.filter("s", lambda x: x["cluster"] == cl),
                            lambda x: x["m"],
                        ).alias("c"),
                    ),
                ).alias("cents")
            )
        )
    raise AssertionError("unreachable: iters >= 1")
