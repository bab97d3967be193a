#!/usr/bin/env python
"""A/B ml1 kmeans: current vs fused centroid/seed aggregation."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import functions as F, Window
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.sources.tables import read_table
from lavasmart_bank_sync_etl_spark.operators.clustering import kmeans_assign, _as_double_array, _sqdist, FIXED_POINT

sf = "/root/testdata/sf0.1"
spark = get_spark("ab-ml1")
spark.range(1).count()
e = read_table(spark, sf, "embeddings")

def kmeans_fused(df, k=8, iters=2, id_col="vec_id", vec_col="embedding"):
    vecs = df.select(F.col(id_col).alias("vid"), _as_double_array(F.col(vec_col)).alias("v"))
    # seed row: k lowest ids, cid = rank in vid order — one agg, no window
    cent_row = (
        vecs.orderBy("vid").limit(k)
        .agg(F.array_sort(F.collect_list(F.struct("vid", "v"))).alias("sv"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.size("sv") - 1),
                lambda i: F.struct(
                    i.cast("int").alias("cid"),
                    F.element_at("sv", i + 1)["v"].alias("c"),
                ),
            ).alias("cents")
        )
    )
    for step in range(iters):
        assigned = (
            vecs.crossJoin(F.broadcast(cent_row))
            .withColumn(
                "best",
                F.array_min(F.transform(
                    "cents",
                    lambda ct: F.struct(_sqdist(F.col("v"), ct["c"]).alias("d"), ct["cid"].alias("cid")),
                )),
            )
            .where(F.col("best").isNotNull())
            .select("vid", "v", F.col("best.cid").alias("cluster"))
        )
        if step == iters - 1:
            return assigned.select(
                F.col("vid").alias(id_col), "cluster",
                F.count(F.lit(1)).over(Window.partitionBy("cluster")).alias("n_members"),
            )
        exploded = assigned.select("cluster", F.posexplode("v").alias("dim", "val")).select(
            "cluster", "dim", F.round(F.col("val") * FIXED_POINT).cast("long").alias("fx"))
        means = exploded.groupBy("cluster", "dim").agg(
            (F.sum("fx") / float(FIXED_POINT) / F.count(F.lit(1))).alias("m"))
        # next centroid row in ONE global agg (fuses the old
        # groupBy(cluster)+collect and the global collect)
        cent_row = (
            means.agg(F.array_sort(F.collect_list(F.struct("cluster", "dim", "m"))).alias("s"))
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
    raise AssertionError

for rnd in range(3):
    t0=time.time(); r1 = sorted(map(tuple, kmeans_assign(e, k=8, iters=2).collect())); tc=round(time.time()-t0,3)
    t0=time.time(); r2 = sorted(map(tuple, kmeans_fused(e, k=8, iters=2).collect())); tf=round(time.time()-t0,3)
    print(f"r{rnd} current {tc}s fused {tf}s identical={r1==r2} rows={len(r1)}", flush=True)
