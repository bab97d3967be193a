#!/usr/bin/env python
"""A/B dd9 connected components: groupBy+join mins vs window mins."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import functions as F, Window as W
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.queries_llm import near_dup_lsh_pairs
from lavasmart_bank_sync_etl_spark.operators.graph import large_small_star_components

sf = "/root/testdata/sf0.1"
spark = get_spark("ab-dd9")
spark.range(1).count()
pairs = near_dup_lsh_pairs(spark, sf)
pairs.count()

def window_star(pairs, src="id_a", dst="id_b", max_rounds=50):
    a, b = F.col(src), F.col(dst)
    edges = (pairs.where(a != b)
             .select(F.greatest(a, b).alias("u"), F.least(a, b).alias("v"))
             .distinct().localCheckpoint(eager=False))
    nodes = (edges.select(F.col("u").alias("node"))
             .unionByName(edges.select(F.col("v").alias("node")))
             .distinct().persist())
    converged = False
    prev = -1
    wu = W.partitionBy("u")
    for _ in range(max_rounds):
        sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: min over the symmetric adjacency, one window pass
        lsw = sym.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
        ls = (lsw.where(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .where(F.col("u") != F.col("v")))
        # small-star: min over ls per u, one window pass; the per-edge
        # (u, m) duplicates collapse in the final distinct
        ssw = ls.withColumn("m", F.min("v").over(wu))
        ss = (ssw.select(F.col("v").alias("u"), F.col("m").alias("v"))
              .unionByName(ssw.select("u", F.col("m").alias("v")))
              .where(F.col("u") != F.col("v")).distinct()
              .localCheckpoint(eager=False))
        cur = ss.count()
        if cur == prev and ss.subtract(edges).limit(1).count() == 0:
            converged = True; edges = ss; break
        prev = cur; edges = ss
    assert converged
    labels = (edges.select(F.col("u").alias("node"), F.col("v").alias("comp"))
              .unionByName(edges.select(F.col("v").alias("node"), F.col("v").alias("comp")))
              .groupBy("node").agg(F.min("comp").alias("comp")))
    out = (nodes.join(labels, "node", "left")
           .select("node", F.coalesce("comp", F.col("node")).alias("comp")))
    nodes.unpersist()
    return out

for rnd in range(3):
    t0=time.time(); r1 = sorted(map(tuple, large_small_star_components(pairs).collect()))
    tj = round(time.time()-t0,3)
    t0=time.time(); r2 = sorted(map(tuple, window_star(pairs).collect()))
    tw = round(time.time()-t0,3)
    print(f"r{rnd} join-form {tj}s window-form {tw}s identical={r1==r2} rows={len(r1)}", flush=True)
