#!/usr/bin/env python
"""A/B ss3 (VERDICT r12 item 7): the interpreted-HOF assignment+scoring
vs a numpy mapInArrow scorer (dim-sequential adds = bitwise-identical
to the left-fold), and a JVM-side fusion of the 3-agg centroid build."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
import numpy as np
import pandas as pd
from pyspark.sql import functions as F, Window
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.sources.tables import read_table
from lavasmart_bank_sync_etl_spark.operators.similarity import (
    ivf_topk, _seeded, _build_centroids, _centroid_array, _assign, _cell_scores)
from lavasmart_bank_sync_etl_spark.functions.vectors import cosine

sf = "/root/testdata/sf0.1"
spark = get_spark("ab-ss3")
spark.range(1).count()
e = read_table(spark, sf, "embeddings")
queries = e.where(F.col("vec_id") < 5)

def fused_cent_row(seeded):
    """one-row cents array straight from the (cell,pos,avg) rows."""
    by_pos = seeded.select("cell0", F.posexplode("vec").alias("pos", "val"))
    means = by_pos.groupBy("cell0", "pos").agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("cv"))
    def unit(cvec):
        n = F.sqrt(F.aggregate(cvec, F.lit(0.0), lambda a, x: a + x * x))
        return F.when(n > 0, F.transform(cvec, lambda x: x / n)).otherwise(
            F.transform(cvec, lambda x: x * 0.0))
    cvec_of = lambda c: F.transform(F.filter("s", lambda x: x["cell0"] == c), lambda x: x["cv"])
    return (
        means.agg(F.array_sort(F.collect_list(F.struct("cell0", "pos", "cv"))).alias("s"))
        .select(F.transform(
            F.array_distinct(F.transform("s", lambda x: x["cell0"])),
            lambda c: F.struct(c.alias("cell"), unit(cvec_of(c)).alias("cvec_n")),
        ).alias("cents"))
    )

def ss3_fusedcent():
    seeded = _seeded(e, 16, "vec_id", "embedding")
    ca = fused_cent_row(seeded).persist()
    assignment = _assign(seeded, ca)
    qs = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
    probes = (qs.crossJoin(F.broadcast(ca)).select(
        "query_id", "q_vec",
        F.explode(F.slice(F.reverse(F.array_sort(_cell_scores(F.col("q_vec")))), 1, 4)["cell"]).alias("cell")))
    cands = (F.broadcast(probes).join(assignment, on="cell")
             .where(F.col("query_id") != F.col("vid"))
             .select("query_id", F.col("vid").alias("neighbor_id"),
                     F.round(cosine(F.col("q_vec"), F.col("vec")), 4).alias("score")))
    wk = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return cands.withColumn("rank", F.row_number().over(wk).cast("long")).where(F.col("rank") <= 10)

# numpy variant: assignment via mapInArrow with dim-sequential accumulation
def ss3_numpy():
    seeded = _seeded(e, 16, "vec_id", "embedding")
    ca = _centroid_array(_build_centroids(seeded)).persist()
    crow = ca.collect()[0]["cents"]
    cells = np.array([r["cell"] for r in crow])
    C = np.array([list(r["cvec_n"]) for r in crow], dtype=np.float64)  # (16, d)
    def assign_batches(it):
        for pdf in it:
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            # dot per (row, cell), dim-sequential to match the left fold
            acc = np.zeros((V.shape[0], C.shape[0]))
            for d in range(C.shape[1]):
                acc = acc + V[:, d:d+1] * C[None, :, d]
            # argmax with (score desc, -cell desc ≡ cell asc) tie-break
            order = np.lexsort((cells[None, :].repeat(len(V), 0), -acc), axis=1)
            best = cells[order[:, 0]]
            yield pd.DataFrame({"vid": pdf["vid"], "vec": pdf["vec"], "cell": best})
    assignment = seeded.select("vid", "vec").mapInPandas(
        assign_batches, schema="vid long, vec array<float>, cell int")
    qs = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
    probes = (qs.crossJoin(F.broadcast(ca)).select(
        "query_id", "q_vec",
        F.explode(F.slice(F.reverse(F.array_sort(_cell_scores(F.col("q_vec")))), 1, 4)["cell"]).alias("cell")))
    cands = (F.broadcast(probes).join(assignment, on="cell")
             .where(F.col("query_id") != F.col("vid"))
             .select("query_id", F.col("vid").alias("neighbor_id"),
                     F.round(cosine(F.col("q_vec"), F.col("vec")), 4).alias("score")))
    wk = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return cands.withColumn("rank", F.row_number().over(wk).cast("long")).where(F.col("rank") <= 10)

def ss3_current():
    return ivf_topk(e, queries, n_cells=16, nprobe=4, k=10)

ref = None
for rnd in range(3):
    row = []
    for name, fn in [("current", ss3_current), ("fusedcent", ss3_fusedcent), ("numpy", ss3_numpy)]:
        t0 = time.time(); r = sorted(map(tuple, fn().collect())); t = round(time.time()-t0, 3)
        if ref is None: ref = r
        row.append(f"{name} {t}s ident={r == ref}")
    print(f"r{rnd} " + " | ".join(row), flush=True)
