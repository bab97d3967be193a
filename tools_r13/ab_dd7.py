#!/usr/bin/env python
"""A/B dd7: run-local persisted sigs vs unpersisted sigs."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import functions as F
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.operators import dedup as DD
from lavasmart_bank_sync_etl_spark.queries_llm import _near_dup_corpus, _run_persist

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("ab-dd7")
spark.range(1).count()

def variant_nopersist():
    sigs = DD.simhash(_near_dup_corpus(spark, sf_dir), bits=32)
    p = DD.simhash_hamming_pairs(sigs, bits=32, bands=4, max_hamming=3)
    return p.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))

def variant_runpersist():
    sigs = _run_persist(spark, ("ab_simhash32", sf_dir),
                        lambda: DD.simhash(_near_dup_corpus(spark, sf_dir), bits=32))
    p = DD.simhash_hamming_pairs(sigs, bits=32, bands=4, max_hamming=3)
    return p.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))

for name, fn in [("nopersist", variant_nopersist), ("runpersist", variant_runpersist)]:
    walls = []
    rows = None
    for _ in range(3):
        t0 = time.time()
        rows = fn().count()
        walls.append(round(time.time() - t0, 3))
    print(name, "rows", rows, walls, flush=True)
