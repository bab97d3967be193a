#!/usr/bin/env python
"""A/B dd7: stage at sigs level (current) vs banded level (after
prefilter+cap) vs both."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import functions as F, Window
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.operators import dedup as DD
from lavasmart_bank_sync_etl_spark.operators.dedup import cap_postings
from lavasmart_bank_sync_etl_spark.queries_llm import _near_dup_corpus, _run_persist

sf = "/root/testdata/sf0.1"
spark = get_spark("ab-dd7b")
spark.range(1).count()

def banded_of(sigs, bits=32, bands=4, max_posting=1000):
    bw = bits // bands
    mask = (1 << bw) - 1
    bs = [F.struct(F.lit(b).alias("band_id"),
                   F.shiftright(F.col("simhash"), b * bw).bitwiseAND(F.lit(mask)).alias("band_val"))
          for b in range(bands)]
    banded = sigs.select("doc_id", "simhash", F.explode(F.array(*bs)).alias("b")).select(
        "doc_id", "simhash", F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val"))
    banded = banded.withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_val"))).where(F.col("_n") > 1).drop("_n")
    return cap_postings(banded, ["band_id", "band_val"], ["doc_id"], max_posting)

def pairs_of(banded):
    l, r = banded.alias("l"), banded.alias("r")
    return (l.join(r, on=[F.col("l.band_id") == F.col("r.band_id"),
                          F.col("l.band_val") == F.col("r.band_val"),
                          F.col("l.doc_id") < F.col("r.doc_id")])
            .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"),
                    F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"))
            .where(F.col("hamming") <= 3).distinct()
            .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming")))

def v_sigs():
    sigs = _run_persist(spark, ("ab7_sigs", sf), lambda: DD.simhash(_near_dup_corpus(spark, sf), bits=32))
    return pairs_of(banded_of(sigs))

def v_banded():
    banded = _run_persist(spark, ("ab7_banded", sf),
                          lambda: banded_of(DD.simhash(_near_dup_corpus(spark, sf), bits=32)))
    return pairs_of(banded)

ref = None
for rnd in range(4):
    row = []
    for name, fn in [("stage-sigs", v_sigs), ("stage-banded", v_banded)]:
        t0=time.time(); r = sorted(map(tuple, fn().collect())); t=round(time.time()-t0,3)
        if ref is None: ref = r
        row.append(f"{name} {t}s ident={r==ref}")
    print(f"r{rnd} " + " | ".join(row), flush=True)
