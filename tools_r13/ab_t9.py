#!/usr/bin/env python
"""Factorial A/B for t9: delta shape (union4 vs explode) x latest staging
(none vs run-persist)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import functions as F
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.sources.tables import sales_view
from lavasmart_bank_sync_etl_spark.queries_warehouse import merge_on_read
from lavasmart_bank_sync_etl_spark.queries_llm import _run_persist

sf = "/root/testdata/sf0.1"
spark = get_spark("ab-t9")
spark.range(1).count()

def parts():
    s = sales_view(spark, sf)
    fol = F.col("folio").cast("long")
    base = s.where(fol % 10 != 0).select("folio", "metodo", "monto")
    return s, fol, base

def delta_union():
    s, fol, base = parts()
    d_ins = s.where(fol % 10 == 0).select("folio","metodo","monto",F.lit("I").alias("op"),F.lit(1).alias("seq"))
    d_us = s.where(fol % 7 == 0).select("folio","metodo",(F.col("monto")+999).alias("monto"),F.lit("U").alias("op"),F.lit(1).alias("seq"))
    d_u = s.where(fol % 7 == 0).select("folio","metodo",(F.col("monto")+5).alias("monto"),F.lit("U").alias("op"),F.lit(2).alias("seq"))
    d_d = s.where(fol % 13 == 0).select("folio","metodo","monto",F.lit("D").alias("op"),F.lit(3).alias("seq"))
    return base, d_ins.unionByName(d_us).unionByName(d_u).unionByName(d_d)

def delta_explode():
    s, fol, base = parts()
    mk = lambda m, o, q: F.struct(m.alias("monto"), F.lit(o).alias("op"), F.lit(q).alias("seq"))
    empty = F.array().cast("array<struct<monto:double,op:string,seq:int>>")
    ops = F.concat(
        F.when(fol % 10 == 0, F.array(mk(F.col("monto"), "I", 1))).otherwise(empty),
        F.when(fol % 7 == 0, F.array(mk(F.col("monto")+999,"U",1), mk(F.col("monto")+5,"U",2))).otherwise(empty),
        F.when(fol % 13 == 0, F.array(mk(F.col("monto"), "D", 3))).otherwise(empty))
    delta = (s.where((fol%10==0)|(fol%7==0)|(fol%13==0))
             .select("folio","metodo",F.explode(ops).alias("_d"))
             .select("folio","metodo","_d.monto","_d.op","_d.seq"))
    return base, delta

def agg(resolved):
    h60 = F.conv(F.substring(F.md5(F.col("folio")), 1, 15), 16, 10).cast("long")
    return (resolved.withColumn("h60", h60).groupBy("metodo")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.round(F.col("monto")*100).cast("long")).cast("long").alias("total_cents"),
                 F.expr("bit_xor(h60)").alias("folio_xor")))

ident = lambda df: df
stage_p = lambda df: _run_persist(spark, ("ab_t9_latest", sf), lambda: df)
cases = [("union+nostage", delta_union, ident), ("union+stage", delta_union, stage_p),
         ("explode+nostage", delta_explode, ident), ("explode+stage", delta_explode, stage_p)]
import itertools
for rnd in range(3):
    for name, dfn, st in cases:
        base, delta = dfn()
        out = agg(merge_on_read(base, delta, key="folio", seq="seq", op="op", stage=st))
        t0=time.time(); out.count(); print(f"r{rnd} {name:16s}", round(time.time()-t0,3), flush=True)
