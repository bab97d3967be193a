"""A/B isolation of dd17/dd4 pair-generation variants on sf0.1 (guide §1.4:
time the computation with a count action, fresh session, 2 reps each).

A = HEAD (_capped_intersections: struct posting lists, struct slice)
B = index-lookup (primitive id/sz parallel arrays, slice on long array,
    element_at for sizes)
C = round-start shape (plain ids + sizes rejoin)
"""
import sys, time

sys.path.insert(0, "/root/repo")
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.operators import dedup as DD
from lavasmart_bank_sync_etl_spark import queries_llm as QL
from pyspark.sql import functions as F

spark = get_spark("ab-pairs")
SF = "/root/testdata/sf0.1"
corpus = QL._containment_corpus(spark, SF)
corpus.count()  # warm the scan


def variant_a(df):
    return DD.ngram_containment_pairs(df, threshold=0.9)


def variant_b(df, text_col="text", id_col="doc_id", k=3, threshold=0.9, max_posting=1000):
    sh = DD._shingle_rows_sized(df, text_col, id_col, k)
    capped = DD.cap_postings(sh, ["shingle"], [id_col], max_posting)
    groups = (
        capped.groupBy("shingle")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("sz").alias("s")))
            ).alias("ps")
        )
        .where(F.size("ps") > 1)
        .select(
            F.transform("ps", lambda p: p["i"]).alias("ids"),
            F.transform("ps", lambda p: p["s"]).alias("szs"),
        )
    )
    ids = F.col("ids")
    szs = F.col("szs")
    pairs = groups.select(
        F.explode(
            F.flatten(
                F.transform(
                    ids,
                    lambda x, i: F.transform(
                        F.slice(ids, i + 2, F.size(ids)),
                        lambda y, j: F.struct(
                            x.alias("a"),
                            y.alias("b"),
                            F.element_at(szs, i + 1).alias("sa"),
                            F.element_at(szs, i + j + 2).alias("sb"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    inter = (
        pairs.select(
            F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"),
            F.col("p.sa").alias("sz_a"), F.col("p.sb").alias("sz_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("sz_a").alias("sz_a"),
            F.min("sz_b").alias("sz_b"),
        )
    )
    return (
        inter.withColumn("containment", F.round(F.col("inter") / F.least("sz_a", "sz_b"), 4))
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "jaccard")
    )


def variant_c(df, text_col="text", id_col="doc_id", k=3, threshold=0.9, max_posting=1000):
    sh = DD._shingle_rows(df, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    capped = DD.cap_postings(sh, ["shingle"], [id_col], max_posting).select("shingle", id_col)
    ids = F.col("ids")
    groups = (
        capped.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.size(ids) > 1)
    )
    pairs = groups.select(
        F.explode(
            F.flatten(
                F.transform(
                    ids,
                    lambda x, i: F.transform(
                        F.slice(ids, i + 2, F.size(ids)),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    inter = (
        pairs.select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a").join(sz_b, "id_b")
        .withColumn("containment", F.round(F.col("inter") / F.least("sz_a", "sz_b"), 4))
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "jaccard")
    )


results = {}
for name, fn in [("A_head_struct", variant_a), ("B_index_lookup", variant_b), ("C_roundstart", variant_c)]:
    walls = []
    for rep in range(2):
        spark.sparkContext.setJobDescription(f"{name} rep{rep}")
        t0 = time.time()
        n = fn(corpus).count()
        walls.append(round(time.time() - t0, 2))
    results[name] = (walls, n)
    print(name, "walls", walls, "rows", n, flush=True)

ra = sorted(map(tuple, variant_a(corpus).collect()))
rb = sorted(map(tuple, variant_b(corpus).collect()))
rc = sorted(map(tuple, variant_c(corpus).collect()))
print("A==B:", ra == rb, "A==C:", ra == rc)
