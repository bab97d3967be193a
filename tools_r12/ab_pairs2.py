"""C-variants: C (round-start), C1 (persist sh), C2 (persist sizes only)."""
import sys, time
sys.path.insert(0, "/root/repo")
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.operators import dedup as DD
from lavasmart_bank_sync_etl_spark import queries_llm as QL
from pyspark.sql import functions as F

spark = get_spark("ab-pairs2")
SF = "/root/testdata/sf0.1"
corpus = QL._containment_corpus(spark, SF)
corpus.count()

def build(persist_sh=False, persist_sizes=False):
    def q(df, text_col="text", id_col="doc_id", k=3, threshold=0.9, max_posting=1000):
        sh = DD._shingle_rows(df, text_col, id_col, k)
        if persist_sh:
            sh = sh.persist()
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
        if persist_sizes:
            sizes = sizes.persist()
        capped = DD.cap_postings(sh, ["shingle"], [id_col], max_posting).select("shingle", id_col)
        ids = F.col("ids")
        groups = (
            capped.groupBy("shingle")
            .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
            .where(F.size(ids) > 1)
        )
        pairs = groups.select(
            F.explode(F.flatten(F.transform(ids, lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("a"), y.alias("b")))))).alias("p"))
        inter = (
            pairs.select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
            .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
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
    return q

for name, kw in [("C_plain", {}), ("C1_persist_sh", {"persist_sh": True}), ("C2_persist_sizes", {"persist_sizes": True})]:
    fn = build(**kw)
    walls = []
    for rep in range(2):
        spark.sparkContext.setJobDescription(f"{name} rep{rep}")
        t0 = time.time()
        n = fn(corpus).count()
        walls.append(round(time.time() - t0, 2))
    print(name, "walls", walls, "rows", n, flush=True)
    spark.catalog.clearCache()
