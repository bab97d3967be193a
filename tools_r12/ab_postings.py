"""A/B: per-session persisted posting-list / doc-size / shingle-set
index artifacts vs the current per-rep recomputation.

Variants (each timed with 3 reps, min semantics, identical-output
asserted against the current code path):

  dd17_cur   — HEAD dd17 (shared exploded-shingle persist only)
  dd17_idx   — postings (capped, sorted, multi-doc only) + sizes
               persisted once per session; per-rep = pair-emit over
               the small postings frame + count + two tiny size joins
  dd13_cur   — HEAD dd13 (per-rep candidate shingle-SET rebuild)
  dd13_idx   — candidate shingle sets persisted once per session

Run on an idle machine: SPARK_GRAFT_CPUS=32 python tools_r12/ab_postings.py
"""
import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F, Window

from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.operators import dedup as DD
from lavasmart_bank_sync_etl_spark import queries_llm as QL
from lavasmart_bank_sync_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.1"


def timed(label, build, reps=3):
    walls = []
    for _ in range(reps):
        df = build()
        t0 = time.time()
        df.count()
        walls.append(round(time.time() - t0, 3))
    print(f"{label}: {walls}", flush=True)
    return build()


def main():
    spark = get_spark("ab-postings")
    spark.sql("select 1").collect()

    # ---- dd17 current -------------------------------------------------
    cur17 = timed(
        "dd17_cur", lambda: QUERIES["dd17_containment_pairs"](spark, SF)
    )

    # ---- dd17 indexed -------------------------------------------------
    sh = QL._containment_shingles(spark, SF)  # existing persist
    t0 = time.time()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz")).persist()
    sizes.count()
    w = Window.partitionBy("shingle").orderBy(F.col("doc_id").asc())
    postings = (
        sh.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 1000)
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
        .persist()
    )
    postings.count()
    print(f"dd17 index build: {round(time.time()-t0,3)}s "
          f"(postings rows={postings.count()}, sizes rows={sizes.count()})", flush=True)

    def dd17_idx():
        ids = F.col("ids")
        pairs = postings.select(
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
        sz_a = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
        sz_b = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
        return (
            inter.join(sz_a, "id_a").join(sz_b, "id_b")
            .withColumn("containment", F.round(F.col("inter") / F.least("sz_a", "sz_b"), 4))
            .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
            .where(F.col("containment") >= 0.9)
            .select("id_a", "id_b", "containment", "jaccard")
        )

    idx17 = timed("dd17_idx", dd17_idx)
    a = sorted(map(tuple, cur17.collect()))
    b = sorted(map(tuple, idx17.collect()))
    print("dd17 outputs identical:", a == b, f"({len(a)} rows)", flush=True)

    # ---- dd13 current -------------------------------------------------
    cur13 = timed(
        "dd13_cur", lambda: QUERIES["dd13_lsh_prefiltered_jaccard"](spark, SF)
    )

    # ---- dd13 indexed -------------------------------------------------
    cands = QL.near_dup_lsh_pairs(spark, SF)
    t0 = time.time()
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    corpus = QL._near_dup_corpus(spark, SF)
    sets = (
        corpus.select("doc_id", F.split(DD.normalized_text("text"), " ").alias("_w"))
        .join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .select("doc_id", DD.shingles_from_words(F.col("_w"), 3).alias("sh"))
        .persist()
    )
    sets.count()
    print(f"dd13 sets build: {round(time.time()-t0,3)}s (rows={sets.count()})", flush=True)

    def dd13_idx():
        a_ = sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
        b_ = sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
        return (
            cands.join(a_, "id_a").join(b_, "id_b")
            .withColumn("jaccard", F.round(inter / union, 4))
            .where(F.col("jaccard") >= 0.6)
            .select("id_a", "id_b", "jaccard")
        )

    idx13 = timed("dd13_idx", dd13_idx)
    a = sorted(map(tuple, cur13.collect()))
    b = sorted(map(tuple, idx13.collect()))
    print("dd13 outputs identical:", a == b, f"({len(a)} rows)", flush=True)


if __name__ == "__main__":
    main()
