"""A/B: vectorized image_dhash (HEAD) vs the round-start per-row loop,
on mm8's pipeline (synth_shot_frames -> dhash -> count) at sf0.1."""
import sys, time

sys.path.insert(0, "/root/repo")
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.multimodal import binary_ops as B
from lavasmart_bank_sync_etl_spark.sources.tables import read_table
from pyspark.sql import functions as F
import pandas as pd
from typing import Iterator

spark = get_spark("ab-dhash")
SF = "/root/testdata/sf0.1"
d = read_table(spark, SF, "documents").select("doc_id")
d.count()


def image_dhash_old(media):
    import numpy as np

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "dhash_bits": [], "ones": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _, rgb = B._parse_ppm(bytes(payload))
                gray = rgb[:, :, 0].astype(np.int64)
                grid = (
                    gray[0::2, 0::2] + gray[0::2, 1::2]
                    + gray[1::2, 0::2] + gray[1::2, 1::2]
                ) // 4
                bits = (grid[:, :-1] < grid[:, 1:]).astype(np.int64)
                s = "".join("1" if b else "0" for b in bits.ravel())
                out["doc_id"].append(doc_id)
                out["dhash_bits"].append(s)
                out["ones"].append(int(bits.sum()))
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "dhash_bits": out["dhash_bits"],
                "ones": pd.Series(out["ones"], dtype="int32"),
            })

    return media.mapInPandas(run, schema=B.DHASH_SCHEMA)


def mm8_like(dhash_fn):
    fh = dhash_fn(B.synth_shot_frames(d)).select(
        F.floor(F.col("doc_id") / 16).cast("long").alias("video_id"),
        F.pmod(F.col("doc_id"), F.lit(16)).alias("fidx"),
        "dhash_bits",
    )
    return fh


# warmup both codepaths once
mm8_like(B.image_dhash).count()
mm8_like(image_dhash_old).count()

for name, fn in [("new_vectorized", B.image_dhash), ("old_perrow", image_dhash_old), ("new_vectorized2", B.image_dhash)]:
    walls = []
    for rep in range(3):
        t0 = time.time()
        n = mm8_like(fn).count()
        walls.append(round(time.time() - t0, 2))
    print(name, walls, "rows", n, flush=True)

# also: bare synth (no dhash) to see the synth share
for rep in range(2):
    t0 = time.time()
    B.synth_shot_frames(d).count()
    print("synth_only", round(time.time() - t0, 2), flush=True)
