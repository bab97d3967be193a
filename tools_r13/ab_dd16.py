import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark.queries_llm import _near_dup_corpus, _run_persist
from lavasmart_bank_sync_etl_spark.operators import dedup as DD

sf = "/root/testdata/sf0.1"
spark = get_spark("ab-dd16")
spark.range(1).count()
corpus = _near_dup_corpus(spark, sf)

def plain():
    return DD.duplicate_passage_spans(corpus, k=8, max_posting=50, min_tokens=16)

def staged():
    return DD.duplicate_passage_spans(
        corpus, k=8, max_posting=50, min_tokens=16,
        stage=lambda df: _run_persist(spark, ("ab16", sf), lambda: df))

ref = None
for rnd in range(4):
    row = []
    for name, fn in [("plain", plain), ("staged", staged)]:
        t0=time.time(); r = sorted(map(tuple, fn().collect())); t=round(time.time()-t0,3)
        if ref is None: ref = r
        row.append(f"{name} {t}s ident={r==ref}")
    print(f"r{rnd} " + " | ".join(row), flush=True)
