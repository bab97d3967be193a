#!/usr/bin/env python
"""Isolated mini-bench: run named queries (bench methodology — count
action, N reps, min) in a fresh session at sf0.1/32cpus."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
import __spark_entry__ as entrymod
from lavasmart_bank_sync_etl_spark.session import get_spark


def main():
    reps = int(os.environ.get("REPS", "2"))
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("iso-bench")
    entrymod.entry(spark).count()  # warmup
    qs = entrymod.queries()
    out = {}
    for n in names:
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"iso:{n}")
            t0 = time.time()
            qs[n](spark, sf_dir).count()
            walls.append(round(time.time() - t0, 3))
        out[n] = walls
        print(n, walls, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
