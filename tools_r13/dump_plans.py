#!/usr/bin/env python
"""Dump .explain('formatted') for the named queries into plans/r13/."""
import os, sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from lavasmart_bank_sync_etl_spark.session import get_spark


def plan_of(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main():
    suffix = sys.argv[1]  # "before" or "after"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    qs = entrymod.queries()
    for n in names:
        p = plan_of(qs[n](spark, sf_dir))
        out = f"/root/repo/plans/r13/{n}_{suffix}.txt"
        with open(out, "w") as fh:
            fh.write(p)
        print(f"{n}: {p.count('Exchange ')} Exchange, "
              f"{p.count('BatchEvalPython') + p.count('ArrowEvalPython')} pyeval, "
              f"-> {out}")


if __name__ == "__main__":
    main()
