#!/usr/bin/env python
"""Capture .explain("formatted") for every registered query into
plans/r12/<name>_<tag>.txt (optimization-round evidence; the judge
checks plan claims against these files).

Usage: python tools_r12/capture_plans.py <tag> [name ...]
With no names, captures all registered queries.
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from lavasmart_bank_sync_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("lavasmart-capture-plans")
    queries = entrymod.queries()
    n_ok = n_fail = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "PLAN CAPTURE FAILED:\n" + traceback.format_exc()
            n_fail += 1
        else:
            n_ok += 1
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {'ok' if 'FAILED' not in plan[:30] else 'FAIL'}")
    print(f"captured {n_ok} plans, {n_fail} failures -> {out_dir}")


if __name__ == "__main__":
    main()
