"""Semantics of the union-window as-of join (operators/asof.py):
inclusive (>=) match, null before any right row, carry-forward across
gaps, and key isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.operators.asof import asof_join


def _ts(second: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=second)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(0), "a"),   # before any right row → NULL
            (1, _ts(10), "b"),  # equal ts to right@10 → inclusive match 10.0
            (1, _ts(25), "c"),  # between right@20 and right@30 → 20.0
            (1, _ts(99), "d"),  # after the last right row → 30.0
            (2, _ts(50), "e"),  # key 2 has no right rows at all → NULL
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 10.0), (1, _ts(20), 20.0), (1, _ts(30), 30.0)],
        "user_id long, ts timestamp, v double",
    )
    out = asof_join(left, right, key="user_id", ts="ts", value_col="v")
    got = {r["tag"]: r["v"] for r in out.collect()}
    assert got == {"a": None, "b": 10.0, "c": 20.0, "d": 30.0, "e": None}
    # only left rows survive, all of them
    assert out.count() == 5
    assert set(out.columns) == {"user_id", "ts", "tag", "v"}


def test_asof_join_single_shuffle_plan(spark):
    """The whole as-of is one exchange on the key — no
    broadcast-nested-loop, no cartesian product in the plan."""
    left = spark.createDataFrame([(1, _ts(1), "x")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(0), 1.0)], "k long, ts timestamp, v double")
    plan = (
        asof_join(left, right, key="k", ts="ts", value_col="v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontamination_flags_planted_benchmark(spark, sf_dir):
    """Every benchmark doc is itself in the corpus → containment 1.0
    self-pairs must all be present."""
    from lavasmart_bank_sync_etl_spark.queries_pipeline import dd8_decontamination

    out = dd8_decontamination(spark, sf_dir).collect()
    self_pairs = {r["bench_id"] for r in out if r["doc_id"] == r["bench_id"]}
    import duckdb

    n_bench = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' WHERE doc_id % 23 = 0"
    ).fetchone()[0]
    assert len(self_pairs) == n_bench
    for r in out:
        if r["doc_id"] == r["bench_id"]:
            assert r["containment"] == 1.0
