"""Skew utilities are semantics-preserving: salted results must equal
their unsalted equivalents exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.operators.skew import salted_agg, salted_join
from lavasmart_bank_sync_etl_spark.sources.tables import read_table


def test_salted_agg_equals_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity", "l_extendedprice"
    )
    plain = {
        r["l_suppkey"]: (r["n"], round(r["s"], 2), r["mn"])
        for r in li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"),
             F.min("l_extendedprice").alias("mn"))
        .collect()
    }
    salted = {
        r["l_suppkey"]: (r["l_suppkey_count"], round(r["l_quantity_sum"], 2),
                         r["l_extendedprice_min"])
        for r in salted_agg(
            li, ["l_suppkey"],
            {"l_suppkey": "count", "l_quantity": "sum", "l_extendedprice": "min"},
            num_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k"), "l_orderkey", "l_linenumber"
    )
    sup = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), "s_name"
    )
    plain = sorted(
        (r["k"], r["l_orderkey"], r["l_linenumber"], r["s_name"])
        for r in li.join(sup, "k").collect()
    )
    salted = sorted(
        (r["k"], r["l_orderkey"], r["l_linenumber"], r["s_name"])
        for r in salted_join(li, sup, "k", num_salts=8).collect()
    )
    assert salted == plain and len(salted) > 0


def test_salted_agg_multi_agg_single_pass(spark, sf_dir):
    """sum+count over ONE column share a single (key, salt)
    pre-aggregation — one scan in the plan, results equal the plain
    two-agg groupBy."""
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    plain = {
        r["l_suppkey"]: (r["n"], round(r["s"], 2))
        for r in li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    out = salted_agg(
        li, ["l_suppkey"], [("l_quantity", "count"), ("l_quantity", "sum")],
        num_salts=16,
    )
    salted = {
        r["l_suppkey"]: (r["l_quantity_count"], round(r["l_quantity_sum"], 2))
        for r in out.collect()
    }
    assert salted == plain


def test_aqe_skew_join_splits_hot_partition(spark):
    """The session's AQE skew-join config must actually ENGAGE on a
    skewed shuffle join: with half the probe side on one hot key and
    thresholds scaled to test-size data, the final adaptive plan runs
    ``SortMergeJoin(skew=true)`` — the runtime complement to the
    explicit salting operators (sk1/sk2) for skew AQE can fix by
    itself. Result correctness is asserted alongside the plan marker
    (the split must not duplicate or drop rows)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 60), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 5000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        j = left.join(right, "k").select(F.substring("pad", 1, 1).alias("c"))
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # 100k hot-key matches + 2500 odd ids below 5000
        assert len(rows) == 102_500
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
