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
