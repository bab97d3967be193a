"""Evidence for the SCALE.md merge-core claim: destination tables
bucketed by the merge key join WITHOUT shuffling either side — the
physical layout that makes the 100 TB keyed upsert co-located."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.sources.tables import read_table
from tests.test_plans import plan_of


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    # tables land in ./spark-warehouse (gitignored); DROP TABLE cleans up
    src = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("folio"),
        F.col("o_totalprice").alias("monto"),
    )
    dst = src.select("folio", (F.col("monto") + 1).alias("monto_dest"))
    for name, df in [("t_src_bkt", src), ("t_dst_bkt", dst)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, "folio").sortBy("folio").format("parquet").saveAsTable(name))
    yield "t_src_bkt", "t_dst_bkt"
    for name in ("t_src_bkt", "t_dst_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_merge_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    joined = spark.table(a).join(spark.table(b), on="folio", how="full_outer")
    plan = plan_of(joined)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # sanity: the join still returns every key
    assert joined.count() == spark.table(a).count()


def test_month_partition_pruning(spark, sf_dir, tmp_path):
    """S1: a month-partitioned source + window predicate prunes
    partitions at planning time — the reference's 'open only the
    month tabs in the window' (Code.gs:701-714) done by Catalyst."""
    src = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("folio"),
        F.col("o_orderdate").cast("date").alias("sale_date"),
        F.col("o_totalprice").alias("monto"),
        F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("month"),
    )
    part_dir = str(tmp_path / "sales_by_month")
    src.write.partitionBy("month").parquet(part_dir)

    from lavasmart_bank_sync_etl_spark.operators.classify import window_filter

    windowed = window_filter(
        spark.read.parquet(part_dir).where(
            F.col("month").between("1998-01", "1998-12")
        ),
        "1998-01-01", "1998-12-31",
    )
    plan = plan_of(windowed.groupBy("month").count())
    assert "PartitionFilters" in plan
    assert "1998" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    got_months = {r["month"] for r in windowed.select("month").distinct().collect()}
    assert got_months and all(m.startswith("1998") for m in got_months)


def test_unbucketed_same_join_shuffles(spark, sf_dir):
    src = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("folio"),
        F.col("o_totalprice").alias("monto"),
    )
    dst = src.select("folio", (F.col("monto") + 1).alias("monto_dest"))
    plan = plan_of(src.join(dst, on="folio", how="full_outer"))
    assert "Exchange" in plan  # the shuffle bucketing removes


def test_b1_rebuilds_only_when_corpus_changes(spark, sf_dir):
    """b1's bucketed tables are built once per (session, sf_dir) — but a
    DIFFERENT sf_dir in the same session must rebuild them (the table
    names are fixed, so serving the previous corpus would be stale), and
    switching back must rebuild again rather than trust the memo."""
    from lavasmart_bank_sync_etl_spark import queries_warehouse as qw
    from lavasmart_bank_sync_etl_spark.queries import QUERIES

    qw._B1_BUILT.clear()
    n1 = QUERIES["b1_bucketed_join"](spark, sf_dir).count()
    app_id = spark.sparkContext.applicationId
    assert qw._B1_BUILT[app_id] == sf_dir

    # the catalog names are per-process: another process's rebuild must
    # target different directories than ours (the cross-process clobber
    # guard — a fixed name let a concurrent rebuild delete parquet parts
    # this process had planned a scan over)
    orders_tbl, cust_tbl = qw._b1_table_names(app_id)
    assert orders_tbl != qw._b1_table_names("some-other-app")[0]
    assert cust_tbl != qw._b1_table_names("some-other-app")[1]

    # same corpus again: memo hit, tables untouched
    import pathlib
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    before = sorted(p.name for p in (pathlib.Path(warehouse) / orders_tbl).iterdir())
    mtimes = {p.name: p.stat().st_mtime_ns for p in (pathlib.Path(warehouse) / orders_tbl).iterdir()}
    assert QUERIES["b1_bucketed_join"](spark, sf_dir).count() == n1
    after = {p.name: p.stat().st_mtime_ns for p in (pathlib.Path(warehouse) / orders_tbl).iterdir()}
    assert after == mtimes and sorted(after) == before

    # different corpus: rebuild, results reflect the NEW data
    other = "/root/testdata/sf0.01" if "0.001" in sf_dir else "/root/testdata/sf0.001"
    n2 = QUERIES["b1_bucketed_join"](spark, other).count()
    assert qw._B1_BUILT[app_id] == other
    from pyspark.sql import functions as F  # noqa: F401
    from lavasmart_bank_sync_etl_spark.sources.tables import read_table

    seg_other = read_table(spark, other, "customer").select("c_mktsegment").distinct().count()
    assert n2 == seg_other

    # and back: the memo must not serve the other corpus's tables
    assert QUERIES["b1_bucketed_join"](spark, sf_dir).count() == n1
