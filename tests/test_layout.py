"""Storage-layout tests: range-clustered writes produce files whose
per-file min/max statistics are disjoint — the file-level
data-skipping foundation at 100 TB (a date-range query touches only
the files whose stats overlap the predicate, before any row is read).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.sources.tables import sales_view


def test_range_clustered_write_has_disjoint_file_stats(spark, sf_dir, tmp_path):
    out = str(tmp_path / "clustered")
    s = sales_view(spark, sf_dir).select("folio", "sale_date", "monto")
    # repartitionByRange clusters rows so each output file owns a
    # contiguous date slice; sortWithinPartitions tightens row-group
    # stats inside the file.
    (
        s.repartitionByRange(4, "sale_date")
        .sortWithinPartitions("sale_date")
        .write.mode("overwrite")
        .parquet(out)
    )
    spans = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["sale_date"]).statistics
            lo = st.min if lo is None or st.min < lo else lo
            hi = st.max if hi is None or st.max > hi else hi
        spans.append((lo, hi))
    assert len(spans) >= 2
    spans.sort()
    # files own disjoint (at most boundary-touching) date ranges
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_unclustered_write_overlaps_everywhere(spark, sf_dir, tmp_path):
    """Control: a hash-shuffled write has every file spanning ~the full
    date range — no file can ever be skipped."""
    out = str(tmp_path / "hashed")
    s = sales_view(spark, sf_dir).select("folio", "sale_date", "monto")
    s.repartition(4, "folio").write.mode("overwrite").parquet(out)
    spans = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        st = md.row_group(0).column(idx["sale_date"]).statistics
        spans.append((st.min, st.max))
    assert len(spans) >= 2
    lo = max(s0 for s0, _ in spans)
    hi = min(s1 for _, s1 in spans)
    assert lo < hi  # every pair of files overlaps


def test_schema_evolution_merge_read(spark, tmp_path):
    """Long-lived tables grow columns over the years; old files must
    stay readable next to new ones. mergeSchema unions the file
    schemas; rows from pre-evolution files surface NULL for the added
    column (never a read failure)."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [("0-1", 100.0)], "folio string, monto double"
    ).write.mode("overwrite").parquet(out)
    spark.createDataFrame(
        [("0-2", 200.0, "SANTANDER")], "folio string, monto double, banco string"
    ).write.mode("append").parquet(out)

    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) == {"folio", "monto", "banco"}
    rows = {r["folio"]: r["banco"] for r in df.collect()}
    assert rows == {"0-1": None, "0-2": "SANTANDER"}

    # default read (no mergeSchema) picks one footer — documents WHY the
    # engine's warehouse pins explicit StructTypes at read (sources/warehouse.py)
    from lavasmart_bank_sync_etl_spark.sources.warehouse import ALL_TABLES
    assert all(len(s.fields) > 0 for s in ALL_TABLES.values())


def test_any_query_module_is_a_safe_first_import():
    """Entering the package through ANY query module must fully
    populate the registry — the partial-module window (queries.py's
    old bottom imports cascading while queries_llm was
    half-initialized) must not come back. Subprocesses give each
    candidate a genuinely fresh interpreter."""
    import subprocess
    import sys

    mods = [
        "queries", "queries_merge", "queries_llm",
        "queries_pipeline", "queries_warehouse", "queries_curation",
        "queries_quality",
    ]
    for mod in mods:
        code = (
            f"import lavasmart_bank_sync_etl_spark.{mod}\n"
            "from lavasmart_bank_sync_etl_spark.queries import ("
            "QUERIES, EXPECTED_QUERY_COUNT)\n"
            "assert len(QUERIES) == EXPECTED_QUERY_COUNT, len(QUERIES)\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
        )
        assert proc.returncode == 0, f"{mod}-first import failed:\n{proc.stderr[-2000:]}"
