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


# ---------------------------------------------------------------------------
# operators/layout.py — Z-order clustering (b3)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from lavasmart_bank_sync_etl_spark.operators import layout as L
from lavasmart_bank_sync_etl_spark.queries_pipeline import b3_zorder_layout


def test_z_interleave_py_known_values():
    # bx bits land at odd positions, by bits at even positions
    assert L.z_interleave_py(0, 0) == 0
    assert L.z_interleave_py(1, 0) == 2
    assert L.z_interleave_py(0, 1) == 1
    assert L.z_interleave_py(0b11, 0b11) == 0b1111
    assert L.z_interleave_py(255, 255) == 65535


def test_z_interleave_py_is_monotone_block_local():
    """Rows sharing the top z-byte agree on the top 4 bits of BOTH
    dims — the property that makes fixed z-ranges valid 'files'."""
    for bx in range(0, 256, 17):
        for by in range(0, 256, 13):
            z = L.z_interleave_py(bx, by)
            # reconstruct the high nibbles from the z block id
            blk = z >> 8
            hx = sum(((blk >> (2 * i + 1)) & 1) << i for i in range(4))
            hy = sum(((blk >> (2 * i)) & 1) << i for i in range(4))
            assert hx == bx >> 4 and hy == by >> 4


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=20, deadline=None)
def test_z_value_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "bx: long, by: long")
    got = [
        r["z"]
        for r in df.select(L.z_value(F.col("bx"), F.col("by")).alias("z"))
        .orderBy("bx", "by")
        .collect()
    ]
    want = [L.z_interleave_py(bx, by) for bx, by in sorted(pairs)]
    assert got == want


def test_z_value_sql_twin_matches(spark):
    rows = [(bx, by) for bx in range(0, 256, 31) for by in range(0, 256, 29)]
    df = spark.createDataFrame(rows, "bx: long, by: long")
    both = df.select(
        L.z_value(F.col("bx"), F.col("by")).alias("a"),
        F.expr(L.z_value_sql("bx", "by")).cast("long").alias("b"),
    )
    assert both.where(F.col("a") != F.col("b")).count() == 0


def test_fixed_width_bin_bounds_and_edges(spark):
    df = spark.createDataFrame(
        [(v,) for v in [0, 1, 99, 100, 101, 9999, 10000]], "v: long"
    )
    out = df.select(
        "v",
        L.fixed_width_bin(F.col("v"), F.lit(0), F.lit(10000), 256).alias("b"),
    ).collect()
    for r in out:
        assert 0 <= r["b"] <= 255
        assert r["b"] == (r["v"] * 256) // 10001  # python floor-div oracle


def test_fixed_width_bin_exact_past_double_precision(spark):
    """The scaled numerator exceeds 2^53, where double division starts
    rounding quotients one low at bin boundaries — the decimal
    quotient must still match Python's arbitrary-precision floor-div
    (ADVICE r7: the operator must not diverge from the SQL twin's
    integer `//` on full-range long columns)."""
    vmin, vmax, bins = 0, (1 << 55) - 1, 256
    span = vmax - vmin + 1
    # values chosen to land exactly on / around bin boundaries where
    # a double quotient like 254.99999999999997 truncates to 254
    edge = [k * span // bins for k in (1, 127, 255)]
    vals = sorted({vmin, vmax, *edge, *[v - 1 for v in edge], *[v + 1 for v in edge]})
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    out = df.select(
        "v",
        L.fixed_width_bin(F.col("v"), F.lit(vmin), F.lit(vmax), bins).alias("b"),
    ).collect()
    for r in out:
        assert r["b"] == (r["v"] * bins) // span, (r["v"], r["b"])


def test_fixed_width_bin_int32_column_full_range(spark):
    """An IntegerType column spanning the full int32 range: the
    subtraction must be widened to long BEFORE it happens, or
    (col - vmin) wraps in 32-bit arithmetic (2^31-1 - (-2^31) → -1)
    and bins come out negative (r8 review finding)."""
    vmin, vmax, bins = -(1 << 31), (1 << 31) - 1, 256
    vals = [vmin, -1, 0, 1, vmax]
    df = spark.createDataFrame([(v,) for v in vals], "v: int")
    out = df.select(
        "v",
        L.fixed_width_bin(
            F.col("v"), F.lit(vmin).cast("int"), F.lit(vmax).cast("int"), bins
        ).alias("b"),
    ).collect()
    span = vmax - vmin + 1
    for r in out:
        assert r["b"] == ((r["v"] - vmin) * bins) // span, (r["v"], r["b"])
    assert {r["b"] for r in out if r["v"] == vmax} == {255}


def test_b3_zorder_prunes_both_dimensions(spark, sf_dir):
    """The operator's reason to exist: for a 2-D box probe the
    z-layout must open a smaller row fraction than the 1-D sort, and
    both layouts must cover every matching row."""
    rows = {r["layout"]: r for r in b3_zorder_layout(spark, sf_dir).collect()}
    z, lin = rows["zorder"], rows["linear"]
    assert z["rows_matching"] == lin["rows_matching"] > 0
    assert z["rows_scanned"] >= z["rows_matching"]
    assert lin["rows_scanned"] >= lin["rows_matching"]
    assert z["rows_scanned"] < lin["rows_scanned"]
