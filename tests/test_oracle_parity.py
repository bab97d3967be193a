"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.001, compare row count, column names, and order-insensitive
values (floats to 12 significant decimals — queries round their float
outputs explicitly, so surviving differences are real engine
divergence, not summation noise).

Catching a mismatch here is 100× cheaper than in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from lavasmart_bank_sync_etl_spark.sources.tables import TABLE_NAMES


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(repr(_norm_cell(r[i])) for i in idx) for r in rows
    )


ORACLES = entrymod.oracle_sql()
QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    if name not in ORACLES:
        # rows-only contract: must run and be deterministic across reruns
        rerun = [tuple(r) for r in fn(spark, sf_dir).collect()]
        assert _norm_rows(spark_cols, spark_rows) == _norm_rows(spark_cols, rerun)
        return

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _norm_rows(spark_cols, spark_rows), _norm_rows(duck_cols, duck_rows)
    if ns != nd:
        diff_s = [r for r in ns if r not in set(nd)][:5]
        diff_d = [r for r in nd if r not in set(ns)][:5]
        raise AssertionError(f"{name}: value mismatch.\n spark-only={diff_s}\n duck-only={diff_d}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
