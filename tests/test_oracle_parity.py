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
import pyarrow as pa
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


def _norm_arrow_type(t):
    """Collapse an Arrow type to the equivalence class the driver's
    hasher distinguishes. Integer widths ≤64 hash identically, so they
    share one class — but DuckDB HUGEINT (int128) surfaces in Arrow as
    decimal128(38,0), a DIFFERENT class from Spark's int64. That is
    exactly the divergence the r2 driver caught (ch1/ml2) while the
    old string-normalizing replica stayed green."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return ("list", _norm_arrow_type(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((f.name, _norm_arrow_type(f.type)) for f in t))
    if pa.types.is_map(t):
        return ("map", _norm_arrow_type(t.key_type), _norm_arrow_type(t.item_type))
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _split_top(s: str):
    """Split a Spark dtype field list on commas at bracket depth 0 —
    tracking both angle brackets (array/struct/map) and parentheses
    (decimal(p,s) carries a comma inside them)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _norm_spark_dtype(s: str):
    s = s.strip()
    if s.startswith("array<") and s.endswith(">"):
        return ("list", _norm_spark_dtype(s[6:-1]))
    if s.startswith("map<") and s.endswith(">"):
        k, v = _split_top(s[4:-1])
        return ("map", _norm_spark_dtype(k), _norm_spark_dtype(v))
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top(s[7:-1]):
            name, _, typ = part.partition(":")
            fields.append((name.strip(), _norm_spark_dtype(typ)))
        return ("struct", tuple(fields))
    if s.startswith("decimal"):
        return "decimal"
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s == "boolean":
        return "bool"
    if s in ("timestamp", "timestamp_ntz"):
        return "timestamp"
    if s == "void":
        return "null"
    return s  # string, binary, date pass through


def _assert_types_compatible(name, sdf, duck_schema):
    duck_types = {f.name: _norm_arrow_type(f.type) for f in duck_schema}
    for col, dtype in sdf.dtypes:
        st, dt = _norm_spark_dtype(dtype), duck_types[col]
        if "null" in (st, dt):
            continue  # an all-NULL column types as null; values still compared
        assert st == dt, (
            f"{name}.{col}: engine type divergence spark={dtype}({st}) "
            f"duck={duck_types[col]} — the driver hashes these differently "
            f"(e.g. un-cast DuckDB HUGEINT); CAST the oracle output"
        )


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
    # one execution serves schema AND values (Arrow table carries both)
    tbl = con.execute(ORACLES[name]).arrow()
    duck_cols = tbl.column_names
    duck_rows = [tuple(d.values()) for d in tbl.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    _assert_types_compatible(name, sdf, tbl.schema)
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
