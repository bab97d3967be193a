"""As-of (point-in-time) join.

The reference's bank-statement matching (SURVEY J5, xlsx `Banco!F`)
is a human-performed "which transfer does this bank movement belong
to" lookup; the engine generalization is the event-time as-of join:
for every left row, the latest right row with ``right.ts <= left.ts``
on the same key.

Spark has no built-in as-of join. The naive encodings both fail at
scale: an inequality join explodes to a broadcast-nested-loop, and a
`groupBy(left_row).max(right.ts)` over the inequality product
materializes O(|L|·|R| / keys) intermediates. The scalable encoding
is **union + ordered window**:

    union(L tagged side=1, R tagged side=0)
      → window PARTITION BY key ORDER BY (ts, side)
      → last(right_value, ignorenulls=True) carried forward
      → keep side=1 rows

One shuffle on the key (the same partitioning both inputs would need
anyway), O(|L|+|R|) total work, no product anywhere. Rights sort
before lefts at equal ts, giving the standard inclusive (>=)
semantics DuckDB's ASOF JOIN uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_col: str,
) -> DataFrame:
    """Left as-of join: attach ``value_col`` from the latest right row
    with ``right.ts <= left.ts`` per ``key``. Left rows with no prior
    right row keep NULL.

    ``right`` must be unique per (key, ts) — pre-aggregate it if not,
    otherwise "latest" is nondeterministic. The join is implemented as
    a union + one window over (key, ts, side); both inputs shuffle
    once on ``key``.
    """
    l_cols = [c for c in left.columns if c not in (key, ts)]
    l_tag = left.select(
        key, ts, F.lit(1).alias("_side"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(dict(right.dtypes)[value_col]).alias(value_col),
    )
    r_tag = right.select(
        key, ts, F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols],
        F.col(value_col),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        value_col, F.last(value_col, ignorenulls=True).over(w)
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
) -> DataFrame:
    """Interval (range) join: all right rows with
    ``left.ts - lookback <= right.ts <= left.ts`` per key — the
    one-to-many sibling of :func:`asof_join` (that one keeps only the
    latest match; this keeps the whole window).

    The join condition is an equi-key plus a *bounded* time range, so
    Spark executes it as a hash join on ``key`` with the range as a
    residual filter — never a cross product — and, critically, the
    SAME expression is a valid **stream-stream join**: with watermarks
    on both sides the two-sided bound lets Spark age out join state
    (unbounded-side stream-stream joins retain state forever). Batch
    and streaming share this code path.

    ``left_ts`` and ``right_ts`` must be distinct column names (the
    output carries both).
    """
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lookback}"))
        & (right[right_ts] <= left[left_ts])
    )
    return left.join(right, cond, "inner").drop(right[key])
