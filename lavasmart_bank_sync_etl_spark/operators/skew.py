"""Skew mitigation utilities (SCALE.md: hot folios, stop-shingles,
dominant payment classes).

AQE's skew-join splitting and partition coalescing handle most skew at
runtime; these explicit forms exist for the cases AQE can't touch —
algebraic aggregates whose single hot key saturates one reducer, and
joins where the build side is small enough to replicate but too big to
broadcast whole.

Both are semantics-preserving: results equal the unsalted equivalent
(asserted in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str] | list[tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase algebraic aggregation: pre-aggregate on
    (key, salt) — spreading a hot key over ``num_salts`` reducers —
    then combine per key. ``aggs`` is column → 'sum'|'count'|'min'|'max'
    (a dict, or a list of (column, how) pairs when one column needs
    several aggregates); every aggregate shares the single (key, salt)
    pre-aggregation pass, so sum+count over one column costs one scan
    and one shuffle, not two.

    Spark's hash aggregate already does map-side partials, so this
    only matters when a single key's *partial* rows still overwhelm
    one reducer (billions of rows for one key); it trades one extra
    narrow shuffle for an even first stage.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts)).alias("_salt")
    pairs = list(aggs.items()) if isinstance(aggs, dict) else list(aggs)
    phase1_aggs, phase2_aggs = [], []
    for col, how in pairs:
        a = f"_{how}_{col}"
        if how == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(a))
            phase2_aggs.append(F.sum(a).alias(f"{col}_count"))
        elif how == "sum":
            phase1_aggs.append(F.sum(col).alias(a))
            phase2_aggs.append(F.sum(a).alias(f"{col}_sum"))
        elif how == "min":
            phase1_aggs.append(F.min(col).alias(a))
            phase2_aggs.append(F.min(a).alias(f"{col}_min"))
        elif how == "max":
            phase1_aggs.append(F.max(col).alias(a))
            phase2_aggs.append(F.max(a).alias(f"{col}_max"))
        else:
            raise ValueError(f"non-algebraic aggregate: {how}")
    pre = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*phase1_aggs)
    return pre.groupBy(*key_cols).agg(*phase2_aggs)


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an explicitly salted probe side: each skewed row
    gets a random-ish salt in [0, num_salts); the build side is
    replicated once per salt value, so one hot key's rows spread over
    ``num_salts`` tasks instead of one.

    Use when the build side is small enough to replicate N× but not
    small enough to broadcast; columns from both sides survive as in a
    plain join on ``key``.
    """
    salts = skewed.sparkSession.range(num_salts).select(F.col("id").cast("int").alias("_salt"))
    probe = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts)).cast("int")
    )
    replicated = build.crossJoin(F.broadcast(salts))
    joined = probe.join(replicated, on=[key, "_salt"], how=how)
    return joined.drop("_salt")
