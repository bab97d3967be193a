"""Data-layout operators: multi-dimensional (Z-order) clustering.

The reference keeps exactly one physical layout — a tab per month
(Code.gs:234-240), i.e. clustering on the single ``fecha`` dimension.
That prunes date windows and nothing else; a query on any second
dimension scans every row of the touched months. At 100 TB the
engine's answer is space-filling-curve clustering (the lakehouse
``OPTIMIZE ZORDER BY`` pattern): interleave the bits of several
column bins so rows close in ANY clustered dimension land in the
same files, and every file's min/max zone map stays narrow in ALL of
them — parquet row-group statistics then prune multi-dimensional
predicates, not just the partition column.

Everything here is pure column arithmetic (whole-stage codegen, no
shuffle): binning is one broadcast of a 1-row min/max stats frame,
the z-value is a fixed unrolled bit-interleave. Assigning files as
fixed z-ranges (``z div cell``) rather than a global row_number keeps
the operator map-only and deterministic — the trade is variable file
sizes on skewed data, which the zone-map output makes visible.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed_width_bin(col: Column, vmin: Column, vmax: Column, bins: int) -> Column:
    """Map ``col`` (integral, within [vmin, vmax]) to ``0..bins-1`` by
    fixed-width binning. Pure integer arithmetic so every engine
    computes the identical bin — no float rounding at bucket
    boundaries. Non-negative numerator by construction (col ≥ vmin),
    where truncating and flooring division agree.

    Input bound (caller contract): ``(vmax - vmin + 1) * bins`` must
    stay below 2^63 — the scaled numerator is computed in long. The
    division itself is exact at any long magnitude: the numerator is
    reduced to an exact multiple of ``span``, and the quotient is
    taken in decimal, not double, so bins never come out one low past
    2^53 (the failure mode of float division).

    Operands are widened to long BEFORE the subtractions: an
    IntegerType column whose span exceeds int32 would otherwise wrap
    in 32-bit arithmetic (e.g. col=2^31-1, vmin=-2^31 → -1) and
    violate the non-negative-numerator precondition invisibly."""
    vmin_l = vmin.cast("long")
    span = vmax.cast("long") - vmin_l + F.lit(1)
    scaled = (col.cast("long") - vmin_l) * F.lit(bins)
    exact = scaled - F.pmod(scaled, span)
    # decimal division of an exact multiple: integral quotient, no
    # rounding at any long magnitude (matches the SQL twin's `//`)
    return (exact.cast("decimal(38,0)") / span.cast("decimal(38,0)")).cast("long")


def z_value(bx: Column, by: Column, bits: int = 8) -> Column:
    """Morton (Z-order) interleave of two ``bits``-bit bin columns:
    bit i of ``bx`` lands at position 2i+1, bit i of ``by`` at 2i.
    Unrolled to ``2*bits`` shift/mask terms — a constant-folded
    whole-stage-codegen expression, no UDF."""
    return reduce(
        lambda acc, term: acc + term,
        [
            F.shiftright(bx, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
            + F.shiftright(by, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            for i in range(bits)
        ],
    ).cast("long")


def z_value_sql(bx: str, by: str, bits: int = 8) -> str:
    """The exact SQL twin of :func:`z_value` for cross-engine oracles."""
    return " + ".join(
        f"((({bx} >> {i}) & 1) * {1 << (2 * i + 1)})"
        f" + ((({by} >> {i}) & 1) * {1 << (2 * i)})"
        for i in range(bits)
    )


def z_interleave_py(bx: int, by: int, bits: int = 8) -> int:
    """Pure-Python reference for tests: interleave two ints bitwise."""
    z = 0
    for i in range(bits):
        z |= ((bx >> i) & 1) << (2 * i + 1)
        z |= ((by >> i) & 1) << (2 * i)
    return z
