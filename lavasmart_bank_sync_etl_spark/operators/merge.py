"""The upsert/merge core (SURVEY.md §2.4 J1, §2.5 C1-C4, §2.1 S3/S4).

The reference's heart: probe each deduped source row against the keyed
destination, classify {insert, update, unchanged, move, delete-
candidate}, and apply updates that overwrite ONLY script-owned columns
while preserving human-owned ones verbatim (requerimientos.md:113-119).

Spark shape: ONE full-outer join per run on the business key carries
everything — source values, destination values (script + human cols),
and the destination table tag. All outcome splits derive from that one
persisted DataFrame, so the join's shuffle happens once (SURVEY §4
read-once/write-once phasing).

At 100 TB: the destination side is bucketed/partitioned by key so the
merge join co-locates; the source side of an incremental run is a
pruned 10-day window, typically small enough that AQE converts the
join to broadcast at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.parsing import dates_equal, money_equal

ACTION_INSERT = "insert"
ACTION_UPDATE = "update"
ACTION_UNCHANGED = "unchanged"
ACTION_MOVE = "move"
ACTION_DEST_ONLY = "dest_only"
#: Folio has an UNRESOLVED (Estado='Pendiente') review-queue row: the
#: guía's contract (GUIA_REVISION_PENDIENTE.md:114-136) is that the
#: system never re-processes a parked conflict until a human flips it
#: to 'Resuelto' — so the sync freezes the folio on both sides.
ACTION_PARKED = "parked"

#: Monitored fields per table family (DOCUMENTACION_SISTEMA.md:293-306):
#: transfers watch banco; cards/cash/others don't (Code.gs:1341-1373).
DIFF_FIELDS_TRANSFERS = ["fecha", "cliente", "servicio", "banco", "monto"]
DIFF_FIELDS_OTHERS = ["fecha", "cliente", "servicio", "monto"]


def field_changed(field: str, src: str = "src", dst: str = "dst") -> Column:
    """C3 — typed comparator for one monitored field (Code.gs:199-214,
    DOCUMENTACION_SISTEMA.md:308-315): dates by Y/M/D null-safe; money
    by |Δ| < 0.01; strings exact post-trim (null ≡ '').

    Money NULLs deliberately coalesce to 0.0 (so NULL vs 0.00 reads
    unchanged): the reference's source side is always numeric
    (parsearMonto is NaN→0, F2) and its destination side reads empty
    sheet cells as '' which JS coerces to 0 in compararMontos'
    subtraction (Code.gs:199-202) — empty ≡ 0 is the reference
    behavior, unlike dates where one-NULL compares unequal."""
    a, b = F.col(f"{src}.{field}"), F.col(f"{dst}.{field}")
    if field == "fecha":
        return ~dates_equal(a, b)
    if field == "monto":
        return ~money_equal(F.coalesce(a, F.lit(0.0)), F.coalesce(b, F.lit(0.0)))
    return ~F.trim(F.coalesce(a, F.lit(""))).eqNullSafe(F.trim(F.coalesce(b, F.lit(""))))


def any_field_changed(fields: list[str], src: str = "src", dst: str = "dst") -> Column:
    """C1/C2 — OR-reduction of the per-field typed diffs
    (Code.gs:1341-1373)."""
    out = F.lit(False)
    for f_ in fields:
        out = out | field_changed(f_, src, dst)
    return out


def change_narrative(fields: list[str], src: str = "src", dst: str = "dst") -> tuple[Column, Column, Column]:
    """C4 — audit narrative (Code.gs:2078-2116): returns
    (detalle, valores_anteriores, valores_nuevos).

    detalle = ``Cambios en: Monto, Banco``; value strings are
    ``; ``-joined ``Campo: valor`` pairs with ``(vacío)`` for empties.
    """
    label = {"fecha": "Fecha", "cliente": "Cliente", "servicio": "Servicio",
             "banco": "Banco", "monto": "Monto"}

    def fmt(side: str, f_: str) -> Column:
        c = F.col(f"{side}.{f_}")
        if f_ == "fecha":
            c = F.date_format(c, "d/M/yyyy")
        elif f_ == "monto":
            c = F.format_number(F.round(c, 2), 2)
        else:
            c = F.trim(c.cast("string"))
        return F.coalesce(F.nullif(c, F.lit("")), F.lit("(vacío)"))

    changed_names = F.array_compact(
        F.array(*[F.when(field_changed(f_, src, dst), F.lit(label[f_])) for f_ in fields])
    )
    detalle = F.concat(F.lit("Cambios en: "), F.array_join(changed_names, ", "))
    old_vals = F.array_join(
        F.array_compact(
            F.array(*[
                F.when(field_changed(f_, src, dst), F.concat(F.lit(label[f_] + ": "), fmt(dst, f_)))
                for f_ in fields
            ])
        ),
        "; ",
    )
    new_vals = F.array_join(
        F.array_compact(
            F.array(*[
                F.when(field_changed(f_, src, dst), F.concat(F.lit(label[f_] + ": "), fmt(src, f_)))
                for f_ in fields
            ])
        ),
        "; ",
    )
    return detalle, old_vals, new_vals


def classify_upsert(
    source: DataFrame,
    dest: DataFrame,
    key: str = "folio",
    diff_fields: list[str] | None = None,
    src_table_col: str | None = None,
    dst_table_col: str | None = None,
) -> DataFrame:
    """J1 — the merge-join classification (Code.gs:768-771, 1159-1211).

    ``source`` must be deduped to ≤1 row/key (D1 runs first — the
    invariant that collapses the reference's in-run map mutation,
    SURVEY §4). Returns the joined frame with ``src.*``/``dst.*``
    struct columns plus an ``action`` column.

    When both table-tag columns are given, a key found in a different
    table than its classified method → ``move`` (J2/R1).
    """
    diff_fields = diff_fields or DIFF_FIELDS_OTHERS
    # shuffle-hash with the (deduped, delta-sized) source as build side:
    # the dest table is the big side at scale, and a sort-merge fallback
    # would sort BOTH sides on folio for a join whose build side always
    # fits (one run's delta). Full-outer can't broadcast, so SHJ is the
    # strongest plan available.
    s = source.alias("src").hint("shuffle_hash")
    d = dest.alias("dst")
    joined = s.join(d, on=F.col(f"src.{key}").eqNullSafe(F.col(f"dst.{key}")), how="full_outer")

    src_present = F.col(f"src.{key}").isNotNull()
    dst_present = F.col(f"dst.{key}").isNotNull()
    changed = any_field_changed(diff_fields)

    if src_table_col and dst_table_col:
        moved = src_present & dst_present & (
            F.col(f"src.{src_table_col}") != F.col(f"dst.{dst_table_col}")
        )
    else:
        moved = F.lit(False)

    action = (
        F.when(src_present & ~dst_present, F.lit(ACTION_INSERT))
        .when(~src_present & dst_present, F.lit(ACTION_DEST_ONLY))
        .when(moved, F.lit(ACTION_MOVE))
        .when(changed, F.lit(ACTION_UPDATE))
        .otherwise(F.lit(ACTION_UNCHANGED))
    )
    return joined.withColumn("action", action)


def merge_preserve(
    classified: DataFrame,
    key: str,
    script_cols: list[str],
    human_cols: list[str],
    drop_keys: DataFrame | None = None,
    insert_rows: DataFrame | None = None,
) -> DataFrame:
    """S3/S4 — materialize the post-merge state of one target table.

    For matched rows: script columns from source, human columns from
    destination, verbatim (Code.gs:1836-1844 writes only A–F). For
    source-only rows: insert with NULL human columns. Destination-only
    rows are kept untouched (the reference never deletes — T5), except
    keys in ``drop_keys`` (rows being moved out, R3). ``insert_rows``
    appends move-ins with their preserved human columns.
    """
    src_has = F.col(f"src.{key}").isNotNull()

    def pick(col: str) -> Column:
        if col == key:
            return F.coalesce(F.col(f"src.{key}"), F.col(f"dst.{key}"))
        if col in human_cols:
            return F.col(f"dst.{col}")
        return F.when(src_has, F.col(f"src.{col}")).otherwise(F.col(f"dst.{col}"))

    out_cols = [pick(c).alias(c) for c in ([key] + [c for c in script_cols if c != key] + human_cols)]
    result = classified.where(F.col("action") != ACTION_MOVE).select(*out_cols)
    if drop_keys is not None:
        result = result.join(drop_keys.select(F.col(key)), on=key, how="left_anti")
    if insert_rows is not None:
        result = result.unionByName(insert_rows, allowMissingColumns=True)
    return result
