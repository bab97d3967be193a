"""Row routing between targets & conflict handling (SURVEY.md §2.6,
J2/R1-R3) and deletion detection (§2.4 J3).

A payment-method change moves a row to another target — unless the
destination row carries protected human work, in which case it parks
in the review queue (Code.gs:1378-1496; policy
DOCUMENTACION_SISTEMA.md:331-354).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.parsing import coerce_checkbox
from ..schemas import TABLE_ORDER

#: Human-column layout per target (Code.gs:1501-1548): checkbox column
#: + free-text columns that constitute "manual work".
HUMAN_WORK_COLS: dict[str, tuple[str, list[str]]] = {
    "transfers": ("conciliado", ["concepto_banco", "observaciones"]),
    "cards": ("recibo", ["afiliacion", "lote", "observaciones"]),
    "cash": ("verificado", ["observaciones"]),
    "others": ("verificado", ["observaciones"]),
}


def has_manual_work(table: str, prefix: str = "") -> Column:
    """R2 — manual-work guard (Code.gs:1501-1548): checkbox truthy OR
    any human text column non-empty."""
    checkbox, texts = HUMAN_WORK_COLS[table]
    p = f"{prefix}." if prefix else ""
    cond = coerce_checkbox(F.col(f"{p}{checkbox}"))
    for t in texts:
        cond = cond | (F.trim(F.coalesce(F.col(f"{p}{t}").cast("string"), F.lit(""))) != "")
    return cond


def human_context(table: str) -> tuple[Column, Column, Column]:
    """Normalize a target's human columns to the common review-queue
    shape, mirroring verificarTrabajoManualGenerico
    (Code.gs:1501-1548): (conciliado boolean, concepto_banco string,
    observaciones string). Cards fold afiliación+lote into the
    concepto field exactly as the reference does (Code.gs:1523)."""
    checkbox, _texts = HUMAN_WORK_COLS[table]

    def trimmed(c: str) -> Column:
        return F.trim(F.coalesce(F.col(c).cast("string"), F.lit("")))

    conciliado = coerce_checkbox(F.col(checkbox))
    if table == "transfers":
        concepto = trimmed("concepto_banco")
    elif table == "cards":
        concepto = F.concat(
            F.lit("Afiliación: "), trimmed("afiliacion"),
            F.lit("; Lote: "), trimmed("lote"),
        )
    else:  # cash / others carry no bank-concept column (Code.gs:1533,1544)
        concepto = F.lit("")
    return conciliado, concepto, trimmed("observaciones")


def union_targets_tagged(targets: dict[str, DataFrame]) -> DataFrame:
    """J2 prep — union all destination targets with a ``table_tag``, a
    precomputed ``dest_has_work`` flag, and the normalized human
    context (so conflict routing can park the ACTUAL human values in
    the review queue, Code.gs:1425-1437), normalized to the common
    probe schema. Tag ordering column pins the reference's fixed
    first-match order T→C→E→O (Code.gs:1229-1240)."""
    parts = []
    for name in TABLE_ORDER:
        if name not in targets:
            continue
        df = targets[name]
        conciliado, concepto, obs = human_context(name)
        parts.append(
            df.select(
                "folio",
                F.col("fecha"),
                F.col("cliente"),
                F.col("servicio"),
                F.col("monto"),
                (F.col("banco") if "banco" in df.columns else F.lit(None).cast("string")).alias("banco"),
                F.lit(name).alias("table_tag"),
                F.lit(TABLE_ORDER.index(name)).alias("table_order"),
                has_manual_work(name).alias("dest_has_work"),
                conciliado.alias("dest_conciliado"),
                concepto.alias("dest_concepto_banco"),
                obs.alias("dest_observaciones"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def first_match_per_key(tagged: DataFrame, key: str = "folio") -> DataFrame:
    """J2 — collapse multi-table hits to the first match in the fixed
    probe order (min table_order wins) — still a single hash
    aggregate, no window shuffle.

    The winning row is picked ATOMICALLY: one lexicographic MIN over a
    (table_order, …all columns) struct, never independent per-column
    min_by aggregates. Per-column picks tie-break independently when a
    folio is duplicated WITHIN one table (same table_order — e.g. a
    human pastes a second row), stitching a chimera record out of two
    physical rows; the struct min always returns the fields of one
    real row, deterministically (full-row lexicographic tiebreak)."""
    cols = [c for c in tagged.columns if c not in (key, "table_order")]
    packed = F.min(F.struct(F.col("table_order"), *[F.col(c) for c in cols]))
    return tagged.groupBy(key).agg(packed.alias("_r")).select(
        key, *[F.col(f"_r.{c}").alias(c) for c in cols]
    )


def split_moves(moves: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R3 — split the move set by the R2 guard: (conflicts → review
    queue, auto_moves → delete-from-old + insert-to-new). The guard
    reads the destination's human columns, carried through the merge
    join (SURVEY §4 point 4)."""
    conflicts = moves.where(F.col("dst.dest_has_work"))
    auto = moves.where(~F.col("dst.dest_has_work"))
    return conflicts, auto


def detect_deletions(
    dest_in_window: DataFrame,
    source_found: DataFrame,
    key: str = "folio",
) -> DataFrame:
    """J3 — anti-join deletion detection (Code.gs:1258-1290): keys in a
    destination (dated inside the scan window) but absent from the
    source scan. Log-only; the engine NEVER auto-deletes
    (Code.gs:1246-1247)."""
    return dest_in_window.join(source_found.select(key).distinct(), on=key, how="left_anti")
