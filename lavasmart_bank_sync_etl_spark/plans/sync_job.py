"""SyncJob — the end-to-end incremental sync plan (SURVEY.md §3).

One parameterized job covers both reference entry points: the daily
run (window = [today−10, today], Code.gs:649-860) and arbitrary-range
backfill (Code.gs:873-1093). Strictly two-phase, mirroring the
reference's read/classify → apply split, which maps 1:1 onto Spark's
lazy-plan → action model:

  Phase 1 (lazy, one shuffle): clean → window → dedup(D1) → ONE
  full-outer merge join of the deduped source against the tag-unioned
  destinations → ``action`` classification {insert, update, unchanged,
  move, dest_only}. The classified plan is persisted so every split
  below reads the join output once (SURVEY §4 read-once phasing).

  Phase 2 (actions, fixed order — moves resolve before inserts so a
  moved folio is never double-written; guaranteed here by action
  exclusivity rather than the reference's map mutation,
  Code.gs:1143-1154): review-queue append, audit append (staged
  plan), then per-target retained-state rewrites followed by new-row
  appends — drops strictly before appends, for crash convergence.

Scale: destinations are read with only their merge-relevant columns;
the incremental source is a pruned date window, so AQE typically
broadcasts it against the big destination side. Null-safe key join
keeps skew bounded (folio is unique per destination — D1 guarantees
unique per source).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import merge as M
from ..operators.classify import null_guards, window_filter
from ..operators.dedup import first_wins_dedup
from ..operators.routing import first_match_per_key, union_targets_tagged
from ..schemas import (
    ACTION_CONFLICT,
    ACTION_DELETE_DETECTED,
    ACTION_DUPLICATE,
    ACTION_MOVE,
    ACTION_NEW,
    ACTION_UPDATE,
    METHOD_TO_TABLE,
    TABLE_ORDER,
    TARGETS,
)
from ..sources.warehouse import Warehouse

#: method string → destination table, as a SQL mapping expression.
def _target_table_expr(metodo: Column) -> Column:
    expr = F.lit(METHOD_TO_TABLE["OTROS"])
    for method, table in METHOD_TO_TABLE.items():
        expr = F.when(metodo == method, F.lit(table)).otherwise(expr)
    return expr


class SyncJob:
    """Run one sync over ``[start, end]`` (inclusive — T1/T4).

    ``run_id`` stamps the run's review/audit appends so a crashed-then-
    retried run (same run_id) replaces rather than duplicates them;
    the default fresh id preserves the reference's append-every-run
    behavior. Recovery contract: phase 2 is review-append →
    audit-append (staged plan) → retained-state rewrites (drops) →
    new-row appends; the rewrites are keyed (idempotent), the appends
    run_id-guarded and snapshot-atomic (``append_once``) with
    explicit preservation of own-run rows a replay no longer
    regenerates, and drops strictly precede appends so a mid-crash
    move can never leave a folio in two tables. Retrying a
    partially-applied run with its run_id therefore converges at
    every crash point (goldens in test_sync_job.py pin the queue
    cases; audit rows for already-applied changes survive via the
    (folio, accion) preservation anti-join)."""

    def __init__(
        self,
        spark,
        warehouse: Warehouse,
        start: dt.date | str,
        end: dt.date | str,
        run_id: str | None = None,
    ):
        self.spark = spark
        self.wh = warehouse
        self.start = dt.date.fromisoformat(start) if isinstance(start, str) else start
        self.end = dt.date.fromisoformat(end) if isinstance(end, str) else end
        self.run_id = run_id or uuid.uuid4().hex
        if self.start > self.end:
            raise ValueError(f"start {self.start} > end {self.end}")  # Code.gs:876-889

    # ------------------------------------------------------------------
    def run(self, source: DataFrame) -> dict[str, int]:
        """Execute the sync. ``source`` columns: folio, sale_date,
        cliente, servicio, monto, metodo (classified), banco,
        src_row_idx. Returns the A4 run summary counts.

        The whole run holds the store's single-writer lease when the
        backend exposes one (``lock()``), so two overlapping syncs on
        the same warehouse fail fast with ``ConcurrentWriterError``
        instead of interleaving reads and rewrites at call granularity
        (lost updates, cleared in-flight versions). Stores without a
        lease (test doubles, transactional engines) run unguarded —
        their own concurrency story applies."""
        lock = getattr(self.wh, "lock", None)
        if callable(lock):
            with lock():
                return self._run(source)
        return self._run(source)

    def _run(self, source: DataFrame) -> dict[str, int]:
        wh = self.wh
        wh.migrate_legacy()
        for t in TABLE_ORDER + ["audit_log", "review_queue"]:
            wh.ensure(t)

        # ---- phase 1: classify (lazy) --------------------------------
        src = null_guards(window_filter(source, self.start, self.end))
        winners, dups = first_wins_dedup(src, "folio", ["sale_date", "src_row_idx"])
        winners = winners.select(
            "folio",
            F.col("sale_date").alias("fecha"),
            "cliente", "servicio", "monto",
            F.coalesce("banco", F.lit("")).alias("banco"),
            _target_table_expr(F.col("metodo")).alias("target_table"),
            F.col("metodo_raw").alias("metodo_pago_raw"),
        )

        targets = {t: wh.read(t) for t in TABLE_ORDER}
        tagged = first_match_per_key(union_targets_tagged(targets), "folio")

        # shuffle_hash: same rationale as operators/merge.classify_upsert
        # — a sort-merge fallback would sort BOTH sides of the full-outer
        # join; hash build on the (windowed, smaller) source side wins.
        s = winners.alias("src").hint("shuffle_hash")
        d = tagged.alias("dst")
        joined = s.join(d, on=F.col("src.folio").eqNullSafe(F.col("dst.folio")), how="full_outer")

        # Review-queue resolution semantics (GUIA_REVISION_PENDIENTE.md:
        # 114-136): a folio with an UNRESOLVED review row (Estado=
        # 'Pendiente') is parked — the sync must not re-queue it, re-
        # insert it, or touch any destination copy until a human flips
        # the row to 'Resuelto', at which point it re-enters normal
        # processing (the pending move then applies as a plain insert
        # into its target).
        #
        # Crash-retry interplay (same run_id, the class recovery
        # contract): a Pendiente row THIS run wrote means this run's
        # earlier attempt already queued the folio. If the folio is
        # STILL in a destination, the crash hit between queue-append
        # (①) and the target rewrite (②) — the retry must re-classify
        # it as a conflict so ② completes and ① regenerates the same
        # queue row. If it is absent from every destination, ② already
        # applied — the retry parks it and step ① PRESERVES the
        # existing own-run queue row (the only live copy of the human
        # work) instead of letting the run_id-guarded replace drop it.
        # Parked folios are a human-scale set, so the lookup broadcasts.
        parked = (
            wh.read("review_queue")
            .where(F.col("estado") == "Pendiente")
            .groupBy("folio")
            .agg(
                F.max(
                    (F.col("run_id").eqNullSafe(F.lit(self.run_id))).cast("int")
                ).alias("_parked_own")
            )
            .select(F.col("folio").alias("_parked_folio"), "_parked_own")
        )
        joined = joined.join(
            F.broadcast(parked),
            F.coalesce(F.col("src.folio"), F.col("dst.folio"))
            == F.col("_parked_folio"),
            "left",
        )

        src_present = F.col("src.folio").isNotNull()
        dst_present = F.col("dst.folio").isNotNull()
        same_table = F.col("src.target_table") == F.col("dst.table_tag")
        changed = F.when(
            F.col("dst.table_tag") == "transfers",
            M.any_field_changed(M.DIFF_FIELDS_TRANSFERS),
        ).otherwise(M.any_field_changed(M.DIFF_FIELDS_OTHERS))

        parked_now = F.col("_parked_folio").isNotNull() & (
            (F.col("_parked_own") == 0) | ~dst_present
        )
        action = (
            F.when(parked_now, F.lit(M.ACTION_PARKED))
            .when(src_present & ~dst_present, F.lit(M.ACTION_INSERT))
            .when(~src_present & dst_present, F.lit(M.ACTION_DEST_ONLY))
            .when(~same_table, F.lit(M.ACTION_MOVE))
            .when(changed, F.lit(M.ACTION_UPDATE))
            .otherwise(F.lit(M.ACTION_UNCHANGED))
        )
        # Materialize the staged mutation plan to scratch parquet and
        # re-read it: a LINEAGE CUT. Phase 2 rewrites the very files the
        # plan was derived from, so nothing downstream may recompute
        # from the pre-rewrite targets (persist() is not enough — cache
        # eviction or refreshByPath would silently recompute against
        # post-rewrite state). This is the Spark form of the reference's
        # staged in-memory buffers (Code.gs:680-698).
        classified_plan = joined.select(
            F.struct(*[F.col(f"src.{c}").alias(c) for c in winners.columns]).alias("src"),
            F.struct(*[F.col(f"dst.{c}").alias(c) for c in tagged.columns]).alias("dst"),
            action.alias("action"),
        )
        scratch = os.path.join(wh.root, "_scratch_classified")
        classified_plan.write.mode("overwrite").parquet(scratch)
        classified = self.spark.read.parquet(scratch)

        dups_scratch = os.path.join(wh.root, "_scratch_dups")
        dups.write.mode("overwrite").parquet(dups_scratch)
        dups = self.spark.read.parquet(dups_scratch)

        # ---- derive splits -------------------------------------------
        is_move = F.col("action") == M.ACTION_MOVE
        conflicts = classified.where(is_move & F.col("dst.dest_has_work"))
        auto_moves = classified.where(is_move & ~F.col("dst.dest_has_work"))
        updates = classified.where(F.col("action") == M.ACTION_UPDATE)
        inserts = classified.where(F.col("action") == M.ACTION_INSERT)
        # J3 deletion set = dest-present ∧ src-absent, windowed. The
        # anti-join form (operators/routing.detect_deletions, the
        # standalone j3 query) is provably redundant HERE: both join
        # sides are unique per folio, so a src-NULL full-outer row's
        # folio cannot also appear in the source — the anti-join would
        # filter nothing while paying an extra scan of the scratch plan
        # plus a distinct. PARKED folios are included when they match
        # the same shape: parking freezes destination state and the
        # queue, but deletion detection is non-mutating telemetry (T5,
        # log-only) and must keep firing for a parked folio that
        # vanished from the source window, exactly as it did before the
        # parking rule outranked dest_only in the action cascade.
        deletions = classified.where(
            (F.col("action") == M.ACTION_DEST_ONLY)
            | (
                (F.col("action") == M.ACTION_PARKED)
                & F.col("src.folio").isNull()
                & F.col("dst.folio").isNotNull()
            )
        ).select("dst.*").where(
            F.col("fecha").between(F.lit(self.start), F.lit(self.end))
        )

        # ---- phase 2: apply (fixed order) ----------------------------
        # Scratch survives a phase-2 failure only until the next run's
        # overwrite, but a failed run must not leave multi-GB scratch
        # copies sitting inside the warehouse root indefinitely.
        try:
            summary = self._apply(
                classified, conflicts, auto_moves, updates, inserts, deletions, dups
            )
        finally:
            for p in (scratch, dups_scratch):
                if os.path.isdir(p):
                    shutil.rmtree(p)
        return summary

    # ------------------------------------------------------------------
    def _src_as_target_row(self, df: DataFrame, table: str) -> DataFrame:
        """Project src-side values into one target's full schema with
        NULL human columns (S3 insert shape)."""
        schema, script_cols, human_cols = TARGETS[table]
        sel: list[Column] = []
        for f_ in schema.fields:
            if f_.name == "metodo_pago_raw":
                sel.append(F.coalesce(F.col("src.metodo_pago_raw"), F.lit("(vacío)")).alias(f_.name))
            elif f_.name in script_cols:
                sel.append(F.col(f"src.{f_.name}").alias(f_.name))
            else:
                sel.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        return df.select(*sel)

    def _apply(
        self,
        classified: DataFrame,
        conflicts: DataFrame,
        auto_moves: DataFrame,
        updates: DataFrame,
        inserts: DataFrame,
        deletions: DataFrame,
        dups: DataFrame,
    ) -> dict[str, int]:
        wh = self.wh
        now = F.current_timestamp()

        # ⓪ A4 counts — ONE driver action: the per-action groupBy and the
        #    four side-output counts union into a single labeled-count
        #    plan over the scratch-backed inputs (5 collect/count jobs
        #    would re-launch scheduling overhead per sync run for no
        #    benefit — everything reads already-materialized scratch)
        def _cnt(df: DataFrame, label: str) -> DataFrame:
            return df.agg(F.count(F.lit(1)).alias("count")).select(
                F.lit(label).alias("action"), "count"
            )

        # Per-target append counts ride the same single action: pass B
        # below needs "any rows for this table?" and probing each
        # union plan with take(1) would launch one extra job per table
        # per run re-reading scratch just to answer yes/no.
        append_sizes = (
            inserts.select(F.col("src.target_table").alias("t"))
            .unionByName(auto_moves.select(F.col("src.target_table").alias("t")))
            .groupBy("t").count()
            .select(F.concat(F.lit("_append_"), F.col("t")).alias("action"), "count")
        )
        summary = (
            classified.groupBy("action").count()
            .unionByName(_cnt(conflicts, "conflicts"))
            .unionByName(_cnt(auto_moves, "auto_moves"))
            .unionByName(_cnt(deletions, "deletions_detected"))
            .unionByName(_cnt(dups, "duplicates"))
            .unionByName(append_sizes)
        )
        counts: dict[str, int] = {r["action"]: r["count"] for r in summary.collect()}
        append_counts = {
            k[len("_append_"):]: counts.pop(k)
            for k in [k for k in counts if k.startswith("_append_")]
        }

        # ① review-queue append for conflicted moves (S6; Code.gs:1422-1437).
        #    The parked row carries the destination's ACTUAL human work —
        #    checkbox state as Sí/No plus the normalized concepto/observa-
        #    ciones (routing.human_context) — because step ② drops the row
        #    from its old table, so this snapshot is the only live copy.
        review_rows = conflicts.select(
            now.alias("ts"),
            F.col("src.folio").alias("folio"),
            F.concat(
                F.lit("Cambio de método de pago con trabajo manual: "),
                F.col("dst.table_tag"), F.lit(" → "), F.col("src.target_table"),
            ).alias("conflicto"),
            F.col("dst.table_tag").alias("hoja_origen"),
            F.col("src.target_table").alias("hoja_destino"),
            F.col("src.fecha").alias("fecha"),
            F.col("src.cliente").alias("cliente"),
            F.col("src.servicio").alias("servicio"),
            F.col("src.monto").alias("monto"),
            F.col("src.banco").alias("banco"),
            F.when(F.col("dst.dest_conciliado"), F.lit("Sí")).otherwise(F.lit("No")).alias("conciliado"),
            F.col("dst.dest_concepto_banco").alias("concepto_banco"),
            F.col("dst.dest_observaciones").alias("observaciones"),
            F.lit("Pendiente").alias("estado"),
            F.lit(self.run_id).alias("run_id"),
        )
        # Crash-after-② recovery: folios this run PARKED because their
        # own-run queue row exists and the targets were already
        # rewritten must keep that row through the run_id-guarded
        # replace below — it is the only live copy of the parked human
        # work. (Normal runs: no own-run rows exist, this is empty.)
        #
        # Own-run rows a human already flipped OFF 'Pendiente' are
        # preserved UNCONDITIONALLY: once resolved, the folio is no
        # longer parked (it re-enters processing and won't be in
        # parked_folios), but the Resuelto row is the permanent record
        # of the human decision — the guía contract says queue rows are
        # never deleted, only marked Resuelto, so a same-run_id retry
        # must not let the replace erase it.
        own_queue = wh.read("review_queue").where(
            F.col("run_id").eqNullSafe(F.lit(self.run_id))
        )
        parked_folios = classified.where(
            F.col("action") == M.ACTION_PARKED
        ).select(F.coalesce(F.col("src.folio"), F.col("dst.folio")).alias("folio"))
        preserved = (
            own_queue.where(F.coalesce(F.col("estado"), F.lit("")) == "Pendiente")
            .join(parked_folios, "folio", "leftsemi")
            .unionByName(
                own_queue.where(F.coalesce(F.col("estado"), F.lit("")) != "Pendiente")
            )
        )
        wh.append_once(
            "review_queue", review_rows.unionByName(preserved), self.run_id
        )

        # ② audit appends (S5 + C4) — written BEFORE the state
        #    rewrites: the rows describe the STAGED plan, so a crash
        #    after this append but before the rewrites replays to an
        #    identical plan (state untouched) and regenerates the same
        #    rows, while a crash AFTER some rewrites would otherwise
        #    lose the record of every change that did apply (the retry
        #    re-classifies applied changes as 'unchanged' and the
        #    run_id-guarded replace would drop their rows). Rows the
        #    replay no longer regenerates — same-run (folio, accion)
        #    keys absent from the new set — are explicitly preserved.
        det, old_v, new_v = M.change_narrative(M.DIFF_FIELDS_TRANSFERS)
        det_o, old_o, new_o = M.change_narrative(M.DIFF_FIELDS_OTHERS)
        is_tr = F.col("dst.table_tag") == "transfers"
        audit_updates = updates.select(
            now.alias("ts"), F.col("src.folio").alias("folio"),
            F.lit(ACTION_UPDATE).alias("accion"),
            F.when(is_tr, det).otherwise(det_o).alias("detalle"),
            F.when(is_tr, old_v).otherwise(old_o).alias("valores_anteriores"),
            F.when(is_tr, new_v).otherwise(new_o).alias("valores_nuevos"),
        )
        audit_inserts = inserts.select(
            now.alias("ts"), F.col("src.folio").alias("folio"),
            F.lit(ACTION_NEW).alias("accion"),
            F.concat(F.lit("Alta en "), F.col("src.target_table")).alias("detalle"),
            F.lit("").alias("valores_anteriores"),
            F.concat_ws(
                "; ",
                F.concat(F.lit("Fecha: "), F.date_format("src.fecha", "d/M/yyyy")),
                F.concat(F.lit("Monto: "), F.format_number(F.round("src.monto", 2), 2)),
            ).alias("valores_nuevos"),
        )
        audit_moves = auto_moves.select(
            now.alias("ts"), F.col("src.folio").alias("folio"),
            F.lit(ACTION_MOVE).alias("accion"),
            F.concat(F.col("dst.table_tag"), F.lit(" → "), F.col("src.target_table")).alias("detalle"),
            F.col("dst.table_tag").alias("valores_anteriores"),
            F.col("src.target_table").alias("valores_nuevos"),
        )
        # Conflict audit rows carry the parked human context, mirroring
        # registrarEnBitacora for the conflict branch (Code.gs:1441-1446).
        audit_conflicts = conflicts.select(
            now.alias("ts"), F.col("src.folio").alias("folio"),
            F.lit(ACTION_CONFLICT).alias("accion"),
            F.concat(
                F.lit("Trabajo manual protegido; enviado a revisión ("),
                F.col("dst.table_tag"), F.lit(" → "), F.col("src.target_table"), F.lit(")"),
            ).alias("detalle"),
            F.concat(
                F.lit("Conciliado: "),
                F.when(F.col("dst.dest_conciliado"), F.lit("Sí")).otherwise(F.lit("No")),
                F.lit("; "), F.col("dst.dest_concepto_banco"),
            ).alias("valores_anteriores"),
            F.concat(F.lit("Movido a revisión: "), F.col("src.target_table")).alias("valores_nuevos"),
        )
        audit_deletions = deletions.select(
            now.alias("ts"), F.col("folio"),
            F.lit(ACTION_DELETE_DETECTED).alias("accion"),
            F.lit("Presente en destino, ausente en origen dentro de la ventana").alias("detalle"),
            F.col("table_tag").alias("valores_anteriores"),
            F.lit("").alias("valores_nuevos"),
        )
        audit_dups = dups.select(
            now.alias("ts"), F.col("folio"),
            F.lit(ACTION_DUPLICATE).alias("accion"),
            F.concat(F.lit("Folio duplicado en origen; gana la primera aparición")).alias("detalle"),
            F.lit("").alias("valores_anteriores"),
            F.lit("").alias("valores_nuevos"),
        )
        audit = (
            audit_updates.unionByName(audit_inserts).unionByName(audit_moves)
            .unionByName(audit_conflicts).unionByName(audit_deletions).unionByName(audit_dups)
        ).withColumn("run_id", F.lit(self.run_id))
        # Preservation is (folio, accion)-keyed, EXCEPT within the
        # state-mutation class {ACTUALIZACIÓN, NUEVO, CAMBIO MÉTODO
        # PAGO}: a run applies at most ONE final-state mutation per
        # folio, so a replay that re-records the folio's mutation under
        # a different accion supersedes the stale row rather than
        # coexisting with it. (A move that crashed between the pass-A
        # drop and the pass-B append replays as a plain insert — the
        # retry's NUEVO row must replace the stale MOVIDO row, or the
        # bitácora double-counts one physical change. Telemetry accions
        # — duplicates, deletions, conflicts — are independent events
        # and stay (folio, accion)-keyed.)
        mutation_class = [ACTION_UPDATE, ACTION_NEW, ACTION_MOVE]
        own_stale = (
            wh.read("audit_log")
            .where(F.col("run_id").eqNullSafe(F.lit(self.run_id)))
            .join(audit.select("folio", "accion"), ["folio", "accion"], "left_anti")
        )
        new_mutated_folios = audit.where(
            F.col("accion").isin(mutation_class)
        ).select("folio")
        preserved_audit = (
            own_stale.where(F.col("accion").isin(mutation_class))
            .join(new_mutated_folios, "folio", "left_anti")
            .unionByName(own_stale.where(~F.col("accion").isin(mutation_class)))
        )
        wh.append_once(
            "audit_log", audit.unionByName(preserved_audit), self.run_id
        )

        # ③ per-target state apply, split into two passes for crash
        #    convergence: pass A rewrites every table's RETAINED state
        #    (updates in place, moved-out rows dropped) before pass B
        #    appends any NEW rows (inserts + auto-move-ins). The old
        #    single combined rewrite had a window where a crash between
        #    "new table rewritten with the move-in" and "old table
        #    rewritten without the move-out" left the folio duplicated
        #    across two tables — and invisible to the retry, because the
        #    first-match collapse hides the stale copy. With drops
        #    strictly before appends, a mid-crash folio is at worst
        #    absent from every table, and the retry re-classifies it as
        #    a plain insert — convergent at every crash point.
        for table in TABLE_ORDER:  # pass A: retained-state rewrite
            schema, script_cols, human_cols = TARGETS[table]
            dest = wh.read(table).alias("dcur")
            plan = classified.where(F.col("dst.table_tag") == table).select(
                F.col("dst.folio").alias("folio"),
                F.col("action").alias("_action"),
                *[F.col(f"src.{c}").alias(f"_new_{c}") for c in script_cols if c != "folio"],
            )
            merged = dest.join(plan, on="folio", how="left")
            kept = merged.where(
                F.coalesce(F.col("_action"), F.lit("")) != F.lit(M.ACTION_MOVE)
            )
            out_cols = []
            for f_ in schema.fields:
                if f_.name == "folio":
                    out_cols.append(F.col("folio"))
                elif f_.name in script_cols:
                    # metodo_pago_raw keeps the insert path's '(vacío)'
                    # default on UPDATE too — a NULL raw method from a
                    # canonical-parquet source must not overwrite the
                    # stored placeholder with NULL
                    new_v = F.col(f"_new_{f_.name}")
                    if f_.name == "metodo_pago_raw":
                        new_v = F.coalesce(new_v, F.lit("(vacío)"))
                    out_cols.append(
                        F.when(
                            F.col("_action") == M.ACTION_UPDATE, new_v
                        ).otherwise(F.col(f"dcur.{f_.name}")).alias(f_.name)
                    )
                else:
                    out_cols.append(F.col(f"dcur.{f_.name}").alias(f_.name))
            wh.rewrite(table, kept.select(*out_cols))

        for table in TABLE_ORDER:  # pass B: append new rows
            if not append_counts.get(table):  # skip the empty-file append
                continue
            ins = self._src_as_target_row(
                inserts.where(F.col("src.target_table") == table), table
            )
            move_ins = self._src_as_target_row(
                auto_moves.where(F.col("src.target_table") == table), table
            )
            wh.append(table, ins.unionByName(move_ins))

        # ④ A4 run summary (Code.gs:846-854) — counts taken in ⓪,
        #    persisted as one run_id-keyed run_log row (the reference
        #    logs its summary to ephemeral console output; a durable
        #    table makes longitudinal runs queryable). Last phase-2
        #    step on purpose: a crash anywhere earlier leaves no row,
        #    and the same-run_id retry writes the converged attempt's
        #    counts — append_once keeps exactly one row per run.
        from ..sources.warehouse import RUN_LOG

        summary_row = self.spark.createDataFrame(
            [(
                self.run_id, dt.datetime.now(), self.start, self.end,
                counts.get("insert", 0), counts.get("update", 0),
                counts.get("unchanged", 0), counts.get("move", 0),
                counts.get("dest_only", 0), counts.get("parked", 0),
                counts.get("conflicts", 0), counts.get("auto_moves", 0),
                counts.get("deletions_detected", 0), counts.get("duplicates", 0),
            )],
            RUN_LOG,
        )
        wh.append_once("run_log", summary_row, self.run_id)
        return counts
