"""Golden ETL scenarios (SURVEY.md §5.2) — the reference's behavioral
invariants as end-to-end sync tests over a tmp warehouse:

  insert / update-preserving-human-cols (requerimientos.md:184 PoC) /
  money-tolerance boundary / move without manual work / conflict with
  manual work → review queue / deletion log-only / duplicate first-wins
  / rerun idempotence (requerimientos.md:169).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType, DoubleType, LongType, StringType, StructField, StructType,
)

from lavasmart_bank_sync_etl_spark.operators.classify import classify_method
from lavasmart_bank_sync_etl_spark.plans.sync_job import SyncJob
from lavasmart_bank_sync_etl_spark.schemas import (
    ACTION_CONFLICT, ACTION_DELETE_DETECTED, ACTION_DUPLICATE, ACTION_MOVE,
    ACTION_NEW, ACTION_UPDATE,
)
from lavasmart_bank_sync_etl_spark.sources.catalog_store import CatalogStore
from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

SRC_SCHEMA = StructType([
    StructField("folio", StringType()),
    StructField("sale_date", DateType()),
    StructField("cliente", StringType()),
    StructField("servicio", StringType()),
    StructField("monto", DoubleType()),
    StructField("metodo_raw", StringType()),
    StructField("banco", StringType()),
    StructField("src_row_idx", LongType()),
])

D = dt.date
WIN = ("2025-11-01", "2025-11-10")


def src_df(spark, rows):
    df = spark.createDataFrame(rows, SRC_SCHEMA)
    return df.withColumn("metodo", classify_method(F.col("metodo_raw")))


def row(folio, day, monto=100.0, metodo="TRANSFERENCIA", cliente="Ana", servicio="Sala",
        banco="SANTANDER", idx=0):
    return (folio, D(2025, 11, day), cliente, servicio, monto, metodo, banco, idx)


@pytest.fixture(params=[Warehouse, CatalogStore])
def wh(request, spark, tmp_path):
    """Every golden scenario runs against BOTH TableStore
    implementations — the storage seam is only proven if SyncJob's
    behavior is identical through either backend."""
    return request.param(spark, str(tmp_path / "wh"))


def run(spark, wh, rows, start=WIN[0], end=WIN[1]):
    return SyncJob(spark, wh, start, end).run(src_df(spark, rows))


def folios(wh, table):
    return {r["folio"]: r.asDict() for r in wh.read(table).collect()}


def audit_actions(wh):
    return [(r["folio"], r["accion"]) for r in wh.read("audit_log").collect()]


def test_insert_new_folio(spark, wh):
    counts = run(spark, wh, [row("0-1", 2), row("0-2", 3, metodo="tarjeta CREDITO")])
    assert counts.get("insert") == 2
    assert "0-1" in folios(wh, "transfers")
    assert "0-2" in folios(wh, "cards")


def test_update_preserves_human_columns(spark, wh):
    run(spark, wh, [row("0-1", 2, monto=550.0)])
    # human annotates
    t = wh.read("transfers").withColumn("conciliado", F.lit(True)).withColumn(
        "observaciones", F.lit("revisado por Ana")
    )
    wh.rewrite("transfers", t)
    counts = run(spark, wh, [row("0-1", 2, monto=990.0)])
    assert counts.get("update") == 1
    got = folios(wh, "transfers")["0-1"]
    assert got["monto"] == 990.0
    assert got["conciliado"] is True
    assert got["observaciones"] == "revisado por Ana"
    assert ("0-1", ACTION_UPDATE) in audit_actions(wh)


def test_money_tolerance_boundary(spark, wh):
    run(spark, wh, [row("0-1", 2, monto=100.0)])
    c1 = run(spark, wh, [row("0-1", 2, monto=100.009)])
    assert c1.get("update") is None and c1.get("unchanged") == 1
    c2 = run(spark, wh, [row("0-1", 2, monto=100.011)])
    assert c2.get("update") == 1


def test_method_change_without_work_moves(spark, wh):
    run(spark, wh, [row("0-1", 2)])
    counts = run(spark, wh, [row("0-1", 2, metodo="EFECTIVO")])
    assert counts.get("auto_moves") == 1
    assert "0-1" not in folios(wh, "transfers")
    assert "0-1" in folios(wh, "cash")
    assert ("0-1", ACTION_MOVE) in audit_actions(wh)


def test_method_change_with_work_goes_to_review(spark, wh):
    run(spark, wh, [row("0-1", 2)])
    t = wh.read("transfers").withColumn("concepto_banco", F.lit("SPEI RECIBIDO 123"))
    wh.rewrite("transfers", t)
    counts = run(spark, wh, [row("0-1", 2, metodo="EFECTIVO")])
    assert counts.get("conflicts") == 1
    assert "0-1" not in folios(wh, "transfers")   # removed from old
    assert "0-1" not in folios(wh, "cash")        # NOT auto-inserted
    rq = {r["folio"]: r.asDict() for r in wh.read("review_queue").collect()}
    assert rq["0-1"]["estado"] == "Pendiente"
    assert rq["0-1"]["hoja_origen"] == "transfers"
    assert rq["0-1"]["hoja_destino"] == "cash"
    # The parked row carries the ACTUAL human values (Code.gs:1425-1437):
    # checkbox state as Sí/No plus the destination's concepto/observaciones
    # — the only live copy once the old-table row is dropped.
    assert rq["0-1"]["conciliado"] == "No"
    assert rq["0-1"]["concepto_banco"] == "SPEI RECIBIDO 123"
    assert rq["0-1"]["observaciones"] == ""
    assert ("0-1", ACTION_CONFLICT) in audit_actions(wh)


def test_review_queue_carries_checkbox_and_cards_context(spark, wh):
    """Conflicts out of cards fold afiliación+lote into concepto_banco
    and report the recibo checkbox as conciliado (Code.gs:1513-1524)."""
    run(spark, wh, [row("0-1", 2, metodo="TARJETA")])
    c = (wh.read("cards")
         .withColumn("recibo", F.lit(True))
         .withColumn("afiliacion", F.lit("AF-77"))
         .withColumn("lote", F.lit("L-9")))
    wh.rewrite("cards", c)
    counts = run(spark, wh, [row("0-1", 2, metodo="EFECTIVO")])
    assert counts.get("conflicts") == 1
    rq = {r["folio"]: r.asDict() for r in wh.read("review_queue").collect()}
    assert rq["0-1"]["conciliado"] == "Sí"
    assert rq["0-1"]["concepto_banco"] == "Afiliación: AF-77; Lote: L-9"
    audit = {(r["folio"], r["accion"]): r.asDict() for r in wh.read("audit_log").collect()}
    prev = audit[("0-1", ACTION_CONFLICT)]["valores_anteriores"]
    assert "Conciliado: Sí" in prev and "AF-77" in prev


def test_deletion_detected_but_never_deleted(spark, wh):
    run(spark, wh, [row("0-1", 2), row("0-2", 3)])
    counts = run(spark, wh, [row("0-1", 2)])  # 0-2 vanished from source
    assert counts.get("deletions_detected") == 1
    assert "0-2" in folios(wh, "transfers")  # log-only, row survives
    assert ("0-2", ACTION_DELETE_DETECTED) in audit_actions(wh)


def test_duplicate_folio_first_wins(spark, wh):
    counts = run(spark, wh, [
        row("0-1", 2, monto=100.0, idx=0),
        row("0-1", 2, monto=999.0, idx=1),   # later scan position loses
    ])
    assert counts.get("duplicates") == 1
    assert folios(wh, "transfers")["0-1"]["monto"] == 100.0
    assert ("0-1", ACTION_DUPLICATE) in audit_actions(wh)


def test_rerun_idempotent(spark, wh):
    rows = [row("0-1", 2), row("0-2", 3, metodo="EFECTIVO"), row("0-3", 4, metodo="tarjeta")]
    run(spark, wh, rows)
    counts = run(spark, wh, rows)
    assert counts.get("insert") is None and counts.get("update") is None
    assert counts.get("unchanged") == 3
    assert wh.read("transfers").count() == 1
    assert wh.read("cards").count() == 1
    assert wh.read("cash").count() == 1


def test_window_excludes_out_of_range(spark, wh):
    counts = run(spark, wh, [row("0-1", 2), ("0-9", D(2025, 10, 1), "Ana", "Sala", 5.0,
                                             "TRANSFERENCIA", "BBVA", 0)])
    assert counts.get("insert") == 1
    assert "0-9" not in folios(wh, "transfers")


def test_others_keeps_raw_method(spark, wh):
    run(spark, wh, [row("0-1", 2, metodo="cheque nominativo")])
    got = folios(wh, "others")["0-1"]
    assert got["metodo_pago_raw"] == "cheque nominativo"


def test_backfill_range_validation(spark, wh):
    with pytest.raises(ValueError):
        SyncJob(spark, wh, "2025-11-10", "2025-11-01")


def test_banco_monitored_only_for_transfers(spark, wh):
    """C1 vs C2 (Code.gs:1341-1373): banco is a monitored diff field
    for transfers but not for cards — cards don't even store it."""
    run(spark, wh, [row("0-1", 2, banco="SANTANDER"),
                    row("0-2", 3, metodo="tarjeta", banco="SANTANDER")])
    counts = run(spark, wh, [row("0-1", 2, banco="BBVA"),
                             row("0-2", 3, metodo="tarjeta", banco="BBVA")])
    assert counts.get("update") == 1        # the transfer
    assert counts.get("unchanged") == 1     # the card ignores banco
    assert folios(wh, "transfers")["0-1"]["banco"] == "BBVA"


def test_banco_change_in_audit_narrative(spark, wh):
    """C4 (Code.gs:2078-2116): the update audit names the changed
    field and carries old/new values."""
    run(spark, wh, [row("0-1", 2, banco="SANTANDER")])
    run(spark, wh, [row("0-1", 2, banco="BBVA")])
    entries = [r.asDict() for r in wh.read("audit_log").collect()
               if r["folio"] == "0-1" and r["accion"] == ACTION_UPDATE]
    assert len(entries) == 1
    assert "Banco" in entries[0]["detalle"]
    assert "SANTANDER" in entries[0]["valores_anteriores"]
    assert "BBVA" in entries[0]["valores_nuevos"]


def test_parked_conflict_lifecycle(spark, wh):
    """Review-queue resolution contract (GUIA_REVISION_PENDIENTE.md:
    114-136): an unresolved conflict parks its folio — re-syncing it
    while Estado='Pendiente' must neither append a second queue row nor
    re-insert the row into any target ("¿El sistema vuelve a mover
    registros que ya resolví? No... no lo volverá a procesar
    automáticamente" applies a fortiori while still unresolved: "El
    registro se queda en la hoja de revisión hasta que lo resuelvas").
    Once a human flips the row to 'Resuelto', the folio re-enters
    normal processing and the next sync applies the pending move
    (Code.gs:1378-1496 conflict branch + guía)."""
    run(spark, wh, [row("0-1", 2)])
    t = wh.read("transfers").withColumn("concepto_banco", F.lit("SPEI 123"))
    wh.rewrite("transfers", t)
    counts = run(spark, wh, [row("0-1", 2, metodo="EFECTIVO")])  # → queue
    assert counts.get("conflicts") == 1

    # rerun while Pendiente: fully parked — no 2nd queue row, no insert
    counts = run(spark, wh, [row("0-1", 2, metodo="EFECTIVO")])
    assert counts.get("parked") == 1
    assert not counts.get("insert") and not counts.get("conflicts")
    assert "0-1" not in folios(wh, "cash")
    assert "0-1" not in folios(wh, "transfers")
    queue = wh.read("review_queue").where(F.col("folio") == "0-1").collect()
    assert len(queue) == 1  # still exactly one parked snapshot
    assert queue[0]["estado"] == "Pendiente"
    assert queue[0]["concepto_banco"] == "SPEI 123"  # context preserved

    # human resolves: flip Estado in place (the guía's workflow — rows
    # are never deleted from the queue, only marked Resuelto)
    resolved = wh.read("review_queue").withColumn(
        "estado",
        F.when(F.col("folio") == "0-1", F.lit("Resuelto")).otherwise(F.col("estado")),
    )
    wh.rewrite("review_queue", resolved)

    # next sync re-processes the folio: the pending move applies
    counts = run(spark, wh, [row("0-1", 2, metodo="EFECTIVO")])
    assert counts.get("insert") == 1
    assert not counts.get("parked")
    assert "0-1" in folios(wh, "cash")
    queue = wh.read("review_queue").where(F.col("folio") == "0-1").collect()
    assert len(queue) == 1  # history kept, no re-queue
    assert queue[0]["estado"] == "Resuelto"


def test_same_run_id_retry_preserves_parked_snapshot(spark, wh):
    """Crash-recovery x parking, case 'crash after the target rewrite'
    (or full completion): retrying a conflict run under its OWN run_id
    finds the folio absent from every destination with its own
    Pendiente queue row — it must park the folio and PRESERVE that
    queue row through the run_id-guarded replace, never delete the
    only live copy of the human work or re-insert the folio clean."""
    run(spark, wh, [row("0-1", 2)])
    t = wh.read("transfers").withColumn("concepto_banco", F.lit("SPEI 77"))
    wh.rewrite("transfers", t)
    src = src_df(spark, [row("0-1", 2, metodo="EFECTIVO")])
    counts = SyncJob(spark, wh, WIN[0], WIN[1], run_id="runX").run(src)
    assert counts.get("conflicts") == 1
    counts = SyncJob(spark, wh, WIN[0], WIN[1], run_id="runX").run(src)
    assert counts.get("parked") == 1 and not counts.get("conflicts")
    assert "0-1" not in folios(wh, "cash")
    queue = wh.read("review_queue").where(F.col("folio") == "0-1").collect()
    assert len(queue) == 1
    assert queue[0]["estado"] == "Pendiente"
    assert queue[0]["concepto_banco"] == "SPEI 77"
    # a FRESH run_id also sees it parked and leaves the queue alone
    counts = SyncJob(spark, wh, WIN[0], WIN[1], run_id="runY").run(src)
    assert counts.get("parked") == 1 and not counts.get("conflicts")
    queue = wh.read("review_queue").where(F.col("folio") == "0-1").collect()
    assert len(queue) == 1 and queue[0]["concepto_banco"] == "SPEI 77"


def test_same_run_id_retry_replays_conflict_when_rewrite_never_ran(spark, wh):
    """Crash-recovery x parking, case 'crash between queue-append and
    target rewrite': the folio still sits in its old table with the
    manual work AND has this run's own Pendiente queue row. The retry
    must re-classify it as a CONFLICT (not parked) so the rewrite
    completes and the queue converges to exactly one snapshot."""
    run(spark, wh, [row("0-2", 3)])
    t = wh.read("transfers").withColumn("concepto_banco", F.lit("SPEI 88"))
    wh.rewrite("transfers", t)
    # hand-plant the queue row a crashed 'runB' would have left behind
    schema = wh.read("review_queue").schema
    crashed_row = spark.createDataFrame(
        [(None, "0-2", "Cambio de método de pago con trabajo manual: transfers → cash",
          "transfers", "cash", D(2025, 11, 3), "Ana", "Sala", 100.0,
          "SANTANDER", "No", "SPEI 88", "", "Pendiente", "runB")],
        schema,
    )
    wh.append("review_queue", crashed_row)
    counts = SyncJob(spark, wh, WIN[0], WIN[1], run_id="runB").run(
        src_df(spark, [row("0-2", 3, metodo="EFECTIVO")])
    )
    assert counts.get("conflicts") == 1 and not counts.get("parked")
    assert "0-2" not in folios(wh, "transfers")  # rewrite completed
    assert "0-2" not in folios(wh, "cash")
    queue = wh.read("review_queue").where(F.col("folio") == "0-2").collect()
    assert len(queue) == 1  # converged: replaced, not duplicated
    assert queue[0]["estado"] == "Pendiente"
    assert queue[0]["concepto_banco"] == "SPEI 88"


def test_parked_folio_resolution_applies_latest_source_values(spark, wh):
    """While a folio sits parked, the SOURCE may keep changing; the
    guía's contract says the system must not touch the folio during
    that time — and once a human resolves it, the next sync processes
    the folio fresh, so the row that lands in the target carries the
    LATEST source values, not the ones frozen in the review snapshot
    (the queue row keeps its historical values as the audit trail)."""
    run(spark, wh, [row("0-1", 2, monto=100.0)])
    t = wh.read("transfers").withColumn("concepto_banco", F.lit("SPEI 9"))
    wh.rewrite("transfers", t)
    run(spark, wh, [row("0-1", 2, monto=100.0, metodo="EFECTIVO")])  # park
    # source drifts while parked: amount changes twice; both runs frozen
    counts = run(spark, wh, [row("0-1", 2, monto=150.0, metodo="EFECTIVO")])
    assert counts.get("parked") == 1
    counts = run(spark, wh, [row("0-1", 2, monto=175.5, metodo="EFECTIVO")])
    assert counts.get("parked") == 1
    assert "0-1" not in folios(wh, "cash")
    resolved = wh.read("review_queue").withColumn("estado", F.lit("Resuelto"))
    wh.rewrite("review_queue", resolved)
    run(spark, wh, [row("0-1", 2, monto=175.5, metodo="EFECTIVO")])
    got = folios(wh, "cash")["0-1"]
    assert got["monto"] == 175.5  # latest source wins after resolution
    rq = wh.read("review_queue").collect()
    assert len(rq) == 1 and rq[0]["monto"] == 100.0  # snapshot unchanged


def test_mid_move_crash_state_converges_on_retry(spark, wh):
    """Phase-2 orders drops strictly before appends, so the only state
    a crash mid-move can leave is 'absent from every table' (never
    duplicated across two). A retry over that state must re-classify
    the folio as a plain insert into its target — one copy, converged."""
    run(spark, wh, [row("0-1", 2)])  # lives in transfers, no work
    # simulate the mid-move crash: old-table drop committed, new-table
    # append not yet run
    t = wh.read("transfers").where(F.col("folio") != "0-1")
    wh.rewrite("transfers", t)
    counts = run(spark, wh, [row("0-1", 2, metodo="EFECTIVO")])
    assert counts.get("insert") == 1
    assert "0-1" in folios(wh, "cash")
    assert "0-1" not in folios(wh, "transfers")


def test_audit_survives_same_run_id_replay_of_applied_changes(spark, wh):
    """Audit is written BEFORE the state rewrites and own-run rows the
    replay no longer regenerates are preserved: retrying a completed
    run under its run_id re-classifies its update as 'unchanged', but
    the ACTUALIZACIÓN row it originally wrote must survive the
    run_id-guarded replace — the warehouse can't show a changed value
    with no bitácora record."""
    run(spark, wh, [row("0-1", 2, monto=100.0)])
    src = src_df(spark, [row("0-1", 2, monto=990.0)])
    SyncJob(spark, wh, WIN[0], WIN[1], run_id="runU").run(src)
    assert folios(wh, "transfers")["0-1"]["monto"] == 990.0
    assert ("0-1", ACTION_UPDATE) in audit_actions(wh)
    # replay: the update is already applied -> classified unchanged,
    # yet its audit row survives
    SyncJob(spark, wh, WIN[0], WIN[1], run_id="runU").run(src)
    audit = [
        r for r in wh.read("audit_log").collect()
        if r["folio"] == "0-1" and r["accion"] == ACTION_UPDATE
    ]
    assert len(audit) == 1
    assert audit[0]["run_id"] == "runU"


def test_same_run_id_retry_after_resolution_keeps_resolved_row(spark, wh):
    """A human may flip the queue row to 'Resuelto' between a crashed
    run and its retry. The retry then classifies the folio as a plain
    insert (no longer parked), but the Resuelto row is the permanent
    record of the human decision — the run_id-guarded replace must
    preserve it, not erase the only copy of the resolution history."""
    run(spark, wh, [row("0-1", 2)])
    t = wh.read("transfers").withColumn("concepto_banco", F.lit("SPEI 123"))
    wh.rewrite("transfers", t)
    src = src_df(spark, [row("0-1", 2, metodo="EFECTIVO")])
    SyncJob(spark, wh, WIN[0], WIN[1], run_id="runX").run(src)
    assert "0-1" not in folios(wh, "transfers")  # conflict applied
    resolved = wh.read("review_queue").withColumn("estado", F.lit("Resuelto"))
    wh.rewrite("review_queue", resolved)
    # ops retries runX believing the crashed run never completed
    counts = SyncJob(spark, wh, WIN[0], WIN[1], run_id="runX").run(src)
    assert counts.get("insert") == 1
    assert "0-1" in folios(wh, "cash")
    rq = wh.read("review_queue").collect()
    assert len(rq) == 1 and rq[0]["estado"] == "Resuelto"


def test_crashed_move_retry_audits_one_mutation_row(spark, wh):
    """A run applies at most one final-state mutation per folio, so the
    bitácora must hold at most one mutation row per (run, folio). A
    move that crashed between the pass-A drop and the pass-B append
    replays as a plain insert: the retry's NUEVO row supersedes the
    stale MOVIDO row instead of coexisting with it (which would
    double-count one physical change in per-run reporting)."""
    run(spark, wh, [row("0-1", 2)])
    src = src_df(spark, [row("0-1", 2, metodo="EFECTIVO")])
    SyncJob(spark, wh, WIN[0], WIN[1], run_id="runM").run(src)
    assert ("0-1", ACTION_MOVE) in audit_actions(wh)
    # rewind to the crash point: pass-B append had not happened yet
    wh.rewrite("cash", wh.read("cash").where(F.col("folio") != "0-1"))
    counts = SyncJob(spark, wh, WIN[0], WIN[1], run_id="runM").run(src)
    assert counts.get("insert") == 1
    assert "0-1" in folios(wh, "cash")
    # scope to runM: the setup run's own NUEVO row is legit history
    mutations = [
        (r["folio"], r["accion"])
        for r in wh.read("audit_log").where(F.col("run_id") == "runM").collect()
        if r["folio"] == "0-1"
        and r["accion"] in (ACTION_MOVE, ACTION_NEW, ACTION_UPDATE)
    ]
    assert mutations == [("0-1", ACTION_NEW)]


def test_parked_dest_only_folio_still_logs_deletion(spark, wh):
    """Parking freezes destination state and the queue, but deletion
    detection is log-only telemetry (T5): a parked folio that is
    dest-present and vanishes from the source window must still emit
    its DETECTADA_ELIMINACION audit row every run, exactly as an
    unparked dest-only folio does."""
    run(spark, wh, [row("0-1", 2)])
    schema = wh.read("review_queue").schema
    foreign = spark.createDataFrame(
        [(None, "0-1", "Cambio de método de pago con trabajo manual: transfers → cash",
          "transfers", "cash", D(2025, 11, 2), "Ana", "Sala", 100.0,
          "SANTANDER", "No", "", "", "Pendiente", "runA")],
        schema,
    )
    wh.append("review_queue", foreign)
    counts = run(spark, wh, [row("0-9", 3)])  # source no longer has 0-1
    assert counts.get("parked") == 1
    assert counts.get("deletions_detected") == 1
    assert ("0-1", ACTION_DELETE_DETECTED) in audit_actions(wh)
    assert "0-1" in folios(wh, "transfers")  # log-only: never deletes


def test_run_id_stamps_and_retry_replaces(spark, wh):
    """Appends are run_id-stamped; retrying a run under its run_id
    replaces its review/audit rows instead of duplicating them
    (crash-recovery contract; default fresh ids keep the reference's
    append-every-run behavior)."""
    SyncJob(spark, wh, WIN[0], WIN[1], run_id="attempt-1").run(
        src_df(spark, [row("0-1", 2), row("0-2", 3)])
    )
    audit = wh.read("audit_log").collect()
    assert audit and all(r["run_id"] == "attempt-1" for r in audit)
    n_first = len(audit)
    # identical retry under the same run_id: state already applied, so
    # the replayed audit set replaces attempt-1's rows (no duplication)
    SyncJob(spark, wh, WIN[0], WIN[1], run_id="attempt-1").run(
        src_df(spark, [row("0-1", 2), row("0-2", 3)])
    )
    audit2 = wh.read("audit_log").collect()
    assert len(audit2) <= n_first  # replaced, never duplicated
    # a fresh run_id accumulates (reference semantics)
    SyncJob(spark, wh, WIN[0], WIN[1]).run(src_df(spark, [row("0-1", 2, monto=55.0)]))
    assert wh.read("audit_log").where("run_id IS NOT NULL").count() >= 1


def test_first_match_returns_one_real_row_not_a_chimera(spark):
    """first_match_per_key must return the fields of ONE physical row,
    picked atomically and deterministically — independent per-column
    aggregates would stitch values from different rows when a folio is
    duplicated within one table (same table_order)."""
    from lavasmart_bank_sync_etl_spark.operators.routing import first_match_per_key

    rows = [
        ("0-1", 0, "SPEI A", 100.0),
        ("0-1", 0, "AAA B", 200.0),  # same-table duplicate, ties order
        ("0-1", 1, "SPEI C", 50.0),
    ]
    df = spark.createDataFrame(
        rows, "folio string, table_order int, concepto string, monto double"
    )
    out = first_match_per_key(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["concepto"], r["monto"]) in {("SPEI A", 100.0), ("AAA B", 200.0)}
    # deterministic full-row lexicographic tiebreak within table_order 0
    assert (r["concepto"], r["monto"]) == ("AAA B", 200.0)


def test_crash_after_audit_before_rewrite_converges(spark, wh):
    """Crash point between the audit append (phase-2 step ③ runs the
    staged audit BEFORE the state rewrites) and the target rewrite:
    the bitácora already records ACTUALIZACIÓN but the table still
    holds the old value. The retry re-classifies the update (still
    pending), applies it, and the run_id-guarded replace keeps
    exactly ONE mutation row — the warehouse may transiently show an
    audit row ahead of its value, never a duplicate record of one
    physical change."""
    run(spark, wh, [row("0-1", 2, monto=100.0)])
    src = src_df(spark, [row("0-1", 2, monto=990.0)])
    SyncJob(spark, wh, WIN[0], WIN[1], run_id="runC").run(src)
    assert folios(wh, "transfers")["0-1"]["monto"] == 990.0
    # rewind the TABLE only: audit row stays (it was written first),
    # the rewrite "never happened"
    t = wh.read("transfers").withColumn(
        "monto",
        F.when(F.col("folio") == "0-1", F.lit(100.0)).otherwise(F.col("monto")),
    )
    wh.rewrite("transfers", t)
    counts = SyncJob(spark, wh, WIN[0], WIN[1], run_id="runC").run(src)
    assert counts.get("update") == 1
    assert folios(wh, "transfers")["0-1"]["monto"] == 990.0
    audit = [
        r for r in wh.read("audit_log").collect()
        if r["folio"] == "0-1" and r["accion"] == ACTION_UPDATE
    ]
    assert len(audit) == 1 and audit[0]["run_id"] == "runC"


def test_concurrent_sync_jobs_one_fails_fast(spark, wh):
    """Two WHOLE SyncJob.runs overlapping on one warehouse: the run
    holds the store's single-writer lease end-to-end, so the second
    job fails fast with ConcurrentWriterError at its first write
    attempt — no interleaved reads/rewrites — while the first run
    completes normally and the warehouse ends invariant-clean.
    Store-level mutual exclusion is proved with real contending
    processes in test_store_contract.py; this pins the JOB-level
    contract on both backends."""
    import threading

    from test_week_sim import check_invariants

    from lavasmart_bank_sync_etl_spark.sources.lease import (
        ConcurrentWriterError,
    )

    # a second, independent store handle over the SAME root — the
    # realistic shape of a second writer (its own lease object)
    wh_b = type(wh)(spark, wh.root)

    # gate job A inside its lease-held critical section:
    # migrate_legacy is _run's first statement, i.e. the lease is
    # already held when `started` fires and stays held until `release`
    started, release = threading.Event(), threading.Event()
    orig_migrate = wh.migrate_legacy

    def gated_migrate():
        started.set()
        assert release.wait(timeout=120), "job B never released job A"
        return orig_migrate()

    wh.migrate_legacy = gated_migrate

    result: dict = {}

    def job_a():
        try:
            result["summary"] = run(spark, wh, [row("A-1", 2)])
        except Exception as exc:  # surfaced after join
            result["exc"] = exc

    t = threading.Thread(target=job_a, daemon=True)
    t.start()
    assert started.wait(timeout=120), "job A never reached its run body"
    try:
        with pytest.raises(ConcurrentWriterError):
            SyncJob(spark, wh_b, *WIN).run(
                src_df(spark, [row("B-1", 3, monto=77.0)])
            )
    finally:
        release.set()
    t.join(timeout=300)
    assert not t.is_alive(), "job A did not finish"
    assert "summary" in result, result.get("exc")
    assert result["summary"].get("insert") == 1

    # only job A's work landed; the store is invariant-clean and
    # writable again (the lease was released, not leaked)
    assert set(folios(wh_b, "transfers")) == {"A-1"}
    check_invariants(wh_b)
    after = SyncJob(spark, wh_b, *WIN).run(
        src_df(spark, [row("B-1", 3, monto=77.0)])
    )
    assert after.get("insert") == 1
    assert set(folios(wh_b, "transfers")) == {"A-1", "B-1"}
