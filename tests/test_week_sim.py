"""Longitudinal production simulation: one folio population driven
through a week of daily syncs — inserts, duplicates, human edits,
updates, clean and conflicted moves, parking, crash-retry, human
resolution, deletions, and a month-end backfill — with the GLOBAL
invariants re-checked after every run. The per-feature goldens in
test_sync_job.py pin each behavior in isolation; this suite pins
that they still hold when they interleave on shared state across
runs (the reference's actual operating regime: one workbook, one
daily trigger, humans editing between runs — Code.gs:649-860 +
GUIA_REVISION_PENDIENTE.md).
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
    ACTION_MOVE, ACTION_NEW, ACTION_UPDATE, TABLE_ORDER,
)
from lavasmart_bank_sync_etl_spark.sources.catalog_store import CatalogStore
from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

D = dt.date
WIN = ("2025-11-01", "2025-11-10")

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


def row(folio, day, monto=100.0, metodo="TRANSFERENCIA", cliente="Ana",
        servicio="Sala", banco="SANTANDER", idx=0):
    return (folio, D(2025, 11, day), cliente, servicio, monto, metodo, banco, idx)


@pytest.fixture(params=[Warehouse, CatalogStore])
def wh(request, spark, tmp_path):
    return request.param(spark, str(tmp_path / "whsim"))


def src_df(spark, rows):
    df = spark.createDataFrame(rows, SRC_SCHEMA)
    return df.withColumn("metodo", classify_method(F.col("metodo_raw")))


def sync(spark, wh, rows, start=WIN[0], end=WIN[1], run_id=None):
    return SyncJob(spark, wh, start, end, run_id=run_id).run(src_df(spark, rows))


def table_folios(wh):
    return {t: {r["folio"] for r in wh.read(t).collect()} for t in TABLE_ORDER}


def check_invariants(wh):
    """Global state invariants that must hold after EVERY run:
    (1) a folio lives in AT MOST one destination table;
    (2) a folio in NO table has a review-queue row — the only path
        out of every table is a conflict, whose queue snapshot is the
        surviving record. (Estado need not be Pendiente: a folio
        resolved AFTER the source stopped sending it stays out of all
        tables forever, by the log-only retention design — the fuzz
        suite found exactly this interleaving. A resolved folio the
        source DOES still send must re-enter a table, which the value
        model in test_sync_fuzz.py asserts.);
    (3) the review queue holds at most one PENDIENTE row per folio
        (the parked snapshot converges, never duplicates). Historical
        Resuelto rows are permanent records and may accumulate: a
        legitimate lifecycle (conflict → Resuelto → re-insert →
        second conflict in a later run) leaves a Pendiente row NEXT TO
        the retained Resuelto row — the guía's FAQ covers exactly a
        folio appearing twice in review (ADVICE r7);
    (4) the audit log holds at most one state-mutation row per
        (run_id, folio) — a run applies at most one final-state
        mutation per folio;
    (5) Warehouse-backed stores: fsck classifies the on-disk layout
        with ZERO `damage` findings — every state the engine (or a
        killed engine) can reach is clean or healable; damage states
        are reserved for external interference, by construction.
        Running inside every crash sweep / fuzz crash point makes
        that claim exhaustive rather than asserted."""
    tf = table_folios(wh)
    seen: dict[str, str] = {}
    for t, fs in tf.items():
        for f in fs:
            assert f not in seen, f"{f} in both {seen[f]} and {t}"
            seen[f] = t
    queue = wh.read("review_queue").collect()
    pendiente_per_folio: dict[str, int] = {}
    for q in queue:
        if q["estado"] == "Pendiente":
            pendiente_per_folio[q["folio"]] = (
                pendiente_per_folio.get(q["folio"], 0) + 1
            )
    assert all(n == 1 for n in pendiente_per_folio.values()), pendiente_per_folio
    queued = {q["folio"] for q in queue}
    ever_known = queued | set(seen)
    missing = {f for f in ever_known if f not in seen}
    assert missing <= queued, (missing, queued)
    audit = wh.read("audit_log").collect()
    mutations = {}
    for a in audit:
        if a["accion"] in (ACTION_UPDATE, ACTION_NEW, ACTION_MOVE):
            key = (a["run_id"], a["folio"])
            mutations[key] = mutations.get(key, 0) + 1
    assert all(n == 1 for n in mutations.values()), {
        k: n for k, n in mutations.items() if n > 1
    }
    inner = getattr(wh, "_inner", wh)
    if isinstance(inner, Warehouse):
        from lavasmart_bank_sync_etl_spark.sources.fsck import inspect_store

        damage = [
            f for f in inspect_store(inner.root)["findings"]
            if f["severity"] == "damage"
        ]
        assert not damage, damage


def test_week_in_production(spark, wh):
    # ---- Monday: first sync of the week ------------------------------
    monday = [
        row("0-1", 2, monto=500.0),                       # A transfers
        row("0-2", 3, metodo="tarjeta CREDITO"),          # B cards
        row("0-3", 3, metodo="EFECTIVO"),                 # C cash
        row("0-4", 4),                                    # D transfers
        row("0-5", 5, monto=100.0, idx=0),                # E transfers
        row("0-5", 5, monto=999.0, idx=1),                # E dup (loses)
    ]
    counts = sync(spark, wh, monday)
    assert counts.get("insert") == 5 and counts.get("duplicates") == 1
    check_invariants(wh)

    # ---- humans annotate between runs --------------------------------
    t = wh.read("transfers").withColumn(
        "conciliado", F.when(F.col("folio") == "0-1", True).otherwise(F.col("conciliado"))
    ).withColumn(
        "observaciones",
        F.when(F.col("folio") == "0-1", F.lit("ok Ana")).otherwise(F.col("observaciones")),
    )
    wh.rewrite("transfers", t)
    c = wh.read("cards").withColumn(
        "lote", F.when(F.col("folio") == "0-2", F.lit("L-7")).otherwise(F.col("lote"))
    )
    wh.rewrite("cards", c)

    # ---- Tuesday: update + conflicted move + clean move + deletion ---
    tuesday = [
        row("0-1", 2, monto=750.0),                       # A update
        row("0-2", 3, metodo="EFECTIVO"),                 # B move w/ work → conflict
        row("0-3", 3),                                    # C cash → transfers, clean
        # D vanished from source → deletion telemetry
        row("0-5", 5, monto=100.0, idx=0),                # E unchanged
        row("0-6", 6, metodo="cheque nominativo"),        # F others insert
    ]
    counts = sync(spark, wh, tuesday)
    assert counts.get("update") == 1
    assert counts.get("conflicts") == 1
    assert counts.get("auto_moves") == 1
    assert counts.get("deletions_detected") == 1
    assert counts.get("unchanged") == 1
    assert counts.get("insert") == 1
    check_invariants(wh)
    got = {r["folio"]: r.asDict() for r in wh.read("transfers").collect()}
    assert got["0-1"]["monto"] == 750.0
    assert got["0-1"]["conciliado"] is True          # human cols survive update
    assert got["0-1"]["observaciones"] == "ok Ana"
    assert "0-3" in got and got["0-4"]["folio"] == "0-4"  # D log-only
    queue = wh.read("review_queue").collect()
    assert len(queue) == 1 and queue[0]["estado"] == "Pendiente"
    assert "L-7" in queue[0]["concepto_banco"]       # cards lote folded in

    # ---- Wednesday: parked folio stays frozen; retry converges -------
    wednesday = tuesday
    counts = sync(spark, wh, wednesday, run_id="wk-wed")
    assert counts.get("parked") == 1 and not counts.get("conflicts")
    check_invariants(wh)
    counts = sync(spark, wh, wednesday, run_id="wk-wed")  # crash-retry
    assert counts.get("parked") == 1 and not counts.get("conflicts")
    check_invariants(wh)
    assert wh.read("review_queue").count() == 1      # snapshot converged

    # ---- Thursday: human resolves; latest source values apply --------
    resolved = wh.read("review_queue").withColumn("estado", F.lit("Resuelto"))
    wh.rewrite("review_queue", resolved)
    thursday = [r if r[0] != "0-2" else row("0-2", 3, monto=222.0, metodo="EFECTIVO")
                for r in tuesday]
    counts = sync(spark, wh, thursday)
    assert counts.get("insert") == 1 and not counts.get("parked")
    check_invariants(wh)
    cash = {r["folio"]: r.asDict() for r in wh.read("cash").collect()}
    assert cash["0-2"]["monto"] == 222.0             # latest source, not snapshot
    queue = wh.read("review_queue").collect()
    assert len(queue) == 1 and queue[0]["estado"] == "Resuelto"
    assert queue[0]["monto"] == 100.0                # snapshot stays historical

    # ---- Friday: month-end backfill widens the window ----------------
    friday = thursday + [row("0-9", 20)]             # late sale, outside daily window
    counts = sync(spark, wh, friday, start="2025-11-01", end="2025-11-30")
    assert counts.get("insert") == 1                 # G only
    assert counts.get("deletions_detected") == 1     # D still gone from source
    check_invariants(wh)

    # ---- Saturday: idempotence under the widened window --------------
    counts = sync(spark, wh, friday, start="2025-11-01", end="2025-11-30")
    assert not counts.get("insert") and not counts.get("update")
    assert counts.get("unchanged") == 6              # A,B,C,E,F,G
    check_invariants(wh)

    # ---- final topology ----------------------------------------------
    tf = table_folios(wh)
    assert tf["transfers"] == {"0-1", "0-3", "0-4", "0-5", "0-9"}
    assert tf["cards"] == set()
    assert tf["cash"] == {"0-2"}
    assert tf["others"] == {"0-6"}

    # ---- run_log: exactly one converged row per logical run ----------
    # 7 sync() calls, but wk-wed ran twice under one run_id — its
    # retry must REPLACE the row (append_once), leaving 6 rows total.
    log = {r["run_id"]: r.asDict() for r in wh.read("run_log").collect()}
    assert len(log) == 6
    wed = log["wk-wed"]
    assert wed["n_parked"] == 1 and wed["n_conflicts"] == 0
    assert wed["window_start"] == D(2025, 11, 1)
    assert wed["window_end"] == D(2025, 11, 10)
    assert all(r["ts"] is not None for r in log.values())
    # Friday's backfill row carries its widened window
    widened = [r for r in log.values() if r["window_end"] == D(2025, 11, 30)]
    assert len(widened) == 2  # friday + saturday rerun
    assert {r["n_insert"] for r in widened} == {1, 0}


def test_week_then_maintenance_keeps_state(spark, tmp_path):
    """Warehouse-only epilogue: after a multi-run week, compact +
    vacuum must not change any visible state, and the retained
    snapshot still time-travels."""
    wh = Warehouse(spark, str(tmp_path / "whmaint"))
    sync(spark, wh, [row("0-1", 2), row("0-2", 3, metodo="EFECTIVO")])
    sync(spark, wh, [row("0-1", 2, monto=321.0), row("0-2", 3, metodo="EFECTIVO")])
    before = sorted(map(tuple, wh.read("transfers").collect()))
    wh.compact("transfers")
    wh.vacuum("transfers", keep=2)
    assert sorted(map(tuple, wh.read("transfers").collect())) == before
    cur = wh.current_version("transfers")
    assert sorted(map(tuple, wh.read_version("transfers", cur).collect())) == before
    check_invariants(wh)


def test_midweek_maintenance_interleaves_with_runs(spark, tmp_path):
    """Maintenance BETWEEN runs (the realistic nightly schedule), not
    just as an epilogue: after compact+vacuum of every table —
    including the review queue holding a parked Pendiente snapshot and
    the run_id-stamped audit log — later syncs must still converge
    (the parked folio stays frozen, resolution re-enters it, retries
    stay idempotent on the compacted state) and all invariants hold.
    Exercises vacuum pruning snapshots that append_once later rewrites
    and compact folding the queue into one file mid-lifecycle."""
    from lavasmart_bank_sync_etl_spark.sources.warehouse import ALL_TABLES

    wh = Warehouse(spark, str(tmp_path / "whmid"))
    # Mon: seed A transfers, B cards with human work
    sync(spark, wh, [row("0-1", 2), row("0-2", 3, metodo="tarjeta CREDITO")])
    wh.rewrite("cards", wh.read("cards").withColumn("lote", F.lit("L-1")))
    # Tue: B tries to move with work → parked conflict
    tue = [row("0-1", 2), row("0-2", 3, metodo="EFECTIVO")]
    counts = sync(spark, wh, tue)
    assert counts.get("conflicts") == 1
    check_invariants(wh)

    # ---- nightly maintenance over EVERY table ------------------------
    for t in ALL_TABLES:
        wh.compact(t)
        wh.vacuum(t, keep=1)
    queue_before = sorted(map(tuple, wh.read("review_queue").collect()))
    check_invariants(wh)

    # Wed: parked folio stays frozen on the compacted state; the
    # same-run_id retry is idempotent across the vacuumed history
    counts = sync(spark, wh, tue, run_id="mid-wed")
    assert counts.get("parked") == 1 and not counts.get("conflicts")
    counts = sync(spark, wh, tue, run_id="mid-wed")
    assert counts.get("parked") == 1
    assert sorted(map(tuple, wh.read("review_queue").collect())) == queue_before
    check_invariants(wh)

    # Thu: resolution still re-enters the folio after maintenance
    wh.rewrite(
        "review_queue",
        wh.read("review_queue").withColumn("estado", F.lit("Resuelto")),
    )
    counts = sync(spark, wh, [row("0-1", 2), row("0-2", 3, monto=77.0, metodo="EFECTIVO")])
    assert counts.get("insert") == 1 and not counts.get("parked")
    cash = {r["folio"]: r["monto"] for r in wh.read("cash").collect()}
    assert cash["0-2"] == 77.0
    check_invariants(wh)
    # run_log survived its own compaction: one row per LOGICAL run —
    # Mon, Tue, mid-wed (two attempts, one row), Thu
    run_ids = [r["run_id"] for r in wh.read("run_log").collect()]
    assert len(run_ids) == len(set(run_ids)) == 4
    assert "mid-wed" in run_ids
