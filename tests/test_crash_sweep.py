"""Exhaustive crash-point sweep (VERDICT r7 task 4): kill the apply
at EVERY mutating-call boundary of a rich sync run — review append ①,
audit append ②, each pass-A rewrite, each pass-B append, run_log ⑤ —
then retry under the same run_id and assert the T3 convergence
contract on BOTH storage backends: the retried state is value-equal
to a never-crashed run of the same history.

The curated goldens in test_sync_job.py pin hand-picked crash points
with exact row expectations; this sweep proves there is no OTHER
boundary anyone forgot, by construction. test_sync_fuzz.py samples
random (history × crash point) combinations on top.

The scenario exercises every phase-2 write in one run: an update, a
conflicted move (human work → review queue), a clean move, a fresh
insert, a source-side disappearance (deletion telemetry), and a
source duplicate (loser logging).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.operators.classify import classify_method
from lavasmart_bank_sync_etl_spark.plans.sync_job import SyncJob
from lavasmart_bank_sync_etl_spark import schemas as S
from lavasmart_bank_sync_etl_spark.schemas import TABLE_ORDER
from lavasmart_bank_sync_etl_spark.sources.catalog_store import CatalogStore
from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

from test_sync_fuzz import CrashInjected, CrashingStore
from test_week_sim import SRC_SCHEMA, WIN, check_invariants, row


class CountingStore:
    """Counts mutating calls without interfering — sizes the sweep."""

    def __init__(self, inner):
        self._inner = inner
        self.calls: list[str] = []

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if name in CrashingStore.MUTATORS and callable(attr):
            def counted(*a, **k):
                self.calls.append(f"{name}:{a[0]}")
                return attr(*a, **k)

            return counted
        return attr


RUN1 = [
    row("0-A", 2, monto=500.0),                      # transfers
    row("0-B", 3, metodo="tarjeta CREDITO"),         # cards
    row("0-C", 3, metodo="EFECTIVO"),                # cash
    row("0-E", 4),                                   # transfers; vanishes in run 2
]
RUN2 = [
    row("0-A", 2, monto=750.0),                      # update
    row("0-B", 3, metodo="EFECTIVO"),                # move w/ human work → conflict
    row("0-C", 3),                                   # cash → transfers, clean move
    row("0-D", 5, metodo="cheque nominativo", idx=0),  # others insert
    row("0-D", 5, metodo="cheque nominativo", monto=999.0, idx=1),  # dup loser
]


def _src(spark, rows):
    df = spark.createDataFrame(rows, SRC_SCHEMA)
    return df.withColumn("metodo", classify_method(F.col("metodo_raw")))


def _seed(spark, wh):
    """Run 1 + the human annotation that makes 0-B's move conflict."""
    SyncJob(spark, wh, WIN[0], WIN[1], run_id="seed").run(_src(spark, RUN1))
    marked = wh.read("cards").withColumn(
        "lote",
        F.when(F.col("folio") == "0-B", F.lit("L-9")).otherwise(F.col("lote")),
    )
    wh.rewrite("cards", marked)


#: tables whose final state must match the never-crashed run EXACTLY
#: (ts excluded: wall-clock timestamps legitimately differ between
#: the golden and retried runs)
_EXACT = {
    **{t: None for t in TABLE_ORDER},  # None = all columns
    "review_queue": [
        "folio", "conflicto", "hoja_origen", "hoja_destino", "fecha",
        "cliente", "servicio", "monto", "banco", "conciliado",
        "concepto_banco", "observaciones", "estado", "run_id",
    ],
}

_MUTATION_CLASS = {S.ACTION_UPDATE, S.ACTION_NEW, S.ACTION_MOVE}


def _state(wh):
    out = {}
    for table, cols in _EXACT.items():
        df = wh.read(table)
        if cols is not None:
            df = df.select(*cols)
        out[table] = sorted(map(tuple, df.collect()))
    out["audit"] = [
        r.asDict() for r in wh.read("audit_log").collect()
    ]
    out["run_log"] = sorted(
        (r["run_id"], r["window_start"], r["window_end"])
        for r in wh.read("run_log").collect()
    )
    return out


def _split_audit(rows):
    """(telemetry rows sans ts, {folio: accion} for mutation rows)."""
    telemetry = sorted(
        (r["folio"], r["accion"], r["detalle"], r["valores_anteriores"],
         r["valores_nuevos"], r["run_id"])
        for r in rows if r["accion"] not in _MUTATION_CLASS
    )
    mutations = {
        r["folio"]: r["accion"] for r in rows if r["accion"] in _MUTATION_CLASS
    }
    return telemetry, mutations


@pytest.mark.parametrize("backend", [Warehouse, CatalogStore])
def test_every_crash_boundary_converges(spark, tmp_path, backend):
    # golden: the same two-run history, never crashed
    gold_wh = backend(spark, str(tmp_path / "gold"))
    _seed(spark, gold_wh)
    counter = CountingStore(gold_wh)
    SyncJob(spark, counter, WIN[0], WIN[1], run_id="r2").run(_src(spark, RUN2))
    golden = _state(gold_wh)
    n_calls = len(counter.calls)
    # the scenario must reach every phase-2 write family
    kinds = {c.split(":", 1)[0] for c in counter.calls}
    assert kinds == {"append_once", "rewrite", "append"}, counter.calls
    assert n_calls >= 8, counter.calls

    for crash_after in range(n_calls):
        wh = backend(spark, str(tmp_path / f"c{crash_after}"))
        _seed(spark, wh)
        with pytest.raises(CrashInjected):
            SyncJob(
                spark, CrashingStore(wh, crash_after), WIN[0], WIN[1], run_id="r2"
            ).run(_src(spark, RUN2))
        # the crash point itself must never expose torn state
        check_invariants(wh)
        # same-run_id retry must converge to the never-crashed outcome
        SyncJob(spark, wh, WIN[0], WIN[1], run_id="r2").run(_src(spark, RUN2))
        check_invariants(wh)
        got = _state(wh)
        ctx = (backend.__name__, crash_after, counter.calls[crash_after])
        # destination tables + review queue: exact value convergence
        for table in _EXACT:
            assert got[table] == golden[table], (*ctx, table)
        # run_log: exactly one row per logical run, same windows (the
        # count COLUMNS record the final attempt's view by design —
        # a post-crash retry re-classifies applied work as unchanged)
        assert got["run_log"] == golden["run_log"], ctx
        # audit: telemetry rows (conflicts, deletions, duplicates)
        # converge exactly; state-mutation rows converge up to the
        # documented MOVE→NUEVO substitution (a move that crashed
        # between the pass-A drop and pass-B append replays as a
        # plain insert) — same mutated-folio set, one row each
        g_tel, g_mut = _split_audit(golden["audit"])
        r_tel, r_mut = _split_audit(got["audit"])
        assert r_tel == g_tel, ctx
        assert set(r_mut) == set(g_mut), ctx
        for folio, accion in r_mut.items():
            assert accion == g_mut[folio] or (
                g_mut[folio] == S.ACTION_MOVE and accion == S.ACTION_NEW
            ), (*ctx, folio, accion, g_mut[folio])


# -- maintenance boundaries (round 9: VERDICT r8 task 6) ---------------

#: a target table (pass-A rewrite path), the two append_once logs, —
#: enough to cover both maintenance verbs over every storage shape
#: without sweeping all 7 tables (each boundary costs a full retry)
_MAINT_TABLES = ["transfers", "audit_log", "review_queue"]


def _maintain(wh_like) -> None:
    """One maintenance pass: compact then vacuum each table — the
    cmd_maintain verb order."""
    for t in _MAINT_TABLES:
        wh_like.compact(t, num_files=1)
    for t in _MAINT_TABLES:
        wh_like.vacuum(t, keep=2)


def test_maintenance_crash_boundaries_converge(spark, tmp_path):
    """Kill a maintenance pass (compact/vacuum over the synced
    warehouse) at EVERY verb boundary, then retry: invariants must
    hold at the crash point and the retried pass must converge to the
    never-crashed outcome. Warehouse-only — compact/vacuum are its
    versioned-layout maintenance; CatalogStore has no snapshots to
    prune. Mid-verb tears (rmtree dying inside vacuum) are pinned
    separately in test_warehouse.py's tombstone tests."""
    import shutil

    base = Warehouse(spark, str(tmp_path / "base"))
    _seed(spark, base)
    SyncJob(spark, base, WIN[0], WIN[1], run_id="r2").run(_src(spark, RUN2))

    gold_wh = Warehouse(spark, str(tmp_path / "mgold"))
    shutil.copytree(base.root, gold_wh.root)
    counter = CountingStore(gold_wh)
    _maintain(counter)
    golden = _state(gold_wh)
    n_calls = len(counter.calls)
    assert {c.split(":", 1)[0] for c in counter.calls} == {"compact", "vacuum"}
    assert n_calls == 2 * len(_MAINT_TABLES)

    for crash_after in range(n_calls):
        wh = Warehouse(spark, str(tmp_path / f"m{crash_after}"))
        shutil.copytree(base.root, wh.root)
        with pytest.raises(CrashInjected):
            _maintain(CrashingStore(wh, crash_after))
        check_invariants(wh)
        _maintain(wh)  # retry the whole pass
        check_invariants(wh)
        got = _state(wh)
        ctx = ("maintenance", crash_after, counter.calls[crash_after])
        for table in _EXACT:
            assert got[table] == golden[table], (*ctx, table)
        assert got["run_log"] == golden["run_log"], ctx
        # no reclassification happens in maintenance: audit converges
        # EXACTLY (no MOVE→NUEVO substitution window here)
        g_tel, g_mut = _split_audit(golden["audit"])
        r_tel, r_mut = _split_audit(got["audit"])
        assert r_tel == g_tel and r_mut == g_mut, ctx
        # vacuum outcome: pruned history, current snapshot readable
        for t in _MAINT_TABLES:
            hist = wh.history(t)
            assert 1 <= len(hist) <= 2, (*ctx, t)
            assert wh.current_version(t) in hist, (*ctx, t)
