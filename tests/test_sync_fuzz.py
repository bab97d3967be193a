"""Metamorphic fuzz over SyncJob: hypothesis drives random multi-run
histories (presence, method, amount, duplicates, human edits between
runs, resolutions) and after EVERY run asserts the global invariants
plus a weak value model — dest state for any non-parked folio present
in the source must equal that run's source values, routed to the
method's table. The curated suites (test_sync_job.py goldens,
test_week_sim.py) pin known interleavings; this sweeps the ones
nobody thought to write down.

Deterministic by construction: ``derandomize=True`` makes hypothesis
replay the same example set every session, so CI can't flake on a
fresh seed; integer-valued amounts keep every change outside the
±0.01 money tolerance (a changed amount must apply, an unchanged one
compares equal either way).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.operators.classify import classify_method
from lavasmart_bank_sync_etl_spark.plans.sync_job import SyncJob
from lavasmart_bank_sync_etl_spark.schemas import METHOD_TO_TABLE, TABLE_ORDER
from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

from test_week_sim import SRC_SCHEMA, WIN, check_invariants, row

FOLIOS = ["f-0", "f-1", "f-2"]
METODOS = ["TRANSFERENCIA", "EFECTIVO"]

#: one folio-run cell: (present, metodo_idx, monto_step, duplicated)
cell = st.tuples(
    st.booleans(), st.integers(0, 1), st.integers(0, 3), st.booleans()
)
#: one run: a cell per folio + post-run
#: (human_edit_folio | None, resolve_all, replay_same_run_id)
run_st = st.tuples(
    st.tuples(cell, cell, cell),
    st.one_of(st.none(), st.integers(0, len(FOLIOS) - 1)),
    st.booleans(),
    st.booleans(),
)
history = st.lists(run_st, min_size=2, max_size=3)


def _src_rows(cells):
    rows = []
    for folio, (present, m_idx, step, dup) in zip(FOLIOS, cells):
        if not present:
            continue
        monto = float(100 + step)
        rows.append(row(folio, 2, monto=monto, metodo=METODOS[m_idx], idx=0))
        if dup:
            rows.append(row(folio, 2, monto=monto + 7, metodo=METODOS[m_idx], idx=1))
    return rows


@settings(max_examples=8, deadline=None, derandomize=True)
@given(history)
def test_random_histories_hold_invariants(spark, tmp_path_factory, hist):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("fuzz") / "wh"))
    for r, (cells, edit_idx, resolve, replay) in enumerate(hist):
        rows = _src_rows(cells)
        src = spark.createDataFrame(rows, SRC_SCHEMA).withColumn(
            "metodo", classify_method(F.col("metodo_raw"))
        )
        SyncJob(spark, wh, WIN[0], WIN[1], run_id=f"fz-{r}").run(src)
        check_invariants(wh)
        if replay:
            # ops retries a "crashed" (actually completed) run under
            # its own run_id — the T3 convergence contract says state
            # must be unchanged and the value model must still hold
            SyncJob(spark, wh, WIN[0], WIN[1], run_id=f"fz-{r}").run(src)
            check_invariants(wh)

        # weak value model: a non-parked folio present in the source
        # sits in its method's table with this run's winner values
        pendiente = {
            q["folio"]
            for q in wh.read("review_queue").collect()
            if q["estado"] == "Pendiente"
        }
        state = {}
        for t in TABLE_ORDER:
            for rec in wh.read(t).collect():
                state[rec["folio"]] = (t, rec["monto"])
        for folio, (present, m_idx, step, dup) in zip(FOLIOS, cells):
            if not present or folio in pendiente:
                continue
            want_table = METHOD_TO_TABLE[METODOS[m_idx]]
            assert state[folio] == (want_table, float(100 + step)), (
                folio, state.get(folio), want_table, 100 + step,
            )

        # between-run human activity
        if edit_idx is not None:
            folio = FOLIOS[edit_idx]
            if folio in state:
                t = state[folio][0]
                marked = wh.read(t).withColumn(
                    "observaciones",
                    F.when(F.col("folio") == folio, F.lit("tocado")).otherwise(
                        F.col("observaciones")
                    ),
                )
                wh.rewrite(t, marked)
        if resolve:
            wh.rewrite(
                "review_queue",
                wh.read("review_queue").withColumn("estado", F.lit("Resuelto")),
            )
