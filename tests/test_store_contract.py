"""TableStore contract suite (sources/store.py): the behavior ANY
storage implementation must match before swapping in for Warehouse
(e.g. a Delta/Iceberg backend). Parameterized over implementations;
Warehouse is the shipped one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.sources.catalog_store import CatalogStore
from lavasmart_bank_sync_etl_spark.sources.store import TableStore
from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

IMPLEMENTATIONS = [Warehouse, CatalogStore]


@pytest.fixture(params=IMPLEMENTATIONS)
def store(request, spark, tmp_path):
    return request.param(spark, str(tmp_path / "store"))


def _audit_row(spark, store, run_id, n=1):
    df = store.read("audit_log").limit(0)
    rows = [(None, f"F-{i}", "ALTA", "d", "", "", run_id) for i in range(n)]
    return spark.createDataFrame(rows, df.schema)


def test_conforms_to_protocol(store):
    assert isinstance(store, TableStore)


def test_ensure_is_idempotent_and_typed(store):
    store.ensure("audit_log")
    store.ensure("audit_log")
    df = store.read("audit_log")
    assert df.count() == 0
    assert "run_id" in df.columns


def test_append_accumulates(spark, store):
    store.append("audit_log", _audit_row(spark, store, "r1", 2))
    store.append("audit_log", _audit_row(spark, store, "r2", 3))
    assert store.read("audit_log").count() == 5


def test_rewrite_replaces_state(spark, store):
    store.append("audit_log", _audit_row(spark, store, "r1", 4))
    store.rewrite("audit_log", _audit_row(spark, store, "r9", 1))
    out = store.read("audit_log").collect()
    assert len(out) == 1 and out[0]["run_id"] == "r9"


def test_append_once_retry_replaces_not_duplicates(spark, store):
    """The effectively-once contract: re-appending under the same
    run_id replaces that run's rows; a different run_id accumulates."""
    store.append_once("audit_log", _audit_row(spark, store, "runA", 3), "runA")
    store.append_once("audit_log", _audit_row(spark, store, "runA", 3), "runA")
    assert store.read("audit_log").count() == 3
    store.append_once("audit_log", _audit_row(spark, store, "runB", 2), "runB")
    got = store.read("audit_log").groupBy("run_id").count().collect()
    assert {r["run_id"]: r["count"] for r in got} == {"runA": 3, "runB": 2}


def test_append_once_preserves_unstamped_rows(spark, store):
    """Rows without a run_id (legacy appends) survive append_once."""
    legacy = _audit_row(spark, store, None, 2)
    store.append("audit_log", legacy)
    store.append_once("audit_log", _audit_row(spark, store, "runC", 1), "runC")
    store.append_once("audit_log", _audit_row(spark, store, "runC", 1), "runC")
    counts = store.read("audit_log").groupBy("run_id").count().collect()
    assert {r["run_id"]: r["count"] for r in counts} == {None: 2, "runC": 1}


def test_append_once_run_id_is_data_not_syntax(spark, store):
    """A run_id containing a quote must behave as an ordinary value —
    the dedup predicate is built with the Column API, so no string can
    splice into it (ADVICE r4)."""
    quoted = "run'; DROP TABLE x --"
    store.append_once("audit_log", _audit_row(spark, store, quoted, 2), quoted)
    store.append_once("audit_log", _audit_row(spark, store, quoted, 2), quoted)
    store.append_once("audit_log", _audit_row(spark, store, "other", 1), "other")
    counts = store.read("audit_log").groupBy("run_id").count().collect()
    assert {r["run_id"]: r["count"] for r in counts} == {quoted: 2, "other": 1}


def test_catalog_rewrite_crash_leaves_recoverable_state(spark, tmp_path):
    """A crash between the CatalogStore swap's renames must leave the
    committed rows under ``<table>__old``; the next ensure() heals it
    with a single rename (ADVICE r4 — no drop-before-rename window)."""
    store = CatalogStore(spark, str(tmp_path / "crash_store"))
    store.append("audit_log", _audit_row(spark, store, "keep", 3))
    # simulate the crash point: target renamed away, staged not yet in
    target = store._qualified("audit_log")
    spark.sql(f"ALTER TABLE {target} RENAME TO {target}__old")
    assert not store.exists("audit_log")
    recovered = store.read("audit_log")  # read -> ensure -> recovery
    assert recovered.count() == 3
    assert not spark.catalog.tableExists(f"{target}__old")


def _simulate_rewrite_crash(spark, store, table, new_df):
    """Drive ``store`` into the worst mid-rewrite crash state its
    protocol allows: the new state is fully written but NOT committed.

    Warehouse: a new version directory exists, the ``_CURRENT`` pointer
    still names the old snapshot (the pointer swap is the only commit).
    CatalogStore: the staged table exists and the target has been
    renamed away to ``__old`` (the deepest window — between the two
    metastore renames)."""
    import os

    if isinstance(store, Warehouse):
        orphan = os.path.join(store.path(table), store._next_version(table))
        new_df.write.mode("overwrite").parquet(orphan)
        return
    target = store._qualified(table)
    spark.sql(f"DROP TABLE IF EXISTS {target}__staged")
    new_df.write.format("parquet").saveAsTable(f"{target}__staged")
    spark.sql(f"ALTER TABLE {target} RENAME TO {target}__old")


def test_rewrite_crash_recovers_and_retry_converges(spark, store):
    """Contract crash case (both backends): a crash at the worst point
    inside ``rewrite`` must (a) leave the PREVIOUS committed state
    fully readable — never empty, never truncated, never the half-new
    state — and (b) let a plain retry of the same rewrite converge to
    the new state with no manual repair."""
    store.append("audit_log", _audit_row(spark, store, "keep", 3))
    new_df = _audit_row(spark, store, "new", 1)
    _simulate_rewrite_crash(spark, store, "audit_log", new_df)

    after_crash = store.read("audit_log").collect()  # triggers recovery
    assert len(after_crash) == 3
    assert all(r["run_id"] == "keep" for r in after_crash)

    store.rewrite("audit_log", _audit_row(spark, store, "new", 1))
    final = store.read("audit_log").collect()
    assert len(final) == 1 and final[0]["run_id"] == "new"


def test_migrate_legacy_widens_v1_audit(spark, tmp_path):
    """S9 sibling: a warehouse whose audit_log still has the older
    5-col shape (the shipped xlsx's Bitácora_Cambios v1 — SURVEY §1.3)
    is widened to the canonical 6-col schema on migrate_legacy();
    a canonical table passes through untouched (idempotence)."""
    import datetime as dt
    import os

    root = str(tmp_path / "store")
    legacy_dir = os.path.join(root, "audit_log")
    v1 = spark.createDataFrame(
        [(dt.datetime(2025, 11, 23, 22, 34, 28), "0-18758", "Banco", "", "SCOTIABANK")],
        "ts timestamp, folio string, campo_modificado string, "
        "valor_anterior string, valor_nuevo string",
    )
    v1.write.mode("overwrite").parquet(legacy_dir)

    wh = Warehouse(spark, root)
    wh.migrate_legacy()
    out = wh.read("audit_log")
    assert [f.name for f in out.schema.fields] == [
        "ts", "folio", "accion", "detalle",
        "valores_anteriores", "valores_nuevos", "run_id",
    ]
    row = out.collect()[0]
    assert row["accion"] == "ACTUALIZACIÓN"
    assert row["detalle"] == "Banco"
    assert row["valores_nuevos"] == "SCOTIABANK"
    assert row["run_id"] is None

    # idempotent: a second migrate leaves the widened state alone
    before = wh.current_version("audit_log")
    wh.migrate_legacy()
    assert wh.current_version("audit_log") == before
    assert wh.read("audit_log").count() == 1


def test_migrate_legacy_retries_through_torn_widening_rewrite(spark, tmp_path):
    """A widening rewrite that crashed between its snapshot write and
    the pointer commit leaves a v_* dir under the LEGACY root (mixed
    parquet depths, which Spark refuses to read). The retry path runs
    migrate_legacy() again BEFORE any ensure() — it must clear the
    torn dir itself and converge, not wedge on 'conflicting directory
    structures' forever (r8 review finding)."""
    import datetime as dt
    import os

    root = str(tmp_path / "store")
    legacy_dir = os.path.join(root, "audit_log")
    v1 = spark.createDataFrame(
        [(dt.datetime(2025, 11, 23, 22, 34, 28), "0-18758", "Banco", "", "SCOTIABANK")],
        "ts timestamp, folio string, campo_modificado string, "
        "valor_anterior string, valor_nuevo string",
    )
    v1.write.mode("overwrite").parquet(legacy_dir)
    # simulate the crashed first attempt: snapshot dir written (torn),
    # no _CURRENT pointer
    torn = os.path.join(legacy_dir, "v_00000001")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-0000-torn.snappy.parquet"), "wb") as f:
        f.write(b"\x00partial")

    wh = Warehouse(spark, root)
    wh.migrate_legacy()  # the retry — must not raise
    out = wh.read("audit_log").collect()
    assert len(out) == 1 and out[0]["accion"] == "ACTUALIZACI\u00d3N"
    assert wh.current_version("audit_log") == "v_00000001"
    assert wh.history("audit_log") == ["v_00000001"]


class _SqlCrash(Exception):
    pass


class _SqlCrashProxy:
    """SparkSession proxy that raises in place of the N-th .sql() call
    — fault injection INSIDE CatalogStore.rewrite's DDL sequence, one
    level deeper than the call-boundary sweep in test_crash_sweep.py."""

    def __init__(self, spark, crash_after):
        self._spark = spark
        self._left = crash_after

    def sql(self, *a, **k):
        if self._left <= 0:
            raise _SqlCrash(a[0] if a else "")
        self._left -= 1
        return self._spark.sql(*a, **k)

    def __getattr__(self, name):
        return getattr(self._spark, name)


def test_catalog_rewrite_crash_at_every_ddl_boundary(spark, tmp_path):
    """Systematic sweep of the two-rename swap protocol: kill rewrite
    before EACH of its five DDL statements (drop staged, drop old,
    park target as old, rename staged in, drop old). After every
    crash the table must read back CONSISTENT — fully the previous
    committed state or fully the new one, never empty or mixed — and
    a plain retry of the same rewrite must converge with no manual
    repair. The curated 'worst point' cases above pin two boundaries
    exactly; this proves the other windows by construction."""
    for crash_after in range(5):
        store = CatalogStore(spark, str(tmp_path / f"swap{crash_after}"))
        store.append("audit_log", _audit_row(spark, store, "keep", 3))
        new_df = _audit_row(spark, store, "new", 1)
        real_spark = store.spark
        store.spark = _SqlCrashProxy(real_spark, crash_after)
        try:
            store.rewrite("audit_log", new_df)
            raised = False
        except _SqlCrash:
            raised = True
        finally:
            store.spark = real_spark
        assert raised, crash_after  # rewrite issues exactly 5 DDLs
        rows = store.read("audit_log").collect()  # triggers recovery
        states = {(r["run_id"]) for r in rows}
        assert states in ({"keep"}, {"new"}), (crash_after, rows)
        assert len(rows) == (3 if states == {"keep"} else 1), (crash_after, rows)
        store.rewrite("audit_log", _audit_row(spark, store, "new", 1))
        final = store.read("audit_log").collect()
        assert len(final) == 1 and final[0]["run_id"] == "new", crash_after


def test_unmigrated_v1_audit_survives_compact_and_heals(spark, tmp_path):
    """The corrupted-compact corner (r8 review, third pass): compacting
    a v1-shaped legacy audit_log WITHOUT migrating first reads it
    under the canonical schema (v1-mapped columns → NULL) and commits
    that as v_00000001. The sweep must REFUSE to delete the v1
    originals (only surviving copy of the payload), and the next
    migrate_legacy must detect the payload-free commit and heal by
    re-widening from them — then sweep."""
    import datetime as dt
    import os

    root = str(tmp_path / "store")
    legacy_dir = os.path.join(root, "audit_log")
    v1 = spark.createDataFrame(
        [(dt.datetime(2025, 11, 23, 22, 34, 28), "0-18758", "Banco", "", "SCOTIABANK")],
        "ts timestamp, folio string, campo_modificado string, "
        "valor_anterior string, valor_nuevo string",
    )
    v1.write.mode("overwrite").parquet(legacy_dir)

    wh = Warehouse(spark, root)
    wh.compact("audit_log")  # misuse: maintenance before migration
    # the commit is corrupted (null payload), but the originals survive
    corrupted = wh.read("audit_log").collect()
    assert len(corrupted) == 1 and corrupted[0]["accion"] is None
    originals = [n for n in os.listdir(legacy_dir) if n.endswith(".parquet")]
    assert originals, "v1 originals must not be swept before migration"
    # vacuum must also refuse the sweep while unmigrated
    wh.vacuum("audit_log", keep=1)
    assert [n for n in os.listdir(legacy_dir) if n.endswith(".parquet")]
    # migrate_legacy heals: widened payload, originals swept after
    wh.migrate_legacy()
    healed = wh.read("audit_log").collect()
    assert len(healed) == 1
    assert healed[0]["accion"] == "ACTUALIZACIÓN"
    assert healed[0]["detalle"] == "Banco"
    assert healed[0]["valores_nuevos"] == "SCOTIABANK"
    assert not [n for n in os.listdir(legacy_dir) if n.endswith(".parquet")]
    # idempotent afterwards
    before = wh.current_version("audit_log")
    wh.migrate_legacy()
    assert wh.current_version("audit_log") == before


def test_mixed_v1_and_canonical_audit_heals_per_row(spark, tmp_path):
    """The mixed-commit corner (r8 review, fourth pass): a legacy
    in-place append put a CANONICAL row next to the v1 originals, then
    a compact-before-migrate committed both — the v1 rows null-
    corrupted, the appended row healthy. The sweep must still refuse
    (any v1-shaped root file refuses, not just an arbitrary probe),
    and migrate_legacy must heal PER ROW: keep the healthy row,
    re-widen the originals, then sweep."""
    import datetime as dt
    import os

    from lavasmart_bank_sync_etl_spark.schemas import AUDIT_LOG

    root = str(tmp_path / "store")
    legacy_dir = os.path.join(root, "audit_log")
    v1 = spark.createDataFrame(
        [(dt.datetime(2025, 11, 23, 22, 34, 28), "0-18758", "Banco", "", "SCOTIABANK")],
        "ts timestamp, folio string, campo_modificado string, "
        "valor_anterior string, valor_nuevo string",
    )
    v1.write.mode("overwrite").parquet(legacy_dir)

    wh = Warehouse(spark, root)
    healthy = spark.createDataFrame(
        [(dt.datetime(2025, 11, 24, 8, 0, 0), "0-19001", "ALTA",
          "insertado", None, None, "run-x")],
        AUDIT_LOG,
    )
    wh.append("audit_log", healthy)   # legacy in-place append (no pointer)
    assert wh.current_version("audit_log") is None
    wh.compact("audit_log")           # misuse: commit before migration
    # v1 rows corrupted in the commit, originals preserved on disk
    assert [n for n in os.listdir(legacy_dir) if n.endswith(".parquet")]
    wh.migrate_legacy()
    rows = {r["folio"]: r.asDict() for r in wh.read("audit_log").collect()}
    assert set(rows) == {"0-18758", "0-19001"}
    assert rows["0-19001"]["accion"] == "ALTA"           # healthy row kept
    assert rows["0-18758"]["accion"] == "ACTUALIZACIÓN"  # v1 re-widened
    assert rows["0-18758"]["valores_nuevos"] == "SCOTIABANK"
    assert not [n for n in os.listdir(legacy_dir) if n.endswith(".parquet")]
    # idempotent afterwards
    before = wh.current_version("audit_log")
    wh.migrate_legacy()
    assert wh.current_version("audit_log") == before


def test_torn_root_parquet_refuses_sweep_and_never_raises(spark, tmp_path):
    """An unreadable parquet footer in a table root (partial restore,
    killed copy) must make the legacy-root sweep REFUSE, not raise —
    vacuum and migrate_legacy are crash-recovery points and cannot
    themselves wedge on torn bytes (r8 review, fourth pass)."""
    import os

    root = str(tmp_path / "store")
    wh = Warehouse(spark, root)
    df = wh.read("transfers").sparkSession.createDataFrame(
        [("0-1", 100.0)], "folio string, monto double"
    ).select(
        "folio",
        F.lit("2025-11-02").cast("date").alias("fecha"),
        F.lit("Ana").alias("cliente"), F.lit("Sala").alias("servicio"),
        F.lit("SANTANDER").alias("banco"), "monto",
        F.lit(None).cast("boolean").alias("conciliado"),
        F.lit(None).cast("string").alias("concepto_banco"),
        F.lit(None).cast("string").alias("observaciones"),
    )
    wh.rewrite("transfers", df)
    torn = os.path.join(wh.path("transfers"), "stray-torn.parquet")
    with open(torn, "wb") as f:
        f.write(b"\x00not parquet")
    wh.vacuum("transfers", keep=1)    # must not raise
    wh.migrate_legacy()               # must not raise
    assert os.path.exists(torn)       # unknown bytes are never swept
    assert {r["folio"] for r in wh.read("transfers").collect()} == {"0-1"}


# -- single-writer lease (round 9: the documented contract, enforced) --

def _dead_pid() -> int:
    """A real pid that is guaranteed dead: a reaped child's."""
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()
    return proc.pid


def test_second_writer_raises_while_lease_held(spark, store):
    """Contract: a mutating verb on a store another LIVE writer is
    mid-run on must raise, never interleave (the silent-corruption
    mode the prose contract used to allow)."""
    from lavasmart_bank_sync_etl_spark.sources.lease import (
        ConcurrentWriterError,
    )

    store.ensure("audit_log")
    second = type(store)(store.spark, store.root)
    with store.lock():  # writer #1 holds a run-scoped lease
        with pytest.raises(ConcurrentWriterError):
            second.append("audit_log", _audit_row(spark, store, "r2", 1))
        # reads stay lock-free: a held lease must not block read verbs
        assert second.read("audit_log").count() == 0
        # and the holder itself nests (reentrant): its own verbs work
        store.append("audit_log", _audit_row(spark, store, "r1", 1))
    # lease released on exit: the second writer now proceeds
    second.append("audit_log", _audit_row(spark, store, "r2", 1))
    assert store.read("audit_log").count() == 2


def test_stale_lock_is_taken_over(spark, store):
    """A lock whose owner pid is dead (crashed writer) must not brick
    the store: the next writer takes it over and releases normally."""
    import os

    store.ensure("audit_log")
    lease = store.lock()
    os.makedirs(store.root, exist_ok=True)
    with open(lease.path, "w") as f:
        f.write(f"{_dead_pid()}\n")
    store.append("audit_log", _audit_row(spark, store, "r1", 1))
    assert store.read("audit_log").count() == 1
    assert not os.path.exists(lease.path)  # released after the verb


def test_unparseable_lock_is_stale(spark, store):
    """A torn lock write (garbage content) means its owner died
    mid-create — treated as stale, not as a live writer."""
    import os

    store.ensure("audit_log")
    lease = store.lock()
    os.makedirs(store.root, exist_ok=True)
    with open(lease.path, "w") as f:
        f.write("not-a-pid")
    store.append("audit_log", _audit_row(spark, store, "r1", 1))
    assert store.read("audit_log").count() == 1


def test_undecodable_lock_bytes_are_stale_not_a_crash(spark, store):
    """UNDECODABLE lock bytes (external interference) are the same
    unparseable-stale case — the acquirer must take the lock over,
    not die with UnicodeDecodeError before it can classify anything
    (found by the fsck adversarial-tree property test)."""
    import os

    store.ensure("audit_log")
    lease = store.lock()
    os.makedirs(store.root, exist_ok=True)
    with open(lease.path, "wb") as f:
        f.write(b"\xff\xfe\x00 binary junk")
    store.append("audit_log", _audit_row(spark, store, "r1", 1))
    assert store.read("audit_log").count() == 1


def test_overflow_pid_lock_is_stale_not_a_crash(spark, store):
    """A pid beyond the kernel's 31-bit space in the lock file must
    classify as stale junk, not raise OverflowError out of os.kill in
    every acquirer (found by the fsck adversarial-tree property
    test)."""
    import os

    store.ensure("audit_log")
    lease = store.lock()
    os.makedirs(store.root, exist_ok=True)
    with open(lease.path, "w") as f:
        f.write("9" * 64 + " -\n")
    store.append("audit_log", _audit_row(spark, store, "r1", 1))
    assert store.read("audit_log").count() == 1


def test_crashed_verb_releases_lease(spark, store, monkeypatch):
    """An exception inside a leased critical section must release the
    lease (else one failed run bricks the store for its process
    lifetime)."""
    import os

    boom = RuntimeError("injected")

    def explode(*a, **k):
        raise boom

    store.ensure("audit_log")
    monkeypatch.setattr(type(store), "rewrite", explode)
    with pytest.raises(RuntimeError):
        store.append_once("audit_log", _audit_row(spark, store, "r", 1), "r")
    monkeypatch.undo()
    assert not os.path.exists(store.lock().path)
    store.append("audit_log", _audit_row(spark, store, "r1", 1))  # usable


def test_recycled_pid_lock_is_stale(tmp_path):
    """Review follow-up: a crashed writer's pid recycled by an
    unrelated live process must not brick the store forever — the
    lock records the pid's /proc start time, and a token mismatch
    classifies the lock stale even though os.kill(pid, 0) succeeds."""
    import os

    from lavasmart_bank_sync_etl_spark.sources.lease import (
        WriterLease, _start_token,
    )

    lease = WriterLease(str(tmp_path))
    os.makedirs(str(tmp_path), exist_ok=True)
    # a LIVE pid (our own) with a start token that cannot match it:
    # exactly what a recycled pid looks like to the next writer
    assert _start_token(os.getpid()) not in (None, "1")
    with open(lease.path, "w") as f:
        f.write(f"{os.getpid()} 1\n")
    with lease:  # takes over instead of raising
        pass
    assert not os.path.exists(lease.path)


def test_degraded_no_hardlink_create_path(tmp_path, monkeypatch):
    """Filesystems without hard links (the documented degraded mode)
    fall back to O_EXCL create + immediate write: acquisition still
    writes pid+token content, a second writer still raises, release
    still unlinks, and the unparseable-lock grace re-read gives a
    mid-create writer time to finish before being classified stale."""
    import os
    import time

    from lavasmart_bank_sync_etl_spark.sources import lease as L

    def no_link(src, dst, *a, **k):
        raise OSError(95, "Operation not supported")

    monkeypatch.setattr(L.os, "link", no_link)
    lease = L.WriterLease(str(tmp_path))
    with lease:
        with open(lease.path) as f:
            parts = f.read().split()
        assert int(parts[0]) == os.getpid() and len(parts) == 2
        # no temp litter even though the link path was abandoned
        assert [n for n in os.listdir(str(tmp_path)) if n.endswith(".tmp")] == []
        second = L.WriterLease(str(tmp_path))
        with pytest.raises(L.ConcurrentWriterError):
            with second:
                pass
    assert not os.path.exists(lease.path)

    # grace re-read: an EMPTY lock (mid-create window) that gains its
    # content during the 50 ms grace must be honored as a live owner,
    # not insta-classified stale and robbed
    with open(lease.path, "w") as f:
        pass  # empty: exactly what the degraded open→write window shows
    real_sleep = time.sleep

    def fill_during_grace(secs):
        with open(lease.path, "w") as f:
            f.write(f"{os.getpid()} {L._start_token(os.getpid()) or '-'}\n")
        real_sleep(0)

    monkeypatch.setattr(L.time, "sleep", fill_during_grace)
    third = L.WriterLease(str(tmp_path))
    with pytest.raises(L.ConcurrentWriterError):
        with third:
            pass
    assert os.path.exists(lease.path)  # the live owner's lock survived
    os.unlink(lease.path)


def test_degraded_mid_create_window_is_live_not_stale(tmp_path):
    """The degraded path's empty-lock window is CLOSED where the FS
    supports flock: a creator holds the side flock across its
    open→write interval, so a prober that finds an unparseable lock
    and a busy side flock raises ConcurrentWriterError immediately —
    it never sleeps-and-robs a live mid-create writer. flock is
    kernel-owned, so the same state with the holder dead (flock
    released) classifies stale and takeover proceeds."""
    import fcntl
    import os

    from lavasmart_bank_sync_etl_spark.sources import lease as L

    root = str(tmp_path)
    lock = os.path.join(root, L._LOCKFILE)
    # a degraded creator frozen INSIDE its window: empty lock file on
    # disk, side flock held (via an independent fd, as a separate
    # process would hold it)
    open(lock, "w").close()
    side = os.open(lock + ".flock", os.O_CREAT | os.O_RDWR)
    fcntl.flock(side, fcntl.LOCK_EX)
    prober = L.WriterLease(root)
    with pytest.raises(L.ConcurrentWriterError, match="mid-create"):
        with prober:
            pass
    assert os.path.exists(lock)  # nothing was quarantined or stolen

    # the creator dies (flock auto-released): the still-empty lock is
    # now genuinely stale and the next acquirer takes over
    os.close(side)
    with L.WriterLease(root):
        assert os.path.exists(lock)
    assert not os.path.exists(lock)


def test_lease_mutual_exclusion_across_processes(tmp_path):
    """End-to-end mutual exclusion with REAL contending processes —
    the one property the single-process simulations can't prove. Each
    worker loops acquire→read-sleep-increment-write→release on a
    shared counter file; any two writers ever inside the critical
    section together lose an update, so counter == workers×iters is
    the exclusion proof. Contenders back off on ConcurrentWriterError
    (the lease is a fail-fast fence, not a queue)."""
    import os
    import subprocess
    import sys

    root = str(tmp_path / "store")
    counter = str(tmp_path / "counter.txt")
    with open(counter, "w") as f:
        f.write("0")
    workers, iters = 6, 8
    script = (
        "import random, sys, time\n"
        "sys.path.insert(0, %r)\n"
        "from lavasmart_bank_sync_etl_spark.sources.lease import (\n"
        "    WriterLease, ConcurrentWriterError)\n"
        "root, counter, iters = sys.argv[1], sys.argv[2], int(sys.argv[3])\n"
        "rng = random.Random(int(sys.argv[4]))\n"
        "done = 0\n"
        "while done < iters:\n"
        "    try:\n"
        "        with WriterLease(root):\n"
        "            v = int(open(counter).read())\n"
        "            time.sleep(0.002)\n"
        "            with open(counter, 'w') as f:\n"
        "                f.write(str(v + 1))\n"
        "        done += 1\n"
        "    except ConcurrentWriterError:\n"
        "        time.sleep(rng.uniform(0.001, 0.01))\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, root, counter, str(iters), str(i)]
        )
        for i in range(workers)
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    assert int(open(counter).read()) == workers * iters
    # no lock or takeover litter survives a clean finish
    leftovers = [n for n in os.listdir(root) if n.startswith("_WRITER_LOCK")]
    assert leftovers == []


def test_killed_real_holder_is_taken_over(tmp_path):
    """A writer holding the lease killed with SIGKILL (true crashed
    process, not a simulated pid) must leave a takeable lock: its pid
    is reaped → ProcessLookupError path — or, if the OS recycled the
    pid, the start-token mismatch path — either way the next writer
    proceeds."""
    import os
    import subprocess
    import sys
    import time

    from lavasmart_bank_sync_etl_spark.sources.lease import WriterLease

    root = str(tmp_path)
    script = (
        "import sys, time\n"
        "sys.path.insert(0, %r)\n"
        "from lavasmart_bank_sync_etl_spark.sources.lease import WriterLease\n"
        "with WriterLease(sys.argv[1]):\n"
        "    print('held', flush=True)\n"
        "    time.sleep(300)\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = subprocess.Popen(
        [sys.executable, "-c", script, root], stdout=subprocess.PIPE, text=True
    )
    assert child.stdout.readline().strip() == "held"
    child.kill()
    child.wait()  # reap: the lock now names a genuinely dead pid
    lease = WriterLease(root)
    deadline = time.time() + 10
    while True:  # the kill is async w.r.t. /proc teardown: brief retry
        try:
            with lease:
                break
        except Exception:
            assert time.time() < deadline
            time.sleep(0.05)
    assert not os.path.exists(lease.path)


def test_zombie_pid_lock_is_stale(tmp_path):
    """Round-9 review follow-up: a crashed writer left as a ZOMBIE
    (dead but unreaped — an orchestrator Popen()ed `cli sync`, the
    child was killed, the parent never wait()ed) must not brick the
    store. A zombie passes os.kill(pid, 0) AND keeps its original
    /proc start token, so only the stat state field ('Z') reveals it
    will never release; _alive must read it as dead and the next
    writer must take the lock over."""
    import os
    import subprocess
    import sys
    import time

    from lavasmart_bank_sync_etl_spark.sources.lease import (
        WriterLease, _alive, _stat_fields, _start_token,
    )

    child = subprocess.Popen([sys.executable, "-c", "pass"])
    try:
        token = _start_token(child.pid)
        assert token is not None
        deadline = time.time() + 10
        while True:  # wait for exit WITHOUT reaping (no poll/wait)
            fields = _stat_fields(child.pid)
            assert fields is not None, "child was reaped early"
            if fields[0] == "Z":
                break
            assert time.time() < deadline, "child never became a zombie"
            time.sleep(0.02)
        assert not _alive(child.pid, token)
        lease = WriterLease(str(tmp_path))
        os.makedirs(str(tmp_path), exist_ok=True)
        with open(lease.path, "w") as f:
            f.write(f"{child.pid} {token}\n")
        with lease:  # takes over instead of raising
            pass
        assert not os.path.exists(lease.path)
        # zombie-taker litter is swept too, same liveness rule
        stale = os.path.join(str(tmp_path), f"_WRITER_LOCK.stale.{child.pid}.1")
        with open(stale, "w") as f:
            f.write("1 1\n")
        with lease:
            pass
        assert not os.path.exists(stale)
    finally:
        child.wait()


def test_release_never_unlinks_a_foreign_lock(tmp_path):
    """If another writer somehow holds the lock at release time (e.g.
    it took over after misclassifying us), exiting must NOT delete
    their lock — that would cascade the failure to a third writer."""
    import os

    from lavasmart_bank_sync_etl_spark.sources.lease import WriterLease

    lease = WriterLease(str(tmp_path))
    with lease:
        # simulate a foreign takeover mid-hold
        os.unlink(lease.path)
        with open(lease.path, "w") as f:
            f.write("99999999 12345\n")
    assert os.path.exists(lease.path)  # foreign lock left intact
    os.unlink(lease.path)


def test_lock_creation_is_atomic_with_content(tmp_path):
    """The lock never exists without its pid content (tmp + hard
    link), so a racing writer can never read an empty lock and
    misclassify a live owner as stale."""
    import os

    from lavasmart_bank_sync_etl_spark.sources.lease import WriterLease

    lease = WriterLease(str(tmp_path))
    with lease:
        with open(lease.path) as f:
            parts = f.read().split()
        assert int(parts[0]) == os.getpid()
        assert len(parts) == 2  # pid + start-time token
        # no stray temp file left behind after acquisition
        assert [n for n in os.listdir(str(tmp_path)) if n.endswith(".tmp")] == []


def test_second_thread_is_a_concurrent_writer(tmp_path):
    """Reentrancy is same-thread only: a second thread of the same
    process entering a held lease must raise, not nest — otherwise
    two in-process writers interleave undetected and the first exit
    unlinks the lock mid-critical-section."""
    import threading

    from lavasmart_bank_sync_etl_spark.sources.lease import (
        ConcurrentWriterError, WriterLease,
    )

    lease = WriterLease(str(tmp_path))
    result = {}

    def other():
        try:
            with lease:
                result["entered"] = True
        except ConcurrentWriterError:
            result["raised"] = True

    with lease:
        t = threading.Thread(target=other)
        t.start()
        t.join()
    assert result == {"raised": True}


def test_orphan_tmp_and_quarantine_litter_is_swept(tmp_path):
    """Files left by writers killed mid-acquire (.tmp) or mid-takeover
    (.stale.*) are swept at the next acquisition when their pid is
    dead — and a live holder's files are left alone."""
    import os

    from lavasmart_bank_sync_etl_spark.sources.lease import WriterLease

    lease = WriterLease(str(tmp_path))
    os.makedirs(str(tmp_path), exist_ok=True)
    dead = _dead_pid()
    for n in (f"_WRITER_LOCK.{dead}.123.tmp", f"_WRITER_LOCK.stale.{dead}.123"):
        with open(os.path.join(str(tmp_path), n), "w") as f:
            f.write(f"{dead} -\n")
    live_tmp = f"_WRITER_LOCK.{os.getpid()}.999.tmp"
    with open(os.path.join(str(tmp_path), live_tmp), "w") as f:
        f.write(f"{os.getpid()} -\n")
    with lease:
        pass
    left = sorted(
        n for n in os.listdir(str(tmp_path)) if n.startswith("_WRITER_LOCK")
    )
    assert left == [live_tmp]  # dead litter gone, live tmp untouched
    os.unlink(os.path.join(str(tmp_path), live_tmp))


def test_takeover_does_not_destroy_a_replacing_live_lock(tmp_path, monkeypatch):
    """The two-taker race: after this writer classifies the lock stale
    but BEFORE its takeover rename, another writer completes takeover
    and acquires. The rename quarantines a LIVE lock — the taker must
    raise ConcurrentWriterError and the quarantined bytes must survive
    on disk (one uniform rule: live-content quarantines are never
    unlinked while their owner runs, and never re-installed either —
    the owner may have released since, and re-installing a released
    lock would wedge the store until its pid exits)."""
    import os

    from lavasmart_bank_sync_etl_spark.sources import lease as L

    lease = L.WriterLease(str(tmp_path))
    os.makedirs(str(tmp_path), exist_ok=True)
    dead = _dead_pid()
    with open(lease.path, "w") as f:
        f.write(f"{dead} -\n")

    real_rename = os.rename
    live_content = f"{os.getpid()} {L._start_token(os.getpid())}\n"

    def racing_rename(src, dst):
        # simulate the racing taker winning between probe and rename:
        # the stale lock is already replaced by a live writer's lock
        if src == lease.path:
            with open(lease.path, "w") as f:
                f.write(live_content)
        return real_rename(src, dst)

    monkeypatch.setattr(L.os, "rename", racing_rename)
    with pytest.raises(L.ConcurrentWriterError, match="re-acquired|live writer"):
        lease.__enter__()
    monkeypatch.undo()
    # the robbed live content survives — in quarantine, unrestored
    stale = [
        n for n in os.listdir(str(tmp_path))
        if n.startswith("_WRITER_LOCK.stale")
    ]
    assert len(stale) == 1
    with open(os.path.join(str(tmp_path), stale[0])) as f:
        assert f.read() == live_content
    os.unlink(os.path.join(str(tmp_path), stale[0]))


def test_sweep_never_destroys_robbed_live_locks_quarantine(tmp_path):
    """A taker that quarantined a LIVE owner's lock (ABA) and crashed
    leaves the only copy under .stale.<dead-taker-pid>. The sweep
    judges by the CONTENT pid: a live-content quarantine is LEFT
    ALONE (never unlinked while its owner runs, and deliberately not
    re-installed either — the owner may have released since, and a
    restored released lock would wedge the store until its pid
    exits); a dead-content one is plain litter and is removed."""
    import os

    from lavasmart_bank_sync_etl_spark.sources import lease as L

    dead = _dead_pid()
    live_content = f"{os.getpid()} {L._start_token(os.getpid())}\n"
    root = str(tmp_path)
    os.makedirs(root, exist_ok=True)
    live_q = os.path.join(root, f"_WRITER_LOCK.stale.{dead}.1")
    dead_q = os.path.join(root, f"_WRITER_LOCK.stale.{dead}.2")
    with open(live_q, "w") as f:
        f.write(live_content)
    with open(dead_q, "w") as f:
        f.write(f"{dead} -\n")

    lease = L.WriterLease(root)
    with lease:  # acquisition sweeps, then proceeds on the free name
        assert os.path.exists(live_q)      # preserved while owner lives
        assert not os.path.exists(dead_q)  # dead-content litter removed
        with open(live_q) as f:
            assert f.read() == live_content
    os.unlink(live_q)


def test_pid_zero_lock_is_stale_not_forever_live(tmp_path):
    """Externally-written '0' owner must not brick the store:
    os.kill(0, 0) signals our own process group and always succeeds,
    so pid<=0 is classified unparseable-stale instead."""
    import os

    from lavasmart_bank_sync_etl_spark.sources.lease import WriterLease

    lease = WriterLease(str(tmp_path))
    os.makedirs(str(tmp_path), exist_ok=True)
    with open(lease.path, "w") as f:
        f.write("0 -\n")
    with lease:  # takes over instead of raising forever
        pass
    assert not os.path.exists(lease.path)
