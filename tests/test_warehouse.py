"""Versioned warehouse commit protocol: atomic pointer swap, time
travel, crash safety, compaction, vacuum."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse


def _folio_rows(wh, table="transfers", version=None):
    df = wh.read(table) if version is None else wh.read_version(table, version)
    return {r["folio"]: r["monto"] for r in df.collect()}


def _seed(wh, monto):
    base = wh.read("transfers").sparkSession.createDataFrame(
        [("0-1", monto)], "folio string, monto double"
    )
    full = base.select(
        "folio",
        F.lit("2025-11-02").cast("date").alias("fecha"),
        F.lit("Ana").alias("cliente"), F.lit("Sala").alias("servicio"),
        F.lit("SANTANDER").alias("banco"), "monto",
        F.lit(None).cast("boolean").alias("conciliado"),
        F.lit(None).cast("string").alias("concepto_banco"),
        F.lit(None).cast("string").alias("observaciones"),
    )
    wh.rewrite("transfers", full)


def test_rewrite_creates_versions_and_time_travel(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed(wh, 100.0)
    v1 = wh.current_version("transfers")
    _seed(wh, 200.0)
    v2 = wh.current_version("transfers")
    assert v1 != v2
    assert _folio_rows(wh)["0-1"] == 200.0
    assert _folio_rows(wh, version=v1)["0-1"] == 100.0  # time travel


def test_crashed_write_leaves_current_intact(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed(wh, 100.0)
    cur = wh.current_version("transfers")
    # simulate a crashed writer: orphan snapshot dir, no pointer commit
    orphan = os.path.join(wh.path("transfers"), wh._next_version("transfers"))
    os.makedirs(orphan)
    assert wh.current_version("transfers") == cur
    assert _folio_rows(wh)["0-1"] == 100.0


def test_compact_and_vacuum(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed(wh, 100.0)
    _seed(wh, 200.0)
    _seed(wh, 300.0)
    wh.compact("transfers", num_files=1)
    assert _folio_rows(wh)["0-1"] == 300.0
    data = [f for f in os.listdir(wh._data_path("transfers")) if f.endswith(".parquet")]
    assert len(data) == 1
    n_before = len(wh.history("transfers"))
    wh.vacuum("transfers", keep=2)
    hist = wh.history("transfers")
    assert len(hist) == 2 < n_before
    assert wh.current_version("transfers") in hist
    assert _folio_rows(wh)["0-1"] == 300.0  # current unaffected


def test_vacuum_dangling_dirs_dont_eat_the_keep_budget(spark, tmp_path):
    """A crashed rewrite's uncommitted version dir (newer than
    _CURRENT) is garbage, not a snapshot: vacuum must delete it AND
    still retain `keep` real committed snapshots — not count the junk
    toward the budget while evicting a valid rollback point."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed(wh, 100.0)
    _seed(wh, 200.0)
    committed = wh.history("transfers")
    cur = wh.current_version("transfers")
    orphan = wh._next_version("transfers")
    os.makedirs(os.path.join(wh.path("transfers"), orphan))
    wh.vacuum("transfers", keep=2)
    hist = wh.history("transfers")
    assert orphan not in hist          # junk removed
    assert hist == committed[-2:]      # both real snapshots kept
    assert wh.current_version("transfers") == cur
    assert _folio_rows(wh)["0-1"] == 200.0


def test_append_visible_in_current(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.ensure("audit_log")
    ts = F.current_timestamp()
    entry = spark.range(1).select(
        ts.alias("ts"), F.lit("0-1").alias("folio"), F.lit("NUEVO").alias("accion"),
        F.lit("d").alias("detalle"),
        F.lit("").alias("valores_anteriores"), F.lit("").alias("valores_nuevos"),
        F.lit("r0").alias("run_id"),
    )
    wh.append("audit_log", entry)
    wh.append("audit_log", entry)
    assert wh.read("audit_log").count() == 2


def test_approx_distinct_within_documented_bound(spark, sf_dir):
    """A9 contract: HLL++ estimates stay within 5% of exact (default
    rsd 2%, margin for small groups) — checked on the detail frame;
    the driver-facing query must report within_bound TRUE everywhere."""
    import __spark_entry__ as entrymod

    from lavasmart_bank_sync_etl_spark.queries_warehouse import a9_calibration_detail

    rows = a9_calibration_detail(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rel_error"] <= 0.05, (r["event_type"], r["rel_error"])

    driver = entrymod.queries()["a9_approx_distinct_calibration"](spark, sf_dir).collect()
    assert driver and all(r["within_bound"] for r in driver)


def test_approx_percentile_within_bound(spark, sf_dir):
    """A10 contract: GK-sketch percentiles within 5% of exact."""
    import __spark_entry__ as entrymod

    from lavasmart_bank_sync_etl_spark.queries_warehouse import a10_calibration_detail

    rows = a10_calibration_detail(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rel_err_p50"] <= 0.05 and r["rel_err_p95"] <= 0.05, tuple(r)

    driver = entrymod.queries()["a10_approx_percentile_calibration"](spark, sf_dir).collect()
    assert driver and all(r["within_bound"] for r in driver)


def test_append_is_snapshot_committed(spark, tmp_path):
    """Round-8 append atomicity: an append commits a NEW version (the
    previous snapshot's files hard-linked in), so committed snapshots
    stay immutable under appends and time travel sees pre-append
    state."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed(wh, 100.0)
    v_before = wh.current_version("transfers")
    extra = wh.read("transfers").withColumn("folio", F.lit("0-2"))
    wh.append("transfers", extra)
    v_after = wh.current_version("transfers")
    assert v_after != v_before
    assert set(_folio_rows(wh)) == {"0-1", "0-2"}
    # the pre-append snapshot is untouched — no partial-append pollution
    assert set(_folio_rows(wh, version=v_before)) == {"0-1"}


def test_append_crash_leaves_current_intact(spark, tmp_path):
    """Simulated crash mid-append: linked files + a torn new file sit
    in an UNCOMMITTED version dir — readers stay on the committed
    snapshot and vacuum removes the junk (the pass-B crash window
    ADVICE r7 flagged, now closed by construction)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed(wh, 100.0)
    cur = wh.current_version("transfers")
    src = os.path.join(wh.path("transfers"), cur)
    orphan = os.path.join(wh.path("transfers"), wh._next_version("transfers"))
    os.makedirs(orphan)
    for name in os.listdir(src):
        if name.endswith(".parquet"):
            os.link(os.path.join(src, name), os.path.join(orphan, name))
    with open(os.path.join(orphan, "part-9999-torn.snappy.parquet"), "wb") as f:
        f.write(b"\x00partial")  # torn write, no pointer commit
    assert wh.current_version("transfers") == cur
    assert _folio_rows(wh) == {"0-1": 100.0}
    wh.vacuum("transfers", keep=2)
    assert not os.path.isdir(orphan)
    assert _folio_rows(wh) == {"0-1": 100.0}


def test_crash_sandwich_never_commits_torn_version(spark, tmp_path):
    """The r8 review's sandwich hole: a crashed append's torn dir must
    NOT become indistinguishable from a committed snapshot once the
    retry commits. The retry reuses the version number (cleared
    first), history/read_version never expose the torn state, and
    vacuum keeps the real rollback snapshot, not the junk."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed(wh, 100.0)
    _seed(wh, 200.0)
    v_rollback = wh.current_version("transfers")
    # crashed append: linked files + torn part file, no pointer commit
    src = os.path.join(wh.path("transfers"), v_rollback)
    torn_name = wh._next_version("transfers")
    torn = os.path.join(wh.path("transfers"), torn_name)
    os.makedirs(torn)
    for name in os.listdir(src):
        if name.endswith(".parquet"):
            os.link(os.path.join(src, name), os.path.join(torn, name))
    with open(os.path.join(torn, "part-9999-torn.snappy.parquet"), "wb") as f:
        f.write(b"\x00partial")
    # dangling dirs are not history and not time-travel targets
    assert torn_name not in wh.history("transfers")
    with pytest.raises(ValueError):
        wh.read_version("transfers", torn_name)
    # the retry lands cleanly ON that version number (torn dir cleared,
    # no stale part files mixed in) — committed state is exactly the
    # retry's rows
    extra = wh.read("transfers").withColumn("folio", F.lit("0-2"))
    wh.append("transfers", extra)
    assert wh.current_version("transfers") == torn_name
    assert set(_folio_rows(wh)) == {"0-1", "0-2"}
    assert set(_folio_rows(wh, version=torn_name)) == {"0-1", "0-2"}
    # vacuum's keep budget counts real snapshots: the rollback version
    # survives keep=2 and time-travels correctly
    wh.vacuum("transfers", keep=2)
    assert wh.history("transfers")[-2:] == [v_rollback, torn_name]
    assert _folio_rows(wh, version=v_rollback) == {"0-1": 200.0}


def test_torn_first_ensure_heals_and_never_masquerades(spark, tmp_path):
    """The cur=None corner of the sandwich hole (r8 review, second
    pass): a crash inside the very FIRST ensure — snapshot dir written,
    pointer never committed — must not leave a torn v_00000001 that
    (a) blocks ensure from retrying (the dir makes exists() true),
    (b) shows up in history once a later write commits, or (c) is
    readable via read_version. ensure heals it: torn dirs cleared,
    create re-run from scratch."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    torn = os.path.join(wh.path("transfers"), "v_00000001")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-0000-torn.snappy.parquet"), "wb") as f:
        f.write(b"\x00partial")
    assert wh.exists("transfers")
    assert wh.current_version("transfers") is None
    # nothing was ever committed: no history, no time travel
    assert wh.history("transfers") == []
    with pytest.raises(ValueError):
        wh.read_version("transfers", "v_00000001")
    # any reader/writer heals via ensure: torn bytes gone, clean create
    assert wh.read("transfers").count() == 0
    assert wh.current_version("transfers") == "v_00000001"
    assert wh.history("transfers") == ["v_00000001"]
    # the healed v_00000001 is a real snapshot: later commits stack on
    # top and time travel back to it reads the (empty) committed state
    _seed(wh, 100.0)
    assert wh.history("transfers") == ["v_00000001", "v_00000002"]
    assert wh.read_version("transfers", "v_00000001").count() == 0
    assert _folio_rows(wh) == {"0-1": 100.0}


def test_vacuum_keep_zero_never_evicts_current(spark, tmp_path):
    """keep is clamped to >=1: 'maintain --vacuum --keep 0' (or a
    negative value) must not rmtree the live snapshot out from under
    _CURRENT (r8 review finding)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed(wh, 100.0)
    _seed(wh, 200.0)
    cur = wh.current_version("transfers")
    wh.vacuum("transfers", keep=0)
    assert wh.history("transfers") == [cur]
    assert _folio_rows(wh) == {"0-1": 200.0}
    wh.vacuum("transfers", keep=-3)
    assert _folio_rows(wh) == {"0-1": 200.0}


def test_first_versioned_commit_sweeps_stale_legacy_root(spark, tmp_path):
    """A pre-versioning table's first rewrite reads the root files,
    commits v_00000001, and must then delete the stale root copies —
    they serve no reader, double storage, and would re-trigger the
    legacy-layout detection if the pointer were ever lost (r8 review
    finding). migrate_legacy/vacuum also sweep them later, covering a
    crash between the commit and the rewrite's own cleanup."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    root = wh.path("transfers")
    _seed(wh, 100.0)  # creates a versioned table; use its rows as donor
    import shutil as _sh
    legacy_root = os.path.join(str(tmp_path), "wh2", "transfers")
    os.makedirs(os.path.dirname(legacy_root), exist_ok=True)
    cur_dir = os.path.join(root, wh.current_version("transfers"))
    _sh.copytree(cur_dir, legacy_root)  # parquet files directly in root
    wh2 = Warehouse(spark, os.path.join(str(tmp_path), "wh2"))
    assert wh2.current_version("transfers") is None
    assert _folio_rows(wh2) == {"0-1": 100.0}          # legacy read OK
    _seed(wh2, 500.0)                                   # first rewrite
    assert wh2.current_version("transfers") == "v_00000001"
    stale = [n for n in os.listdir(legacy_root)
             if os.path.isfile(os.path.join(legacy_root, n)) and n != "_CURRENT"]
    assert stale == []                                  # root swept
    assert _folio_rows(wh2) == {"0-1": 500.0}


def test_migrate_legacy_survives_torn_first_ensure_husk(spark, tmp_path):
    """migrate_legacy runs BEFORE ensure in SyncJob; on an audit_log
    husk left by a torn first ensure (v_* dir, no pointer, no legacy
    root data) it must return quietly after clearing — not raise
    UNABLE_TO_INFER_SCHEMA reading the now-empty dir (r8 review
    finding) — leaving ensure() to recreate."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    torn = os.path.join(wh.path("audit_log"), "v_00000001")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-0000-torn.snappy.parquet"), "wb") as f:
        f.write(b"\x00partial")
    wh.migrate_legacy()          # must not raise
    wh.migrate_legacy()          # and stays quiet on the cleared husk
    assert wh.read("audit_log").count() == 0   # ensure recreated
    assert wh.history("audit_log") == ["v_00000001"]


def test_torn_vacuum_rmtree_never_pollutes_history(spark, tmp_path, monkeypatch):
    """The round-9 deleter corner: vacuum's delete of an old COMMITTED
    snapshot is rename-to-tombstone + rmtree. A crash mid-rmtree
    (simulated: rmtree deletes one file then dies) must leave the
    victim OUT of history — the atomic rename already evicted it — so
    time travel can never read its torn contents; the tombstone is
    pure garbage the next writer/vacuum sweeps."""
    import shutil as _shutil

    import pytest as _pytest

    from lavasmart_bank_sync_etl_spark.sources import warehouse as W

    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed(wh, 100.0)
    _seed(wh, 200.0)
    _seed(wh, 300.0)
    victim = wh.history("transfers")[0]

    real_rmtree = _shutil.rmtree

    def torn_rmtree(path, *a, **k):
        if W._TOMBSTONE in os.path.basename(path):
            # tear: remove one data file, then die mid-delete
            for n in sorted(os.listdir(path)):
                p = os.path.join(path, n)
                if os.path.isfile(p):
                    os.remove(p)
                    break
            raise OSError("injected mid-rmtree crash")
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(W.shutil, "rmtree", torn_rmtree)
    with _pytest.raises(OSError, match="injected"):
        wh.vacuum("transfers", keep=1)
    monkeypatch.undo()

    # the victim left history atomically at the rename — the torn
    # remains are a tombstone, never a readable snapshot
    assert victim not in wh.history("transfers")
    with _pytest.raises(ValueError):
        wh.read_version("transfers", victim)
    tomb = W._TOMBSTONE + victim
    assert tomb in os.listdir(wh.path("transfers"))
    # read_version must also refuse the tombstone name itself
    with _pytest.raises(ValueError):
        wh.read_version("transfers", tomb)
    # current state is untouched
    assert _folio_rows(wh)["0-1"] == 300.0

    # convergence: the next writer (any mutating verb goes through
    # _clear_dangling) sweeps the tombstone and the table is healthy
    _seed(wh, 400.0)
    assert not [
        n for n in os.listdir(wh.path("transfers"))
        if n.startswith(W._TOMBSTONE)
    ]
    assert _folio_rows(wh)["0-1"] == 400.0
    wh.vacuum("transfers", keep=1)
    assert len(wh.history("transfers")) == 1


def test_vacuum_retry_after_torn_rmtree_converges(spark, tmp_path, monkeypatch):
    """Retrying vacuum itself (not another writer) after a torn
    eviction must sweep the leftover tombstone and finish the prune."""
    import shutil as _shutil

    import pytest as _pytest

    from lavasmart_bank_sync_etl_spark.sources import warehouse as W

    wh = Warehouse(spark, str(tmp_path / "wh"))
    for m in (100.0, 200.0, 300.0, 400.0):
        _seed(wh, m)

    real_rmtree = _shutil.rmtree
    calls = {"n": 0}

    def crash_first_tombstone(path, *a, **k):
        if W._TOMBSTONE in os.path.basename(path) and calls["n"] == 0:
            calls["n"] += 1
            raise OSError("injected")
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(W.shutil, "rmtree", crash_first_tombstone)
    with _pytest.raises(OSError, match="injected"):
        wh.vacuum("transfers", keep=1)
    monkeypatch.undo()

    wh.vacuum("transfers", keep=1)  # retry
    hist = wh.history("transfers")
    assert len(hist) == 1 and hist[0] == wh.current_version("transfers")
    assert not [
        n for n in os.listdir(wh.path("transfers"))
        if n.startswith(W._TOMBSTONE)
    ]
    assert _folio_rows(wh)["0-1"] == 400.0


def test_peek_is_strictly_read_only(spark, tmp_path):
    """peek(): committed state and legacy roots are served, torn husks
    and absent tables return None — and NOTHING is created, healed, or
    locked in any of those states (the read-verb contract)."""
    import shutil as _shutil

    wh = Warehouse(spark, str(tmp_path / "wh"))
    # absent table
    assert wh.peek("transfers") is None
    assert not wh.exists("transfers")
    # committed state
    _seed(wh, 100.0)
    assert {r["folio"] for r in wh.peek("transfers").collect()} == {"0-1"}
    # legacy layout: root parquet, no pointer — served as-is, even
    # with a dangling v_* leftover alongside (explicit file list)
    legacy = str(tmp_path / "wh" / "audit_log")
    df = spark.createDataFrame(
        [(None, "F-1", "ALTA", "d", "", "", None)],
        wh.read("audit_log").schema,
    )
    wh.ensure("audit_log")
    df.write.mode("overwrite").parquet(str(tmp_path / "flat"))
    _shutil.rmtree(legacy)
    os.makedirs(legacy)
    for n in os.listdir(str(tmp_path / "flat")):
        if n.endswith(".parquet"):
            _shutil.copy(os.path.join(str(tmp_path / "flat"), n), legacy)
    os.makedirs(os.path.join(legacy, "v_00000007"))  # dangling junk
    got = wh.peek("audit_log").collect()
    assert [r["folio"] for r in got] == ["F-1"]
    assert os.path.isdir(os.path.join(legacy, "v_00000007"))  # untouched
    assert not os.path.exists(os.path.join(legacy, "_CURRENT"))
    # torn husk: v_* dirs, no pointer, no root parquet → None, unhealed
    husk = str(tmp_path / "wh" / "cards")
    os.makedirs(os.path.join(husk, "v_00000001"))
    assert wh.peek("cards") is None
    assert os.path.isdir(os.path.join(husk, "v_00000001"))


def test_legacy_layout_read_is_lock_free(spark, tmp_path):
    """ensure()'s no-op fast paths must include the pure pre-versioning
    legacy layout (root parquet, no pointer): reading such a table
    while ANOTHER writer holds the lease must serve the data, not
    raise ConcurrentWriterError — reads never contend."""
    import shutil as _shutil

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.ensure("audit_log")
    df = spark.createDataFrame(
        [(None, "F-1", "ALTA", "d", "", "", None)],
        wh.read("audit_log").schema,
    )
    flat = str(tmp_path / "flat")
    df.write.mode("overwrite").parquet(flat)
    legacy = wh.path("audit_log")
    _shutil.rmtree(legacy)
    os.makedirs(legacy)
    for n in os.listdir(flat):
        if n.endswith(".parquet"):
            _shutil.copy(os.path.join(flat, n), legacy)

    other = Warehouse(spark, str(tmp_path / "wh"))
    with other.lock():  # a concurrent writer mid-run
        got = wh.read("audit_log").collect()  # must not contend
    assert [r["folio"] for r in got] == ["F-1"]
    assert wh.current_version("audit_log") is None  # still legacy


def test_history_filters_malformed_names_and_damaged_pointers(spark, tmp_path):
    """Read verbs degrade on external junk, never serve it: a v_*
    DIRECTORY whose name no writer produces is excluded from history
    even when it sorts below the pointer (it used to masquerade as a
    committed time-travel target), read_version refuses it, and a
    tampered or unreadable pointer makes history [] (committed state
    unknowable; fsck reports, rollback recovers) instead of a junk
    string-compare listing — while the refusal message itself must
    not crash on the damaged pointer."""
    import pytest

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    wh.rewrite("transfers", wh.read("transfers"))  # v2
    tdir = os.path.join(root, "transfers")

    # junk dir sorting BELOW the pointer
    os.makedirs(os.path.join(tdir, "v_00000000x"))
    assert wh.history("transfers") == ["v_00000001", "v_00000002"]
    with pytest.raises(ValueError, match="not a committed snapshot"):
        wh.read_version("transfers", "v_00000000x")
    # writers keep working around it
    wh.rewrite("transfers", wh.read("transfers"))  # v3
    assert wh.history("transfers")[-1] == "v_00000003"

    # tampered (regex-failing) pointer: history degrades to empty
    cur = os.path.join(tdir, "_CURRENT")
    with open(cur, "w") as f:
        f.write("../outside")
    assert wh.history("transfers") == []

    # unreadable pointer (directory): history degrades, and
    # read_version's refusal message reads the pointer tolerantly
    os.unlink(cur)
    os.makedirs(cur)
    assert wh.history("transfers") == []
    with pytest.raises(ValueError, match="<unreadable>"):
        wh.read_version("transfers", "v_00000002")


def test_tampered_pointer_is_never_followed(spark, tmp_path):
    """A malformed pointer must FAIL, not be joined into a path: a
    _CURRENT holding '../outside' used to make read()/peek() serve a
    directory OUTSIDE the store root as committed table state."""
    import pytest

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    # plant data OUTSIDE the store where the traversal would land
    outside = tmp_path / "outside"
    wh_out = Warehouse(spark, str(tmp_path))
    os.makedirs(outside, exist_ok=True)
    del wh_out
    with open(os.path.join(root, "transfers", "_CURRENT"), "w") as f:
        f.write("../../outside")
    assert wh.peek("transfers") is None  # read verbs degrade
    with pytest.raises(ValueError, match="not a writer-written"):
        wh.read("transfers").count()  # writer-path reads fail loudly


def test_fifo_pointer_reports_damage_without_hanging(spark, tmp_path):
    """open() on a FIFO blocks forever; the tolerant pointer readers
    must stat first so fsck/peek/rollback report pointer_unreadable
    instead of hanging on exactly the junk they exist to diagnose."""
    from lavasmart_bank_sync_etl_spark.sources.fsck import inspect_store

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    wh.rewrite("transfers", wh.read("transfers"))  # v2
    cur = os.path.join(root, "transfers", "_CURRENT")
    os.unlink(cur)
    os.mkfifo(cur)
    assert wh.pointer_state("transfers") == (None, True)
    assert wh.peek("transfers") is None
    report = inspect_store(root)
    assert "pointer_unreadable" in {
        f["kind"] for f in report["findings"] if f["severity"] == "damage"
    }
    # rollback recovers straight through the FIFO (os.replace overwrites it)
    wh.rollback("transfers", "v_00000002")
    assert wh.current_version("transfers") == "v_00000002"


def test_repeat_damage_rollback_tombstones_dont_collide(spark, tmp_path):
    """Directory-junk _CURRENT is renamed to a tombstone by rollback;
    REPEAT damage before any writer sweeps must pick a fresh tombstone
    name instead of failing ENOTEMPTY on the earlier one."""
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    wh.rewrite("transfers", wh.read("transfers"))  # v2
    cur = os.path.join(root, "transfers", "_CURRENT")
    for _ in range(2):
        os.unlink(cur)
        os.makedirs(os.path.join(cur, "junk"))
        wh.rollback("transfers", "v_00000002")
        assert wh.current_version("transfers") == "v_00000002"
    tombs = [
        n for n in os.listdir(os.path.join(root, "transfers"))
        if n.startswith("_rm__CURRENT")
    ]
    assert len(tombs) == 2  # both junk dirs parked, none lost
    # the next writer sweeps both
    wh.rewrite("transfers", wh.read("transfers"))
    assert not [
        n for n in os.listdir(os.path.join(root, "transfers"))
        if n.startswith("_rm_")
    ]


def test_symlink_tombstone_junk_does_not_brick_writers(spark, tmp_path):
    """External junk: a SYMLINK wearing a tombstone name used to make
    the sweep's rmtree raise out of every writer; it is unlinked."""
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    link = os.path.join(root, "transfers", "_rm_v_00000000")
    os.symlink(os.path.join(root, "transfers", "v_00000001"), link)
    wh.rewrite("transfers", wh.read("transfers"))  # must not raise
    assert not os.path.lexists(link)
    assert wh.current_version("transfers") == "v_00000002"
