"""fsck classification pins: every crash state the snapshot protocol
heals must read as ``healable``, every protocol-impossible state as
``damage``, and a healthy store as clean — so the diagnostic verb
stays in lockstep with the healing machinery it describes.

Structural tests are Spark-free (states are built with pyarrow files
and bare directories, exactly what the protocol leaves on disk); one
integration test runs fsck against a REAL Warehouse before/after a
genuine crash-shaped mutation to prove the two views agree.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lavasmart_bank_sync_etl_spark.sources.fsck import inspect_store
from lavasmart_bank_sync_etl_spark.sources.lease import _LOCKFILE


def _mk_snapshot(root: str, table: str, version: str, commit: bool = True) -> str:
    path = os.path.join(root, table, version)
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({"folio": ["F1"]}), os.path.join(path, "part-0.parquet"))
    if commit:
        with open(os.path.join(root, table, "_CURRENT"), "w") as f:
            f.write(version)
    return path


def _kinds(report: dict, severity: str | None = None) -> set[str]:
    return {
        f["kind"]
        for f in report["findings"]
        if severity is None or f["severity"] == severity
    }


def test_clean_store_is_clean(tmp_path):
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    report = inspect_store(root, deep=True)
    assert report["clean"] is True
    assert report["exit_code"] == 0
    assert report["tables"]["transfers"]["pointer"] == "v_00000001"
    assert report["tables"]["transfers"]["committed"] == ["v_00000001"]


def test_dangling_and_tombstone_are_healable(tmp_path):
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    _mk_snapshot(root, "transfers", "v_00000002", commit=False)  # crashed write
    os.makedirs(os.path.join(root, "transfers", "_rm_v_00000000"))  # torn vacuum
    report = inspect_store(root)
    assert report["exit_code"] == 1
    assert {"dangling_snapshot", "tombstone"} <= _kinds(report, "healable")
    assert report["tables"]["transfers"]["dangling"] == ["v_00000002"]
    assert not _kinds(report, "damage")


def test_torn_first_commit_and_pointer_tmp(tmp_path):
    root = str(tmp_path)
    _mk_snapshot(root, "cards", "v_00000001", commit=False)  # no pointer ever
    _mk_snapshot(root, "transfers", "v_00000001")
    open(os.path.join(root, "transfers", "_CURRENT.tmp"), "w").close()
    report = inspect_store(root)
    assert {"torn_first_commit", "pointer_tmp"} <= _kinds(report, "healable")
    assert report["exit_code"] == 1


def test_pointer_target_missing_is_damage(tmp_path):
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    with open(os.path.join(root, "transfers", "_CURRENT"), "w") as f:
        f.write("v_00000009")  # names a snapshot that does not exist
    report = inspect_store(root)
    assert "pointer_target_missing" in _kinds(report, "damage")
    assert report["exit_code"] == 2


def test_malformed_pointer_is_damage(tmp_path):
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    with open(os.path.join(root, "transfers", "_CURRENT"), "w") as f:
        f.write("../outside")
    report = inspect_store(root)
    assert "pointer_malformed" in _kinds(report, "damage")
    assert report["exit_code"] == 2


def test_torn_older_snapshot_needs_deep(tmp_path):
    root = str(tmp_path)
    old = _mk_snapshot(root, "transfers", "v_00000001")
    _mk_snapshot(root, "transfers", "v_00000002")  # pointer moves here
    # overwrite an OLDER committed file with torn bytes (protocol-
    # impossible: committed snapshots are immutable — only external
    # interference). The default run certifies only the CURRENT
    # snapshot's footers, so history damage needs --deep.
    with open(os.path.join(old, "part-0.parquet"), "wb") as f:
        f.write(b"not parquet")
    shallow = inspect_store(root, deep=False)
    assert shallow["exit_code"] == 0  # current snapshot is intact
    deep = inspect_store(root, deep=True)
    assert "torn_committed_snapshot" in _kinds(deep, "damage")
    assert deep["exit_code"] == 2


def test_torn_current_snapshot_caught_by_default(tmp_path):
    """The snapshot users actually read is footer-checked WITHOUT
    --deep: torn bytes on the hot table must surface immediately, at
    the cost of one snapshot's footer reads per table."""
    root = str(tmp_path)
    path = _mk_snapshot(root, "transfers", "v_00000001")
    with open(os.path.join(path, "part-0.parquet"), "wb") as f:
        f.write(b"not parquet")
    shallow = inspect_store(root, deep=False)
    assert "torn_committed_snapshot" in _kinds(shallow, "damage")
    assert shallow["exit_code"] == 2
    assert any(
        "CURRENT" in f["detail"]
        for f in shallow["findings"]
        if f["kind"] == "torn_committed_snapshot"
    )


def test_deep_unavailable_when_pyarrow_missing(tmp_path, monkeypatch):
    """With no footer checker, 'could not check' must read as ONE info
    finding (deep_unavailable), never as per-snapshot torn-bytes
    damage prescribing a rollback that would itself refuse every
    target for the same reason."""
    import lavasmart_bank_sync_etl_spark.sources.fsck as fsck_mod

    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    _mk_snapshot(root, "cards", "v_00000001")
    monkeypatch.setattr(fsck_mod, "_pyarrow_available", lambda: False)
    report = inspect_store(root, deep=True)
    assert "torn_committed_snapshot" not in _kinds(report)
    assert "deep_unavailable" in _kinds(report, "info")
    assert sum(
        1 for f in report["findings"] if f["kind"] == "deep_unavailable"
    ) == 1  # once per run, not per table/snapshot
    assert report["exit_code"] == 0


def test_malformed_version_dir_findings(tmp_path):
    """A DIRECTORY wearing a name no writer produces gets a finding
    whose severity tracks whether any writer sweep reclaims it:
    sorts at/below a valid pointer (masquerades as committed history)
    → damage; above the pointer or in a never-committed table (the
    dangling sweep clears it) → healable — and it never appears in
    the committed/dangling state lists."""
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000002")
    os.makedirs(os.path.join(root, "transfers", "v_00000000x"))  # sorts below
    os.makedirs(os.path.join(root, "transfers", "v_junk"))       # sorts above
    report = inspect_store(root)
    by_sev = {
        f["detail"].split()[0]: f["severity"]
        for f in report["findings"]
        if f["kind"] == "malformed_version_dir"
    }
    assert by_sev == {"v_00000000x": "damage", "v_junk": "healable"}
    assert report["tables"]["transfers"]["committed"] == ["v_00000002"]
    assert report["tables"]["transfers"]["dangling"] == []
    assert report["exit_code"] == 2

    # never-committed table: every v_* dir is cleared by the next
    # writer, junk names included
    os.makedirs(os.path.join(root, "cards", "v_abc"))
    report = inspect_store(root)
    assert ("cards", "healable") in {
        (f["table"], f["severity"])
        for f in report["findings"]
        if f["kind"] == "malformed_version_dir"
    }


def test_legacy_layout_states(tmp_path):
    root = str(tmp_path)
    # pure pre-versioning layout: info, not a problem
    os.makedirs(os.path.join(root, "transfers"))
    pq.write_table(
        pa.table({"folio": ["F1"]}),
        os.path.join(root, "transfers", "legacy.parquet"),
    )
    # pending one-shot rename
    os.makedirs(os.path.join(root, "conciliacion_bancaria"))
    report = inspect_store(root)
    assert "legacy_layout" in _kinds(report, "info")
    assert "legacy_rename_pending" in _kinds(report, "healable")
    assert report["tables"]["transfers"]["layout"] == "legacy"


def test_unmigrated_v1_audit_root_is_healable(tmp_path):
    root = str(tmp_path)
    _mk_snapshot(root, "audit_log", "v_00000001")
    v1 = pa.table(
        {
            "ts": pa.array([None], pa.timestamp("us")),
            "folio": ["F1"],
            "campo_modificado": ["monto"],
            "valor_anterior": ["1"],
            "valor_nuevo": ["2"],
        }
    )
    pq.write_table(v1, os.path.join(root, "audit_log", "legacy.parquet"))
    report = inspect_store(root)
    assert "unmigrated_v1_root" in _kinds(report, "healable")


def test_stale_and_unreadable_root_copies(tmp_path):
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    pq.write_table(
        pa.table({"folio": ["F1"]}),
        os.path.join(root, "transfers", "stale.parquet"),
    )
    report = inspect_store(root)
    assert "stale_legacy_root" in _kinds(report, "healable")
    with open(os.path.join(root, "transfers", "stale.parquet"), "wb") as f:
        f.write(b"torn")
    report = inspect_store(root)
    assert "unreadable_root_parquet" in _kinds(report, "healable")
    assert "stale_legacy_root" not in _kinds(report)


def test_lock_states(tmp_path):
    root = str(tmp_path)
    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, _LOCKFILE)
    # live owner: this very process
    with open(lock, "w") as f:
        f.write(f"{os.getpid()} -\n")
    assert "lock_held" in _kinds(inspect_store(root), "info")
    # dead owner: a pid that cannot exist
    with open(lock, "w") as f:
        f.write("999999999 -\n")
    assert "lock_stale" in _kinds(inspect_store(root), "healable")
    # unparseable content
    with open(lock, "w") as f:
        f.write("???")
    assert "lock_unparseable" in _kinds(inspect_store(root), "healable")
    os.unlink(lock)
    # litter: orphan tmp + dead-content quarantine
    open(os.path.join(root, f"{_LOCKFILE}.999999999.1.tmp"), "w").close()
    with open(os.path.join(root, f"{_LOCKFILE}.stale.999999998.1"), "w") as f:
        f.write("999999997 -\n")
    kinds = _kinds(inspect_store(root), "healable")
    assert {"lock_tmp", "lock_quarantine"} <= kinds
    # live-content quarantine is deliberate (never destroyed): info
    with open(os.path.join(root, f"{_LOCKFILE}.stale.999999998.1"), "w") as f:
        f.write(f"{os.getpid()} -\n")
    assert "lock_quarantine_live" in _kinds(inspect_store(root), "info")


def test_unreadable_pointer_is_damage_not_crash(tmp_path):
    """External interference can make _CURRENT unreadable as text (a
    directory, binary junk); the diagnostic must report damage, never
    raise — an operator points fsck at EXACTLY such stores."""
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    cur = os.path.join(root, "transfers", "_CURRENT")
    os.unlink(cur)
    os.makedirs(cur)  # _CURRENT as a directory
    report = inspect_store(root)
    assert "pointer_unreadable" in _kinds(report, "damage")
    os.rmdir(cur)
    with open(cur, "wb") as f:
        f.write(b"\xff\xfe\x00junk")  # undecodable bytes
    report = inspect_store(root)
    assert "pointer_unreadable" in _kinds(report, "damage")
    assert report["exit_code"] == 2


def test_fsck_never_raises_on_adversarial_trees(tmp_path):
    """Property: inspect_store returns a well-formed report on
    arbitrary junk layouts (hypothesis-built file/dir trees using the
    protocol's magic names in wrong positions) — a diagnostic that
    crashes on damage is useless exactly when needed. Deterministic
    examples; hypothesis drives the name/shape mix."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    magic = st.sampled_from(
        ["_CURRENT", "_CURRENT.tmp", "v_00000001", "v_junk", "_rm_v_1",
         "_WRITER_LOCK", "_WRITER_LOCK.stale.x.y", "_WRITER_LOCK.1.2.tmp",
         "part-0.parquet", "data", "v_00000001x"]
    )
    payload = st.sampled_from([b"", b"v_00000001", b"\xff\xfe", b"9" * 64])

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(st.tuples(st.sampled_from(["transfers", "audit_log", ""]),
                              magic, st.booleans(), payload),
                    max_size=8))
    def prop(entries):
        import shutil
        import tempfile

        root = tempfile.mkdtemp(dir=str(tmp_path))
        try:
            for table, name, as_dir, content in entries:
                d = os.path.join(root, table) if table else root
                os.makedirs(d, exist_ok=True)
                p = os.path.join(d, name)
                if os.path.exists(p):
                    continue
                if as_dir:
                    os.makedirs(p)
                else:
                    with open(p, "wb") as f:
                        f.write(content)
            report = inspect_store(root, deep=True)
            assert set(report["counts"]) == {"info", "healable", "damage"}
            assert isinstance(report["clean"], bool)
            assert report["exit_code"] in (0, 1, 2)
            for f in report["findings"]:
                assert f["severity"] in ("info", "healable", "damage")
        finally:
            shutil.rmtree(root, ignore_errors=True)

    prop()


def test_reserved_name_file_is_healable(tmp_path):
    """A FILE wearing a snapshot/tombstone name is external junk:
    fsck reports it healable (writers skip it in version math; the
    engine-owned root sweep removes it) — and it must NOT read as a
    dangling snapshot or tombstone."""
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    open(os.path.join(root, "transfers", "v_00000099"), "w").close()
    open(os.path.join(root, "transfers", "_rm_v_x"), "w").close()
    report = inspect_store(root)
    findings = [f for f in report["findings"] if f["kind"] == "reserved_name_file"]
    assert len(findings) == 2
    assert all(f["severity"] == "healable" for f in findings)
    assert report["exit_code"] == 1
    assert "dangling_snapshot" not in _kinds(report)
    assert "tombstone" not in _kinds(report)


def test_writers_tolerate_reserved_name_files(spark, tmp_path):
    """The same junk must not brick writers: _clear_dangling used to
    rmtree a v_-named FILE (NotADirectoryError on every write) and
    history() could list it as an unreadable snapshot. Writers now
    skip non-dirs; maintenance's root sweep then reclaims the junk,
    converging fsck back to clean."""
    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    junk = os.path.join(root, "transfers", "v_99999999")
    open(junk, "w").close()
    assert "reserved_name_file" in _kinds(inspect_store(root), "healable")
    wh.rewrite("transfers", wh.read("transfers"))       # v2, no crash
    wh.append("transfers", wh.read("transfers"))        # v3, no crash
    assert wh.history("transfers") == [
        "v_00000001", "v_00000002", "v_00000003"
    ]  # junk never surfaces as history
    wh.vacuum("transfers", keep=1)                      # sweeps the junk
    assert wh.current_version("transfers") == "v_00000003"
    assert not os.path.exists(junk)
    assert inspect_store(root, deep=True)["clean"] is True


def test_missing_root_is_damage(tmp_path):
    report = inspect_store(str(tmp_path / "nope"))
    assert report["exit_code"] == 2
    assert "missing_root" in _kinds(report, "damage")


def test_unknown_entries_are_info_only(tmp_path):
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    os.makedirs(os.path.join(root, "somebody_elses_dir"))
    report = inspect_store(root)
    assert report["exit_code"] == 0
    assert "unknown_entries" in _kinds(report, "info")
    assert report["unknown_entries"] == ["somebody_elses_dir"]


def test_mixed_states_and_exit_code_precedence(tmp_path):
    """Findings across tables accumulate independently and damage
    dominates the exit code over any number of healable findings."""
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    _mk_snapshot(root, "transfers", "v_00000002", commit=False)  # healable
    _mk_snapshot(root, "cards", "v_00000001", commit=False)      # healable
    _mk_snapshot(root, "cash", "v_00000001")
    with open(os.path.join(root, "cash", "_CURRENT"), "w") as f:
        f.write("v_00000042")                                    # damage
    report = inspect_store(root)
    assert report["exit_code"] == 2
    assert report["counts"]["damage"] == 1
    assert report["counts"]["healable"] >= 2
    per_table = {
        (f["table"], f["kind"]) for f in report["findings"]
    }
    assert ("transfers", "dangling_snapshot") in per_table
    assert ("cards", "torn_first_commit") in per_table
    assert ("cash", "pointer_target_missing") in per_table


def test_cli_fsck_exit_codes_and_readonly(tmp_path):
    """The CLI verb relays inspect_store's exit code and mutates
    nothing (byte-identical directory tree before and after)."""
    root = str(tmp_path)
    _mk_snapshot(root, "transfers", "v_00000001")
    _mk_snapshot(root, "transfers", "v_00000002", commit=False)

    def tree(r):
        out = {}
        for d, _, files in os.walk(r):
            for n in files:
                p = os.path.join(d, n)
                out[os.path.relpath(p, r)] = os.path.getsize(p)
        return out

    before = tree(root)
    proc = subprocess.run(
        [sys.executable, "-m", "lavasmart_bank_sync_etl_spark.cli",
         "fsck", "--warehouse", root],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 1, proc.stderr
    report = json.loads(proc.stdout)
    assert "dangling_snapshot" in {f["kind"] for f in report["findings"]}
    assert tree(root) == before


def test_catalog_store_swap_leftovers(spark, tmp_path):
    """The catalog twin classifies each swap-crash window as healable
    and reads clean after the protocol's own recovery converges it."""
    from lavasmart_bank_sync_etl_spark.sources.catalog_store import CatalogStore
    from lavasmart_bank_sync_etl_spark.sources.fsck import inspect_catalog_store

    store = CatalogStore(spark, str(tmp_path / "cat"))
    store.ensure("transfers")
    store.rewrite("transfers", store.read("transfers"))
    assert inspect_catalog_store(store)["clean"] is True

    target = store._qualified("transfers")
    # staged leftover: crash before the swap
    store.read("transfers").write.format("parquet").saveAsTable(f"{target}__staged")
    report = inspect_catalog_store(store)
    assert {f["kind"] for f in report["findings"]} == {"staged_leftover"}
    assert report["exit_code"] == 1
    store.rewrite("transfers", store.read("transfers"))  # next rewrite converges
    assert inspect_catalog_store(store)["clean"] is True

    # parked state: crash inside the swap window (target renamed away)
    spark.sql(f"ALTER TABLE {target} RENAME TO {target}__old")
    report = inspect_catalog_store(store)
    assert {f["kind"] for f in report["findings"]} == {"parked_state"}
    store.ensure("transfers")  # single recovery rename
    assert inspect_catalog_store(store)["clean"] is True

    # old leftover: crash between rename-in and the final drop
    store.read("transfers").write.format("parquet").saveAsTable(f"{target}__old")
    report = inspect_catalog_store(store)
    assert {f["kind"] for f in report["findings"]} == {"old_leftover"}
    store.rewrite("transfers", store.read("transfers"))
    assert inspect_catalog_store(store)["clean"] is True


def test_disaster_recovery_loop(spark, tmp_path):
    """The full damage workflow fsck prescribes: a real synced
    warehouse suffers external loss of its CURRENT snapshot → fsck
    reports damage (exit 2) and reads fail → `rollback` restores the
    surviving snapshot → fsck is clean, reads work, and a sync can
    resume and commit on top."""
    import shutil

    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    df = wh.read("transfers")
    wh.rewrite("transfers", df)  # v2
    wh.rewrite("transfers", df)  # v3
    assert wh.current_version("transfers") == "v_00000003"

    # external interference: the live snapshot vanishes
    shutil.rmtree(os.path.join(root, "transfers", "v_00000003"))
    report = inspect_store(root)
    assert report["exit_code"] == 2
    assert "pointer_target_missing" in _kinds(report, "damage")
    with pytest.raises(Exception):
        wh.read("transfers").count()

    # recovery: roll back to the newest intact survivor
    wh.rollback("transfers", "v_00000002")
    after = inspect_store(root, deep=True)
    assert after["clean"] is True, after["findings"]
    assert wh.read("transfers").count() == 0
    assert wh.history("transfers") == ["v_00000001", "v_00000002"]

    # the engine resumes writing on top of the restored state
    wh.rewrite("transfers", wh.read("transfers"))
    assert wh.current_version("transfers") == "v_00000003"
    assert inspect_store(root, deep=True)["clean"] is True


def test_rollback_safety_rails(spark, tmp_path):
    """rollback refuses everything that is not an intact, committed
    rollback target — and leaves newer dirs as the documented undo
    window rather than sweeping them."""
    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    wh.rewrite("transfers", wh.read("transfers"))  # v2

    # dangling (newer-than-pointer) dir is not a target
    os.makedirs(os.path.join(root, "transfers", "v_00000009"))
    with pytest.raises(ValueError, match="newer than the committed"):
        wh.rollback("transfers", "v_00000009")
    # garbage names / absent dirs are not targets
    with pytest.raises(ValueError, match="not an on-disk snapshot"):
        wh.rollback("transfers", "v_00000007")
    with pytest.raises(ValueError, match="not an on-disk snapshot"):
        wh.rollback("transfers", "../outside")
    # torn bytes inside the target are refused
    bad = os.path.join(root, "transfers", "v_00000001")
    victim = next(n for n in os.listdir(bad) if n.endswith(".parquet"))
    with open(os.path.join(bad, victim), "wb") as f:
        f.write(b"torn")
    with pytest.raises(ValueError, match="unreadable parquet"):
        wh.rollback("transfers", "v_00000001")
    # no-pointer table has nothing to roll back
    os.makedirs(os.path.join(root, "cards"))
    with pytest.raises(ValueError, match="no committed pointer"):
        wh.rollback("cards", "v_00000001")

    # repair v1 so it is an intact target again, then pin the
    # post-rollback semantics: the newer dir is LEFT on disk
    # (hand-recoverable until the next write) and rolling FORWARD to
    # it is refused — indistinguishable from a crashed write
    os.remove(os.path.join(bad, victim))
    pq.write_table(pa.table({"folio": ["F1"]}), os.path.join(bad, victim))
    wh.rollback("transfers", "v_00000001")
    assert wh.current_version("transfers") == "v_00000001"
    assert os.path.isdir(os.path.join(root, "transfers", "v_00000002"))
    wh.rollback("transfers", "v_00000001")  # idempotent on same target
    with pytest.raises(ValueError, match="newer than the committed"):
        wh.rollback("transfers", "v_00000002")


def test_rollback_recovers_malformed_pointer(spark, tmp_path):
    """When the pointer itself is the damage (tampered content that
    does not parse as a version name), the newer-than-pointer rail
    cannot apply — any INTACT snapshot is accepted, restoring a
    readable pointer."""
    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    wh.rewrite("transfers", wh.read("transfers"))  # v2
    with open(os.path.join(root, "transfers", "_CURRENT"), "w") as f:
        f.write("../tampered")
    assert inspect_store(root)["exit_code"] == 2
    wh.rollback("transfers", "v_00000002")
    assert wh.current_version("transfers") == "v_00000002"
    assert inspect_store(root, deep=True)["clean"] is True
    assert wh.read("transfers").count() == 0


def test_rollback_recovers_unreadable_pointer(spark, tmp_path):
    """When _CURRENT cannot even be READ as text (binary junk, or a
    directory wearing the name), rollback is still the prescribed
    recovery verb: it reads the pointer tolerantly, accepts any intact
    snapshot, clears the junk itself, and never asks the operator to
    pre-delete _CURRENT (a pointer-less store reads as never-committed
    and the next writer's sweep would reclaim every snapshot)."""
    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    wh.rewrite("transfers", wh.read("transfers"))  # v2
    cur = os.path.join(root, "transfers", "_CURRENT")

    # binary junk pointer
    with open(cur, "wb") as f:
        f.write(b"\xff\xfe\x00junk")
    assert "pointer_unreadable" in _kinds(inspect_store(root), "damage")
    assert wh.peek("transfers") is None  # read verbs degrade, not crash
    wh.rollback("transfers", "v_00000002")
    assert wh.current_version("transfers") == "v_00000002"
    assert inspect_store(root, deep=True)["clean"] is True

    # _CURRENT as a DIRECTORY (os.replace cannot overwrite it; rollback
    # renames it aside to a tombstone the next writer sweeps)
    os.unlink(cur)
    os.makedirs(os.path.join(cur, "nested"))
    open(os.path.join(cur, "nested", "junk"), "w").close()
    assert "pointer_unreadable" in _kinds(inspect_store(root), "damage")
    wh.rollback("transfers", "v_00000001")
    assert wh.current_version("transfers") == "v_00000001"
    assert wh.read("transfers").count() == 0
    # the junk dir became a tombstone; the next writer reclaims it
    wh.rewrite("transfers", wh.read("transfers"))
    assert inspect_store(root, deep=True)["clean"] is True

    # the surviving snapshots were NEVER dangling-swept away
    assert wh.history("transfers") == ["v_00000001", "v_00000002"]


def test_cli_rollback_survives_unreadable_pointer(spark, tmp_path):
    """The CLI verb's before-state probe and error path must not
    traceback on the exact damage rollback exists to repair."""
    from lavasmart_bank_sync_etl_spark import cli
    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    cur = os.path.join(root, "transfers", "_CURRENT")
    os.unlink(cur)
    os.makedirs(cur)
    assert cli.main([
        "rollback", "--warehouse", root,
        "--table", "transfers", "--version", "v_00000001",
    ]) == 0
    assert wh.current_version("transfers") == "v_00000001"
    # refusal with a damaged pointer and a bogus target: clean exit 2
    os.unlink(cur) if os.path.isfile(cur) else None
    with open(cur, "wb") as f:
        f.write(b"\xff\xfe")
    assert cli.main([
        "rollback", "--warehouse", root,
        "--table", "transfers", "--version", "v_00000042",
    ]) == 2


def test_rollback_skips_footer_check_without_pyarrow(spark, tmp_path, monkeypatch):
    """With pyarrow absent every footer probe returns None; rollback
    must not conflate 'could not check' with 'torn' and refuse every
    target (recovery would be impossible exactly when prescribed)."""
    import lavasmart_bank_sync_etl_spark.sources.warehouse as wh_mod
    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    wh.rewrite("transfers", wh.read("transfers"))  # v2
    monkeypatch.setattr(wh_mod, "_pyarrow_available", lambda: False)
    wh.rollback("transfers", "v_00000001")
    assert wh.current_version("transfers") == "v_00000001"


def test_read_verbs_degrade_on_damaged_pointer(spark, tmp_path, capsys):
    """A read verb pointed at a DAMAGED store (pointer names a missing
    snapshot) must degrade to the empty canonical shape with a
    warning — peek returns None — not die on Spark's raw
    PATH_NOT_FOUND; recovery is rollback's job."""
    import shutil

    from lavasmart_bank_sync_etl_spark import cli
    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    wh.rewrite("transfers", wh.read("transfers"))  # v2
    shutil.rmtree(os.path.join(root, "transfers", "v_00000002"))
    assert wh.peek("transfers") is None
    rc = cli.main([
        "sql", "--warehouse", root, "SELECT COUNT(*) AS n FROM transfers",
    ])
    assert rc == 0
    captured = capsys.readouterr()
    assert '"n":0' in captured.out.replace(" ", "")
    assert "no readable state" in captured.err


def test_cli_rollback_roundtrip(spark, tmp_path):
    """CLI surface: fsck finds the damage, rollback (in-process main)
    repairs it, fsck exits 0."""
    import shutil

    from lavasmart_bank_sync_etl_spark import cli
    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    wh.rewrite("transfers", wh.read("transfers"))  # v2
    shutil.rmtree(os.path.join(root, "transfers", "v_00000002"))
    assert cli.main(["fsck", "--warehouse", root]) == 2
    assert cli.main([
        "rollback", "--warehouse", root,
        "--table", "transfers", "--version", "v_00000001",
    ]) == 0
    assert cli.main(["fsck", "--warehouse", root, "--deep"]) == 0
    # refusal path: exit 2, pointer unchanged
    assert cli.main([
        "rollback", "--warehouse", root,
        "--table", "transfers", "--version", "v_00000042",
    ]) == 2
    assert wh.current_version("transfers") == "v_00000001"


@pytest.mark.usefixtures("spark")
def test_fsck_agrees_with_real_warehouse(spark, tmp_path):
    """End-to-end agreement: a real Warehouse lifecycle reads clean;
    injecting the exact crash states the protocol's writers heal
    flips fsck to healable; running a writer verb converges them and
    fsck is clean again."""
    from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.ensure("transfers")
    df = wh.read("transfers")
    wh.rewrite("transfers", df)
    assert inspect_store(root, deep=True)["clean"] is True

    # crash-shaped leftovers: dangling snapshot + vacuum tombstone
    os.makedirs(os.path.join(root, "transfers", "v_00000099"))
    os.makedirs(os.path.join(root, "transfers", "_rm_v_00000000"))
    report = inspect_store(root)
    assert report["exit_code"] == 1
    assert {"dangling_snapshot", "tombstone"} <= {
        f["kind"] for f in report["findings"]
    }

    wh.rewrite("transfers", df)  # any writer converges both states
    assert inspect_store(root, deep=True)["clean"] is True
