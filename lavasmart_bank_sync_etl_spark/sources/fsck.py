"""Read-only consistency checker (``fsck``) for the Warehouse layout.

The snapshot protocol (sources/warehouse.py) is self-healing: every
crash state a writer can leave — a dangling uncommitted ``v_*`` dir, a
vacuum tombstone, a torn-first-commit husk, stale legacy root copies,
an unmigrated v1 audit payload, a dead writer's lock — is converged by
the next mutating verb. What was missing is OBSERVABILITY: an operator
looking at a crashed store had to know the layout to tell "this heals
itself on the next sync" from "this is external damage no writer will
fix". ``inspect_store`` walks one store root WITHOUT a SparkSession
(directory structure + parquet footers only), classifies every finding
into three severities, and never mutates anything:

``info``
    expected states needing no action — a live writer's lock, a
    pre-versioning legacy layout still awaiting its first migrate.
``healable``
    crash leftovers the next writer/maintenance verb converges —
    exactly the states the protocol's ``_clear_dangling`` /
    ``_clear_tombstones`` / ``ensure`` / ``migrate_legacy`` / lease
    takeover machinery handles.
``damage``
    protocol-impossible states only external interference produces
    (a ``_CURRENT`` pointer naming a missing or malformed snapshot,
    torn parquet bytes inside a COMMITTED snapshot): no writer heals
    these; they need a human — the ``rollback`` verb restores the
    pointer to an older intact snapshot after validating it.

The CatalogStore backend gets its own entry point,
``inspect_catalog_store``: its FILE layout is metastore-managed (Spark
owns it — fsck-ing those bytes would second-guess the engine), so the
diagnosis is at the catalog level instead: leftover ``__staged`` /
``__old`` swap tables from a crashed rewrite (each healable — the next
rewrite drops them, or ``ensure`` recovers a parked target with its
single rename, pinned in tests/test_store_contract.py). The
store-level lease artifacts are shared, so the lock diagnostics apply
to both backends' roots.

Reference provenance: the reference has no analog (a Sheets document
cannot crash-tear; Code.gs:649 is one daily trigger) — this is the
operability the filesystem-backed engine owes its operators instead.
"""

from __future__ import annotations

import os
import stat

from .lease import _LOCKFILE, _alive, _read_owner
from .warehouse import (
    ALL_TABLES,
    AUDIT_V1_COLUMNS,
    LEGACY_RENAMES,
    _CURRENT,
    _TOMBSTONE,
    _VERSION_RE,
    _parquet_columns,
    _pyarrow_available,
)

SEVERITIES = ("info", "healable", "damage")


def _finding(out: dict, severity: str, table: str | None, kind: str, detail: str) -> None:
    out["findings"].append(
        {"severity": severity, "table": table, "kind": kind, "detail": detail}
    )


def _snapshot_footers_ok(path: str) -> list[str]:
    """Names of parquet files under one snapshot dir whose footer does
    not read back — torn bytes inside what claims to be committed
    state. Callers gate on ``_pyarrow_available()`` first: with no
    checker, "could not check" must surface as ``deep_unavailable``,
    not as per-file torn-bytes damage."""
    try:
        names = sorted(os.listdir(path))
    except OSError:
        return ["<unlistable snapshot dir>"]
    bad = []
    for n in names:
        if n.endswith(".parquet") and _parquet_columns(os.path.join(path, n)) is None:
            bad.append(n)
    return bad


def _inspect_lock(root: str, out: dict) -> None:
    """Lease diagnostics shared by both filesystem-rooted backends:
    the lock itself (live owner vs stale), orphan acquire tmps, and
    takeover quarantines (content-live ones are deliberate — the
    sweep's one-uniform-rule keeps them until their pid dies)."""
    lock = os.path.join(root, _LOCKFILE)
    if os.path.exists(lock):
        owner = _read_owner(lock)
        if owner is None:
            _finding(
                out, "healable", None, "lock_unparseable",
                f"{_LOCKFILE} exists but holds no parseable owner; the "
                "next acquirer quarantines and retries",
            )
        elif _alive(*owner):
            _finding(
                out, "info", None, "lock_held",
                f"{_LOCKFILE} held by live writer pid {owner[0]}",
            )
        else:
            _finding(
                out, "healable", None, "lock_stale",
                f"{_LOCKFILE} owner pid {owner[0]} is dead/recycled; the "
                "next acquirer takes the lease over",
            )
    try:
        names = sorted(os.listdir(root))
    except OSError:
        return
    for n in names:
        if not n.startswith(_LOCKFILE + "."):
            continue
        parts = n.split(".")
        if parts[1:2] == ["stale"]:
            q = _read_owner(os.path.join(root, n))
            if q is not None and _alive(*q):
                _finding(
                    out, "info", None, "lock_quarantine_live",
                    f"{n} quarantines a lock whose content pid {q[0]} "
                    "still lives; left alone by design until it exits",
                )
            else:
                _finding(
                    out, "healable", None, "lock_quarantine",
                    f"{n} is a finished takeover's leftover; swept by "
                    "the next acquirer",
                )
        elif n.endswith(".tmp"):
            _finding(
                out, "healable", None, "lock_tmp",
                f"{n} is an acquirer's staging file; swept by the next "
                "acquirer unless its pid is still mid-acquire",
            )


def _inspect_table(root: str, table: str, out: dict, deep: bool) -> dict | None:
    path = os.path.join(root, table)
    if not os.path.isdir(path):
        return None
    try:
        entries = sorted(os.listdir(path))
    except OSError as exc:
        _finding(
            out, "damage", table, "table_unlistable",
            f"table directory cannot be listed ({type(exc).__name__}); "
            "fsck cannot certify what it cannot see",
        )
        return {}
    v_dirs = [n for n in entries if n.startswith("v_") and os.path.isdir(os.path.join(path, n))]
    # writers only ever produce v_NNNNNNNN directories; a v_* dir whose
    # name fails that format is external junk that must not be
    # classified as committed/dangling below — history()'s string
    # compare WOULD expose one sorting below the pointer as a
    # time-travel target, which is exactly why it gets a finding
    versions = [n for n in v_dirs if _VERSION_RE.fullmatch(n)]
    malformed_dirs = [n for n in v_dirs if not _VERSION_RE.fullmatch(n)]
    tombstones = [
        n for n in entries
        if n.startswith(_TOMBSTONE) and os.path.isdir(os.path.join(path, n))
    ]
    # FILES wearing the protocol's reserved names are external junk:
    # writers only ever create v_*/_rm_* DIRECTORIES and skip files in
    # version math (sources/warehouse.py::_versions), so the junk can
    # never surface as history or brick a write — and the committed
    # table ROOT is engine-owned, so the stale-legacy-root sweep
    # (every sync's migrate_legacy, every vacuum) removes it
    for n in entries:
        p = os.path.join(path, n)
        if (n.startswith("v_") or n.startswith(_TOMBSTONE)) and os.path.isfile(p):
            _finding(
                out, "healable", table, "reserved_name_file",
                f"{n} is a FILE wearing a snapshot/tombstone name; "
                "writers ignore it and the next sync/vacuum sweeps it",
            )
    root_parquet = [
        n for n in entries
        if n.endswith(".parquet") and os.path.isfile(os.path.join(path, n))
    ]
    ptr_path = os.path.join(path, _CURRENT)
    pointer = None
    ptr_damage: str | None = None
    try:
        # stat BEFORE open: a FIFO wearing the _CURRENT name would
        # make open() block forever — hanging the diagnostic on the
        # exact junk it exists to report
        st = os.stat(ptr_path)
        if not stat.S_ISREG(st.st_mode):
            ptr_damage = "not a regular file"
        else:
            with open(ptr_path) as f:
                pointer = f.read().strip()
    except FileNotFoundError:
        if os.path.lexists(ptr_path):
            ptr_damage = "dangling symlink"
    except (OSError, UnicodeDecodeError) as exc:
        ptr_damage = type(exc).__name__
    if ptr_damage is not None:
        # _CURRENT exists but cannot be read as the one-line text file
        # the protocol writes (a directory, FIFO, binary junk,
        # permissions): external interference a diagnostic must
        # REPORT, never crash or hang on — and since the pointer is
        # what readers resolve first, this is damage, not litter
        _finding(
            out, "damage", table, "pointer_unreadable",
            f"_CURRENT is not a readable one-line pointer "
            f"({ptr_damage}); no writer produces or heals this "
            "— `rollback` to an intact snapshot (it clears the junk "
            "pointer itself; do NOT delete _CURRENT by hand — a store "
            "with no pointer reads as never-committed and the next "
            "writer's sweep would reclaim every surviving snapshot)",
        )
        for m in malformed_dirs:
            _finding(
                out, "damage", table, "malformed_version_dir",
                f"{m} is a directory wearing a name no writer produces; "
                "with the pointer unreadable nothing sweeps it — remove "
                "the junk dir by hand after `rollback` restores the "
                "pointer",
            )
        return {
            "pointer": None, "committed": [], "dangling": [],
            "tombstones": tombstones, "root_parquet": len(root_parquet),
        }

    state = {
        "pointer": pointer,
        "committed": [],
        "dangling": [],
        "tombstones": tombstones,
        "root_parquet": len(root_parquet),
    }

    for m in malformed_dirs:
        # healable only when a writer's sweep actually reclaims it:
        # no pointer → _clear_dangling clears EVERY v_* dir; valid
        # pointer and the junk sorts above it → the dangling sweep
        # clears it. Otherwise (sorts at/below a valid pointer, or the
        # pointer itself is malformed so writers crash before any
        # sweep) it masquerades as committed history — external junk
        # no writer heals.
        swept = pointer is None or (
            _VERSION_RE.fullmatch(pointer) and m > pointer
        )
        if swept:
            _finding(
                out, "healable", table, "malformed_version_dir",
                f"{m} is a directory wearing a name no writer produces; "
                "the next writer's sweep clears it",
            )
        else:
            _finding(
                out, "damage", table, "malformed_version_dir",
                f"{m} is a directory wearing a name no writer produces, "
                "sorting into the committed range; readers filter it "
                "(history()/read_version refuse non-writer names) but "
                "no writer reclaims it — remove the junk dir by hand",
            )

    for t in tombstones:
        _finding(
            out, "healable", table, "tombstone",
            f"{t}: vacuum eviction tore mid-delete; already invisible "
            "to history, swept by the next writer/vacuum",
        )
    if os.path.exists(os.path.join(path, _CURRENT + ".tmp")):
        _finding(
            out, "healable", table, "pointer_tmp",
            "_CURRENT.tmp staging file left by a crash inside a commit; "
            "overwritten by the next commit",
        )

    if pointer is not None and not _VERSION_RE.fullmatch(pointer):
        # tampered pointer: history()'s string compare would mis-sort
        # around it and read() would chase a name the writer never made
        _finding(
            out, "damage", table, "pointer_malformed",
            f"_CURRENT holds {pointer!r}, not a v_NNNNNNNN snapshot "
            "name; no writer produces or heals this — `rollback` to "
            "an intact snapshot restores a readable pointer",
        )
        return state

    if pointer is None:
        if root_parquet:
            state["layout"] = "legacy"
            _finding(
                out, "info", table, "legacy_layout",
                f"pre-versioning layout ({len(root_parquet)} root parquet "
                "files, no snapshot yet); first sync/maintain migrates it",
            )
            if versions:
                _finding(
                    out, "healable", table, "dangling_snapshot",
                    f"{len(versions)} uncommitted v_* dir(s) beside the "
                    "legacy root (torn first rewrite); cleared by the "
                    "next writer",
                )
                state["dangling"] = versions
        elif versions or not entries:
            _finding(
                out, "healable", table, "torn_first_commit",
                "no committed pointer and no legacy data: a crash inside "
                "the first ensure/rewrite; the next ensure recreates",
            )
            state["dangling"] = versions
        return state

    state["committed"] = [v for v in versions if v <= pointer]
    state["dangling"] = [v for v in versions if v > pointer]

    if pointer not in versions:
        _finding(
            out, "damage", table, "pointer_target_missing",
            f"_CURRENT names {pointer} but no such snapshot dir exists; "
            "reads fail and no writer heals this — `rollback` to a "
            "surviving intact snapshot",
        )
    if state["dangling"]:
        _finding(
            out, "healable", table, "dangling_snapshot",
            f"{len(state['dangling'])} uncommitted v_* dir(s) newer than "
            f"{pointer} (crashed write); cleared by the next writer",
        )
    if root_parquet:
        unreadable = [
            n for n in root_parquet
            if _parquet_columns(os.path.join(path, n)) is None
        ]
        v1 = [
            n for n in root_parquet
            if table == "audit_log"
            and _parquet_columns(os.path.join(path, n)) == AUDIT_V1_COLUMNS
        ]
        if v1:
            _finding(
                out, "healable", table, "unmigrated_v1_root",
                f"{len(v1)} legacy v1 audit file(s) survive in the root; "
                "migrate_legacy re-widens and heals any null-corrupted "
                "commit made past them",
            )
        if unreadable:
            _finding(
                out, "healable", table, "unreadable_root_parquet",
                f"{len(unreadable)} root parquet file(s) with unreadable "
                "footers; the legacy-root sweep refuses them (kept, "
                "never silently deleted)",
            )
        if not v1 and not unreadable:
            _finding(
                out, "healable", table, "stale_legacy_root",
                f"{len(root_parquet)} stale pre-versioning copy/copies in "
                "the root under a committed pointer; swept by the next "
                "migrate/maintain",
            )
    if _pyarrow_available():
        # The CURRENT snapshot — the one every read resolves first —
        # is footer-checked even in the default run (one snapshot's
        # worth of footer reads, O(files-in-current), so torn-committed
        # damage on the hot table surfaces immediately); ``--deep``
        # extends the same check to ALL committed history. With
        # pyarrow absent neither can run and inspect_store reports
        # that ONCE as ``deep_unavailable`` instead of letting every
        # per-file probe fail identically and read as torn bytes.
        targets = state["committed"] if deep else (
            [pointer] if pointer in state["committed"] else []
        )
        for v in targets:
            bad = _snapshot_footers_ok(os.path.join(path, v))
            if bad:
                which = "CURRENT " if v == pointer else ""
                _finding(
                    out, "damage", table, "torn_committed_snapshot",
                    f"{v} holds {len(bad)} parquet file(s) with unreadable "
                    f"footers inside {which}COMMITTED state — protocol-"
                    "impossible; `rollback` to an older intact snapshot",
                )
    return state


def inspect_store(root: str, deep: bool = False) -> dict:
    """Inspect one store root; returns a JSON-ready report::

        {"root": ..., "clean": bool, "exit_code": 0|1|2,
         "counts": {"info": n, "healable": n, "damage": n},
         "findings": [{severity, table, kind, detail}, ...],
         "tables": {name: {pointer, committed, dangling, ...}},
         "unknown_entries": [...]}

    The default run reads the parquet footers of each table's CURRENT
    snapshot only (the state users actually read; cost is one
    snapshot's footer reads per table). ``deep=True`` additionally
    reads every footer inside every committed snapshot (full
    torn-bytes detection) — O(all files) driver-side, so it is opt-in;
    the structural checks are metadata-only either way. When pyarrow
    is unavailable no footer can be read at all: that is reported ONCE
    as an info-level ``deep_unavailable`` finding (could-not-check,
    not damage — an intact store must not read as externally torn).
    Exit code convention: 0 clean (info findings allowed), 1 healable
    findings (the next write converges them), 2 damage (human
    required)."""
    out: dict = {"root": root, "findings": [], "tables": {}}
    if not _pyarrow_available():
        _finding(
            out, "info", None, "deep_unavailable",
            "pyarrow is unavailable: parquet footers were NOT checked "
            "(current-snapshot and --deep certification skipped; "
            "could-not-check is not damage)",
        )
    try:
        root_entries = sorted(os.listdir(root)) if os.path.isdir(root) else None
    except OSError:
        root_entries = None
    if root_entries is None:
        _finding(
            out, "damage", None, "missing_root",
            f"{root!r} is not a listable directory",
        )
    else:
        _inspect_lock(root, out)
        for old in LEGACY_RENAMES:
            if os.path.isdir(os.path.join(root, old)):
                _finding(
                    out, "healable", old, "legacy_rename_pending",
                    f"legacy table dir {old!r} awaits its one-shot rename "
                    f"to {LEGACY_RENAMES[old]!r} (migrate_legacy)",
                )
        for table in ALL_TABLES:
            state = _inspect_table(root, table, out, deep)
            if state is not None:
                out["tables"][table] = state
        known = set(ALL_TABLES) | set(LEGACY_RENAMES) | {"rejects"}
        out["unknown_entries"] = [
            n for n in root_entries
            if n not in known and not n.startswith(_LOCKFILE)
        ]
        if out["unknown_entries"]:
            _finding(
                out, "info", None, "unknown_entries",
                f"{len(out['unknown_entries'])} entr(ies) fsck does not "
                "manage: " + ", ".join(out["unknown_entries"][:8]),
            )
    return _summarize(out)


def _summarize(out: dict) -> dict:
    counts = {s: 0 for s in SEVERITIES}
    for f in out["findings"]:
        counts[f["severity"]] += 1
    out["counts"] = counts
    out["clean"] = counts["healable"] == 0 and counts["damage"] == 0
    out["exit_code"] = 2 if counts["damage"] else (1 if counts["healable"] else 0)
    return out


def inspect_catalog_store(store) -> dict:
    """Catalog-level twin of ``inspect_store`` for the CatalogStore
    backend: takes a live store (its SparkSession resolves the
    catalog), reports the shared lease artifacts plus the swap
    protocol's crash leftovers —

    ``staged_leftover``
        ``<t>__staged`` survives: the rewrite crashed before its swap;
        the next rewrite drops and restages it.
    ``old_leftover``
        ``<t>__old`` survives NEXT TO the target: crash between the
        rename-in and the final drop; the next rewrite drops it.
    ``parked_state``
        ``<t>__old`` survives and the target is GONE: crash inside
        the swap window; ``ensure`` recovers it with one rename.

    All healable by construction — the metastore owns the file bytes,
    so there is no catalog-level analog of external byte damage for
    fsck to certify."""
    out: dict = {"root": store.root, "findings": [], "tables": {}}
    if os.path.isdir(store.root):
        _inspect_lock(store.root, out)
    known = set(ALL_TABLES)
    # temp views piggyback on listTables and may shadow table names
    # (the sql CLI registers views named like tables) — catalog state
    # is only the persistent entries
    listed = {
        t.name
        for t in store.spark.catalog.listTables(store.db)
        if not t.isTemporary
    }
    for table in sorted(known):
        state = {
            "exists": table in listed,
            "staged": f"{table}__staged" in listed,
            "old": f"{table}__old" in listed,
        }
        if state["staged"]:
            _finding(
                out, "healable", table, "staged_leftover",
                f"{table}__staged survives a crashed rewrite; the next "
                "rewrite drops and restages it",
            )
        if state["old"] and state["exists"]:
            _finding(
                out, "healable", table, "old_leftover",
                f"{table}__old survives beside the target (crash between "
                "rename-in and drop); the next rewrite drops it",
            )
        elif state["old"]:
            _finding(
                out, "healable", table, "parked_state",
                f"{table}__old holds the committed state and the target "
                "is gone (crash mid-swap); ensure() recovers it with one "
                "rename",
            )
        if state["exists"] or state["staged"] or state["old"]:
            out["tables"][table] = state
    out["unknown_entries"] = sorted(
        t for t in listed
        if t not in known
        and not (t.endswith("__staged") or t.endswith("__old"))
    )
    if out["unknown_entries"]:
        _finding(
            out, "info", None, "unknown_entries",
            f"{len(out['unknown_entries'])} catalog table(s) fsck does "
            "not manage: " + ", ".join(out["unknown_entries"][:8]),
        )
    return _summarize(out)
