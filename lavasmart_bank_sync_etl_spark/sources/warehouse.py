"""Warehouse storage (SURVEY.md §2.1 S3-S9): parquet-backed logical
tables with create-if-missing DDL, append sinks, and a **versioned
commit protocol** for the merge-target rewrites.

Layout per table::

    root/<table>/
        v_00000001/        immutable parquet snapshot
        v_00000002/
        _CURRENT           text pointer → the live snapshot name

A rewrite writes the next ``v_*`` snapshot in full, then atomically
replaces ``_CURRENT`` (``os.replace`` of a one-line file — POSIX
rename atomicity). Readers resolve the pointer first, so a crashed
write leaves a dangling snapshot dir but NEVER a truncated or
half-visible table — the poor-man's Delta/Iceberg commit. Version
numbers advance from the COMMITTED pointer and every writer clears
dangling (uncommitted) dirs before writing, so a crashed attempt can
never be "sandwiched" under a later commit into looking like a
committed snapshot; ``history``/``read_version`` expose committed
versions only. Retained
snapshots give time travel (``read_version``/``history``) until
``vacuum`` prunes them; ``compact`` rewrites the current state into a
target file count as a new version (small-file management).

Appends are snapshot-committed too: the current snapshot's files are
hard-linked (metadata-only) into the next version dir, the new rows
land there, and the pointer flip publishes the append atomically —
so EVERY committed ``v_*`` dir is immutable and time-travel-safe,
including across the target-table inserts of SyncJob's pass B.
``append_once`` upgrades that to effectively-once for retried
runs: rows carry a ``run_id`` stamp and the run's rows are folded in
via the atomic snapshot commit, so a crashed-then-retried run never
torn-writes or double-appends (recovery story: SyncJob phases are
review-append → target rewrites → audit-append, every step keyed or
run_id-guarded, so a rerun of the same run_id converges to the same
state).

Single-writer by design (the reference is one daily trigger), and
ENFORCED since round 9: every mutating verb holds the store's
``WriterLease`` (sources/lease.py), so a second concurrent writer
raises ``ConcurrentWriterError`` instead of interleaving with — and
silently corrupting — the first's in-flight commit. A multi-writer
deployment swaps this module for a Delta/Iceberg implementation of
the ``sources.store.TableStore`` protocol — the SyncJob semantics
(MERGE with protected columns) are unchanged, and
tests/test_store_contract.py pins the behavior any replacement must
match.
"""

from __future__ import annotations

import os
import re
import shutil
import stat
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..schemas import AUDIT_LOG, BATCH_CLOSURES, FOLIO_DIM, REVIEW_QUEUE, TARGETS
from .lease import WriterLease

#: A4 run summary persisted as a durable table (one row per logical
#: run, run_id-keyed): the reference logs its summary per execution
#: (Code.gs:846-854) but the log is ephemeral console output — here
#: longitudinal runs are queryable. A same-run_id crash retry REPLACES
#: the row (append_once), so the table records the converged final
#: attempt's view of each run, exactly one row per run_id.
RUN_LOG = StructType([
    StructField("run_id", StringType()),
    StructField("ts", TimestampType()),
    StructField("window_start", DateType()),
    StructField("window_end", DateType()),
    StructField("n_insert", LongType()),
    StructField("n_update", LongType()),
    StructField("n_unchanged", LongType()),
    StructField("n_move", LongType()),
    StructField("n_dest_only", LongType()),
    StructField("n_parked", LongType()),
    StructField("n_conflicts", LongType()),
    StructField("n_auto_moves", LongType()),
    StructField("n_deletions_detected", LongType()),
    StructField("n_duplicates", LongType()),
])

ALL_TABLES: dict[str, StructType] = {
    **{name: schema for name, (schema, _, _) in TARGETS.items()},
    "audit_log": AUDIT_LOG,
    "review_queue": REVIEW_QUEUE,
    "batch_closures": BATCH_CLOSURES,
    "folio_dim": FOLIO_DIM,
    "run_log": RUN_LOG,
}

#: S9 — legacy rename migration (Code.gs:247-258).
LEGACY_RENAMES = {"conciliacion_bancaria": "transfers"}

#: S9's sibling: the older 5-col audit-log v1 shape the shipped xlsx
#: still carries (Timestamp, Folio, Campo Modificado, Valor Anterior,
#: Valor Nuevo — SURVEY §1.3 note). Detected by column set, widened to
#: the canonical 6-col schema (+run_id) on migrate.
AUDIT_V1_COLUMNS = frozenset(
    {"ts", "folio", "campo_modificado", "valor_anterior", "valor_nuevo"}
)

_CURRENT = "_CURRENT"

#: prefix a committed snapshot is renamed to immediately before vacuum
#: deletes it. The rename is atomic, so the snapshot leaves
#: ``history()``/``_versions`` (which match ``v_*`` only) in one step;
#: a crash mid-``rmtree`` then leaves a TOMBSTONE, never a torn dir
#: that still sorts below ``_CURRENT`` and masquerades as time-travel
#: history. Leftover tombstones are swept by the next writer/vacuum.
_TOMBSTONE = "_rm_"

#: the only pointer content a writer ever produces; anything else in
#: ``_CURRENT`` is external interference (fsck reports it as damage)
_VERSION_RE = re.compile(r"^v_\d{8}$")


def _parquet_columns(path: str) -> set[str] | None:
    """Column names from one parquet file's footer (driver-side, no
    Spark job) — used to recognize unmigrated v1 audit payloads.
    Returns None when the footer cannot be read (torn/partial file,
    or pyarrow unavailable): callers must treat unknown as
    NOT-sweepable, never as safe."""
    try:
        import pyarrow.parquet as pq

        return set(pq.read_schema(path).names)
    except Exception:
        return None


def _pyarrow_available() -> bool:
    """Whether footer validation CAN run. Callers that would otherwise
    conflate "could not check" with "torn bytes" (rollback's intact-
    target rail, fsck --deep) branch on this once instead of letting
    every per-file probe fail identically."""
    try:
        import pyarrow.parquet  # noqa: F401

        return True
    except Exception:
        return False


def _v1_files(root: str) -> tuple[list[str], bool]:
    """(v1-shaped parquet file names under ``root``, any-unreadable
    flag). Probes EVERY root parquet footer — a mixed-schema root
    (e.g. a legacy in-place append added a canonical file next to the
    v1 originals) must not defeat the sweep refusal just because one
    arbitrary listing-order file probed canonical."""
    v1, unreadable = [], False
    for n in sorted(os.listdir(root)):
        if not n.endswith(".parquet"):
            continue
        cols = _parquet_columns(os.path.join(root, n))
        if cols is None:
            unreadable = True
        elif cols == AUDIT_V1_COLUMNS:
            v1.append(n)
    return v1, unreadable


class Warehouse:
    """A directory of versioned parquet tables with the reference's
    DDL semantics."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._lease = WriterLease(root)

    def lock(self) -> WriterLease:
        """The store's single-writer lease, for run-scoped holds:
        ``with wh.lock(): ...`` makes a whole multi-statement job
        exclusive (SyncJob.run does this), turning a concurrent second
        writer into a loud ``ConcurrentWriterError`` instead of silent
        interleaved corruption. Reentrant — the per-verb acquisitions
        below nest inside it."""
        return self._lease

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    # -- version bookkeeping ------------------------------------------
    def _pointer(self, table: str) -> str:
        return os.path.join(self.path(table), _CURRENT)

    def current_version(self, table: str) -> str | None:
        try:
            with open(self._pointer(table)) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def pointer_state(self, table: str) -> tuple[str | None, bool]:
        """``(value, damaged)`` tolerant twin of ``current_version``
        for DIAGNOSTIC/RECOVERY paths: ``value`` is the stripped
        pointer text (None when no pointer file exists), ``damaged``
        is True when ``_CURRENT`` exists but cannot be read as the
        one-line text file the protocol writes (a directory, binary
        junk, permissions — external interference). Writers keep the
        strict reader on purpose: crashing loudly on a damaged pointer
        beats writing past it; only ``rollback``/``peek``/fsck-style
        verbs may degrade.

        The stat pre-check matters: ``open()`` on a FIFO wearing the
        ``_CURRENT`` name would BLOCK forever waiting for a writer —
        hanging the exact diagnostic verbs that exist to report such
        junk. Any non-regular file (directory, FIFO, socket, device,
        dangling symlink) is damage without being opened."""
        ptr = self._pointer(table)
        try:
            st = os.stat(ptr)
        except FileNotFoundError:
            # a dangling symlink wearing the name is junk, not absence
            return None, os.path.lexists(ptr)
        except OSError:
            return None, True
        if not stat.S_ISREG(st.st_mode):
            return None, True
        try:
            with open(ptr) as f:
                return f.read().strip(), False
        except FileNotFoundError:
            return None, False  # vanished between stat and open
        except (OSError, UnicodeDecodeError):
            return None, True

    def _versions(self, table: str) -> list[str]:
        """Every ``v_*`` DIRECTORY on disk, committed or not, oldest
        first. The isdir filter matters: a writer only ever creates
        snapshot directories, so a ``v_``-named FILE is external junk —
        without the filter it would brick every writer
        (``_clear_dangling`` rmtree-ing a file raises) and could
        surface in ``history`` as an unreadable snapshot. Writers
        ignore it; fsck reports it as healable (``reserved_name_file``
        — the root sweep reclaims it)."""
        if not self.exists(table):
            return []
        path = self.path(table)
        return sorted(
            v for v in os.listdir(path)
            if v.startswith("v_") and os.path.isdir(os.path.join(path, v))
        )

    def history(self, table: str) -> list[str]:
        """COMMITTED snapshot names, oldest first. Dirs newer than the
        ``_CURRENT`` pointer are crash leftovers (write happened, the
        atomic pointer commit did not) — they are garbage, never
        snapshots, so they are excluded here and must never be exposed
        as time-travel targets. No pointer at all means NO version was
        ever committed (a crash inside the very first ``ensure``, or a
        pre-versioning legacy layout, which has no ``v_*`` dirs) — so
        history is empty, not "every dir on disk".

        Damage degrades to empty, never to junk: a pointer that is
        unreadable or fails the writer's name format makes the
        committed state unknowable (fsck reports it; rollback
        recovers), and a ``v_*`` DIRECTORY whose name no writer
        produces is external junk — without the ``_VERSION_RE`` filter
        one sorting below the pointer would masquerade as a committed
        time-travel target (fsck's ``malformed_version_dir``)."""
        cur, damaged = self.pointer_state(table)
        if damaged or cur is None or not _VERSION_RE.fullmatch(cur):
            return []
        return [
            v for v in self._versions(table)
            if v <= cur and _VERSION_RE.fullmatch(v)
        ]

    def _next_version(self, table: str) -> str:
        """The next version name, numbered from the COMMITTED pointer
        (not the max dir on disk): a crashed attempt's dangling dir
        must not advance the sequence, or once a later commit lands the
        torn dir sorts below ``_CURRENT`` and masquerades as a
        committed snapshot — polluting vacuum's keep budget and time
        travel. Writers clear dangling dirs (``_clear_dangling``)
        before reusing the number. No pointer → nothing was ever
        committed → the sequence starts at 1 (any ``v_*`` dir on disk
        is an uncommitted leftover the writer just cleared)."""
        cur = self.current_version(table)
        if cur is None:
            return "v_00000001"
        return f"v_{int(cur[2:]) + 1:08d}"

    def _clear_dangling(self, table: str) -> None:
        """Delete uncommitted ``v_*`` dirs (newer than ``_CURRENT``,
        or — when no pointer exists — every ``v_*`` dir, since nothing
        was ever committed). Safe under the single-writer contract:
        nothing else can be mid-write, so any such dir is a crashed
        attempt's leftover. Called by every writer before choosing its
        version so a retry both reuses the number (no gap) and never
        leaves torn files mixed into — or sandwiched below — a later
        commit."""
        cur = self.current_version(table)
        for v in self._versions(table):
            if cur is None or v > cur:
                shutil.rmtree(os.path.join(self.path(table), v))
        self._clear_tombstones(table)

    def _clear_tombstones(self, table: str) -> None:
        """Finish crashed vacuum deletions: a ``_rm_*`` dir is a
        snapshot vacuum renamed away whose ``rmtree`` tore mid-delete.
        It is already invisible to ``history``/``read_version`` (the
        rename is the atomic eviction), so this is pure space
        reclamation — retried by every writer via ``_clear_dangling``
        and by the next ``vacuum``."""
        if not self.exists(table):
            return
        for n in os.listdir(self.path(table)):
            p = os.path.join(self.path(table), n)
            if not n.startswith(_TOMBSTONE):
                continue
            if os.path.islink(p):
                # external junk: a symlink wearing a tombstone name
                # would make rmtree raise and brick every writer
                os.unlink(p)
            elif os.path.isdir(p):
                shutil.rmtree(p)

    def _clear_legacy_root(self, table: str, migrated: bool = False) -> None:
        """Once a version is committed, data files still sitting in the
        table ROOT are normally stale pre-versioning leftovers (the
        first rewrite of a legacy table reads them, writes
        ``v_00000001``, and commits — the copies then serve no
        reader): delete them so they neither double storage nor
        re-trigger ensure()'s legacy-layout detection if the pointer
        were ever lost. Only call with a committed pointer present.

        EXCEPTION: root files in the legacy v1 audit shape are refused
        unless ``migrated=True`` — a version committed WITHOUT
        ``migrate_legacy`` (e.g. a compact run first) read them under
        the canonical schema and nulled every v1-mapped column, so
        these files are the only surviving copy of the payload.
        ``migrate_legacy`` detects exactly that case, re-widens from
        the originals, and is the one caller allowed to force the
        sweep afterward. A root holding any UNREADABLE parquet footer
        is likewise refused (unknown is never sweepable)."""
        root = self.path(table)
        files = [
            n for n in os.listdir(root)
            if os.path.isfile(os.path.join(root, n)) and n != _CURRENT
        ]
        if not migrated:
            v1, unreadable = _v1_files(root)
            if v1 or unreadable:
                return
        for n in files:
            os.remove(os.path.join(root, n))

    def _data_path(self, table: str) -> str:
        cur = self.current_version(table)
        if cur is None:
            return self.path(table)  # pre-versioning layout fallback
        if not _VERSION_RE.fullmatch(cur):
            # a tampered pointer must never be FOLLOWED: joining junk
            # like "../outside" would read data from outside the store
            # root as committed table state. Writers/readers through
            # this path fail loudly; fsck reports pointer_malformed,
            # rollback recovers.
            raise ValueError(
                f"{table}'s _CURRENT holds {cur!r}, not a writer-"
                "written snapshot name — external interference; "
                "`rollback` to an intact snapshot"
            )
        return os.path.join(self.path(table), cur)

    def _commit(self, table: str, version: str) -> None:
        """Atomically repoint ``_CURRENT`` at ``version``."""
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer(table))

    # -- DDL -----------------------------------------------------------
    def _widen_v1(self, v1: DataFrame) -> DataFrame:
        """The v1→v2 audit widening: a v1 row records one field-level
        update, so it becomes an ACTUALIZACIÓN whose detalle names the
        modified field; run_id null — pre-engine history carries no
        idempotence stamp."""
        return v1.select(
            F.col("ts"),
            F.col("folio"),
            F.lit("ACTUALIZACIÓN").alias("accion"),
            F.col("campo_modificado").alias("detalle"),
            F.col("valor_anterior").alias("valores_anteriores"),
            F.col("valor_nuevo").alias("valores_nuevos"),
            F.lit(None).cast("string").alias("run_id"),
        )

    def migrate_legacy(self) -> None:
        """S9 — one-shot rename of legacy table directories, plus the
        v1→v2 audit-log widening (``_widen_v1``). Idempotent: a
        canonical-shaped audit table passes through untouched.

        Also the recovery point for two crash/misuse corners:
        a torn widening rewrite (v_* dir under the legacy root, no
        pointer) is cleared and retried; and a version committed
        WITHOUT migrating first (e.g. a compact run before this
        method) — which read the v1 files under the canonical schema
        and nulled every v1-mapped column — is detected (the commit
        carries no ``accion`` payload while v1 originals survive in
        the root, because ``_clear_legacy_root`` refuses to sweep
        them) and HEALED by re-widening from the originals."""
        with self._lease:
            self._migrate_legacy()

    def _migrate_legacy(self) -> None:
        for old, new in LEGACY_RENAMES.items():
            if os.path.isdir(self.path(old)) and not self.exists(new):
                os.rename(self.path(old), self.path(new))
        # Converge the stale-legacy-root sweep for every versioned
        # table: covers a crash between a legacy table's first
        # versioned commit and that rewrite's own cleanup. This method
        # runs at the start of every SyncJob and mutating CLI verb, so
        # the stale-copy window is one run, not unbounded. The sweep
        # itself refuses v1/unreadable payloads, so this is safe
        # before the audit handling below.
        for table in ALL_TABLES:
            if self.exists(table) and self.current_version(table) is not None:
                self._clear_legacy_root(table)
        if not self.exists("audit_log"):
            return
        # Raw reads below bypass ensure()'s heal, so clear crash
        # leftovers first: a widening rewrite that tore between its
        # snapshot write and the pointer commit leaves a v_* dir under
        # the legacy root, and Spark refuses the mixed-depth layout
        # ("conflicting directory structures") on every retry.
        self._clear_dangling("audit_log")
        root = self.path("audit_log")
        root_pq = sorted(n for n in os.listdir(root) if n.endswith(".parquet"))
        if self.current_version("audit_log") is None:
            if not root_pq:
                # torn FIRST ensure husk (no pointer, no legacy root
                # data): nothing to migrate, and reading the now-empty
                # dir would raise; leave it for ensure()'s recreate
                return
            v1_names, unreadable = _v1_files(root)
            if unreadable:
                return  # torn bytes: refuse to widen past them
            if not v1_names:
                return  # canonical-shaped legacy root: nothing to widen
            # Widen the v1 files by EXPLICIT list; a mixed root (a
            # legacy in-place append added canonical rows next to the
            # v1 originals) folds the canonical files in under the
            # canonical schema rather than letting spark.read infer
            # one arbitrary file's schema for all of them.
            v1 = self.spark.read.parquet(
                *[os.path.join(root, n) for n in v1_names]
            )
            widened = self._widen_v1(v1)
            canonical = [n for n in root_pq if n not in set(v1_names)]
            if canonical:
                widened = widened.unionByName(
                    self.spark.read.schema(ALL_TABLES["audit_log"]).parquet(
                        *[os.path.join(root, n) for n in canonical]
                    )
                )
            self.rewrite("audit_log", widened)
            # rewrite's own sweep refuses v1-shaped roots (it cannot
            # know the payload was preserved); we just committed the
            # widened copy, so the sweep is safe here.
            self._clear_legacy_root("audit_log", migrated=True)
            return
        # Pointer already committed. v1-shaped originals still in the
        # root mean either a previous widening crashed before its
        # sweep, or something committed without migrating (the
        # corrupted-compact case). Distinguish PER ROW, not per table:
        # a widened/engine row always carries accion, while a
        # canonical-schema read of a v1 file nulls it — so rows with
        # accion IS NULL are exactly the corrupted images of the v1
        # originals (a commit can legitimately mix both, e.g. a legacy
        # in-place append added a canonical row before the compact).
        # Heal = replace the corrupted rows with the re-widened
        # originals, keep every healthy row, then sweep.
        v1_names, unreadable = _v1_files(root)
        if v1_names and not unreadable:
            committed = self.read("audit_log")
            corrupted = committed.where(F.col("accion").isNull())
            if corrupted.limit(1).count() > 0:
                healthy = committed.where(F.col("accion").isNotNull())
                v1 = self.spark.read.parquet(
                    *[os.path.join(root, n) for n in v1_names]
                )
                self.rewrite(
                    "audit_log", healthy.unionByName(self._widen_v1(v1))
                )
            self._clear_legacy_root("audit_log", migrated=True)

    def ensure(self, table: str) -> None:
        """S7 — create-if-missing with the canonical schema
        (Code.gs:289-329 et al.).

        Also heals a torn FIRST commit: a crash between the initial
        snapshot write and the pointer commit leaves the table dir
        holding ``v_*`` dirs but no ``_CURRENT``. Without healing,
        that torn dir would pass ``exists`` (so ensure never retried)
        yet carry no committed state — and once a later write
        committed, it would sort below ``_CURRENT`` and masquerade as
        history. Here: no pointer ⇒ every ``v_*`` dir is uncommitted
        garbage, cleared; if no pre-versioning legacy data remains
        either, the create is re-run from scratch. Distinguishable
        from the legacy layout because legacy tables keep their
        parquet files in the table root, never under ``v_*``.

        Lease note: BOTH no-op fast paths below are lock-free — a
        committed pointer, and a pure pre-versioning legacy layout
        (root parquet, no ``v_*`` dirs) — so READ verbs (which call
        ensure via ``read``) never contend with — or error on — a
        concurrent writer's lease; the lease is taken only when there
        is actually something to create or heal (absent table, torn
        husk, dangling dirs), and the state is re-checked under it."""
        try:
            if self.exists(table):
                if self.current_version(table) is not None:
                    return  # committed state: nothing to create/heal
                if not self._versions(table) and any(
                    n.endswith(".parquet")
                    for n in os.listdir(self.path(table))
                ):
                    # pure legacy layout: reads serve the root as-is.
                    # (A read planned here can still fail transiently
                    # if a concurrent writer's one-shot migrate_legacy
                    # sweeps the root between plan and action — rerun;
                    # contending on the lease instead would make EVERY
                    # legacy read error while any writer runs.)
                    return
        except FileNotFoundError:
            pass  # dir vanished under us (writer healing a husk):
            # fall through and re-check under the lease
        with self._lease:
            if self.exists(table) and self.current_version(table) is None:
                self._clear_dangling(table)  # torn first commit(s), if any
                legacy = any(
                    n.endswith(".parquet") for n in os.listdir(self.path(table))
                )
                if legacy:
                    return  # pre-versioning layout: data lives in the root
                shutil.rmtree(self.path(table))  # empty husk → recreate below
            if not self.exists(table):
                v = "v_00000001"
                empty = self.spark.createDataFrame([], ALL_TABLES[table])
                empty.write.mode("overwrite").parquet(
                    os.path.join(self.path(table), v)
                )
                self._commit(table, v)

    # -- IO ------------------------------------------------------------
    def read(self, table: str) -> DataFrame:
        """S2 — destination scan of the CURRENT snapshot. S8's header
        validation becomes schema enforcement: read under the
        canonical schema."""
        self.ensure(table)
        return self.spark.read.schema(ALL_TABLES[table]).parquet(self._data_path(table))

    def peek(self, table: str) -> DataFrame | None:
        """Strictly read-only view of the current state for READ verbs
        (verify/sql/render): the committed snapshot, or the
        pre-versioning legacy root when no pointer exists. Returns
        None when there is no readable state — absent table, or a
        torn first-commit husk (``v_*`` dirs, no pointer) that only a
        WRITER may heal. Unlike ``read``, never creates, heals, or
        takes the writer lease — a diagnostic verb pointed at a
        crashed or in-use warehouse must not mutate it."""
        if not self.exists(table):
            return None
        cur, damaged = self.pointer_state(table)
        if damaged:
            # _CURRENT exists but is unreadable (a directory, binary
            # junk — fsck's pointer_unreadable): committed state is
            # unknowable, so degrade rather than crash or fall through
            # to the legacy root; recovery is the rollback verb
            return None
        if cur is not None and not _VERSION_RE.fullmatch(cur):
            # tampered pointer (fsck: pointer_malformed): never FOLLOW
            # it — "../outside" would serve data from beyond the store
            # root as committed state; degrade like any other damage
            return None
        if cur is not None:
            snap = os.path.join(self.path(table), cur)
            if not os.path.isdir(snap):
                # the pointer names a missing snapshot (external damage
                # fsck reports as pointer_target_missing): a diagnostic
                # verb must degrade like any other unreadable state,
                # not die on Spark's raw PATH_NOT_FOUND — recovery is
                # the rollback verb, not a read
                return None
            return self.spark.read.schema(ALL_TABLES[table]).parquet(snap)
        # no pointer: serve the legacy root files by EXPLICIT list so a
        # dangling v_* leftover next to them cannot trip Spark's
        # mixed-depth directory refusal (a writer's ensure heals that)
        try:
            files = [
                n for n in os.listdir(self.path(table))
                if n.endswith(".parquet")
            ]
        except FileNotFoundError:
            return None  # dir vanished under us (writer healing a husk)
        if not files:
            return None  # torn husk or empty dir: no committed state
        return self.spark.read.schema(ALL_TABLES[table]).parquet(
            *[os.path.join(self.path(table), n) for n in files]
        )

    def read_version(self, table: str, version: str) -> DataFrame:
        """Time travel: read a retained COMMITTED snapshot by name.
        Uncommitted dirs (newer than ``_CURRENT``, or any dir when no
        pointer was ever committed) are crash leftovers and possibly
        torn — refuse them rather than expose never-published state.
        Membership in ``history()`` is the check (not a ``<= cur``
        string compare), so non-snapshot names — vacuum tombstones,
        arbitrary paths — are refused too."""
        if version not in self.history(table):
            # tolerant pointer read in the ERROR PATH only: a damaged
            # pointer must surface as this refusal, not as a raw
            # IsADirectoryError out of the message construction
            cur, damaged = self.pointer_state(table)
            raise ValueError(
                f"{table}/{version} is not a committed snapshot "
                f"(current is {'<unreadable>' if damaged else cur})"
            )
        return self.spark.read.schema(ALL_TABLES[table]).parquet(
            os.path.join(self.path(table), version)
        )

    def append(self, table: str, df: DataFrame) -> None:
        """S3/S5/S6 — batch append sink, committed as a NEW snapshot.

        The current snapshot's data files are hard-linked into the
        next version dir (metadata-only, no data copy), the new rows
        are written there, and the pointer commit publishes both
        atomically. Committed snapshots therefore stay IMMUTABLE under
        appends too — a crash mid-append leaves only an uncommitted
        dangling dir (vacuum's garbage), never a partial append
        visible to readers or polluting a time-travel version (the
        pass-B hole ADVICE r7 flagged). Collision-free by Spark's
        job-unique part-file names; falls back to a copy on
        filesystems without hard links."""
        with self._lease:
            self.ensure(table)
            cur = self.current_version(table)
            if cur is None:
                # pre-versioning directory layout: in-place legacy append
                df.select(*[f.name for f in ALL_TABLES[table].fields]).write.mode(
                    "append"
                ).parquet(self._data_path(table))
                self.spark.catalog.refreshByPath(self._data_path(table))
                return
            self._clear_dangling(table)
            v = self._next_version(table)
            src = os.path.join(self.path(table), cur)
            dest = os.path.join(self.path(table), v)
            os.makedirs(dest)
            for name in os.listdir(src):
                if name.endswith(".parquet"):
                    try:
                        os.link(os.path.join(src, name), os.path.join(dest, name))
                    except OSError:
                        shutil.copy2(
                            os.path.join(src, name), os.path.join(dest, name)
                        )
            df.select(*[f.name for f in ALL_TABLES[table].fields]).write.mode(
                "append"
            ).parquet(dest)
            self._commit(table, v)
            self.spark.catalog.refreshByPath(dest)

    def append_once(self, table: str, df: DataFrame, run_id: str, run_id_col: str = "run_id") -> None:
        """Idempotent append: fold ``df`` (whose rows are stamped
        ``run_id``) into a NEW snapshot after dropping any rows a
        previous attempt of the same run already wrote. The atomic
        pointer commit makes the append all-or-nothing, so a retry
        can neither tear nor duplicate.

        Costs one rewrite of the table per call — the right trade for
        the reference-sized audit/review tables; an engine with real
        transactions (see sources/store.py) does it as a guarded
        append instead."""
        with self._lease:  # read→fold→rewrite is ONE critical section
            self.ensure(table)
            # Column API, not string interpolation: a run_id containing
            # a quote must compare as data, not splice into the predicate.
            cur = self.read(table).where(
                F.col(run_id_col).isNull() | (F.col(run_id_col) != F.lit(run_id))
            )
            self.rewrite(
                table,
                cur.unionByName(
                    df.select(*[f.name for f in ALL_TABLES[table].fields])
                ),
            )

    def rewrite(self, table: str, df: DataFrame) -> None:
        """S4 — full-state rewrite as a NEW snapshot + atomic pointer
        commit; a failed write never truncates or half-exposes the
        target (SURVEY §7.3 risk note)."""
        with self._lease:
            self.ensure(table)
            self._clear_dangling(table)
            was_legacy = self.current_version(table) is None
            v = self._next_version(table)
            dest = os.path.join(self.path(table), v)
            df.select(*[f.name for f in ALL_TABLES[table].fields]).write.mode(
                "overwrite"
            ).parquet(dest)
            self._commit(table, v)
            if was_legacy:
                # first versioned commit of a pre-versioning table: the
                # root copies just became stale (migrate_legacy/vacuum
                # also sweep them later if this line is never reached)
                self._clear_legacy_root(table)
            self.spark.catalog.refreshByPath(dest)

    # -- maintenance ---------------------------------------------------
    def rollback(self, table: str, version: str) -> None:
        """Disaster recovery: atomically repoint ``_CURRENT`` at an
        older retained snapshot — the operator verb fsck's ``damage``
        findings prescribe when the current snapshot is lost or torn
        by external interference (no WRITER can produce those states,
        so no writer auto-heals them; restoring published state is an
        explicit human decision).

        Safety rails: the target must be an intact on-disk snapshot —
        name in the writer's own format, directory present, every
        parquet footer readable (footer validation is skipped, with a
        stderr warning, when pyarrow is unavailable: refusing EVERY
        target because the checker is missing would make recovery
        impossible, the opposite of a safety rail) —
        and, when the current pointer still parses as a writer-written
        version name, the target must not be NEWER than it (a newer
        dir is a crashed write's dangling leftover; publishing it
        would expose never-committed state). A pointer that does NOT
        parse — malformed text, binary junk, even a directory wearing
        the ``_CURRENT`` name — is itself the damage being recovered
        from, so any intact target is accepted then; an unreadable
        junk ``_CURRENT`` is cleared by rollback itself immediately
        before the pointer commit (operators must NEVER pre-delete it
        by hand: a store with no pointer at all reads as
        never-committed, and the next writer's dangling sweep would
        reclaim every surviving snapshot).

        Deliberately NO sweep of now-newer dirs: rolling FORWARD is
        refused by the same rail (once the pointer moved back, a newer
        dir is indistinguishable from a crashed write's never-published
        state), so the leftover dirs are kept on disk — a mistaken
        rollback stays recoverable BY HAND (restore ``_CURRENT``)
        until the next write, when ``_clear_dangling`` reclaims
        them."""
        with self._lease:
            cur, cur_damaged = self.pointer_state(table)
            if cur is None and not cur_damaged:
                raise ValueError(
                    f"{table} has no committed pointer to roll back; "
                    "nothing was ever published"
                )
            path = os.path.join(self.path(table), version)
            if not _VERSION_RE.fullmatch(version) or not os.path.isdir(path):
                raise ValueError(
                    f"{table}/{version} is not an on-disk snapshot"
                )
            if cur is not None and _VERSION_RE.fullmatch(cur) and version > cur:
                raise ValueError(
                    f"{table}/{version} is newer than the committed "
                    f"pointer {cur} — an uncommitted leftover, not a "
                    "rollback target"
                )
            if _pyarrow_available():
                torn = [
                    n for n in sorted(os.listdir(path))
                    if n.endswith(".parquet")
                    and _parquet_columns(os.path.join(path, n)) is None
                ]
                if torn:
                    raise ValueError(
                        f"{table}/{version} holds unreadable parquet "
                        f"({torn[:3]}…): not an intact rollback target"
                    )
            else:
                print(
                    f"warning: pyarrow unavailable — footer validation "
                    f"of rollback target {table}/{version} was SKIPPED "
                    "(could-not-check, not certified-intact)",
                    file=sys.stderr,
                )
            if cur_damaged:
                # junk _CURRENT. A symlink is unlinked (rename would
                # move the link into a tombstone the sweep's rmtree
                # chokes on); a plain file/FIFO is simply overwritten
                # by the atomic replace below; a real DIRECTORY can't
                # be atomically swapped for a file on POSIX, so rename
                # it aside to a UNIQUE tombstone name (repeat damage +
                # repeat rollback must not collide with an unswept
                # earlier tombstone) for the next writer/vacuum to
                # sweep. The no-pointer window is the two syscalls
                # between this rename and _commit's os.replace — the
                # unavoidable minimum, vs. the unbounded window of an
                # operator deleting _CURRENT by hand and never running
                # rollback
                ptr = self._pointer(table)
                if os.path.islink(ptr):
                    os.unlink(ptr)
                elif os.path.isdir(ptr):
                    tomb = os.path.join(
                        self.path(table), _TOMBSTONE + _CURRENT
                    )
                    n = 0
                    while os.path.exists(tomb):
                        n += 1
                        tomb = os.path.join(
                            self.path(table), f"{_TOMBSTONE}{_CURRENT}.{n}"
                        )
                    os.rename(ptr, tomb)
            self._commit(table, version)
            self.spark.catalog.refreshByPath(path)

    def compact(self, table: str, num_files: int = 1) -> None:
        """Small-file management: rewrite the current state into
        ``num_files`` files as a new snapshot (the OPTIMIZE analog).
        The read→rewrite pair holds the lease as one critical
        section."""
        with self._lease:
            self.rewrite(table, self.read(table).coalesce(num_files))

    def vacuum(self, table: str, keep: int = 2) -> None:
        """Prune old snapshots, retaining the latest ``keep`` COMMITTED
        ones (the current snapshot is always retained).

        Version dirs NEWER than the ``_CURRENT`` pointer are dangling
        leftovers of a crashed rewrite (the write happened, the atomic
        pointer commit did not) — they are garbage, not snapshots, so
        they are deleted outright and never count toward the keep
        budget; counting them would silently evict valid rollback
        snapshots while retaining junk. ``keep`` is clamped to ≥1 —
        the CURRENT snapshot is never evicted, whatever the caller
        passes (a keep=0 slice would rmtree the live data out from
        under the still-pointing ``_CURRENT``).

        Eviction is rename-then-delete: the victim is atomically
        renamed to a ``_rm_*`` tombstone FIRST, so it leaves
        ``history()`` in one step and a crash mid-``rmtree`` can
        never leave a torn dir that still reads as a committed
        snapshot — only a tombstone the next writer/vacuum sweeps
        (``_clear_tombstones``)."""
        with self._lease:
            self._clear_dangling(table)  # ONE definition of "dangling"
            if self.current_version(table) is not None:
                # maintenance also converges the stale-legacy-root
                # sweep (covers a crash between a legacy table's first
                # versioned commit and that rewrite's own cleanup) —
                # refused for unmigrated v1 payloads, _clear_legacy_root
                self._clear_legacy_root(table)
            committed = self.history(table)
            for v in committed[: max(0, len(committed) - max(1, keep))]:
                tomb = os.path.join(self.path(table), _TOMBSTONE + v)
                os.rename(os.path.join(self.path(table), v), tomb)
                shutil.rmtree(tomb)
