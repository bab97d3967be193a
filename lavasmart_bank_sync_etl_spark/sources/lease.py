"""Single-writer lease for the filesystem-rooted TableStore backends.

Both shipped stores (``Warehouse``, ``CatalogStore``) document a
single-writer contract — the reference is one daily trigger
(Code.gs:649) — but until round 9 the contract was prose only: a
second concurrent writer would interleave ``_clear_dangling`` /
staged-swap steps with the first's in-flight commit and corrupt
SILENTLY. This lease turns contract violation into a loud
``ConcurrentWriterError`` instead.

Mechanics: a ``_WRITER_LOCK`` file at the store root holding the owner
``pid`` plus the pid's /proc start-time token. Creation is
ATOMIC-WITH-CONTENT: the content is written to a unique temp file
first and ``os.link``ed to the lock name (hard-link creation fails if
the name exists), so no reader can ever observe an empty/torn lock
that a racing writer would misclassify as stale — the TOCTOU a plain
O_EXCL-create-then-write would have. On filesystems without hard
links the create degrades to O_EXCL + immediate write, and the
empty-lock window of the open→write interval is closed by a
PERMANENT SIDE FILE (``_WRITER_LOCK.flock``) flocked for the duration
of the create: a prober that finds an unparseable lock first tries
the side flock non-blocking — busy means a live writer is inside its
create window (raise ConcurrentWriterError, steal nothing), and
flock's kernel ownership auto-releases if that writer dies, so a
crashed mid-create writer still classifies stale. Where even flock is
unsupported the prober falls back to the original best-effort grace
re-read (kept in all paths as belt-and-braces) before classifying an
unparseable lock stale. Mutating store verbs acquire the lease around their critical
section; ``SyncJob.run`` holds it for the whole run so two
overlapping syncs fail fast rather than interleave at call
granularity. Reentrant per lease instance FOR THE ACQUIRING THREAD —
a second thread of the same process entering a held lease is a
concurrent writer and raises, and release is owner-verified (own pid
still in the file) so a process can never delete a lock it no longer
owns.

Staleness: a lock is stale when its recorded pid no longer exists,
when the pid exists but its /proc start time differs from the
recorded token (the pid was RECYCLED by an unrelated process — plain
``os.kill(pid, 0)`` aliveness would brick the store forever in that
case), or when the content is unparseable (impossible for the
link-atomic path's own writes; treated as stale because only external
interference or the degraded-create window produces it).

Takeover is QUARANTINE-RENAME, not blind unlink: the stale lock is
atomically renamed to a taker-unique name — so exactly one racing
taker wins the stale file, and a loser whose rename finds nothing
simply retries the create and then sees the winner as a live owner.
The quarantined content is re-verified: if it turns out live (the
probed-stale lock was replaced in the probe→rename window), the taker
raises and the quarantine is LEFT ON DISK — one uniform rule: a
live-content quarantine is never destroyed while its content pid
lives (the sweep clears it after that pid dies) and never
re-installed (the robbed owner may have released in the meantime, and
a re-installed released lock would wedge the store until its pid
exits).

Scope and residual windows, explicitly: the /proc probe makes the
contract SINGLE HOST — exactly the scope of these filesystem
backends; a multi-writer / multi-host deployment swaps in
Delta/Iceberg (sources/store.py) whose transactions subsume this
file. The lease is an ENFORCEMENT AID for an already-documented
single-writer contract (one daily trigger), not a distributed lock:
when two-plus takers race RECOVERY of the same crashed writer while
yet another writer starts inside their microsecond probe→rename
windows, a robbed-then-freed name can briefly admit a second writer.
Those interleavings require simultaneous crash-recovery races that
the contract's workload cannot produce; the failure mode without the
lease was silent corruption on EVERY overlap.
"""

from __future__ import annotations

import os
import threading
import time

_LOCKFILE = "_WRITER_LOCK"


class ConcurrentWriterError(RuntimeError):
    """A second writer hit a store another live writer is mutating."""


def _stat_fields(pid: int) -> tuple[str, str] | None:
    """(state, start-time token) from /proc/<pid>/stat — split AFTER
    the comm field, which may itself contain spaces/parens, so the
    state letter is field 0 and starttime (clock ticks since boot,
    stat field 22) is field 19 of the tail. None when unreadable: pid
    dead, or no procfs (non-Linux) — callers then fall back to
    pid-aliveness only."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            data = f.read()
        tail = data.rsplit(b")", 1)[1].split()
        return tail[0].decode(), tail[19].decode()
    except (OSError, IndexError):
        return None


def _start_token(pid: int) -> str | None:
    fields = _stat_fields(pid)
    return fields[1] if fields else None


def _alive(pid: int, token: str | None) -> bool:
    """Is the LOCK OWNER still running? False when the pid is gone,
    when it was recycled (start-time token mismatch), or when it is a
    ZOMBIE — dead but unreaped (an orchestrator Popen()ed the writer,
    it crashed, the parent never wait()ed). A zombie passes
    ``os.kill(pid, 0)`` and keeps its original start token forever, so
    without the state check a crashed subprocess writer would read as
    live until its PARENT exits, bricking the store — the exact mode
    the stale takeover exists to prevent."""
    foreign = False
    try:
        os.kill(pid, 0)
    except (ProcessLookupError, OverflowError):
        # gone — or an impossible pid beyond the kernel's space (a
        # litter filename can carry one into here): dead either way
        return False
    except PermissionError:
        foreign = True  # exists, owned by someone else — /proc may be
        # hidden from us too (hidepid mounts), so an unreadable stat
        # below must NOT read as dead
    fields = _stat_fields(pid)
    if fields is None:
        # pid passed kill(0) but /proc/<pid> is unreadable: for a
        # same-user pid on Linux that means it died in between — dead;
        # for a foreign-user pid or without procfs the kill verdict is
        # all we have — live (conservative: brick loudly over robbing
        # a live writer)
        return foreign or not os.path.isdir("/proc")
    state, current = fields
    if state == "Z":
        return False  # zombie: dead writer awaiting reap, never releases
    if token and current and current != token:
        return False  # same pid number, different process: recycled
    return True


def _parse(content: str) -> tuple[int, str | None] | None:
    try:
        parts = content.split()
        pid = int(parts[0])
        token = parts[1] if len(parts) > 1 and parts[1] != "-" else None
    except (ValueError, IndexError):
        return None
    if pid <= 0 or pid > 0x7FFFFFFF:
        # parseable-but-impossible owner: ``os.kill(0, 0)`` would
        # signal our own process group and read as forever-live, and a
        # pid beyond the kernel's 31-bit space makes ``os.kill`` raise
        # OverflowError out of every acquirer (found by the fsck
        # adversarial-tree property test). Both are external junk —
        # treat like unparseable content: stale
        return None
    return pid, token


def _read_owner(path: str) -> tuple[int, str | None] | None:
    """Lock-content read + parse: (pid, token), or None when the file
    is gone or unparseable. Read as BYTES and decode explicitly:
    undecodable junk written by external interference is exactly the
    "unparseable → stale" case, and a text-mode read would raise
    UnicodeDecodeError out of the acquirer instead — bricking every
    writer on content the takeover machinery exists to clear."""
    try:
        with open(path, "rb") as f:
            raw = f.read()
    except OSError:
        return None
    try:
        return _parse(raw.decode())
    except UnicodeDecodeError:
        return None


class WriterLease:
    """Reentrant (same-thread) single-writer lockfile for one store
    root. Use as a context manager; mutating store methods wrap their
    critical sections in it and a job may hold it across a whole run
    (inner acquisitions just nest)."""

    def __init__(self, root: str):
        self.root = root
        self._depth = 0
        self._thread: int | None = None

    @property
    def path(self) -> str:
        return os.path.join(self.root, _LOCKFILE)

    def _owner(self) -> tuple[int, str | None] | None:
        """(owner pid, start-time token) — or None when the lock file
        is gone or unparseable (external interference, or the degraded
        no-hard-link create window)."""
        return _read_owner(self.path)

    def _content(self) -> str:
        pid = os.getpid()
        return f"{pid} {_start_token(pid) or '-'}\n"

    def _side_flock(self, blocking: bool) -> int | None:
        """Acquire the permanent side file's flock; returns the fd (the
        caller closes it to release) or None when the platform/FS does
        not support flock (callers keep their grace-re-read fallback).
        Non-blocking mode raises ``ConcurrentWriterError`` when the
        flock is busy: the only holder is a degraded-path creator
        inside its create window — a LIVE writer, never to be robbed.
        flock is kernel-owned, so a creator that dies mid-window
        releases it automatically (no new stale state to sweep); the
        side file itself is inert litter fsck ignores."""
        try:
            import fcntl
        except ImportError:
            return None
        try:
            fd = os.open(self.path + ".flock", os.O_CREAT | os.O_RDWR)
        except OSError:
            return None
        flags = fcntl.LOCK_EX if blocking else fcntl.LOCK_EX | fcntl.LOCK_NB
        try:
            fcntl.flock(fd, flags)
        except BlockingIOError:
            os.close(fd)
            raise ConcurrentWriterError(
                f"store {self.root!r} lock is mid-create by another "
                "live writer (side flock busy); the single-writer "
                "contract forbids concurrent mutation"
            )
        except OSError:
            os.close(fd)
            return None
        return fd

    def _try_create(self) -> bool:
        """Atomically create the lock WITH its content via a hard link
        from a unique temp file; the link either fully appears
        (content included) or fails — no empty-lock window. Degrades
        to O_EXCL + immediate write where hard links are unsupported,
        holding the side flock across the open→write window so probers
        never misread it as stale (see module docstring)."""
        tmp = f"{self.path}.{os.getpid()}.{threading.get_ident()}.tmp"
        with open(tmp, "w") as f:
            f.write(self._content())
        try:
            os.link(tmp, self.path)
            return True
        except FileExistsError:
            return False
        except OSError:
            pass  # no hard-link support: degraded path below
        finally:
            os.unlink(tmp)
        side = self._side_flock(blocking=True)
        try:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd, "w") as f:
                f.write(self._content())
            return True
        finally:
            if side is not None:
                os.close(side)

    def _sweep_orphan_tmps(self) -> None:
        """Remove ``_WRITER_LOCK.<pid>.<tid>.tmp`` and
        ``_WRITER_LOCK.stale.<pid>.<tid>`` litter left by writers
        killed mid-acquire / mid-takeover — same liveness probe as the
        lock itself, so a racing LIVE acquirer's in-flight files are
        left alone."""
        try:
            names = os.listdir(self.root)
        except OSError:
            return
        for n in names:
            if not n.startswith(_LOCKFILE + "."):
                continue
            parts = n.split(".")
            is_stale_file = parts[1:2] == ["stale"]
            if not is_stale_file and not n.endswith(".tmp"):
                continue
            try:
                pid = int(parts[2 if is_stale_file else 1])
            except (ValueError, IndexError):
                continue
            if _alive(pid, None):
                continue  # live acquirer/taker mid-flight: hands off
            p = os.path.join(self.root, n)
            if is_stale_file:
                # a dead taker's quarantine may hold a ROBBED LIVE
                # owner's lock (ABA crash before its verify step).
                # Judge by the CONTENT pid: dead → plain litter,
                # deleted; live → leave the file alone. Deliberately
                # NO restore here: the content owner may have RELEASED
                # since (its release was a no-op on the missing lock
                # name), and restoring a released owner's lock would
                # brick the store until that pid exits. The inert file
                # is swept once its content pid dies.
                owner = _read_owner(p)
                if owner is not None and _alive(*owner):
                    continue
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass

    def _take_over_stale(self) -> None:
        """Quarantine-rename the stale lock: exactly one racing taker
        wins the rename; the quarantined content is re-verified so a
        lock REPLACED by a live writer inside the probe→rename window
        is surfaced as a live conflict (raise, quarantine left on
        disk — never re-installed, never destroyed while its content
        pid lives) rather than silently destroyed."""
        quarantine = f"{self.path}.stale.{os.getpid()}.{threading.get_ident()}"
        try:
            os.rename(self.path, quarantine)
        except FileNotFoundError:
            return  # another taker won (or the owner released): retry create
        owner = _read_owner(quarantine)
        if owner is not None and _alive(*owner):
            # ABA: we quarantined a LIVE lock (it replaced the stale
            # one we probed, or the aliveness verdict flipped). ONE
            # rule for live-content quarantines everywhere (here and
            # in the sweep): leave the file on disk, never destroyed
            # while its content pid lives, and never re-installed —
            # the owner may have RELEASED since its lock was renamed
            # away (release no-ops on a missing name), and re-
            # installing a released owner's lock would wedge the
            # store until that pid exits. This taker still raises; the
            # robbed-owner residual window is in the module docstring.
            raise ConcurrentWriterError(
                f"store {self.root!r} lock was re-acquired by live "
                f"writer pid {owner[0]} during stale-lock takeover"
            )
        os.unlink(quarantine)

    def __enter__(self) -> "WriterLease":
        if self._depth:
            if self._thread != threading.get_ident():
                raise ConcurrentWriterError(
                    f"store {self.root!r} lease is held by another "
                    "thread of this process; the single-writer "
                    "contract applies within a process too"
                )
            self._depth += 1
            return self
        os.makedirs(self.root, exist_ok=True)
        self._sweep_orphan_tmps()
        for attempt in (0, 1):
            if self._try_create():
                self._depth = 1
                self._thread = threading.get_ident()
                return self
            owner = self._owner()
            if owner is None and os.path.exists(self.path):
                # unparseable-but-present: on the degraded no-hardlink
                # path another writer may sit INSIDE its open→write
                # window. The side flock settles it where the FS
                # supports locking — busy raises (live creator, never
                # robbed); acquired proves no creator is mid-window.
                # The grace re-read is kept in all paths as
                # belt-and-braces for writers that predate the flock
                # or filesystems without it.
                side = self._side_flock(blocking=False)
                try:
                    time.sleep(0.05)
                    owner = self._owner()
                finally:
                    if side is not None:
                        os.close(side)
            if owner is not None and _alive(*owner):
                raise ConcurrentWriterError(
                    f"store {self.root!r} is locked by live writer "
                    f"pid {owner[0]} ({self.path}); the single-writer "
                    "contract forbids concurrent mutation — wait for "
                    "it or, if it is not a real writer, remove the "
                    "lock file"
                )
            # stale (owner dead/recycled, or unparseable external
            # interference): quarantine-rename takeover, then retry —
            # a racing taker that wins is then seen as a LIVE owner
            # and this writer raises above on the retry
            self._take_over_stale()
            if attempt:
                raise ConcurrentWriterError(
                    f"could not acquire {self.path} after stale-lock "
                    "takeover; another writer is racing"
                )
        raise AssertionError("unreachable")

    def __exit__(self, *exc) -> None:
        self._depth -= 1
        if self._depth == 0:
            self._thread = None
            # release only what we still own: if a (mis)classification
            # let another writer take over, deleting THEIR lock would
            # cascade the failure to a third writer
            owner = self._owner()
            if owner is not None and owner[0] == os.getpid():
                try:
                    os.unlink(self.path)
                except FileNotFoundError:
                    pass
