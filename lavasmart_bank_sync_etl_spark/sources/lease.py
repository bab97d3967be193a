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
O_EXCL-create-then-write would have. Mutating store verbs acquire it
around their critical section; ``SyncJob.run`` holds it for the whole
run so two overlapping syncs fail fast rather than interleave at call
granularity. Reentrant per lease instance (a run-scoped hold nests
the per-call holds). Release verifies ownership (own pid in the file)
before unlinking, so a process can never delete a lock it no longer
owns.

Staleness: a lock is stale when its recorded pid no longer exists,
when the pid exists but its /proc start time differs from the
recorded token (the pid was RECYCLED by an unrelated process — plain
``os.kill(pid, 0)`` aliveness would brick the store forever in that
case), or when the content is unparseable (impossible for this
protocol's own writes, which are link-atomic; treated as stale
because only external interference produces it). Stale locks are
taken over by unlink + one retry of the atomic link. The /proc probe
makes the contract SINGLE HOST — exactly the scope of these
filesystem backends; a multi-writer / multi-host deployment swaps in
Delta/Iceberg (sources/store.py) whose transactions subsume this
file. The takeover has a theoretical two-taker race (both probe the
same dead pid, both unlink); the loser's retry then sees the winner
live and raises — no window with two acquired writers.
"""

from __future__ import annotations

import os

_LOCKFILE = "_WRITER_LOCK"


class ConcurrentWriterError(RuntimeError):
    """A second writer hit a store another live process is mutating."""


def _start_token(pid: int) -> str | None:
    """The pid's kernel start time (clock ticks since boot, field 22
    of /proc/<pid>/stat — read AFTER the comm field, which may itself
    contain spaces/parens). None when unreadable: pid dead, or no
    procfs (non-Linux) — callers then fall back to pid-aliveness
    only."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            data = f.read()
        return data.rsplit(b")", 1)[1].split()[19].decode()
    except (OSError, IndexError):
        return None


def _alive(pid: int, token: str | None) -> bool:
    """Is the LOCK OWNER still running? False when the pid is gone or
    when it was recycled (start-time token mismatch)."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        pass  # exists, owned by someone else — fall through to token
    current = _start_token(pid)
    if token and current and current != token:
        return False  # same pid number, different process: recycled
    return True


class WriterLease:
    """Reentrant single-writer lockfile for one store root.

    Use as a context manager; mutating store methods wrap their
    critical sections in it and a job may hold it across a whole run
    (inner acquisitions just nest)."""

    def __init__(self, root: str):
        self.root = root
        self._depth = 0

    @property
    def path(self) -> str:
        return os.path.join(self.root, _LOCKFILE)

    def _owner(self) -> tuple[int, str | None] | None:
        """(owner pid, start-time token) — or None when the file is
        gone or unparseable (external interference; our own writes are
        link-atomic and always complete)."""
        try:
            with open(self.path) as f:
                parts = f.read().split()
            return int(parts[0]), (parts[1] if len(parts) > 1 else None)
        except (OSError, ValueError, IndexError):
            return None

    def _try_create(self) -> bool:
        """Atomically create the lock WITH its content via a hard link
        from a pid-unique temp file; the link either fully appears
        (content included) or fails — no empty-lock window."""
        tmp = f"{self.path}.{os.getpid()}.tmp"
        pid = os.getpid()
        with open(tmp, "w") as f:
            f.write(f"{pid} {_start_token(pid) or '-'}\n")
        try:
            os.link(tmp, self.path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def __enter__(self) -> "WriterLease":
        if self._depth:
            self._depth += 1
            return self
        os.makedirs(self.root, exist_ok=True)
        for attempt in (0, 1):
            if self._try_create():
                self._depth = 1
                return self
            owner = self._owner()
            if owner is not None:
                pid, token = owner
                if _alive(pid, None if token == "-" else token):
                    raise ConcurrentWriterError(
                        f"store {self.root!r} is locked by live writer "
                        f"pid {pid} ({self.path}); the single-writer "
                        "contract forbids concurrent mutation — wait for "
                        "it or, if it is not a real writer, remove the "
                        "lock file"
                    )
            # stale (owner dead/recycled, or externally corrupted):
            # take over once; a racing taker that wins the retry link
            # is then seen as a LIVE owner and this writer raises above
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
            if attempt:
                raise ConcurrentWriterError(
                    f"could not acquire {self.path} after stale-lock "
                    "takeover; another writer is racing"
                )
        raise AssertionError("unreachable")

    def __exit__(self, *exc) -> None:
        self._depth -= 1
        if self._depth == 0:
            # release only what we still own: if a (mis)classification
            # let another writer take over, deleting THEIR lock would
            # cascade the failure to a third writer
            owner = self._owner()
            if owner is not None and owner[0] == os.getpid():
                try:
                    os.unlink(self.path)
                except FileNotFoundError:
                    pass
