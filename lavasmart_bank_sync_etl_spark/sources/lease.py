"""Single-writer lease for the filesystem-rooted TableStore backends.

Both shipped stores (``Warehouse``, ``CatalogStore``) document a
single-writer contract — the reference is one daily trigger
(Code.gs:649) — but until round 9 the contract was prose only: a
second concurrent writer would interleave ``_clear_dangling`` /
staged-swap steps with the first's in-flight commit and corrupt
SILENTLY. This lease turns contract violation into a loud
``ConcurrentWriterError`` instead.

Mechanics: a ``_WRITER_LOCK`` file at the store root, created with
``O_CREAT | O_EXCL`` (atomic on POSIX local filesystems), holding the
owner pid. Mutating store verbs acquire it around their critical
section; ``SyncJob.run`` holds it for the whole run so two overlapping
syncs fail fast rather than interleave at call granularity. Reentrant
per lease instance (a run-scoped hold nests the per-call holds).

Staleness: a lock whose recorded pid no longer exists (the owner
crashed — ``os.kill(pid, 0)`` probe) or whose content is unreadable is
taken over by unlink + one retry of the exclusive create. The probe is
pid-local, so the contract is SINGLE HOST — which is exactly the scope
of these filesystem backends; a multi-writer / multi-host deployment
swaps in Delta/Iceberg (sources/store.py) whose transactions subsume
this file. The unlink+recreate takeover has a theoretical two-taker
race (both probe the same dead pid); acceptable for a crash-recovery
path whose alternative was silent corruption, and documented here.
"""

from __future__ import annotations

import os

_LOCKFILE = "_WRITER_LOCK"


class ConcurrentWriterError(RuntimeError):
    """A second writer hit a store another live process is mutating."""


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
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

    def _owner(self) -> int | None:
        """Recorded owner pid, or None when unreadable/unparseable
        (treated as stale: a torn lock write means its owner died
        mid-create)."""
        try:
            with open(self.path) as f:
                return int(f.read().split()[0])
        except (OSError, ValueError, IndexError):
            return None

    def __enter__(self) -> "WriterLease":
        if self._depth:
            self._depth += 1
            return self
        os.makedirs(self.root, exist_ok=True)
        for attempt in (0, 1):
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                pid = self._owner()
                if pid is not None and _alive(pid):
                    raise ConcurrentWriterError(
                        f"store {self.root!r} is locked by live writer "
                        f"pid {pid} ({self.path}); the single-writer "
                        "contract forbids concurrent mutation — wait for "
                        "it or, if it is not a real writer, remove the "
                        "lock file"
                    )
                # stale (owner dead / torn lock): take over once
                try:
                    os.unlink(self.path)
                except FileNotFoundError:
                    pass
                if attempt:
                    raise ConcurrentWriterError(
                        f"could not acquire {self.path} after stale-lock "
                        "takeover; another writer is racing"
                    )
                continue
            with os.fdopen(fd, "w") as f:
                f.write(f"{os.getpid()}\n")
            self._depth = 1
            return self
        raise AssertionError("unreachable")

    def __exit__(self, *exc) -> None:
        self._depth -= 1
        if self._depth == 0:
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
