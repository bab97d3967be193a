"""Storage seam: the table-store contract SyncJob writes through.

``Warehouse`` (versioned-parquet, single-writer) is the shipped
implementation; a multi-writer deployment swaps in a Delta/Iceberg
implementation of the SAME protocol without touching SyncJob:

=============  =====================================================
method         Delta/Iceberg mapping
=============  =====================================================
ensure         CREATE TABLE IF NOT EXISTS <canonical schema>
read           SELECT * (snapshot isolation comes free)
rewrite        overwrite txn (or MERGE when the diff is keyed)
append         append txn
append_once    append txn guarded by the run_id stamp — engines with
               real transactions make this exactly-once; the parquet
               implementation gets atomicity from its snapshot-commit
               protocol instead
=============  =====================================================

The contract is pinned by tests/test_store_contract.py, which runs the
same behavioral suite against any implementation registered there.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame


@runtime_checkable
class TableStore(Protocol):
    """What SyncJob needs from storage (SURVEY.md §2.1 S2-S7)."""

    def exists(self, table: str) -> bool: ...

    def ensure(self, table: str) -> None:
        """S7 — create-if-missing with the canonical schema."""

    def migrate_legacy(self) -> None:
        """S9 — one-shot rename of legacy tables to canonical names."""

    def read(self, table: str) -> DataFrame:
        """S2 — scan the current committed state."""

    def append(self, table: str, df: DataFrame) -> None:
        """S3/S5/S6 — append rows (at-least-once on bare retry)."""

    def append_once(self, table: str, df: DataFrame, run_id: str) -> None:
        """Append rows stamped with ``run_id`` so a retried run
        replaces-instead-of-duplicates its own rows (effectively-once)."""

    def rewrite(self, table: str, df: DataFrame) -> None:
        """S4 — replace the table state atomically."""
