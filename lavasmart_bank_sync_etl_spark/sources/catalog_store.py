"""Catalog-backed TableStore: the SAME ``sources.store.TableStore``
protocol as ``Warehouse``, implemented through Spark's catalog
(metastore DDL + managed tables) instead of direct filesystem layout.

This is the second implementation the storage seam promises: SyncJob
and the contract suite (tests/test_store_contract.py) run unchanged
against either backend, demonstrating that swapping in a
metastore-managed engine (the stepping stone to Delta/Iceberg — same
code path, those formats just add ACID txns on top) touches zero
plan/merge code.

Mechanics per contract method:

=============  =====================================================
ensure         ``CREATE TABLE`` (saveAsTable of an empty canonical-
               schema frame) if ``tableExists`` is false
read           ``spark.table`` — catalog-resolved scan
append         ``mode("append").saveAsTable`` (by-name resolution);
               crash durability comes from Spark's file-commit
               protocol (stage to ``_temporary``, rename on job
               commit) — the Warehouse backend instead snapshots
               appends via its hard-link + pointer-flip commit
append_once    recompute (prior state minus this run_id's rows) ∪ df,
               then the staged-swap rewrite below
rewrite        write a ``__staged`` table, park the target as
               ``__old``, RENAME staged → target, drop ``__old``.
               Two metastore renames, not one atomic op — but the
               committed rows exist under SOME name at every instant,
               and ``ensure`` heals the only target-less window with
               a single recovery rename (crash case pinned for both
               backends in test_store_contract.py). Engines with
               transactional commits (Delta/Iceberg) replace this
               with one overwrite txn — the trade documented in
               sources/store.py.
=============  =====================================================

Each store instance namespaces its tables in an own database created
``LOCATION <root>``, so independent stores (e.g. per-test tmp dirs)
never collide in the session-global catalog.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lease import WriterLease
from .warehouse import ALL_TABLES, LEGACY_RENAMES


class CatalogStore:
    """TableStore over Spark catalog managed tables (SURVEY §2.1
    S2-S7 via DDL instead of directory layout). Single-writer like
    Warehouse, enforced by the same root-scoped ``WriterLease``: the
    two-rename swap protocol assumes nothing else touches the
    ``__staged``/``__old`` names mid-swap."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._lease = WriterLease(root)
        digest = hashlib.md5(os.path.abspath(root).encode()).hexdigest()[:12]
        self.db = f"spark_graft_store_{digest}"
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {self.db} "
            f"LOCATION '{os.path.abspath(root)}'"
        )

    def lock(self) -> WriterLease:
        """Run-scoped single-writer hold (see Warehouse.lock)."""
        return self._lease

    def _qualified(self, table: str) -> str:
        return f"{self.db}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._qualified(table))

    def ensure(self, table: str) -> None:
        """S7 — create-if-missing with the canonical schema.

        If a crash during ``rewrite``'s swap left the committed state
        parked under ``<table>__old`` (target renamed away but the
        staged table not yet renamed in), recover it with the single
        rename the swap protocol guarantees suffices.

        Lease note: the committed-state fast path is lock-free so read
        verbs never contend with a writer's lease; the lease is taken
        only when there is something to create or recover, and the
        state is re-checked under it."""
        if self.exists(table):
            return
        with self._lease:
            target = self._qualified(table)
            old = f"{target}__old"
            if not self.exists(table) and self.spark.catalog.tableExists(old):
                self.spark.sql(f"ALTER TABLE {old} RENAME TO {target}")
            if not self.exists(table):
                empty = self.spark.createDataFrame([], ALL_TABLES[table])
                empty.write.format("parquet").saveAsTable(target)

    def migrate_legacy(self) -> None:
        """S9 — legacy renames as metastore DDL (vs Warehouse's
        directory rename)."""
        with self._lease:
            for old, new in LEGACY_RENAMES.items():
                if self.exists(old) and not self.exists(new):
                    self.spark.sql(
                        f"ALTER TABLE {self._qualified(old)} "
                        f"RENAME TO {self._qualified(new)}"
                    )

    def read(self, table: str) -> DataFrame:
        """S2 — catalog-resolved scan of committed state."""
        self.ensure(table)
        return self.spark.table(self._qualified(table))

    def append(self, table: str, df: DataFrame) -> None:
        """S3/S5/S6 — append sink."""
        with self._lease:
            self.ensure(table)
            df.select(*[f.name for f in ALL_TABLES[table].fields]).write.mode(
                "append"
            ).format("parquet").saveAsTable(self._qualified(table))

    def append_once(
        self, table: str, df: DataFrame, run_id: str, run_id_col: str = "run_id"
    ) -> None:
        """Effectively-once append: drop any rows a previous attempt of
        this run wrote, then fold the new rows in via the staged-swap
        rewrite (same semantics as Warehouse.append_once)."""
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
        """S4 — replace table state via staged table + metastore swap.

        The staging write fully materializes the new state BEFORE the
        target moves (``df`` may read from the target — Spark forbids
        overwriting a table being read, and the stage/swap sidesteps
        that as well), so a failed write never truncates the target.
        The swap itself parks the old state under ``<table>__old``
        before renaming the staged table in, so the committed data
        exists under SOME name at every instant; a crash mid-swap is
        healed by ``ensure``'s single recovery rename. True one-call
        atomicity is what a Delta/Iceberg backend buys
        (sources/store.py)."""
        with self._lease:
            self.ensure(table)
            target = self._qualified(table)
            staged = f"{target}__staged"
            old = f"{target}__old"
            self.spark.sql(f"DROP TABLE IF EXISTS {staged}")
            df.select(*[f.name for f in ALL_TABLES[table].fields]).write.format(
                "parquet"
            ).saveAsTable(staged)
            self.spark.sql(f"DROP TABLE IF EXISTS {old}")
            self.spark.sql(f"ALTER TABLE {target} RENAME TO {old}")
            self.spark.sql(f"ALTER TABLE {staged} RENAME TO {target}")
            self.spark.sql(f"DROP TABLE {old}")
            self.spark.catalog.refreshTable(target)
