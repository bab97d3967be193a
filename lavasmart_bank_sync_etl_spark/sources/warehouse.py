"""Warehouse storage (SURVEY.md §2.1 S3-S9): parquet-backed logical
tables with create-if-missing DDL, append sinks, and atomic-enough
rewrite (write tmp → swap) for the merge targets.

Plain parquet keeps the engine dependency-free; on a cluster with
Delta/Iceberg available, ``rewrite_target`` becomes a single
``MERGE INTO`` and this module shrinks to table registration.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import AUDIT_LOG, BATCH_CLOSURES, FOLIO_DIM, REVIEW_QUEUE, TARGETS

ALL_TABLES: dict[str, StructType] = {
    **{name: schema for name, (schema, _, _) in TARGETS.items()},
    "audit_log": AUDIT_LOG,
    "review_queue": REVIEW_QUEUE,
    "batch_closures": BATCH_CLOSURES,
    "folio_dim": FOLIO_DIM,
}

#: S9 — legacy rename migration (Code.gs:247-258).
LEGACY_RENAMES = {"conciliacion_bancaria": "transfers"}


class Warehouse:
    """A directory of parquet tables with the reference's DDL
    semantics."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def migrate_legacy(self) -> None:
        """S9 — one-shot rename of legacy table directories."""
        for old, new in LEGACY_RENAMES.items():
            if os.path.isdir(self.path(old)) and not self.exists(new):
                os.rename(self.path(old), self.path(new))

    def ensure(self, table: str) -> None:
        """S7 — create-if-missing with the canonical schema
        (Code.gs:289-329 et al.)."""
        if not self.exists(table):
            empty = self.spark.createDataFrame([], ALL_TABLES[table])
            empty.write.mode("overwrite").parquet(self.path(table))

    def read(self, table: str) -> DataFrame:
        """S2 — destination scan. S8's header validation becomes schema
        enforcement: read under the canonical schema."""
        self.ensure(table)
        return self.spark.read.schema(ALL_TABLES[table]).parquet(self.path(table))

    def append(self, table: str, df: DataFrame) -> None:
        """S3/S5/S6 — batch append sink."""
        self.ensure(table)
        df.select(*[f.name for f in ALL_TABLES[table].fields]).write.mode("append").parquet(
            self.path(table)
        )

    def rewrite(self, table: str, df: DataFrame) -> None:
        """S4 — full-state rewrite via tmp-dir swap, so a failed write
        never truncates the target (SURVEY §7.3 risk note)."""
        tmp = self.path(table) + ".tmp"
        final = self.path(table)
        df.select(*[f.name for f in ALL_TABLES[table].fields]).write.mode("overwrite").parquet(tmp)
        old = final + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.isdir(old):
            shutil.rmtree(old)
        # drop any cached file listing for the swapped directory
        self.spark.catalog.refreshByPath(final)
