"""Table-format writer protocol.

The reference selects one of three open table formats by config switch
(``cdk.json:87``, ``cdk_stacks/glue_stack.py:76``) and implements the
same logical pipeline against each. This engine expresses that as a
structural protocol: the pipeline and catalog code in this repo only
touch these methods, so a backend swap is one constructor change.

Backends:
- ``parquet_cow.ParquetCowTable`` — copy-on-write (Hudi CoW / Delta
  default): every merge rewrites affected files; reads are plain scans.
  Best for read-heavy tables.
- ``parquet_mor.ParquetMorTable`` — merge-on-read (Hudi MoR): merges
  append small delta logs; reads reconcile base + deltas with
  latest-wins; ``compact()`` folds deltas into a new base. Best for
  write-heavy / frequent-small-batch CDC.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame


@runtime_checkable
class TableFormat(Protocol):
    """What the pipeline requires of a managed-table backend.

    Implementations also expose a ``path`` attribute (the table's
    warehouse directory — the ledger anchors there); data members
    can't live on a runtime-checkable Protocol, so it's documented
    rather than declared.
    """

    def exists(self) -> bool: ...

    def create(
        self, df: DataFrame, if_not_exists: bool = True, snapshot_meta: dict | None = None
    ) -> bool: ...

    def overwrite(self, df: DataFrame, snapshot_meta: dict | None = None) -> None: ...

    def snapshot_meta(self, version: int | None = None) -> dict | None: ...

    def read(self) -> DataFrame: ...

    def merge_upsert(self, src: DataFrame) -> None: ...

    def merge_delete(self, src: DataFrame) -> None: ...

    def compact(self) -> None: ...

    def vacuum(self, retain_last: int = 1) -> list[str]: ...
