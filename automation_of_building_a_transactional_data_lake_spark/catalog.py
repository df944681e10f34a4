"""Catalog operations over a warehouse of managed tables.

The reference uses the Glue Data Catalog: existence checks via
``spark.catalog.listTables`` / ``SHOW TABLES``
(``src/hudi/hudi-initial-load.py:114``,
``src/iceberg/iceberg-initial-load.py:102-104``,
``src/delta/delta-cdc-load.py:158-160``) and registration via hive sync /
GlueCatalog / a crawler (``cdk_stacks/glue_stack.py:242-259``). This
engine's catalog is the warehouse directory tree itself plus the
per-table commit pointer — registration is implicit in a committed
create (no crawler needed), which is the ``saveAsTable`` behavior the
reference's Delta variant lacks (SURVEY §2.2 W9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .formats.parquet_cow import ParquetCowTable
from .formats.parquet_mor import ParquetMorTable
from .spec import TableSpec

_FORMATS = {"cow": ParquetCowTable, "mor": ParquetMorTable}


class Catalog:
    """Directory-backed catalog: databases are directories, tables are
    committed table-format instances.

    ``table_format`` selects the writer backend for all tables in this
    catalog — the engine-native equivalent of the reference's single
    config switch between Hudi/Iceberg/Delta (``cdk.json:87``):
    ``"cow"`` (copy-on-write, read-optimized, default) or ``"mor"``
    (merge-on-read, write-optimized).
    """

    def __init__(self, spark: SparkSession, warehouse: str, table_format: str = "cow") -> None:
        if table_format not in _FORMATS:
            raise ValueError(
                f"unknown table_format {table_format!r}; choose from {sorted(_FORMATS)}"
            )
        self.spark = spark
        self.warehouse = warehouse
        self.table_format = table_format

    def table(self, spec: TableSpec):
        """Instantiate the table's backend. An EXISTING table is opened
        with the format that wrote it (recorded in its `_format.json`
        at create time), whatever this catalog's default — so a
        warehouse can mix CoW analytics tables with MoR CDC tables and
        a reader never applies the wrong reconciliation. New tables get
        the catalog default."""
        recorded = self._recorded_format(spec)
        if recorded == "parquet_cow":  # legacy alias from early metas
            recorded = "cow"
        fmt = recorded if recorded in _FORMATS else self.table_format
        return _FORMATS[fmt](self.spark, self.warehouse, spec)

    def _recorded_format(self, spec: TableSpec) -> str | None:
        meta_path = os.path.join(
            self.warehouse, spec.database, spec.table_name, "_format.json"
        )
        if not os.path.isfile(meta_path):
            return None
        import json

        try:
            with open(meta_path, encoding="utf-8") as f:
                return json.load(f).get("format")
        except (OSError, ValueError):
            return None

    def table_exists(self, spec: TableSpec) -> bool:
        """S5: existence check (reference
        ``spark.catalog.listTables(DATABASE)`` —
        ``src/hudi/hudi-cdc-load.py:108-109``)."""
        return self.table(spec).exists()

    def list_tables(self, database: str) -> list[str]:
        """S5: ``SHOW TABLES IN db`` (reference
        ``src/iceberg/iceberg-cdc-load.py:117``). Only committed tables
        (with a version pointer) are listed — an in-flight create is
        invisible, matching transactional catalog semantics."""
        db_dir = os.path.join(self.warehouse, database)
        if not os.path.isdir(db_dir):
            return []
        out = []
        for entry in sorted(os.listdir(db_dir)):
            if os.path.isfile(os.path.join(db_dir, entry, "_LATEST")):
                out.append(entry)
        return out

    def read_table(
        self,
        spec: TableSpec,
        version: int | None = None,
        tag: str | None = None,
        branch: str | None = None,
    ) -> DataFrame:
        """S4: snapshot read through the catalog. ``version`` time-
        travels (both formats); ``tag`` resolves a named snapshot ref;
        ``branch`` reads an unpublished branch head (both CoW-only —
        see ``ParquetCowTable.create_tag``/``create_branch``). The
        three selectors are mutually exclusive."""
        if sum(x is not None for x in (version, tag, branch)) > 1:
            raise ValueError("pass at most one of version=, tag=, branch=")
        tbl = self.table(spec)
        if tag is not None or branch is not None:
            if not isinstance(tbl, ParquetCowTable):
                # Without the guard this crashes with an opaque
                # TypeError (ParquetMorTable.read has no `tag`, no
                # branch refs) — a mixed-format warehouse deserves a
                # feature error.
                what = "tags" if tag is not None else "branches"
                raise ValueError(
                    f"{spec.qualified_name}: {what} are only supported on "
                    "copy-on-write tables; this table is merge-on-read"
                )
            if branch is not None:
                return tbl.branch(branch).read()
            return tbl.read(tag=tag)
        if version is not None:
            return tbl.read(version=version)
        return tbl.read()

    def drop_table(self, spec: TableSpec, if_exists: bool = True) -> bool:
        """DROP TABLE: remove the table directory (data, versions,
        ledger, metadata). Returns False when absent and
        ``if_exists``. The reference has no drop surface (cleanup is
        stack teardown); a switching user needs one."""
        import shutil

        tdir = os.path.join(self.warehouse, spec.database, spec.table_name)
        if not os.path.isdir(tdir):
            if if_exists:
                return False
            raise FileNotFoundError(spec.qualified_name)
        shutil.rmtree(tdir)
        return True

    def register_temp_view(self, spec: TableSpec, name: str | None = None) -> str:
        """W11: make the table SQL-visible in the session."""
        return self.table(spec).register_temp_view(name)
