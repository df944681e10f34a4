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

    def resolve_spec(self, database: str, table_name: str) -> TableSpec:
        """Rebuild a table's spec from its committed metadata — what
        lets the SQL surface (``sql.LakeSQL``) address tables by NAME
        (``lake.db.table``) the way the reference's jobs do
        (``src/iceberg/iceberg-cdc-load.py:158-159``) without the
        caller holding a TableSpec. Identity, layout, AND write-side
        invariants (CHECK constraints, bloom index columns, version
        guard, z-order) come from ``_format.json``, written at create
        time — a MERGE through the SQL-text surface enforces exactly
        what the creating writer declared (r7 advisory: resolving
        without constraints silently skipped validation)."""
        import json

        meta_path = os.path.join(self.warehouse, database, table_name, "_format.json")
        if not os.path.isfile(meta_path):
            raise FileNotFoundError(f"no managed table {database}.{table_name}")
        with open(meta_path, encoding="utf-8") as f:
            meta = json.load(f)
        pk = meta.get("primary_key")
        if not pk:
            raise ValueError(
                f"{database}.{table_name}: metadata records no primary_key"
            )
        return TableSpec(
            table_name=table_name,
            primary_key=pk,
            partition_key=meta.get("partition_key"),
            version_key=meta.get("version_key"),
            database=database,
            zorder_by=tuple(meta["zorder_by"]) if meta.get("zorder_by") else None,
            constraints=tuple(meta.get("constraints") or ()),
            bloom_filter_cols=tuple(meta.get("bloom_filter_cols") or ()),
            partition_transform=meta.get("partition_transform"),
        )

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
            if entry.startswith("."):
                continue  # hidden build dirs (e.g. in-flight clones)
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
        travels, ``tag`` resolves a named snapshot ref, and ``branch``
        reads an unpublished branch head — all supported by BOTH
        formats (MoR branch refs landed with r7 verdict #5). The three
        selectors are mutually exclusive."""
        if sum(x is not None for x in (version, tag, branch)) > 1:
            raise ValueError("pass at most one of version=, tag=, branch=")
        tbl = self.table(spec)
        if branch is not None:
            return tbl.branch(branch).read()
        if tag is not None:
            return tbl.read(tag=tag)
        if version is not None:
            return tbl.read(version=version)
        return tbl.read()

    def clone_table(
        self,
        src_spec: TableSpec,
        dst_spec: TableSpec,
        version: int | None = None,
        tag: str | None = None,
        deep: bool = False,
    ) -> int:
        """Delta-style CLONE: a new managed table whose first version
        references one snapshot of the source — shallow (default) via
        hard links (metadata-only, zero data movement: the dev/test
        sandbox pattern), or ``deep=True`` via byte copies (also the
        cross-filesystem path; shallow falls back to copy per file when
        linking fails). The clone is an INDEPENDENT table: fresh
        lineage starting at v1, its own refs and ledger, no source
        transaction markers — vacuuming either table never breaks the
        other because hard links keep shared bytes alive until the last
        referent drops them. Returns the clone's version (always 1).

        The destination spec must declare the same physical layout
        (partition key/transform) — a clone re-labels bytes, it never
        re-partitions them."""
        import shutil

        src = self.table(src_spec)
        if not isinstance(src, ParquetCowTable):
            raise ValueError(
                f"{src_spec.qualified_name}: clone is only supported for "
                "copy-on-write tables; this table is merge-on-read"
            )
        if (
            dst_spec.partition_key != src_spec.partition_key
            or dst_spec.partition_transform != src_spec.partition_transform
        ):
            raise ValueError(
                "clone cannot change the physical layout: destination spec "
                "must declare the same partition_key/partition_transform"
            )
        if tag is not None and version is not None:
            raise ValueError("pass version= or tag=, not both")
        if tag is not None:
            known = src.tags()
            if tag not in known:
                raise KeyError(f"tag {tag!r} does not exist on {src_spec.qualified_name}")
            version = known[tag]
        cur = src.current_version()
        if cur is None:
            raise FileNotFoundError(f"table {src_spec.qualified_name} does not exist")
        vpath = cur.path
        if version is not None:
            vpath = os.path.join(src.path, f"v{version:08d}")
            if not os.path.isdir(vpath):
                raise FileNotFoundError(
                    f"version {version} of {src_spec.qualified_name} is not retained"
                )

        dst = self.table(dst_spec)
        if dst.exists():
            raise FileExistsError(dst_spec.qualified_name)
        # Build the whole clone under a hidden temp dir, then one rename
        # publishes it — a crashed clone leaves only invisible debris.
        import json as _json
        import uuid as _uuid

        tmp = os.path.join(
            os.path.dirname(dst.path),
            f".{dst_spec.table_name}.clonetmp-{_uuid.uuid4().hex}",
        )
        v1 = os.path.join(tmp, "v00000001")
        try:
            os.makedirs(v1)
            meta = dict(src._read_meta())
            meta["table"] = dst_spec.table_name
            meta["database"] = dst_spec.database
            with open(os.path.join(tmp, "_format.json"), "w", encoding="utf-8") as f:
                _json.dump(meta, f, indent=2)
            for root, dirs, files in os.walk(vpath):
                # The source's change-data capture is lineage state, not
                # table content — a clone starts a fresh change history.
                dirs[:] = [d for d in dirs if d != "_changelog"]
                rel = os.path.relpath(root, vpath)
                out_dir = v1 if rel == "." else os.path.join(v1, rel)
                os.makedirs(out_dir, exist_ok=True)
                for fname in files:
                    if fname in ("_snapshot.json", "_commit_op.json"):
                        continue  # source txn/IVM/op markers are lineage state
                    s = os.path.join(root, fname)
                    d = os.path.join(out_dir, fname)
                    if deep:
                        shutil.copy2(s, d)
                    else:
                        try:
                            os.link(s, d)
                        except OSError:
                            shutil.copy2(s, d)  # cross-device shallow
            with open(os.path.join(v1, "_commit_op.json"), "w", encoding="utf-8") as f:
                _json.dump({"op": "create"}, f)
            with open(os.path.join(tmp, "_LATEST"), "w", encoding="ascii") as f:
                f.write("1")
            os.makedirs(os.path.dirname(dst.path), exist_ok=True)
            os.rename(tmp, dst.path)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        return 1

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

    def sync_session_views(self, database: str | None = None) -> list[str]:
        """Bridge to the BARE SparkSession: (re)register every managed
        table as a session temp view named ``<db>__<table>``, so plain
        ``spark.table("db__t")`` / ``spark.sql("SELECT ... FROM
        db__t")`` work with no ``LakeSQL`` wrapper — the nearest
        equivalent of the reference's Glue-catalog visibility
        (``src/iceberg/iceberg-cdc-load.py:158-159``) a pure-Python
        engine can offer.

        Honest contract: views are SNAPSHOT-PINNED at sync time (each
        backs the table's committed head via its read path, schema
        mapping and MoR reconcile included). Re-run after commits to
        advance them — the call is metadata-only per table, no data
        scan. Why pinned: Spark's CatalogPlugin API (which would make
        ``spark.table("lake.db.t")`` resolve live) is JVM-only, Python
        data sources cannot register a session catalog, and
        DataFrame-backed temp views store the analyzed plan — there is
        no pure-Python hook that re-resolves a table pointer at query
        time. ``LakeSQL`` remains the always-current SQL surface.

        ``database=None`` syncs every database in the warehouse.
        Returns the registered view names."""
        if database is not None:
            dbs = [database]
        elif os.path.isdir(self.warehouse):
            dbs = sorted(
                d
                for d in os.listdir(self.warehouse)
                if not d.startswith(".") and os.path.isdir(os.path.join(self.warehouse, d))
            )
        else:
            dbs = []
        out: list[str] = []
        for db in dbs:
            for t in self.list_tables(db):
                spec = self.resolve_spec(db, t)
                out.append(self.table(spec).register_temp_view(f"{db}__{t}"))
        return out

    def fsck(self, spec: TableSpec, deep: bool = False) -> list[dict]:
        """Integrity audit of a managed table (either format): findings
        with severity+kind, empty = healthy. Never mutates — vacuum is
        the repair tool for debris findings."""
        return self.table(spec).fsck(deep=deep)
