"""Pipeline orchestration: the reference's two job lifecycles as library
functions (SURVEY §3.1 initial load, §3.2 CDC load, §2.12 control plane).

Reference shape per table (``src/hudi/hudi-initial-load.py:109-127``,
``src/iceberg/iceberg-cdc-load.py:68-178``):

  initial:  scan raw zone → skip if table exists → bulk write + register
  cdc:      incremental scan (bookmark) → empty-batch guard → cast ts →
            latest-record dedup → I vs U/D split + unionAll → audit col →
            telemetry → skip if table missing → MERGE upsert → MERGE
            delete → commit bookmark

Differences, intentional (SURVEY §7.4):
- dedup is row_number with deterministic tie-break (the reference's
  window-max keeps equal-timestamp duplicates, which MERGE rejects);
- telemetry is one groupBy pass, not four separate count() jobs
  (reference ``src/hudi/hudi-cdc-load.py:97-100``) — at 100 TB each
  count() is a full batch re-scan;
- the deduped batch is cached: it feeds telemetry, the upsert merge and
  the delete merge (reference recomputes the window per action);
- the file ledger commits only after both merges succeed, so a failed
  run replays the batch (MERGE is idempotent per key).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .operators.cdc import (
    cast_envelope_timestamp,
    dedupe_latest,
    op_telemetry,
    recombine_ops,
    split_ops,
    with_audit_column,
)
from .sources.ledger import FileLedger
from .spec import OP_COL, TS_COL, TableSpec

INITIAL_ZONE = "initial-load"
CDC_ZONE = "cdc-load"


@dataclass
class LoadReport:
    table: str
    action: str  # created | skipped_exists | merged | skipped_empty | skipped_missing
    telemetry: dict[str, int] = field(default_factory=dict)
    files: list[str] = field(default_factory=list)


def _raw_dir(raw_root: str, zone: str, spec: TableSpec) -> str:
    # Raw-zone layout <root>/<zone>/<db>/<table>/ (reference README.md:31-46).
    return f"{raw_root}/{zone}/{spec.database}/{spec.table_name}"


_SOURCE_FORMATS = {"parquet", "csv", "json"}


def initial_load(
    spark: SparkSession,
    catalog: Catalog,
    spec: TableSpec,
    raw_root: str,
    source_format: str = "parquet",
    schema=None,
    reader_options: dict[str, str] | None = None,
) -> LoadReport:
    """One table's full load (§3.1): recursive raw-zone scan (S1) →
    idempotent create (W1/W2, skip-if-exists guard at reference
    ``src/hudi/hudi-initial-load.py:109-110``).

    ``source_format``/``schema``/``reader_options`` extend the
    reference's parquet-only raw zone to csv/json drops (a DMS task
    can emit any of the three). Prefer an explicit ``schema`` for
    text formats at scale — ``inferSchema`` is an extra full pass over
    the raw zone. The managed table is always written as parquet."""
    if source_format not in _SOURCE_FORMATS:
        raise ValueError(
            f"source_format {source_format!r} not in {sorted(_SOURCE_FORMATS)}"
        )
    tbl = catalog.table(spec)
    if tbl.exists():
        return LoadReport(spec.table_name, "skipped_exists")
    reader = spark.read.option("recursiveFileLookup", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    df = getattr(reader, source_format)(_raw_dir(raw_root, INITIAL_ZONE, spec))
    tbl.create(df)
    return LoadReport(spec.table_name, "created")


def cdc_load(
    spark: SparkSession,
    catalog: Catalog,
    spec: TableSpec,
    raw_root: str,
    clock: datetime | None = None,
) -> LoadReport:
    """One table's CDC micro-batch (§3.2) against the managed table."""
    tbl = catalog.table(spec)
    ledger = FileLedger(tbl.path)
    files = ledger.new_files(_raw_dir(raw_root, CDC_ZONE, spec))
    if not files:
        # Empty-batch guard (reference src/hudi/hudi-cdc-load.py:72-73).
        return LoadReport(spec.table_name, "skipped_empty")
    if not tbl.exists():
        # Missing-table guard (reference src/hudi/hudi-cdc-load.py:110-112).
        return LoadReport(spec.table_name, "skipped_missing", files=files)

    batch = spark.read.parquet(*files)
    telemetry = apply_cdc_batch(batch, tbl, spec, clock)
    # Bookmark commits only after both merges succeed.
    ledger.commit(files)
    return LoadReport(spec.table_name, "merged", telemetry=telemetry, files=files)


def apply_cdc_batch(
    batch,
    tbl,
    spec: TableSpec,
    clock: datetime | None = None,
    snapshot_meta: dict | None = None,
) -> dict:
    """The CDC apply core (§3.2 steps 3-8), shared by the batch loop
    and the Structured Streaming ``foreachBatch`` sink: cast envelope
    timestamp → latest-record dedup → I/U-D route+union → telemetry →
    MERGE upsert (envelope dropped, audit stamped) → MERGE delete.

    ``snapshot_meta`` (e.g. the streaming txn marker) attaches to the
    LAST commit the batch produces: a crash between the upsert and
    delete halves leaves the marker un-advanced, so a replay re-applies
    the whole batch (idempotent merges) and the outcome stays
    exactly-once."""
    deduped = dedupe_latest(
        cast_envelope_timestamp(batch),
        key=spec.primary_key,
        ts_col=spec.version_key or TS_COL,
        op_col=OP_COL,
    )
    routed = recombine_ops(deduped).cache()
    try:
        telemetry = op_telemetry(routed)
        upserts, deletes = split_ops(routed)
        n_upserts = telemetry.get("I", 0) + telemetry.get("U", 0)
        n_deletes = telemetry.get("D", 0)
        if n_upserts > 0:
            # P2 envelope drop (reference src/hudi/hudi-cdc-load.py:107,115)
            # + P4 audit stamp, then MERGE upsert (W5/W6).
            src = with_audit_column(upserts.drop(OP_COL, TS_COL), clock)
            tbl.merge_upsert(
                src, snapshot_meta=snapshot_meta if n_deletes == 0 else None
            )
        if n_deletes > 0:
            # MERGE delete needs only the key column (W7/W8).
            tbl.merge_delete(deletes.select(spec.primary_key), snapshot_meta=snapshot_meta)
    finally:
        routed.unpersist()
    return telemetry


def cdc_load_wap(
    spark: SparkSession,
    catalog: Catalog,
    spec: TableSpec,
    raw_root: str,
    audit=None,
    branch_name: str = "wap-cdc",
    clock: datetime | None = None,
) -> LoadReport:
    """Write-audit-publish CDC micro-batch (Iceberg's WAP pattern as a
    spec-driven pipeline step, no table-API dropdown needed): the batch
    merges into a staging BRANCH invisible to main readers, ``audit``
    (a callable ``DataFrame -> bool`` over the branch state) gates it,
    and only a passing batch fast-forwards main. A failing audit drops
    the branch — main never saw the bad batch — and leaves the file
    ledger uncommitted, so the NEXT run replays the same files (merges
    are idempotent per key; fix the audit or the data and rerun).

    Works on both formats: CoW and MoR tables carry branch refs in
    their commit protocols (r7 verdict #5 lifted the CoW-only
    restriction).
    """
    tbl = catalog.table(spec)
    ledger = FileLedger(tbl.path)
    files = ledger.new_files(_raw_dir(raw_root, CDC_ZONE, spec))
    if not files:
        return LoadReport(spec.table_name, "skipped_empty")
    if not tbl.exists():
        return LoadReport(spec.table_name, "skipped_missing", files=files)

    # A leftover staging branch (crash between create and drop/publish,
    # or a publish that lost a ConcurrentWriteError race) must not wedge
    # every subsequent run with "branch already exists" — the batch it
    # staged was never published and its ledger never committed, so the
    # correct recovery IS to drop it and replay from a fresh fork.
    try:
        tbl.drop_branch(branch_name)
    except KeyError:
        pass
    tbl.create_branch(branch_name)
    try:
        batch = spark.read.parquet(*files)
        telemetry = apply_cdc_batch(batch, tbl.branch(branch_name), spec, clock)
        staged = catalog.read_table(spec, branch=branch_name)
        if audit is not None and not audit(staged):
            tbl.drop_branch(branch_name)
            return LoadReport(
                spec.table_name, "audit_failed", telemetry=telemetry, files=files
            )
        # Publish INSIDE the try: if main advanced past the fork point,
        # publish_branch raises ConcurrentWriteError — the cleanup below
        # drops the branch so the retry replays against the new head.
        tbl.publish_branch(branch_name)
    except Exception:
        # Never leave a half-applied staging branch behind: the next
        # run re-creates it from a fresh fork and replays the batch.
        try:
            tbl.drop_branch(branch_name)
        except KeyError:
            pass
        raise
    # Bookmark commits only after the audited state is live on main.
    ledger.commit(files)
    return LoadReport(spec.table_name, "published", telemetry=telemetry, files=files)


def initial_load_all(
    spark: SparkSession,
    catalog: Catalog,
    specs: list[TableSpec],
    raw_root: str,
) -> list[LoadReport]:
    """Multi-table loop from declarative config (reference
    ``src/hudi/hudi-initial-load.py:118-127``)."""
    return [initial_load(spark, catalog, s, raw_root) for s in specs]


def cdc_load_all(
    spark: SparkSession,
    catalog: Catalog,
    specs: list[TableSpec],
    raw_root: str,
    clock: datetime | None = None,
) -> list[LoadReport]:
    """Multi-table CDC loop (reference
    ``src/iceberg/iceberg-cdc-load.py:171-178``)."""
    return [cdc_load(spark, catalog, s, raw_root, clock) for s in specs]


def mirror_to_delta(
    catalog: Catalog,
    spec: TableSpec,
    delta_path: str,
    telemetry: dict | None = None,
) -> int:
    """Publish the table's committed snapshot as a REAL Delta Lake
    table for external consumers — the engine-native upgrade of the
    reference's Redshift symlink-manifest flow
    (``cdk_stacks/glue_stack.py:262-279``): any Delta reader
    (Spark+delta jars, Trino, DuckDB-delta, Polars) opens the mirror
    with snapshot isolation and schema, no manifest glue.

    INCREMENTAL (r9): after the initial bulk publish, each cycle diffs
    the source's snapshots (X36) between the last-mirrored version
    (``_mirror_state.json`` beside the mirror) and head, and applies
    only the changed keys through ``interop.merge_delta`` — write
    amplification O(changed files), not O(table). An unchanged source
    is a no-op; a vacuumed diff window falls back to one overwrite
    commit (readers still always see a consistent snapshot). Returns
    the mirror's Delta version."""
    from .formats.interop import (
        _DELTA_LOG,
        _delta_latest_version,
        merge_delta,
        write_delta,
    )

    log_dir = os.path.join(delta_path, _DELTA_LOG)
    tbl = catalog.table(spec)
    head = (
        tbl.current_version().version
        if hasattr(tbl, "current_version") and tbl.exists()
        else None
    )
    if not os.path.isdir(log_dir):
        v = write_delta(
            catalog.read_table(spec), delta_path, mode="error",
            partition_by=spec.partition_keys,
        )
        _write_mirror_state(delta_path, head)
        return v
    ups, dels, head = _mirror_delta_rows(catalog, spec, delta_path)
    if ups is None:
        return _delta_latest_version(log_dir)  # already current
    if isinstance(dels, str):  # full republish fallback
        if telemetry is not None:
            # Surface WHY the expensive O(table) path ran (r9 advice
            # #3): a persistent non-vacuum cause must be visible, not
            # masquerade as routine maintenance cost.
            telemetry["delta_mirror_fallback"] = dels
        v = write_delta(ups, delta_path, mode="overwrite")
    else:
        v = _delta_latest_version(log_dir)
        if ups.limit(1).count():
            v = merge_delta(ups, delta_path, key=spec.primary_key, mode="upsert")
        if dels.limit(1).count():
            v = merge_delta(
                dels, delta_path, key=spec.primary_key, mode="delete"
            )
    _write_mirror_state(delta_path, head)
    return v


def mirror_to_iceberg(
    catalog: Catalog,
    spec: TableSpec,
    iceberg_path: str,
    telemetry: dict | None = None,
) -> int:
    """The Iceberg twin of ``mirror_to_delta``: publish the committed
    snapshot as a REAL Iceberg v2 table. INCREMENTAL (r10, closing the
    last full-republish-per-cycle mirror): after the initial bulk
    publish, each cycle diffs the source's snapshots (X36) between the
    last-mirrored version (``_mirror_state.json`` beside the mirror)
    and head and applies only the changed keys through
    ``interop.merge_iceberg`` — write amplification O(changed files),
    not O(table). An unchanged source is a no-op; a vacuumed diff
    window falls back to one overwrite snapshot (reason recorded in
    ``telemetry``). Prior mirror snapshots stay time-travelable on the
    Iceberg side either way. Identity partitioning only
    (transform-partitioned specs mirror unpartitioned — the mirror's
    layout is a consumer convenience, not a correctness surface).
    Returns the current snapshot id."""
    from .formats.interop import (
        _iceberg_current_metadata,
        merge_iceberg,
        write_iceberg,
    )

    exists = os.path.isdir(os.path.join(iceberg_path, "metadata"))
    pkeys = list(spec.partition_keys or [])
    tbl = catalog.table(spec)
    head = (
        tbl.current_version().version
        if hasattr(tbl, "current_version") and tbl.exists()
        else None
    )

    def _publish_full(df):
        try:
            return write_iceberg(
                df, iceberg_path,
                mode="overwrite" if exists else "error",
                partition_by=pkeys,
            )
        except NotImplementedError:
            if not pkeys:
                raise
            return write_iceberg(
                df, iceberg_path, mode="overwrite" if exists else "error"
            )

    if not exists:
        sid = _publish_full(catalog.read_table(spec))
        _write_mirror_state(iceberg_path, head)
        return sid
    ups, dels, head = _mirror_delta_rows(catalog, spec, iceberg_path)
    if ups is None:
        return _iceberg_current_metadata(iceberg_path).get("current-snapshot-id")
    if isinstance(dels, str):  # full republish fallback
        if telemetry is not None:
            telemetry["iceberg_mirror_fallback"] = dels
        sid = _publish_full(ups)
    else:
        sid = _iceberg_current_metadata(iceberg_path).get("current-snapshot-id")
        if ups.limit(1).count():
            sid = merge_iceberg(
                ups, iceberg_path, key=spec.primary_key, mode="upsert"
            )
        if dels.limit(1).count():
            sid = merge_iceberg(
                dels, iceberg_path, key=spec.primary_key, mode="delete"
            )
    _write_mirror_state(iceberg_path, head)
    return sid


_MIRROR_STATE = "_mirror_state.json"


def _read_mirror_state(mirror_path: str) -> int | None:
    try:
        with open(os.path.join(mirror_path, _MIRROR_STATE), encoding="utf-8") as f:
            import json

            return int(json.load(f).get("source_version"))
    except (OSError, ValueError, TypeError):
        return None


def _write_mirror_state(mirror_path: str, version: int | None) -> None:
    if version is None:
        return
    import json

    with open(os.path.join(mirror_path, _MIRROR_STATE), "w", encoding="utf-8") as f:
        json.dump({"source_version": int(version)}, f)


def _mirror_delta_rows(catalog: Catalog, spec: TableSpec, mirror_path: str):
    """(upserts, delete-keys, source head version) for an incremental
    mirror publish, from the engine's own snapshot diff (X36) between
    the last-mirrored version and head — or (None, None, head) when
    nothing changed, or (full snapshot, 'diff', head) when the diff
    window is gone (vacuumed / no recorded state). MoR tables lack a
    public head accessor and always take the full path."""
    from .formats.changes import CHANGE_TYPE_COL, snapshot_changes

    tbl = catalog.table(spec)
    cur = (
        tbl.current_version()
        if hasattr(tbl, "current_version") and tbl.exists()
        else None
    )
    head = cur.version if cur is not None else None
    prev = _read_mirror_state(mirror_path)
    if head is not None and prev == head:
        return None, None, head  # mirror already current: no writes
    if head is not None and prev is not None:
        try:
            ch = snapshot_changes(tbl, prev, head)
            ups = ch.filter(
                F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage")
            ).drop(CHANGE_TYPE_COL)
            dels = ch.filter(F.col(CHANGE_TYPE_COL) == "delete").select(
                spec.primary_key
            )
            return ups, dels, head
        except (FileNotFoundError, KeyError) as exc:
            # Only the vacuumed-window failures (version-resolution
            # errors from read(version=prev)) may fall back to a full
            # republish; anything else (wrong primary_key, schema
            # drift) must SURFACE, not masquerade as an O(table)
            # rewrite every maintenance cycle (round-9 advice #3). The
            # reason rides in the sentinel for the caller's telemetry.
            return catalog.read_table(spec), f"full:{type(exc).__name__}", head
    return catalog.read_table(spec), "full:first_diffable_publish", head


def mirror_to_hudi(
    catalog: Catalog,
    spec: TableSpec,
    hudi_path: str,
    telemetry: dict | None = None,
) -> str:
    """The Hudi twin: a genuinely INCREMENTAL mirror — first publish
    bulk-inserts; later publishes diff the source's snapshots (X36)
    between the last-mirrored version (recorded in
    ``_mirror_state.json`` beside the mirror) and head, and upsert /
    delete ONLY the changed keys — so only the file groups those keys
    live in rewrite (Hudi's CoW economics). An unchanged source is a
    no-op; a vacuumed diff window falls back to full
    upsert + departed-key delete. Keys come from the spec's
    ``primary_key``. Returns the commit instant ('noop' when
    current)."""
    from .formats.interop import _HOODIE_DIR, read_hudi, write_hudi

    key = spec.primary_key
    pkeys = list(spec.partition_keys or [])
    tbl = catalog.table(spec)
    head = (
        tbl.current_version().version
        if hasattr(tbl, "current_version") and tbl.exists()
        else None
    )
    if not os.path.isdir(os.path.join(hudi_path, _HOODIE_DIR)):
        instant = write_hudi(
            catalog.read_table(spec), hudi_path, record_key=key,
            mode="bulk_insert", partition_by=pkeys,
        )
        _write_mirror_state(hudi_path, head)
        return instant
    ups, dels, head = _mirror_delta_rows(catalog, spec, hudi_path)
    if ups is None:
        return "noop"
    spark = catalog.spark
    if isinstance(dels, str):  # full republish fallback
        if telemetry is not None:
            telemetry["hudi_mirror_fallback"] = dels
        df = ups
        instant = write_hudi(
            df, hudi_path, record_key=key, mode="upsert", partition_by=pkeys
        )
        gone = read_hudi(spark, hudi_path).join(df.select(key), key, "left_anti")
        if gone.limit(1).count():
            instant = write_hudi(
                gone, hudi_path, record_key=key, mode="delete",
                partition_by=pkeys,
            )
    else:
        instant = "noop"
        if ups.limit(1).count():
            instant = write_hudi(
                ups, hudi_path, record_key=key, mode="upsert",
                partition_by=pkeys,
            )
        if dels.limit(1).count():
            # write_hudi delete needs the business columns' shape only
            # for partition derivation; survivors supply them — pass
            # key-only rows padded via a join against the mirror. No
            # broadcast hint: a CDC-sized delete set broadcasts under
            # AQE anyway, and a backfill-sized one must not be forced
            # (same class as the interop writers' size gate).
            mirror_rows = read_hudi(spark, hudi_path).join(
                dels, key, "left_semi"
            )
            if mirror_rows.limit(1).count():
                instant = write_hudi(
                    mirror_rows, hudi_path, record_key=key, mode="delete",
                    partition_by=pkeys,
                )
    _write_mirror_state(hudi_path, head)
    return instant


def maintain_all(
    catalog: Catalog,
    specs: list[TableSpec],
    compact: bool = True,
    vacuum_retain_last: int | None = 2,
    target_file_mb: float = 128,
    ann_indexes: list | None = None,
    dedup_indexes: list | None = None,
    delta_mirrors: dict[str, str] | None = None,
    iceberg_mirrors: dict[str, str] | None = None,
    hudi_mirrors: dict[str, str] | None = None,
    mirror_retention: int | None = None,
    mirror_compact: bool = True,
) -> list[LoadReport]:
    """Scheduled maintenance over the table registry (the reference's
    missing story, SURVEY §4 / BASELINE north star): per table, compact
    small files / fold MoR deltas, then vacuum snapshots older than the
    retention window. Run after the CDC loop on whatever cadence the
    deployment's time-travel contract allows.

    ``ann_indexes`` (``operators.ann_index.ManagedAnnIndex``) refresh
    FIRST, before any compaction or vacuum: the incremental refresh
    diffs against the source snapshot it last indexed, and (a) vacuum
    could drop that snapshot (forcing the full re-encode fallback),
    (b) compaction creates a rewrite-only version whose change feed is
    empty — diffing before it avoids paying those joins for nothing.

    ``delta_mirrors`` maps table names to Delta paths: those tables'
    committed snapshots republish as real Delta tables after
    compaction (``mirror_to_delta``) — the external-consumer story.

    ``mirror_retention`` (versions/snapshots/slices to keep) runs the
    real-format storage lifecycle after each publish — Delta VACUUM,
    Iceberg expire_snapshots, the Hudi cleaner — so a mirror published
    every cycle for months does not hold every historical byte (the
    job the reference delegates to the format jars' inline cleaners).

    ``mirror_compact`` pays down MERGE-ON-READ debt after each publish
    and before retention: the incremental mirrors' keyed MERGEs write
    deletion vectors / position deletes under ``strategy='auto'``
    (O(changes) per cycle — the right write shape), and this folds the
    accumulated debt back into clean files (``compact_delta`` /
    ``compact_iceberg`` / ``compact_hudi``, each a no-op when the
    mirror carries none)."""
    reports = []
    for idx in ann_indexes or []:
        reports.append(
            LoadReport(
                idx.index_spec.table_name,
                "ann_refreshed",
                telemetry={
                    k: v
                    for k, v in idx.refresh().items()
                    if isinstance(v, (int, float))
                },
            )
        )
    # Dedup indexes refresh on the same pre-compaction schedule and for
    # the same reasons as the ANN indexes (see the docstring above).
    for idx in dedup_indexes or []:
        reports.append(
            LoadReport(
                idx.index_spec.table_name,
                "dedup_refreshed",
                telemetry={
                    k: v
                    for k, v in idx.refresh().items()
                    if isinstance(v, (int, float))
                },
            )
        )
    for spec in specs:
        tbl = catalog.table(spec)
        if not tbl.exists():
            reports.append(LoadReport(spec.table_name, "skipped_missing"))
            continue
        if compact:
            from .formats.parquet_cow import ParquetCowTable

            if isinstance(tbl, ParquetCowTable):
                tbl.compact(
                    target_file_mb=target_file_mb,
                    zorder=list(spec.zorder_by) if spec.zorder_by else None,
                )
                # Compaction replaced every data file: refresh the
                # symlink manifest external engines read (W10).
                tbl.generate_manifest()
            else:
                tbl.compact()
        removed = tbl.vacuum(vacuum_retain_last) if vacuum_retain_last else []
        telemetry = {"removed_dirs": len(removed)}
        mirror = (delta_mirrors or {}).get(spec.table_name)
        if mirror:
            telemetry["delta_mirror_version"] = mirror_to_delta(
                catalog, spec, mirror, telemetry=telemetry
            )
            if mirror_compact:
                from .formats.interop import compact_delta

                telemetry["delta_mirror_compacted"] = int(
                    compact_delta(catalog.spark, mirror) is not None
                )
            if mirror_retention:
                from .formats.interop import vacuum_delta

                # grace_seconds=0 is safe HERE: the pipeline is the
                # mirror's only writer and runs this synchronously
                # between its own commits — no staging race exists.
                telemetry["delta_mirror_vacuumed"] = vacuum_delta(
                    mirror, retain_versions=mirror_retention,
                    grace_seconds=0,
                )["deleted_files"]
        imirror = (iceberg_mirrors or {}).get(spec.table_name)
        if imirror:
            telemetry["iceberg_mirror_snapshot"] = mirror_to_iceberg(
                catalog, spec, imirror, telemetry=telemetry
            )
            if mirror_compact:
                from .formats.interop import compact_iceberg

                telemetry["iceberg_mirror_compacted"] = int(
                    compact_iceberg(catalog.spark, imirror) is not None
                )
            if mirror_retention:
                from .formats.interop import expire_iceberg_snapshots

                telemetry["iceberg_mirror_expired"] = expire_iceberg_snapshots(
                    imirror, keep_last=mirror_retention
                )["expired"]
        hmirror = (hudi_mirrors or {}).get(spec.table_name)
        if hmirror:
            telemetry["hudi_mirror_instant"] = mirror_to_hudi(
                catalog, spec, hmirror, telemetry=telemetry
            )
            if mirror_compact:
                from .formats.interop import compact_hudi

                telemetry["hudi_mirror_compacted"] = int(
                    compact_hudi(catalog.spark, hmirror) is not None
                )
            if mirror_retention:
                from .formats.interop import clean_hudi

                telemetry["hudi_mirror_cleaned"] = clean_hudi(
                    hmirror, keep_last_slices=mirror_retention
                )["deleted_files"]
        reports.append(
            LoadReport(spec.table_name, "maintained", telemetry=telemetry)
        )
    return reports
