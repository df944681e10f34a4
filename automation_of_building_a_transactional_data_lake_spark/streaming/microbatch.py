"""Streaming CDC ingestion: Structured Streaming file source +
``Trigger.AvailableNow`` + ``foreachBatch``.

The reference achieves incrementality with Glue job bookmarks plus an
hourly cron trigger (SURVEY §2.10 — no true streaming operators exist
there). Spark's native equivalent of "process the files that arrived
since last run, then stop" is exactly this module: the file source
tracks seen files in the checkpoint (replacing both the bookmark and
our explicit ``FileLedger``), ``AvailableNow`` drains everything
pending in bounded micro-batches and terminates, and ``foreachBatch``
applies the same CDC core (`pipeline.apply_cdc_batch`) the batch loop
uses — dedup, route, MERGE upsert, MERGE delete.

Exactly-once, two layers deep: (1) a transactional replay guard
(``apply_cdc_batch_txn`` — the Delta txnAppId/txnVersion pattern)
records the batch id in the table's atomic snapshot metadata, so a
batch re-delivered after a crash between sink-commit and
checkpoint-commit is SKIPPED, not re-merged; (2) even without the
marker (a fresh consumer), the merge itself is idempotent per key, so
re-application converges to the same state.

Scale: the file-source listing cost and per-batch work are identical to
the batch path; ``maxFilesPerTrigger`` (via ``options``) bounds
micro-batch size so a backlogged table drains in memory-safe chunks
instead of one giant batch — something the reference's bookmark job
cannot do.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..pipeline import CDC_ZONE, apply_cdc_batch
from ..spec import TableSpec


def apply_cdc_batch_txn(
    batch_df,
    batch_id: int,
    tbl,
    spec: TableSpec,
    clock: datetime | None = None,
    txn_app: str = "stream",
) -> dict | None:
    """Exactly-once foreachBatch apply — the Delta ``txnAppId`` /
    ``txnVersion`` pattern on this engine's atomic snapshot metadata.

    Structured Streaming's foreachBatch is at-least-once: after a crash
    between the sink's commit and the checkpoint's, the SAME
    ``batch_id`` is re-delivered. The guard records
    ``(txn_app, txn_version=batch_id)`` in the snapshot metadata of the
    batch's LAST table commit (same atomic rename as the data); a
    re-delivered batch whose id is already committed for this app is
    skipped entirely — no duplicate versions, no redundant merge work.
    ``txn_app`` scopes the marker to one consumer (use the checkpoint
    path). Markers live in a per-app map ``{"txns": {app_id: version}}``
    — Delta's per-appId txn table — so two consumers with different
    checkpoints interleaving into one table each keep their own replay
    protection instead of clobbering a single slot (r3 advisory).
    Returns the batch telemetry, or None when skipped as a replay."""
    meta = (tbl.snapshot_meta() or {}) if tbl.exists() else {}
    txns = dict(meta.get("txns") or {})
    # Migrate the pre-r4 single-slot marker into the map once.
    if "txn_app" in meta:
        txns.setdefault(meta["txn_app"], meta.get("txn_version", -1))
    if txns.get(txn_app, -1) >= batch_id:
        return None
    new_meta = {k: v for k, v in meta.items() if k not in ("txn_app", "txn_version")}
    new_meta["txns"] = {**txns, txn_app: batch_id}
    return apply_cdc_batch(batch_df, tbl, spec, clock, snapshot_meta=new_meta)


def stage_micros_parquet(
    spark: SparkSession,
    src_path: str,
    out_dir: str,
    ns_ts_cols: tuple[str, ...] = ("ts",),
) -> str:
    """Normalize INT64 TIMESTAMP(NANOS) parquet (the driver's ``events``
    table) into standard microsecond parquet a STREAMING file source can
    consume.

    Spark 4 rejects nanosecond parquet outright unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set — a BATCH-only knob
    with no ``readStream`` hook, so the streaming CDC twin cannot read
    such files directly. This bridge batch-reads with the knob, rebuilds
    µs timestamps in long arithmetic (``div 1000`` — exact; a double
    division would lose precision above 2^53 ns), and rewrites. At scale
    it is a one-off normalization pass over the raw zone (or the
    producer writes µs in the first place); from then on every stream
    reads the staged copy. Returns ``out_dir``.
    """
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(src_path)
        dtypes = dict(df.dtypes)
        for c in ns_ts_cols:
            if dtypes.get(c) == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
            elif dtypes.get(c) == "timestamp_ntz":
                # Watermarks require TIMESTAMP (LTZ): EVENT_TIME_IS_NOT_ON
                # _TIMESTAMP_TYPE on NTZ. The cast interprets wall-clock in
                # the session time zone — the engine pins UTC, so it is
                # lossless.
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        df.write.mode("overwrite").parquet(out_dir)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return out_dir


def cdc_stream_available_now(
    spark: SparkSession,
    catalog: Catalog,
    spec: TableSpec,
    raw_root: str,
    checkpoint_dir: str,
    clock: datetime | None = None,
    options: dict[str, str] | None = None,
    branch: str | None = None,
) -> list[dict]:
    """Drain all pending CDC files for one table and stop. Returns the
    per-micro-batch telemetry dicts (empty list when nothing pending).

    ``branch`` targets a named branch ref instead of main: streaming
    write-audit-publish — micro-batches (and their exactly-once txn
    markers) commit to the branch head, production readers on main see
    nothing until ``publish_branch`` fast-forwards the pointer after
    audit."""
    raw_dir = f"{raw_root}/{CDC_ZONE}/{spec.database}/{spec.table_name}"
    tbl = catalog.table(spec)
    if not tbl.exists():
        raise FileNotFoundError(
            f"table {spec.qualified_name} missing — run initial_load first"
        )
    if branch is not None:
        tbl = tbl.branch(branch)

    # Streaming file sources need a declared schema; infer once from the
    # raw zone with a batch read (footer-only, no data scan).
    schema = spark.read.parquet(raw_dir).schema

    reader = spark.readStream.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(raw_dir)

    telemetries: list[dict] = []

    txn_app = os.path.abspath(checkpoint_dir)

    def _apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        t = apply_cdc_batch_txn(batch_df, batch_id, tbl, spec, clock, txn_app=txn_app)
        if t is not None:
            telemetries.append(t)

    query = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return telemetries
