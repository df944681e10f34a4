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

Exactly-once: the checkpoint commits a batch's file list only after
``foreachBatch`` returns, and the merge itself is idempotent per key,
so a crash between merge and checkpoint-commit replays harmlessly —
the same at-least-once + idempotent-apply contract as the batch ledger.

Scale: the file-source listing cost and per-batch work are identical to
the batch path; ``maxFilesPerTrigger`` (via ``options``) bounds
micro-batch size so a backlogged table drains in memory-safe chunks
instead of one giant batch — something the reference's bookmark job
cannot do.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..pipeline import CDC_ZONE, apply_cdc_batch
from ..spec import TableSpec


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
) -> list[dict]:
    """Drain all pending CDC files for one table and stop. Returns the
    per-micro-batch telemetry dicts (empty list when nothing pending)."""
    raw_dir = f"{raw_root}/{CDC_ZONE}/{spec.database}/{spec.table_name}"
    tbl = catalog.table(spec)
    if not tbl.exists():
        raise FileNotFoundError(
            f"table {spec.qualified_name} missing — run initial_load first"
        )

    # Streaming file sources need a declared schema; infer once from the
    # raw zone with a batch read (footer-only, no data scan).
    schema = spark.read.parquet(raw_dir).schema

    reader = spark.readStream.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(raw_dir)

    telemetries: list[dict] = []

    def _apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        telemetries.append(apply_cdc_batch(batch_df, tbl, spec, clock))

    query = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return telemetries
