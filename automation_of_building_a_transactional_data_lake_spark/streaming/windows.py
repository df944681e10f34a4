"""Event-time windowed aggregation over streams: tumbling/sliding
windows and session windows, with watermarks for late data.

The reference has no streaming operators at all (SURVEY §2.10); these
are the Structured Streaming counterparts of the batch rollup
(``events_hourly_rollup``) and batch sessionization
(``operators/sessionize``). Semantics contract, tested in
tests/test_streaming_windows.py: draining a static dataset through
the stream with ``Trigger.AvailableNow`` produces exactly the batch
result — the watermark only drops rows that arrive later than the
threshold, and in a drain-everything run nothing is late.

Scale: state per window-pane lives in the state store keyed by
(group, window); the watermark bounds state size — without it an
event-time agg on an unbounded stream grows state forever. Panes
shuffle on the group key exactly once, same as the batch agg.

Caveat: the streaming file source has no hook for the
``nanosAsLong`` legacy conf that ``plans.testdata_queries.load``
uses, so streams over parquet with INT64 TIMESTAMP(NANOS) columns
must originate from µs-normalized files (rewrite once with
``load(...).write.parquet(...)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    time_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (group, event-time window) count + value sum. Works on a
    streaming OR batch DataFrame (watermark is a no-op in batch), so
    the parity test runs the same function on both."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    win: Column = (
        F.window(F.col(time_col), window, slide)
        if slide
        else F.window(F.col(time_col), window)
    )
    return df.groupBy(win.alias("win"), F.col(group_col)).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        group_col,
        "n_events",
        "total_value",
    )


def session_window_stats(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows (``F.session_window`` — dynamic-length
    panes closed by the inactivity gap). The streaming twin of
    ``operators/sessionize.with_session_id``; batch parity between the
    two formulations is asserted in tests."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return df.groupBy(
        F.session_window(F.col(time_col), gap).alias("sw"), F.col(key_col)
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("sw.start").alias("session_start"),
        key_col,
        "n_events",
        "total_value",
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of the batch
    content-hash dedup (X3): keep the first row per key, with state
    BOUNDED by the watermark horizon (``dropDuplicatesWithinWatermark``
    evicts keys older than the watermark; plain ``dropDuplicates`` on a
    stream keeps every key forever — the unbounded-state trap). A
    duplicate arriving later than the watermark re-emits: at-least-once
    dedup, which the idempotent MERGE sink downstream absorbs."""
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain an aggregated stream with AvailableNow into an in-memory
    sink and return the result as a batch DataFrame. ``complete`` for
    windowed aggs (re-emits finalized panes); ``append`` for stateful
    operators that emit rows exactly once (note: the memory sink in
    append mode only holds rows from THIS drain, not prior runs)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
