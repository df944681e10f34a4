"""Streaming joins: stream-static enrichment and stream-stream
time-interval joins.

The reference's only join surfaces are the batch MERGE equi-join and
the downstream 3-way analytic join (SURVEY §2.7); its CDC "stream" is
scheduled micro-batch. A user moving that pipeline onto real streams
immediately needs the two join shapes Structured Streaming offers:

- **Stream-static**: enrich a fact/CDC stream with a dimension table
  (the streaming counterpart of the reference's
  ``sample_redshift_ml_sql_query.txt:54-73`` user_id joins). The
  static side is re-read per micro-batch (picking up dimension
  updates between batches) and — for the dimension sizes the
  reference's catalog holds — broadcast, so the stream side never
  shuffles.
- **Stream-stream**: correlate two event streams within a time bound
  (the streaming twin of the batch bounded range join,
  ``operators/temporal.bounded_range_join``). Both sides carry watermarks
  and the join condition carries the time interval, so each side's
  buffered state is evicted once the other side's watermark passes
  the bound — state is O(events inside the gap window), not O(stream).

Parity contract (tests/test_streaming_enrich.py): draining the same
rows through the stream path with ``Trigger.AvailableNow`` reproduces
the batch join exactly — enrichment equals a batch equi-join;
the interval join equals ``operators/temporal.bounded_range_join``.

Scale: stream-static broadcasts the dim per micro-batch (no stream
shuffle, dim refresh for free); if the dim outgrows broadcast, drop
``broadcast_dim`` and Spark shuffles both sides on the key like any
equi-join. Stream-stream shuffles both streams on the equi-key once;
watermark-bounded state is the difference between this and the batch
bucketed join, which instead explodes each row into gap-width buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.dates import col_is_ntz, epoch_micros


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join: attach dimension attributes to a streaming
    fact table. ``how`` may be ``inner`` or any left-sided join (the
    static side cannot drive rows in a stream-static join); ``left``
    keeps facts whose dimension row is missing — the lossless default
    for an enrichment."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"stream-static join must be stream-sided, got how={how!r}"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    max_gap_seconds: float,
    watermark: str = "1 hour",
    direction: str = "both",
) -> DataFrame:
    """Stream-stream inner join of two event streams on a key, keeping
    pairs whose event times lie within ``max_gap_seconds``
    (``direction``: ``both`` |r-l| <= gap, ``forward`` 0 < r-l <= gap,
    ``backward`` 0 < l-r <= gap) — same semantics as the batch
    ``operators/temporal.bounded_range_join``.

    Both inputs must be streaming DataFrames; each gets the watermark,
    and the interval lands in the join condition so Spark can evict
    buffered rows once the opposite watermark passes the bound. Column
    names must be pre-aliased disjoint (as in the batch twin) except
    the key ``on`` and the two time columns.
    """
    if direction not in ("both", "forward", "backward"):
        raise ValueError(f"direction must be both|forward|backward, got {direction!r}")
    gap_us = int(round(float(max_gap_seconds) * 1_000_000))
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    dt: Column = epoch_micros(right_time, col_is_ntz(right, right_time)) - epoch_micros(
        left_time, col_is_ntz(left, left_time)
    )
    if direction == "both":
        bound = F.abs(dt) <= gap_us
    elif direction == "forward":
        bound = (dt > 0) & (dt <= gap_us)
    else:
        bound = (dt < 0) & (-dt <= gap_us)
    return lw.join(rw, (lw[on] == rw[on]) & bound, "inner").drop(rw[on])
