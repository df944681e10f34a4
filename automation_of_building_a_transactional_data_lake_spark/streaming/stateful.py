"""Custom stateful streaming operator: sessionization with explicit
per-key state via ``applyInPandasWithState``.

``F.session_window`` (streaming/windows.py) covers the built-in case;
this module is the template for session semantics the built-in can't
express (e.g. emit-on-close with custom payload, caps on session
length, per-key parameters). State is one open session per key; rows
arrive as Arrow batches and are processed vectorized with pandas —
the per-row work is numpy, not Python-per-record.

Emission contract (append mode):
- sessions CLOSED by a later event inside the arriving data emit
  immediately;
- the trailing open session stays in state until the event-time
  watermark passes ``last_ts + gap`` (EventTimeTimeout), then emits
  on timeout. A finite watermark is therefore REQUIRED upstream.

Scale: state is O(keys) (one open session each), bounded by the
timeout; the shuffle is the same single hash partition on the key as
the batch sessionizer. Arrow transfer cost is per-batch, not per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_US = 1_000_000


def _make_sessionizer(gap_seconds: int, key_col: str, time_col: str, value_col: str):
    gap_us = gap_seconds * _US

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        out_rows: list[tuple] = []  # (uid, start_us, end_us, n, total)
        (uid,) = key

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            out_rows.append((uid, start_us, last_us, n, total))
            state.remove()
        else:
            parts = [pdf[[time_col, value_col]] for pdf in pdf_iter]
            df = pd.concat(parts).sort_values(time_col)
            ts_us = df[time_col].astype("int64").to_numpy() // 1_000  # ns -> µs
            vals = df[value_col].to_numpy(dtype="float64")

            # Segment the arriving rows at > gap boundaries (vectorized).
            bounds = np.flatnonzero(np.diff(ts_us) > gap_us) + 1
            segments = np.split(np.arange(len(ts_us)), bounds)
            seg_stats = [
                (
                    int(ts_us[s[0]]),
                    int(ts_us[s[-1]]),
                    int(len(s)),
                    float(vals[s].sum()),
                )
                for s in segments
            ]

            # Fold the open session from state into the first segment if
            # the gap bridges; otherwise the stored session is closed.
            if state.exists:
                start_us, last_us, n, total = state.get
                first = seg_stats[0]
                if first[0] - last_us <= gap_us:
                    seg_stats[0] = (
                        start_us,
                        first[1],
                        n + first[2],
                        total + first[3],
                    )
                else:
                    out_rows.append((uid, start_us, last_us, n, total))

            # Every segment except the last is closed by a later event;
            # the last stays open in state until more data or timeout.
            for seg in seg_stats[:-1]:
                out_rows.append((uid, *seg))
            open_seg = seg_stats[-1]
            state.update(open_seg)
            # setTimeoutTimestamp takes event-time MILLISECONDS.
            state.setTimeoutTimestamp(open_seg[1] // 1_000 + gap_seconds * 1_000)

        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out_rows],
                    "session_start": pd.to_datetime([r[1] for r in out_rows], unit="us"),
                    "session_end": pd.to_datetime([r[2] for r in out_rows], unit="us"),
                    "n_events": [r[3] for r in out_rows],
                    "total_value": [round(r[4], 2) for r in out_rows],
                }
            )

    return fn


def stateful_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionizer with explicit state. Requires a streaming
    input; attaches the watermark itself."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if not stream.isStreaming:
        raise ValueError("stateful_sessionize requires a streaming DataFrame")
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _make_sessionizer(gap_seconds, key_col, time_col, value_col),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
