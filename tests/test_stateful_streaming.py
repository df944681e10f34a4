"""applyInPandasWithState sessionizer: in-batch closed sessions emit
immediately; open sessions emit via event-time timeout when the
watermark passes; results match the batch sessionizer."""

from datetime import datetime

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from automation_of_building_a_transactional_data_lake_spark.streaming.stateful import (
    stateful_sessionize,
)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

T = datetime


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def _stream(spark, path):
    return spark.readStream.schema(SCHEMA).parquet(path)


def _drain(stream_df, ckpt):
    """AvailableNow drain through foreachBatch (the memory sink cannot
    recover a checkpoint in append mode; foreachBatch can)."""
    rows = []
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, _bid: rows.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_stateful_sessions_emit_on_close_and_timeout(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    # user 1: one open session; user 2: a session closed IN-batch by a
    # much later event (gap 2.5h > 30min).
    _write(
        spark,
        src,
        [
            (1, T(2024, 1, 1, 10, 0), 1.0),
            (1, T(2024, 1, 1, 10, 10), 2.0),
            (1, T(2024, 1, 1, 10, 20), 3.0),
            (2, T(2024, 1, 1, 9, 0), 5.0),
            (2, T(2024, 1, 1, 11, 30), 7.0),
        ],
    )
    out1 = _drain(stateful_sessionize(_stream(spark, src), gap_seconds=1800, watermark="1 hour"), ckpt)
    got1 = {(r.user_id, r.session_start, r.n_events, r.total_value) for r in out1}
    # Only user 2's first session is closed by arriving data.
    assert got1 == {(2, T(2024, 1, 1, 9, 0), 1, 5.0)}

    # A far-future event advances the watermark past both open
    # sessions' timeouts -> they emit on the next drain.
    _write(spark, src, [(3, T(2024, 1, 1, 14, 0), 0.5)])
    out2 = _drain(stateful_sessionize(_stream(spark, src), gap_seconds=1800, watermark="1 hour"), ckpt)
    got2 = {(r.user_id, r.session_start, r.session_end, r.n_events, r.total_value) for r in out2}
    assert (1, T(2024, 1, 1, 10, 0), T(2024, 1, 1, 10, 20), 3, 6.0) in got2
    assert (2, T(2024, 1, 1, 11, 30), T(2024, 1, 1, 11, 30), 1, 7.0) in got2


def test_stateful_rejects_batch_input(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="streaming"):
        stateful_sessionize(df)


def test_state_bridges_across_batches(spark, tmp_path):
    """Events continuing within the gap across two drains must fold
    into ONE session (state carry), verified at final timeout."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, src, [(7, T(2024, 1, 1, 10, 0), 1.0)])
    _drain(stateful_sessionize(_stream(spark, src), gap_seconds=1800, watermark="1 hour"), ckpt)
    # +20 min: same session continues in a new drain.
    _write(spark, src, [(7, T(2024, 1, 1, 10, 20), 2.0)])
    _drain(stateful_sessionize(_stream(spark, src), gap_seconds=1800, watermark="1 hour"), ckpt)
    # Far-future event triggers the timeout.
    _write(spark, src, [(8, T(2024, 1, 2, 0, 0), 0.0)])
    out = _drain(stateful_sessionize(_stream(spark, src), gap_seconds=1800, watermark="1 hour"), ckpt)
    sessions7 = [r for r in out if r.user_id == 7]
    assert len(sessions7) == 1
    r = sessions7[0]
    assert (r.session_start, r.session_end, r.n_events, r.total_value) == (
        T(2024, 1, 1, 10, 0),
        T(2024, 1, 1, 10, 20),
        2,
        3.0,
    )
