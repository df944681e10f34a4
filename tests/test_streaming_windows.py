"""Streaming windowed aggs: a full AvailableNow drain must equal the
batch computation on the same data (watermark drops nothing when all
data is present), and the session_window formulation must agree with
the batch lag+cumsum sessionizer."""

import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.operators.sessionize import (
    session_stats,
)
from automation_of_building_a_transactional_data_lake_spark.streaming.windows import (
    run_stream_to_memory,
    session_window_stats,
    windowed_event_counts,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def event_stream(spark, tmp_path):
    """Real driver events staged to µs parquet through the production
    bridge (the streaming file source can't read TIMESTAMP(NANOS)) + a
    readStream over the staged copy."""
    from automation_of_building_a_transactional_data_lake_spark.streaming.microbatch import (
        stage_micros_parquet,
    )

    src = stage_micros_parquet(
        spark, f"{SF_SMOKE}/events.parquet", str(tmp_path / "stream_src")
    )
    clean = spark.read.parquet(src)
    stream = spark.readStream.schema(clean.schema).parquet(src)
    return clean, stream


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_stream_tumbling_agg_equals_batch(spark, event_stream, tmp_path):
    batch, stream = event_stream
    got = run_stream_to_memory(
        windowed_event_counts(stream),
        "win_counts",
        str(tmp_path / "ckpt_win"),
    )
    want = windowed_event_counts(batch)
    cols = ["win_start", "win_end", "event_type", "n_events", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    assert len(_sorted_rows(got, cols)) > 0


def test_stream_session_window_equals_batch_sessionizer(spark, event_stream, tmp_path):
    batch, stream = event_stream
    got = run_stream_to_memory(
        session_window_stats(stream, gap="30 minutes"),
        "sess_stats",
        str(tmp_path / "ckpt_sess"),
    )
    # Native session_window vs the lag+cumsum batch formulation: same
    # (user, n_events, total_value) multiset and same session count.
    want = session_stats(batch, gap_seconds=1800)
    cols = ["user_id", "n_events", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_streaming_dedup_equals_batch_distinct(spark, event_stream, tmp_path):
    """Duplicated source files streamed through watermark-bounded
    dedup yield exactly one row per event_id — same as batch
    dropDuplicates over the doubled data."""
    import shutil

    from automation_of_building_a_transactional_data_lake_spark.streaming.windows import (
        streaming_dedup,
    )

    clean, _ = event_stream
    src2 = str(tmp_path / "dup_src")
    clean.write.parquet(src2)
    # Double every row by copying each data file under a new name.
    import os as _os

    for f in list(_os.listdir(src2)):
        if f.endswith(".parquet"):
            shutil.copy(_os.path.join(src2, f), _os.path.join(src2, "dup_" + f))
    doubled = spark.read.parquet(src2)
    assert doubled.count() == 2 * clean.count()

    stream = spark.readStream.schema(doubled.schema).parquet(src2)
    got = run_stream_to_memory(
        streaming_dedup(stream, ["event_id"], watermark="10 minutes"),
        "dedup_stream",
        str(tmp_path / "ckpt_dedup"),
        output_mode="append",
    )
    assert got.count() == clean.count()
    assert got.select("event_id").distinct().count() == clean.count()


def test_late_rows_dropped_by_watermark(spark, tmp_path):
    """With a finite watermark and a second micro-batch arriving far
    behind the first batch's max event time, the late rows are
    excluded from update-mode emission. (AvailableNow + memory sink in
    complete mode re-emits everything, so this asserts the watermark
    column threading works rather than end-to-end drop — the drop
    semantics are Spark-internal.)"""
    from pyspark.sql.types import DoubleType, StructField, StructType, TimestampType

    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("event_type", __import__("pyspark").sql.types.StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src = str(tmp_path / "late_src")
    spark.createDataFrame(
        [("2024-01-01 10:00:00", "click", 1.0)], ["s", "event_type", "value"]
    ).withColumn("ts", F.col("s").cast("timestamp")).select(
        "ts", "event_type", "value"
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_event_counts(stream, watermark="10 minutes")
    assert agg.isStreaming
    # The watermark is attached to the pre-agg plan node.
    assert "watermark" in agg._jdf.queryExecution().analyzed().toString().lower()
