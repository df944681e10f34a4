"""Streaming joins: a full AvailableNow drain must reproduce the batch
join — stream-static enrichment equals the batch equi-join, and the
stream-stream interval join equals the batch bucketed interval join on
the same rows."""

import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.operators.temporal import (
    bounded_range_join,
)
from automation_of_building_a_transactional_data_lake_spark.streaming.enrich import (
    enrich_stream,
    stream_interval_join,
)
from automation_of_building_a_transactional_data_lake_spark.streaming.windows import (
    run_stream_to_memory,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def event_stream(spark, tmp_path):
    from automation_of_building_a_transactional_data_lake_spark.streaming.microbatch import (
        stage_micros_parquet,
    )

    src = stage_micros_parquet(
        spark, f"{SF_SMOKE}/events.parquet", str(tmp_path / "stream_src")
    )
    clean = spark.read.parquet(src)
    stream = spark.readStream.schema(clean.schema).parquet(src)
    return clean, stream


def _rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_stream_static_enrich_equals_batch_join(spark, event_stream, tmp_path):
    """Enriching the event stream with a per-user dimension (built as a
    batch aggregate) drains to exactly the batch left join; rows whose
    user is missing from the dim survive with nulls."""
    clean, stream = event_stream
    dim = (
        clean.groupBy("user_id")
        .agg(F.count("*").alias("n_total"))
        .filter(F.col("user_id") % 3 != 0)  # ~1/3 of users missing from dim
    )
    got = run_stream_to_memory(
        enrich_stream(stream, dim, "user_id"),
        "enriched",
        str(tmp_path / "ckpt_enrich"),
        output_mode="append",
    )
    want = clean.join(F.broadcast(dim), "user_id", "left")
    cols = ["event_id", "user_id", "n_total"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.filter(F.col("n_total").isNull()).count() > 0  # left-ness is real


def test_stream_static_rejects_static_sided_join(spark, event_stream):
    clean, stream = event_stream
    dim = clean.select("user_id").distinct()
    with pytest.raises(ValueError, match="stream-sided"):
        enrich_stream(stream, dim, "user_id", how="right")


def test_stream_interval_join_equals_batch(spark, event_stream, tmp_path):
    """click->purchase attribution within 30 minutes, as two streams
    over the same staged source: the drained stream-stream interval
    join must equal the batch bucketed interval_join (which is itself
    gated against brute force)."""
    clean, stream = event_stream

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id"),
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        return clicks, purchases

    s_clicks, s_purch = split(stream)
    got = run_stream_to_memory(
        stream_interval_join(
            s_clicks, s_purch, "user_id", "c_ts", "p_ts", 1800, direction="forward"
        ),
        "attributed",
        str(tmp_path / "ckpt_ssj"),
        output_mode="append",
    )
    b_clicks, b_purch = split(clean)
    want = bounded_range_join(
        b_clicks, b_purch, "user_id", "c_ts", "p_ts", 1800, direction="forward"
    )
    cols = ["user_id", "c_id", "p_id"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0  # the fixture really attributes something


def test_streaming_decontamination_matches_batch(spark, tmp_path):
    """Curation ops compose with Structured Streaming: a document
    STREAM decontaminated against a STATIC eval set (stream-side gram
    explode -> stream-static broadcast join -> per-batch distinct ids)
    must flag exactly the ids the batch operator flags."""
    from automation_of_building_a_transactional_data_lake_spark.operators.decontam import (
        contaminated_ids,
    )
    from automation_of_building_a_transactional_data_lake_spark.operators.dedup import (
        shingles_col,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    want = {r.doc_id for r in contaminated_ids(corpus, ev, n=3).collect()}
    assert want  # the fixture genuinely contains contamination

    src = str(tmp_path / "stream_docs")
    corpus.write.parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    ev_grams = ev.select(F.explode(shingles_col(F.col("text"), 3)).alias("__g")).distinct()
    flagged_stream = (
        stream.select(F.col("doc_id"), F.explode(shingles_col(F.col("text"), 3)).alias("__g"))
        .join(F.broadcast(ev_grams), "__g", "left_semi")
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )
    got_df = run_stream_to_memory(
        flagged_stream, "contam_stream", str(tmp_path / "ckpt"), output_mode="append"
    )
    got = {r.doc_id for r in got_df.collect()}
    assert got == want
