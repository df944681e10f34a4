"""Incremental rollup maintenance: folding files in batches must equal
the full recompute, re-running with nothing new must be a no-op, and a
crash between table-commit and ledger-commit must converge."""

import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.catalog import Catalog
from automation_of_building_a_transactional_data_lake_spark.operators.ivm import (
    AggCol,
    IncrementalRollup,
)
from automation_of_building_a_transactional_data_lake_spark.plans.testdata_queries import load
from automation_of_building_a_transactional_data_lake_spark.spec import TableSpec

from .conftest import SF_SMOKE

AGGS = [
    AggCol("n_events", "count"),
    AggCol("total_value", "sum", "value"),
    AggCol("max_value", "max", "value"),
    AggCol("first_event", "min", "event_id"),
]


def _prepare(df):
    return df.withColumn("hour", F.date_trunc("hour", "ts"))


def _rollup(spark, tmp_path, raw_dir):
    cat = Catalog(spark, warehouse=str(tmp_path / "wh"))
    spec = TableSpec(table_name="events_hourly", primary_key="hour", database="ivm")
    return IncrementalRollup(
        cat.table(spec), raw_dir, ["hour", "event_type"], AGGS, prepare=_prepare
    )


def _sorted(df):
    """Rows sorted by all columns, with float aggregates rounded:
    incremental combine sums partial sums, so double results differ
    from the single-pass recompute in the last ulp (IEEE summation is
    order-dependent) — identical semantics, not an error."""
    cols = sorted(df.columns)
    rows = [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]
    return [
        tuple(round(v, 6) if isinstance(v, float) else v for v in r) for r in rows
    ]


@pytest.fixture()
def arrivals(spark, tmp_path):
    """Events split into two arrival waves of parquet files."""
    ev = load(spark, SF_SMOKE, "events")
    raw = str(tmp_path / "raw")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(f"{raw}/wave1")
    return ev, raw


def test_incremental_equals_full_recompute(spark, tmp_path, arrivals):
    ev, raw = arrivals
    r = _rollup(spark, tmp_path, raw)

    rep1 = r.refresh(spark)
    assert rep1["new_files"] > 0

    # Wave 2 arrives; refresh folds only the delta.
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(f"{raw}/wave2")
    rep2 = r.refresh(spark)
    assert rep2["new_files"] > 0

    full = (
        _prepare(ev)
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
            F.min("event_id").alias("first_event"),
        )
    )
    assert _sorted(r.table.read()) == _sorted(full)


def test_refresh_without_new_files_is_noop(spark, tmp_path, arrivals):
    _, raw = arrivals
    r = _rollup(spark, tmp_path, raw)
    r.refresh(spark)
    v_before = r.table.current_version().version
    rep = r.refresh(spark)
    assert rep["new_files"] == 0
    assert r.table.current_version().version == v_before  # no empty version


def test_processed_set_commits_atomically_with_version(spark, tmp_path, arrivals):
    """Exactly-once: the processed-file set rides inside the version
    snapshot, so there is NO state window where the table head and the
    ledger disagree (round-2 advisory: the old side-ledger design
    double-counted after a crash between overwrite and ledger-commit).
    A crash before promote leaves neither the version nor the set; a
    rollback to an older version rolls the set back with it."""
    ev, raw = arrivals
    r = _rollup(spark, tmp_path, raw)
    r.refresh(spark)
    v1_processed = r.processed()
    assert v1_processed and all("wave1" in p for p in v1_processed)

    ev.filter(F.col("event_id") % 2 == 1).write.parquet(f"{raw}/wave2")
    r.refresh(spark)
    assert any("wave2" in p for p in r.processed())

    # Crash-simulation A: a torn run that staged but never promoted
    # changes nothing — an abandoned staging dir is invisible.
    staging = r.table._write_staging(r.table.read().limit(1))
    assert r.processed() == {p for p in r.processed()}  # unchanged
    import shutil

    shutil.rmtree(staging)

    # Crash-simulation B: roll the table back to the wave1-only
    # version — the processed set MUST roll back with it, so the next
    # refresh refolds wave2 exactly once (no double count).
    prev = r.table.current_version().version - 1
    r.table.overwrite(
        r.table.read(version=prev), snapshot_meta=r.table.snapshot_meta(version=prev)
    )
    assert r.processed() == v1_processed
    rep = r.refresh(spark)
    assert rep["new_files"] > 0  # wave2 refolded once

    full = (
        _prepare(ev)
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
            F.min("event_id").alias("first_event"),
        )
    )
    assert _sorted(r.table.read()) == _sorted(full)


def test_approx_distinct_incremental_equals_full_sketch(spark, tmp_path, arrivals):
    """COUNT DISTINCT is not decomposable as a scalar, but HLL sketch
    state is: incrementally-folded sketches produce the EXACT same
    estimates as a single-pass recompute (register-max merge is
    associative/commutative/idempotent), and the estimate tracks the
    true distinct count."""
    ev, raw = arrivals
    cat = Catalog(spark, warehouse=str(tmp_path / "whad"))
    spec = TableSpec(table_name="events_uniques", primary_key="event_type", database="ivm")
    r = IncrementalRollup(
        cat.table(spec),
        raw,
        ["event_type"],
        [AggCol("n_events", "count"), AggCol("uniq_users", "approx_distinct", "user_id")],
    )
    r.refresh(spark)
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(f"{raw}/wave2")
    r.refresh(spark)

    got = {
        r_.event_type: (r_.n_events, r_.uniq_users)
        for r_ in r.estimates().collect()
    }
    full = {
        r_.event_type: (r_.n, r_.u)
        for r_ in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("u"),
        )
        .collect()
    }
    assert got == full  # sketch-exact, not just approximately equal
    exact = {
        r_.event_type: r_.u
        for r_ in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    for et, (_n, est) in got.items():
        assert abs(est - exact[et]) / exact[et] < 0.05  # HLL accuracy sanity


def test_aggcol_validation():
    with pytest.raises(ValueError, match="decomposable"):
        AggCol("a", "avg", "x")
    with pytest.raises(ValueError, match="needs a src"):
        AggCol("a", "sum")
