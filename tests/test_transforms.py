"""Hidden partitioning (Iceberg-style partition transforms) on the CoW
format: days/months/years/hours/bucket/truncate layouts whose derived
partition column lives only in directory names — never in query
results — with read-side pruning mapped from predicates on the SOURCE
column (reference parity: the Iceberg tables' ``PARTITIONED BY
(days(ts))`` capability its Hudi/Delta twins fake with materialized
derivation columns)."""

import datetime as dt
import os

import pytest

from automation_of_building_a_transactional_data_lake_spark.formats.parquet_cow import (
    ParquetCowTable,
)
from automation_of_building_a_transactional_data_lake_spark.formats.parquet_mor import (
    ParquetMorTable,
)
from automation_of_building_a_transactional_data_lake_spark.formats.transforms import (
    PartitionTransform,
    parse_transform,
)
from automation_of_building_a_transactional_data_lake_spark.spec import TableSpec


def _ts(day, hour=0):
    return dt.datetime(2024, 3, day, hour, 30, 0)


def _days_spec(**kw):
    return TableSpec(
        "ev_hidden", "id", None, None, "testdb", partition_transform="days(ts)", **kw
    )


def _mk_events(spark, rows):
    return spark.createDataFrame(rows, "id long, ts timestamp, val string")


# -- parsing -----------------------------------------------------------------


def test_parse_transform_forms():
    assert parse_transform("days(ts)") == PartitionTransform("days", "ts", None)
    assert parse_transform(" months( ts )") == PartitionTransform("months", "ts", None)
    assert parse_transform("bucket(16, id)") == PartitionTransform("bucket", "id", 16)
    assert parse_transform("truncate(4,code)") == PartitionTransform("truncate", "code", 4)
    assert parse_transform("days(ts)").monotonic
    assert not parse_transform("bucket(8, id)").monotonic


@pytest.mark.parametrize(
    "bad",
    ["day(ts)", "days()", "days(ts", "bucket(ts)", "bucket(0, ts)", "truncate(ts)", "days(2, ts)", ""],
)
def test_parse_transform_rejects(bad):
    with pytest.raises(ValueError):
        parse_transform(bad)


def test_literal_mapping():
    assert parse_transform("days(ts)").literal(_ts(5)) == dt.date(2024, 3, 5)
    assert parse_transform("days(ts)").literal("2024-03-05T10:00:00") == dt.date(2024, 3, 5)
    assert parse_transform("months(ts)").literal(_ts(5)) == "2024-03"
    assert parse_transform("years(ts)").literal(_ts(5)) == "2024"
    assert parse_transform("hours(ts)").literal(_ts(5, hour=7)) == "2024-03-05-07"
    assert parse_transform("truncate(4, code)").literal("abcdef") == "abcd"
    assert parse_transform("truncate(100, id)").literal(537) == 500
    with pytest.raises(ValueError):
        parse_transform("bucket(8, id)").literal(3)


def test_spec_validation():
    with pytest.raises(ValueError):
        TableSpec("t", "id", "cat", None, "db", partition_transform="days(ts)")


def test_mor_rejects_hidden_partitioning(spark, tmp_path):
    with pytest.raises(NotImplementedError):
        ParquetMorTable(spark, str(tmp_path), _days_spec())


# -- layout + roundtrip ------------------------------------------------------


def test_days_layout_and_hidden_schema(spark, tmp_path):
    tbl = ParquetCowTable(spark, str(tmp_path), _days_spec())
    df = _mk_events(
        spark, [(1, _ts(1), "a"), (2, _ts(1, 5), "b"), (3, _ts(2), "c"), (4, None, "n")]
    )
    tbl.create(df)
    # Derived column is in directory names only — not in results.
    got = tbl.read()
    assert set(got.columns) == {"id", "ts", "val"}
    assert {(r.id, r.val) for r in got.collect()} == {
        (1, "a"), (2, "b"), (3, "c"), (4, "n"),
    }
    vdir = tbl.current_version().path
    dirs = {e for e in os.listdir(vdir) if e.startswith("ts_days=")}
    assert dirs == {
        "ts_days=2024-03-01",
        "ts_days=2024-03-02",
        "ts_days=__HIVE_DEFAULT_PARTITION__",
    }
    # ...and not in the data files themselves.
    import pyarrow.parquet as pq

    f = tbl.data_files()[0]
    assert "ts_days" not in pq.ParquetFile(f).schema_arrow.names


def test_months_layout(spark, tmp_path):
    spec = TableSpec("ev_m", "id", None, None, "testdb", partition_transform="months(ts)")
    tbl = ParquetCowTable(spark, str(tmp_path), spec)
    tbl.create(
        _mk_events(
            spark,
            [(1, dt.datetime(2024, 1, 15), "a"), (2, dt.datetime(2024, 2, 2), "b")],
        )
    )
    vdir = tbl.current_version().path
    dirs = {e for e in os.listdir(vdir) if e.startswith("ts_months=")}
    assert dirs == {"ts_months=2024-01", "ts_months=2024-02"}


def test_time_travel_read_stays_hidden(spark, tmp_path):
    tbl = ParquetCowTable(spark, str(tmp_path), _days_spec())
    tbl.create(_mk_events(spark, [(1, _ts(1), "a")]))
    tbl.merge_upsert(_mk_events(spark, [(2, _ts(2), "b")]))
    v1 = tbl.read(version=1)
    assert set(v1.columns) == {"id", "ts", "val"}
    assert v1.count() == 1


# -- merge through the hidden layout ----------------------------------------


def test_merge_upsert_hidden_partitioned(spark, tmp_path):
    tbl = ParquetCowTable(spark, str(tmp_path), _days_spec())
    tbl.create(
        _mk_events(spark, [(1, _ts(1), "a"), (2, _ts(2), "b"), (3, _ts(3), "c")])
    )
    # Update id=2 (stays on day 2) and insert id=4 landing on day 4.
    tbl.merge_upsert(_mk_events(spark, [(2, _ts(2, 9), "B"), (4, _ts(4), "d")]))
    got = {(r.id, r.val) for r in tbl.read().collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_merge_links_unaffected_days_forward(spark, tmp_path):
    tbl = ParquetCowTable(spark, str(tmp_path), _days_spec())
    tbl.create(_mk_events(spark, [(1, _ts(1), "a"), (2, _ts(2), "b")]))
    day1_before = [f for f in tbl.data_files() if "ts_days=2024-03-01" in f]
    tbl.merge_upsert(_mk_events(spark, [(2, _ts(2, 9), "B")]))
    day1_after = [f for f in tbl.data_files() if "ts_days=2024-03-01" in f]
    # Unaffected day carried forward as hard links (same inode).
    assert {os.stat(f).st_ino for f in day1_before} == {
        os.stat(f).st_ino for f in day1_after
    }


def test_merge_delete_hidden_partitioned(spark, tmp_path):
    tbl = ParquetCowTable(spark, str(tmp_path), _days_spec())
    tbl.create(_mk_events(spark, [(1, _ts(1), "a"), (2, _ts(2), "b")]))
    tbl.merge_delete(spark.createDataFrame([(1,)], "id long"))
    assert {r.id for r in tbl.read().collect()} == {2}


def test_compact_preserves_hidden_layout(spark, tmp_path):
    tbl = ParquetCowTable(spark, str(tmp_path), _days_spec())
    tbl.create(_mk_events(spark, [(1, _ts(1), "a"), (2, _ts(2), "b")]))
    tbl.compact(n_files=1)
    got = tbl.read()
    assert set(got.columns) == {"id", "ts", "val"}
    assert got.count() == 2
    vdir = tbl.current_version().path
    assert any(e.startswith("ts_days=") for e in os.listdir(vdir))


# -- read-side pruning from SOURCE-column predicates -------------------------


def test_range_read_prunes_directories(spark, tmp_path):
    tbl = ParquetCowTable(spark, str(tmp_path), _days_spec())
    rows = [(d * 10 + i, _ts(d, i), f"v{d}") for d in range(1, 9) for i in range(3)]
    rows.append((999, None, "null-day"))
    tbl.create(_mk_events(spark, rows))
    all_files = tbl.data_files()
    lo, hi = _ts(3), _ts(4, 23)
    pruned = tbl.pruned_files("ts", lo, hi)
    # Only the two in-range day directories survive — the null
    # partition and out-of-range days drop on the DIRECTORY name alone.
    assert 0 < len(pruned) < len(all_files)
    assert all("ts_days=2024-03-03" in f or "ts_days=2024-03-04" in f for f in pruned)
    got = tbl.read_skipping("ts", lo, hi)
    assert set(got.columns) == {"id", "ts", "val"}
    full = tbl.read()
    expect = {r.id for r in full.filter((full.ts >= lo) & (full.ts <= hi)).collect()}
    assert {r.id for r in got.collect()} == expect


def test_bucket_lookup_scans_one_bucket(spark, tmp_path):
    spec = TableSpec(
        "keyed", "id", None, None, "testdb", partition_transform="bucket(8, id)"
    )
    tbl = ParquetCowTable(spark, str(tmp_path), spec)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(200)], "id long, val string")
    tbl.create(df)
    vdir = tbl.current_version().path
    buckets = {e for e in os.listdir(vdir) if e.startswith("id_bucket=")}
    assert len(buckets) == 8
    probed = tbl.read_lookup(57)
    assert [(r.id, r.val) for r in probed.collect()] == [(57, "v57")]
    assert set(probed.columns) == {"id", "val"}
    # The bucket filter must be a PartitionFilter and open 1/8 of files.
    scan = probed._jdf.queryExecution().executedPlan().collectLeaves().head()
    assert scan.metrics().apply("numFiles").value() < len(tbl.data_files())
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_bucket_merge_roundtrip(spark, tmp_path):
    spec = TableSpec(
        "keyed2", "id", None, None, "testdb", partition_transform="bucket(4, id)"
    )
    tbl = ParquetCowTable(spark, str(tmp_path), spec)
    tbl.create(spark.createDataFrame([(i, "a") for i in range(50)], "id long, val string"))
    tbl.merge_upsert(spark.createDataFrame([(7, "UPD"), (60, "NEW")], "id long, val string"))
    got = dict((r.id, r.val) for r in tbl.read().collect())
    assert len(got) == 51 and got[7] == "UPD" and got[60] == "NEW"


def test_truncate_layouts(spark, tmp_path):
    spec = TableSpec(
        "codes", "id", None, None, "testdb", partition_transform="truncate(2, code)"
    )
    tbl = ParquetCowTable(spark, str(tmp_path), spec)
    tbl.create(
        spark.createDataFrame(
            [(1, "aaX"), (2, "aaY"), (3, "bbZ")], "id long, code string"
        )
    )
    vdir = tbl.current_version().path
    assert {e for e in os.listdir(vdir) if e.startswith("code_truncate=")} == {
        "code_truncate=aa",
        "code_truncate=bb",
    }
    pruned = tbl.pruned_files("code", "aa", "aa~")  # range within the 'aa' prefix
    assert all("code_truncate=aa" in f for f in pruned)

    spec_i = TableSpec(
        "nums", "id", None, None, "testdb", partition_transform="truncate(100, amt)"
    )
    tbl_i = ParquetCowTable(spark, str(tmp_path), spec_i)
    tbl_i.create(
        spark.createDataFrame([(1, 37), (2, 142), (3, 963)], "id long, amt long")
    )
    vdir = tbl_i.current_version().path
    assert {e for e in os.listdir(vdir) if e.startswith("amt_truncate=")} == {
        "amt_truncate=0",
        "amt_truncate=100",
        "amt_truncate=900",
    }
    pruned = tbl_i.pruned_files("amt", 100, 199)
    assert all("amt_truncate=100" in f for f in pruned)
