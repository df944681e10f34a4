"""Merge-on-read backend: unit semantics, protocol conformance, and
full-pipeline equivalence with the copy-on-write backend."""

from datetime import datetime, timezone

import pytest

from automation_of_building_a_transactional_data_lake_spark.catalog import Catalog
from automation_of_building_a_transactional_data_lake_spark.formats.base import TableFormat
from automation_of_building_a_transactional_data_lake_spark.formats.parquet_cow import (
    MergeError,
    ParquetCowTable,
)
from automation_of_building_a_transactional_data_lake_spark.formats.parquet_mor import (
    ParquetMorTable,
)
from automation_of_building_a_transactional_data_lake_spark.pipeline import (
    cdc_load_all,
    initial_load_all,
)
from automation_of_building_a_transactional_data_lake_spark.spec import GAME_SPECS, TableSpec

DEMO = "/root/reference/demo_data"
CLOCK = datetime(2023, 9, 1, tzinfo=timezone.utc)
SPEC = TableSpec("t_mor", "id", None, None, "testdb")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def test_protocol_conformance(spark, tmp_path):
    assert isinstance(ParquetCowTable(spark, str(tmp_path), SPEC), TableFormat)
    assert isinstance(ParquetMorTable(spark, str(tmp_path), SPEC), TableFormat)


def test_mor_upsert_delete_roundtrip(spark, tmp_path):
    tbl = ParquetMorTable(spark, str(tmp_path), SPEC)
    tbl.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    tbl.merge_upsert(_mk(spark, [(2, "B"), (4, "d")]))
    tbl.merge_delete(spark.createDataFrame([(1,)], "id long"))
    got = {(r.id, r.val) for r in tbl.read().collect()}
    assert got == {(2, "B"), (3, "c"), (4, "d")}
    # Writes were append-only: base + 2 deltas referenced.
    snap = tbl.current_snapshot()
    assert snap["base"] == "b00000001" and len(snap["deltas"]) == 2


def test_mor_compact_folds_deltas(spark, tmp_path):
    tbl = ParquetMorTable(spark, str(tmp_path), SPEC)
    tbl.create(_mk(spark, [(1, "a"), (2, "b")]))
    tbl.merge_upsert(_mk(spark, [(2, "B")]))
    before = {(r.id, r.val) for r in tbl.read().collect()}
    tbl.compact()
    snap = tbl.current_snapshot()
    assert snap["deltas"] == []
    assert {(r.id, r.val) for r in tbl.read().collect()} == before
    removed = tbl.vacuum(retain_last=1)
    assert "d00000002" in removed and "b00000001" in removed


def test_mor_rejects_duplicate_source_keys(spark, tmp_path):
    tbl = ParquetMorTable(spark, str(tmp_path), SPEC)
    tbl.create(_mk(spark, [(1, "a")]))
    with pytest.raises(MergeError):
        tbl.merge_upsert(_mk(spark, [(1, "x"), (1, "y")]))


def test_mor_upsert_wins_over_older_delete(spark, tmp_path):
    """Sequence ordering: delete then re-insert resurrects the key."""
    tbl = ParquetMorTable(spark, str(tmp_path), SPEC)
    tbl.create(_mk(spark, [(1, "a")]))
    tbl.merge_delete(spark.createDataFrame([(1,)], "id long"))
    assert tbl.read().count() == 0
    tbl.merge_upsert(_mk(spark, [(1, "back")]))
    assert [(r.id, r.val) for r in tbl.read().collect()] == [(1, "back")]


def test_full_pipeline_equivalence_cow_vs_mor(spark, tmp_path):
    """The same demo lifecycle through both backends yields identical
    final state — the format really is pluggable."""
    spec = next(s for s in GAME_SPECS if s.table_name == "user_data")
    results = {}
    for fmt in ("cow", "mor"):
        cat = Catalog(spark, str(tmp_path / fmt), table_format=fmt)
        initial_load_all(spark, cat, [spec], DEMO)
        cdc_load_all(spark, cat, [spec], DEMO, clock=CLOCK)
        rows = (
            cat.read_table(spec)
            .select("user_id", "email", "cur_level", "last_applied_date")
            .collect()
        )
        results[fmt] = sorted((r.user_id, r.email, r.cur_level, r.last_applied_date) for r in rows)
    assert results["cow"] == results["mor"]
    assert len(results["cow"]) == 10044
