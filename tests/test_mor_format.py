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


def test_mor_check_constraints(spark, tmp_path):
    """MoR enforces the same CHECK semantics: violating batches are
    rejected before any base or delta is written."""
    from automation_of_building_a_transactional_data_lake_spark.formats.parquet_cow import (
        ConstraintViolation,
    )

    spec = TableSpec("t_mor_chk", "id", None, None, "testdb", constraints=("id > 0",))
    tbl = ParquetMorTable(spark, str(tmp_path), spec)
    with pytest.raises(ConstraintViolation):
        tbl.create(spark.createDataFrame([(0, "a")], "id long, val string"))
    assert not tbl.exists()
    tbl.create(spark.createDataFrame([(1, "a")], "id long, val string"))
    with pytest.raises(ConstraintViolation):
        tbl.merge_upsert(spark.createDataFrame([(-2, "b")], "id long, val string"))
    assert tbl.current_snapshot()["deltas"] == []


def test_snapshot_meta_carries_through_deltas_and_compact(spark, tmp_path):
    """MoR snapshot_meta commits with the snapshot json and survives
    merge-appended deltas and compaction (same contract as CoW)."""
    tbl = ParquetMorTable(spark, str(tmp_path), SPEC)
    tbl.create(
        spark.createDataFrame([(1, "a")], "id long, val string"),
        snapshot_meta={"processed_files": ["w1"]},
    )
    assert tbl.snapshot_meta() == {"processed_files": ["w1"]}
    tbl.merge_upsert(spark.createDataFrame([(2, "b")], "id long, val string"))
    assert tbl.snapshot_meta() == {"processed_files": ["w1"]}  # carried
    tbl.compact()
    assert tbl.snapshot_meta() == {"processed_files": ["w1"]}
    tbl.overwrite(
        spark.createDataFrame([(9, "z")], "id long, val string"),
        snapshot_meta={"processed_files": ["w1", "w2"]},
    )
    assert tbl.snapshot_meta() == {"processed_files": ["w1", "w2"]}


def test_catalog_opens_table_with_writing_format(spark, tmp_path):
    """A warehouse can mix formats: an existing table opens with the
    backend that WROTE it (recorded in _format.json), not the catalog
    default — a CoW-default catalog must read a MoR table through
    delta reconciliation, and vice versa."""
    wh = str(tmp_path)
    mor_cat = Catalog(spark, wh, table_format="mor")
    mor_cat.table(SPEC).create(spark.createDataFrame([(1, "a")], "id long, val string"))
    mor_cat.table(SPEC).merge_upsert(
        spark.createDataFrame([(1, "A"), (2, "b")], "id long, val string")
    )

    cow_cat = Catalog(spark, wh)  # default "cow"
    opened = cow_cat.table(SPEC)
    assert isinstance(opened, ParquetMorTable)
    got = {(r.id, r.val) for r in cow_cat.read_table(SPEC).collect()}
    assert got == {(1, "A"), (2, "b")}  # deltas reconciled, not raw base

    cow_spec = TableSpec("t_cow_mixed", "id", None, None, "testdb")
    cow_cat.table(cow_spec).create(spark.createDataFrame([(7, "q")], "id long, val string"))
    assert isinstance(mor_cat.table(cow_spec), ParquetCowTable)


def test_full_pipeline_equivalence_cow_vs_mor(spark, tmp_path):
    """The ENTIRE game demo lifecycle (all tables: initial load + CDC
    merge, including item_data's in-batch duplicate keys and
    play_data's case-sensitive column) through both backends yields
    identical final state on every column — the format really is
    pluggable end-to-end, one catalog switch like the reference's
    cdk.json:87."""
    results = {}
    for fmt in ("cow", "mor"):
        cat = Catalog(spark, str(tmp_path / fmt), table_format=fmt)
        init = initial_load_all(spark, cat, GAME_SPECS, DEMO)
        assert [r.action for r in init] == ["created"] * len(GAME_SPECS)
        cdc_load_all(spark, cat, GAME_SPECS, DEMO, clock=CLOCK)
        per_table = {}
        for spec in GAME_SPECS:
            df = cat.read_table(spec)
            cols = sorted(df.columns)
            rows = [tuple(r) for r in df.select(*cols).collect()]
            # None-safe ordering: nulls (e.g. audit col on untouched
            # rows) sort before values without ever comparing across types.
            rows.sort(key=lambda t: tuple((v is not None, v) for v in t))
            per_table[spec.table_name] = (cols, rows)
        results[fmt] = per_table
    for spec in GAME_SPECS:
        cow_cols, cow_rows = results["cow"][spec.table_name]
        mor_cols, mor_rows = results["mor"][spec.table_name]
        assert cow_cols == mor_cols, spec.table_name
        assert cow_rows == mor_rows, spec.table_name
    assert len(results["cow"]["user_data"][1]) == 10044


def test_catalog_tag_read_on_mor_raises_clear_error(spark, tmp_path):
    """Catalog.read_table(spec, tag=...) on a merge-on-read table must
    raise a feature error naming the limitation, not an opaque
    TypeError from ParquetMorTable.read's signature."""
    import pytest

    cat = Catalog(spark, str(tmp_path), table_format="mor")
    cat.table(SPEC).create(spark.createDataFrame([(1, "a")], "id long, val string"))
    with pytest.raises(ValueError, match="copy-on-write"):
        cat.read_table(SPEC, tag="some_tag")


def test_mor_fsck_healthy_and_damaged(spark, tmp_path):
    """MoR fsck: [] on a healthy table (deep included); a manually
    removed delta directory surfaces as a dangling_dir error. The
    catalog passthrough works for either format."""
    import os
    import shutil as _shutil

    cat = Catalog(spark, str(tmp_path), table_format="mor")
    cat.table(SPEC).create(_mk(spark, [(1, "a"), (2, "b")]))
    cat.table(SPEC).merge_upsert(_mk(spark, [(3, "c")]))
    assert cat.fsck(SPEC, deep=True) == []

    _shutil.rmtree(os.path.join(cat.table(SPEC).path, "d00000002"))
    kinds = {f["kind"] for f in cat.fsck(SPEC)}
    assert "dangling_dir" in kinds
