"""ManagedDedupIndex: the CDC-maintained near-duplicate index
(operators/dedup_index.py) — build / incremental refresh / delete /
vacuumed-window rebuild / shard-pruned query."""

import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.catalog import Catalog
from automation_of_building_a_transactional_data_lake_spark.operators.dedup_index import (
    ManagedDedupIndex,
)
from automation_of_building_a_transactional_data_lake_spark.spec import TableSpec

_DOC = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep green forest tonight"
)
_NEAR = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep green forest today"
)
_FAR = "completely different words describing unrelated matters entirely"


def _mk(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    spec = TableSpec("docs", "doc_id", None, None, "corpusdb")
    tbl = cat.table(spec)
    tbl.create(
        spark.createDataFrame(
            [(1, _DOC), (2, _FAR), (3, "some other text about nothing at all")],
            "doc_id long, text string",
        )
    )
    return cat, spec, tbl


def test_build_query_and_incremental_refresh(spark, tmp_path):
    cat, spec, tbl = _mk(spark, tmp_path)
    idx = ManagedDedupIndex(cat, spec, threshold=0.7)
    out = idx.build()
    assert out["action"] == "built"

    batch = spark.createDataFrame([(100, _NEAR)], "query_id long, text string")
    got = idx.near_duplicates(batch).collect()
    assert [(r.query_id, r.doc_id) for r in got] == [(100, 1)]
    assert got[0].jaccard >= 0.7

    # noop when the source has not moved.
    assert idx.refresh()["action"] == "noop"

    # Insert a near-dup of _FAR; refresh hashes ONLY the change.
    tbl.merge_upsert(
        spark.createDataFrame(
            [(4, _FAR + " indeed")], "doc_id long, text string"
        )
    )
    out = idx.refresh()
    assert out["action"] == "refreshed" and out["hashed"] == 1
    got = idx.near_duplicates(
        spark.createDataFrame([(200, _FAR)], "query_id long, text string")
    ).collect()
    assert sorted((r.query_id, r.doc_id) for r in got) == [(200, 2), (200, 4)]

    # Delete doc 1: its (doc x band) entries leave the index, so the
    # near-dup query that used to hit it returns nothing.
    tbl.merge_delete(spark.createDataFrame([(1,)], "doc_id long"))
    out = idx.refresh()
    assert out["deleted"] == 1
    assert idx.near_duplicates(batch).count() == 0


def test_query_is_shard_pruned_and_self_match_free(spark, tmp_path):
    cat, spec, _tbl = _mk(spark, tmp_path)
    idx = ManagedDedupIndex(cat, spec, threshold=0.7, n_shards=8)
    idx.build()
    # A batch document that IS an indexed document must not report
    # itself as its own duplicate.
    same = spark.createDataFrame([(1, _DOC)], "query_id long, text string")
    assert idx.near_duplicates(same).count() == 0
    # Mismatched LSH parameters refuse loudly rather than silently
    # querying with incompatible hashes.
    other = ManagedDedupIndex(cat, spec, threshold=0.7, num_perm=64, bands=16)
    with pytest.raises(ValueError, match="different LSH parameters"):
        other.near_duplicates(same)


def test_vacuumed_window_falls_back_to_full_rebuild(spark, tmp_path):
    cat, spec, tbl = _mk(spark, tmp_path)
    idx = ManagedDedupIndex(cat, spec, threshold=0.7)
    idx.build()
    # Advance the source several versions, then vacuum past the
    # indexed snapshot: the diff window is gone and refresh must
    # rebuild (deterministic hashes make it byte-equivalent).
    for i in range(3):
        tbl.merge_upsert(
            spark.createDataFrame(
                [(10 + i, f"filler document number {i} with words")],
                "doc_id long, text string",
            )
        )
    tbl.vacuum(retain_last=1)
    out = idx.refresh()
    assert out["action"] == "rebuilt_full"
    got = idx.near_duplicates(
        spark.createDataFrame([(100, _NEAR)], "query_id long, text string")
    ).collect()
    assert [(r.query_id, r.doc_id) for r in got] == [(100, 1)]


def test_refresh_is_idempotent_per_window(spark, tmp_path):
    """Replaying the same change window (crash between merge and meta
    write) converges: MERGE upsert/delete are idempotent per key."""
    cat, spec, tbl = _mk(spark, tmp_path)
    idx = ManagedDedupIndex(cat, spec, threshold=0.7)
    idx.build()
    meta_before = idx._read_meta()
    tbl.merge_upsert(
        spark.createDataFrame([(5, _NEAR)], "doc_id long, text string")
    )
    idx.refresh()
    rows1 = sorted(
        (r.entry_id, r.bucket) for r in idx._table().read().collect()
    )
    # Simulate the crash: rewind the meta to the pre-refresh snapshot
    # and refresh again — the same window re-applies.
    idx._write_meta(meta_before)
    out = idx.refresh()
    assert out["action"] == "refreshed"
    rows2 = sorted(
        (r.entry_id, r.bucket) for r in idx._table().read().collect()
    )
    assert rows1 == rows2


def test_maintain_all_refreshes_dedup_indexes(spark, tmp_path):
    """maintain_all(dedup_indexes=) catches the index up on the
    maintenance cadence, same contract as ann_indexes."""
    from automation_of_building_a_transactional_data_lake_spark.pipeline import (
        maintain_all,
    )

    cat, spec, tbl = _mk(spark, tmp_path)
    idx = ManagedDedupIndex(cat, spec, threshold=0.7)
    idx.build()
    tbl.merge_upsert(
        spark.createDataFrame([(9, _NEAR)], "doc_id long, text string")
    )
    reports = maintain_all(cat, [spec], dedup_indexes=[idx])
    r = next(r for r in reports if r.action == "dedup_refreshed")
    assert r.telemetry["hashed"] == 1
    got = idx.near_duplicates(
        spark.createDataFrame([(100, _DOC)], "query_id long, text string")
    )
    assert sorted(x.doc_id for x in got.collect()) == [1, 9]
