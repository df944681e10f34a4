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


# -- Model-based fuzz: refresh+query vs brute force -------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BASES = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "completely different words describing unrelated administrative matters",
    "training data pipelines deduplicate documents before tokenization step",
]
_MUT = ["", " extra", " tail words here", " x"]
_text = st.tuples(st.sampled_from(_BASES), st.sampled_from(_MUT)).map(
    lambda t: t[0] + t[1]
)
_op = st.one_of(
    st.tuples(st.just("upsert"), st.integers(0, 7), _text),
    st.tuples(st.just("delete"), st.integers(0, 7), st.none()),
)


def _sh(text, n=3):
    toks = [t for t in text.lower().split() if t]
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)}


def _jac(a, b):
    return len(a & b) / len(a | b) if a | b else 0.0


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op, min_size=1, max_size=4), probe=_text)
def test_dedup_index_refresh_query_matches_brute_force(
    spark, tmp_path_factory, ops, probe
):
    """ANY upsert/delete sequence + refresh: the index's answer has
    EXACT precision (every reported pair is a true >= threshold pair —
    the verify stage is exact) and full recall above the LSH guarantee
    point (j >= 0.8 misses with P ~ 8e-8 at b=16/r=2)."""
    wh = tmp_path_factory.mktemp("difuzz")
    cat = Catalog(spark, str(wh / "wh"))
    spec = TableSpec("docs", "doc_id", None, None, "fuzzdb")
    tbl = cat.table(spec)
    model = {0: _BASES[0], 1: _BASES[1]}
    tbl.create(
        spark.createDataFrame(list(model.items()), "doc_id long, text string")
    )
    idx = ManagedDedupIndex(cat, spec, threshold=0.7)
    idx.build()
    for kind, key, text in ops:
        if kind == "upsert":
            tbl.merge_upsert(
                spark.createDataFrame([(key, text)], "doc_id long, text string")
            )
            model[key] = text
        else:
            if key not in model:
                continue
            tbl.merge_delete(spark.createDataFrame([(key,)], "doc_id long"))
            model.pop(key)
        idx.refresh()
    got = {
        r.doc_id: r.jaccard
        for r in idx.near_duplicates(
            spark.createDataFrame([(999, probe)], "query_id long, text string")
        ).collect()
    }
    ps = _sh(probe)
    truth = {k: _jac(ps, _sh(v)) for k, v in model.items()}
    # Precision is exact at the query threshold.
    for k, j in got.items():
        assert truth[k] >= 0.7 and abs(truth[k] - j) < 5e-4
    # Recall is exact above the banding guarantee point.
    for k, j in truth.items():
        if j >= 0.8:
            assert k in got, (k, j, got)
