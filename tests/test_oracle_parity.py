"""Every declared query must hash-match its DuckDB oracle (the local
mirror of the driver's t2 correctness gate), at sf0.001 for speed and
sf0.01 for the flagship aggregate."""

import os

import pytest

from automation_of_building_a_transactional_data_lake_spark.plans.testdata_queries import QUERIES

from .conftest import SF_CORRECTNESS, SF_SMOKE
from .oracle import compare, duckdb_con

ORACLE_QUERIES = [name for name, q in QUERIES.items() if q.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_sf0001(spark, name):
    q = QUERIES[name]
    con = duckdb_con(SF_SMOKE)
    compare(q.spark(spark, SF_SMOKE), con.sql(q.oracle).df())


@pytest.mark.parametrize("name", ["q1_pricing_summary", "events_cdc_state", "emb_knn_brute"])
def test_query_matches_oracle_sf001(spark, name):
    q = QUERIES[name]
    con = duckdb_con(SF_CORRECTNESS)
    compare(q.spark(spark, SF_CORRECTNESS), con.sql(q.oracle).df())


# r16 (r15 verdict #7): the DEMOTED tail's composed pipelines — the
# multi-stage gates whose driver slots rotated away — keep
# nontrivial-scale coverage at sf0.01 in an opt-in tier
# (TDL_DEEP_TESTS=1, the weekly/deep CI lane; SURVEY §5 notes it).
_DEEP_TAIL = [
    "docs_curation_pipeline",
    "docs_curation_v2",
    "game_user_cdc_e2e_delta",
    "game_user_cdc_e2e_iceberg",
    "game_user_cdc_e2e_hudi",
    "game_item_cdc_e2e",
    "game_user_cdc_e2e_sqltext",
    "game_user_cdc_e2e_via_changes",
    "game_user_cdc_e2e_delta_evolve",
    "game_user_cdc_e2e_iceberg_v1up",
    "docs_decontamination",
    "docs_winnow_fingerprints",
    "events_exclusive_errors",
    "orders_1996_iceberg_pruned",
    # Rotated to recorded driver slots in r17; kept here for sf0.01
    # depth beyond the driver's sf0.01 run.
    "docs_html_extract",
    "orders_changelog_fold_iceberg",
]


def _deep_rotation(k: int = 1) -> list[str]:
    """r17 (r16 verdict #5) ran FIVE rotating sf0.01 tail pipelines in
    the default lane; the lane outgrew the driver's pytest budget and
    the r17 verify run truncated at 32% (r17 verdict #1 — an
    incomplete run protects nothing). r18: the default lane keeps ONE
    rotating deep slot (composed-pipeline coverage at sf0.01 without
    the opt-in, cycling the whole tail deterministically on the
    committed CORRECTNESS history count); the other ``len(_DEEP_TAIL)-1``
    pipelines run under TDL_DEEP_TESTS=1 (the weekly/deep CI lane).
    Every tail query still oracle-gates at sf0.001 in the default lane
    via test_query_matches_oracle_sf0001."""
    import glob

    rnd = len(
        glob.glob(
            os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")
        )
    )
    return [_DEEP_TAIL[(rnd * k + i) % len(_DEEP_TAIL)] for i in range(k)]


_DEEP_ALWAYS = _deep_rotation()


@pytest.mark.parametrize("name", _DEEP_ALWAYS)
def test_tail_pipeline_sf001_rotating(spark, name):
    q = QUERIES[name]
    con = duckdb_con(SF_CORRECTNESS)
    compare(q.spark(spark, SF_CORRECTNESS), con.sql(q.oracle).df())


@pytest.mark.deep
@pytest.mark.skipif(
    os.environ.get("TDL_DEEP_TESTS", "0") != "1",
    reason="sf0.01 tail tier: set TDL_DEEP_TESTS=1 (weekly/deep lane)",
)
@pytest.mark.parametrize(
    "name", [n for n in _DEEP_TAIL if n not in _DEEP_ALWAYS]
)
def test_tail_pipeline_matches_oracle_sf001(spark, name):
    q = QUERIES[name]
    con = duckdb_con(SF_CORRECTNESS)
    compare(q.spark(spark, SF_CORRECTNESS), con.sql(q.oracle).df())


def test_rotation_invariant_audited():
    """r17 (r16 verdict #8): mechanize the 50-slot rotation log's
    invariant. With 116+ registered queries and 50 driver-recorded
    slots, every registered query must either (a) sit in the current
    recorded head (it records this round), (b) have a driver-green row
    in SOME committed CORRECTNESS_r*.json, or (c) be a fresh tail-first
    registration carrying a rotation comment in the log (the
    emb_top_pairs pattern: registered first, rotated to a recorded
    slot next round) — at most a handful at a time, or the rotation
    has stalled."""
    import glob
    import json

    import __spark_entry__ as e

    root = os.path.join(os.path.dirname(__file__), "..")
    recorded: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(p, encoding="utf-8") as f:
            recorded |= set(json.load(f))
    all_q = set(QUERIES)
    tail = set(e._DEMOTED_TAIL)
    # A demoted name that is not registered is a wiring bug (queries()
    # silently drops it).
    assert tail <= all_q, f"stale tail entries: {sorted(tail - all_q)}"
    head = all_q - tail
    never = all_q - recorded - head
    # Bench-only twins (no value oracle by design) never earn a row.
    pending = {n for n in never if QUERIES[n].oracle is not None}
    assert len(pending) <= 4, (
        f"rotation stalled: {sorted(pending)} registered but never "
        "driver-recorded and not in the current head"
    )
    with open(os.path.join(root, "__spark_entry__.py"), encoding="utf-8") as f:
        src = f.read()
    for n in sorted(pending):
        assert src.count(n) >= 2, (
            f"{n} is tail-registered but carries no rotation-log comment"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0  # mirrors the driver's rows>0 smoke check
    assert set(e.oracle_sql()) <= set(e.queries())
