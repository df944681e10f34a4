"""Round-17 optimization guards: pin the structural properties the
optimization round introduced, so a later refactor can't silently
regress them (plan shape + numeric contracts, not timings)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.operators.ann_pq import (
    _lloyd,
    _normalize,
)


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_lloyd_update_is_member_mean_and_deterministic():
    """The vectorized centroid update (bincount sums / counts) must
    agree with the definitional per-cluster member mean to float
    accumulation tolerance, keep empty-cluster centroids, and be
    bit-deterministic across calls."""
    rng = np.random.RandomState(7)
    x = _normalize(rng.randn(500, 8))
    got = _lloyd(x, 32, iters=1)
    # Recompute one definitional Lloyd step from the same seeds.
    seeds = x[:32].copy()
    d2 = (
        (x * x).sum(axis=1, keepdims=True)
        - 2.0 * (x @ seeds.T)
        + (seeds * seeds).sum(axis=1)[None, :]
    )
    assign = d2.argmin(axis=1)
    for c in range(32):
        members = x[assign == c]
        if len(members):
            assert np.allclose(got[c], members.mean(axis=0), atol=1e-12), c
        else:
            assert np.array_equal(got[c], seeds[c]), c
    assert np.array_equal(got, _lloyd(x, 32, iters=1))  # deterministic


def test_similarity_verify_stage_is_repartitioned(spark):
    """The exact-verify stage of the prefix join must fan out across
    the session parallelism: candidate pairs are tiny in bytes but
    CPU-heavy per row, and AQE's byte-based coalescing would otherwise
    verify on ~one task (r17; 1.6 s -> 0.2 s at sf0.1). Pinned by the
    explicit hashpartitioning(id_a, id_b) exchange in the plan."""
    from automation_of_building_a_transactional_data_lake_spark.operators.dedup import (
        ngram_jaccard_prefix_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(30)],
        "doc_id long, text string",
    )
    plan = _formatted_plan(
        ngram_jaccard_prefix_pairs(docs, threshold=0.7, materialize="none")
    )
    assert "hashpartitioning(id_a" in plan and "REPARTITION_BY_NUM" in plan, plan


def test_tokenize_evaluates_once_per_projection(spark):
    """Higher-order-function lambdas defeat Catalyst CSE, so a stat
    column that inlines the tokenize re-runs it per use; the operators
    alias the token array into its own projection instead. Guard: the
    lang-id plan carries exactly one tokenize of the text column (the
    formatted plan prints the tree and the operator details, so the
    split expression may appear at most twice)."""
    from automation_of_building_a_transactional_data_lake_spark.operators.textstats import (
        with_lang_id,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox und der baum")], "doc_id long, text string"
    )
    plan = _formatted_plan(with_lang_id(docs).select("doc_id", "lang_pred"))
    assert 1 <= plan.count("split(lower(text") <= 2, plan


def test_materialize_local_is_lazy(spark):
    """_materialize(mode='local') must not launch its own job — the
    first consuming action computes and stores the frame in one pass
    (r17: one job launch saved per materialize point)."""
    from automation_of_building_a_transactional_data_lake_spark.operators.dedup import (
        _materialize,
    )

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    m = _materialize(spark.range(100).select((F.col("id") * 2).alias("v")), "local")
    assert set(tracker.getJobIdsForGroup(None)) == before  # no eager job
    assert m.count() == 100  # consuming action materializes it
