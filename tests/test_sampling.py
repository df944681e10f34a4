"""Deterministic sampling: assignment must be a pure function of the
record key — stable under repartitioning (the property randomSplit
lacks) and within documented tolerance of the target fraction."""

import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.operators.sampling import (
    deterministic_sample,
    with_split,
)
from automation_of_building_a_transactional_data_lake_spark.plans.testdata_queries import load

from .conftest import SF_CORRECTNESS


def test_split_stable_under_repartition(spark):
    docs = load(spark, SF_CORRECTNESS, "documents")
    a = with_split(docs, key_col="text").select("doc_id", "split")
    b = with_split(docs.repartition(7, "doc_id"), key_col="text").select("doc_id", "split")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_split_fraction_near_target(spark):
    docs = load(spark, SF_CORRECTNESS, "documents")
    counts = dict(
        with_split(docs, key_col="text", train_frac=0.8)
        .groupBy("split")
        .count()
        .collect()
    )
    total = sum(counts.values())
    # 500 docs, binomial(0.8): 5 sigma ~ 0.09.
    assert abs(counts["train"] / total - 0.8) < 0.1


def test_identical_keys_same_split(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["id", "text"]
    )
    splits = with_split(df, key_col="text").select("text", "split").distinct()
    assert splits.groupBy("text").count().filter(F.col("count") > 1).count() == 0


def test_deterministic_sample_is_subset_and_stable(spark):
    docs = load(spark, SF_CORRECTNESS, "documents")
    s1 = deterministic_sample(docs, "text", 0.3).select("doc_id")
    s2 = deterministic_sample(docs.repartition(5), "text", 0.3).select("doc_id")
    assert s1.subtract(s2).count() == 0 and s2.subtract(s1).count() == 0
    n = s1.count()
    assert 0 < n < docs.count()
    # Nested property: a smaller fraction is a subset of a larger one.
    s_small = deterministic_sample(docs, "text", 0.1).select("doc_id")
    assert s_small.subtract(s1).count() == 0


def test_invalid_fractions_raise(spark):
    docs = load(spark, SF_CORRECTNESS, "documents")
    with pytest.raises(ValueError):
        with_split(docs, train_frac=0.0)
    with pytest.raises(ValueError):
        deterministic_sample(docs, "text", 1.5)


def test_stratified_sample_per_stratum_policy(spark):
    """Per-stratum fractions apply independently: frac 1.0 keeps the
    whole stratum, 0.0 drops it, unlisted strata use default_frac, and
    membership is layout-stable (repartition changes nothing). Each
    stratum's kept set must equal deterministic_sample at its own
    fraction — the stratified operator is exactly the per-group
    composition of the portable sampler."""
    from automation_of_building_a_transactional_data_lake_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    docs = load(spark, SF_CORRECTNESS, "documents")
    fracs = {"en": 0.5, "de": 1.0, "zh": 0.0}
    kept = stratified_sample(docs, "lang", fracs, default_frac=0.75)
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["de"] == base["de"]          # frac 1.0: everything
    assert "zh" not in counts                  # frac 0.0: nothing
    assert 0 < counts["en"] < base["en"]
    for lang in ("fr", "es"):                  # default 0.75
        assert 0 < counts[lang] <= base[lang]

    # Per-stratum equivalence with the flat sampler.
    en_flat = {
        r.doc_id
        for r in deterministic_sample(docs.filter(F.col("lang") == "en"), "text", 0.5)
        .select("doc_id").collect()
    }
    en_strat = {r.doc_id for r in kept.filter(F.col("lang") == "en").select("doc_id").collect()}
    assert en_flat == en_strat

    # Layout-stable.
    kept2 = stratified_sample(docs.repartition(7), "lang", fracs, default_frac=0.75)
    a = {r.doc_id for r in kept.select("doc_id").collect()}
    b = {r.doc_id for r in kept2.select("doc_id").collect()}
    assert a == b

    with pytest.raises(ValueError):
        stratified_sample(docs, "lang", {"en": 1.5})


def test_stratified_cap_deterministic_per_group(spark):
    """Per-stratum absolute cap: over-cap strata keep exactly max_rows
    (the same rows on every layout), under-cap strata keep everything,
    cap 0 empties, and the kept set is stable under repartitioning."""
    from automation_of_building_a_transactional_data_lake_spark.operators.sampling import (
        stratified_cap,
    )

    docs = load(spark, SF_CORRECTNESS, "documents")
    capped = stratified_cap(docs, "lang", 40)
    counts = {r.lang: r.n for r in capped.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in base.items():
        assert counts[lang] == min(n, 40), lang

    a = {r.doc_id for r in capped.select("doc_id").collect()}
    b = {r.doc_id for r in stratified_cap(docs.repartition(7), "lang", 40).select("doc_id").collect()}
    assert a == b

    assert stratified_cap(docs, "lang", 0).count() == 0
    with pytest.raises(ValueError):
        stratified_cap(docs, "lang", -1)


def test_mixture_resample_policy_and_determinism(spark):
    """r14: mixture_resample composes a target mix with exact-rational
    policy arithmetic — scarce domains replicate as whole epochs + a
    hash-thresholded fractional tail, abundant ones downsample,
    unweighted domains drop; the output is a pure function of the data
    (stable under repartitioning) and whole epochs carry every row of
    their domain."""
    from automation_of_building_a_transactional_data_lake_spark.operators.sampling import (
        mixture_resample,
    )

    docs = load(spark, SF_CORRECTNESS, "documents").select("doc_id", "text", "lang")
    total = docs.count()
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    parts = {"en": 30, "de": 35, "zh": 25, "fr": 10}
    mixed = mixture_resample(docs, "lang", parts, total_rows=total, key_col="text")

    got = {r.lang: r.n for r in mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "es" not in got  # unweighted domain drops
    for lang, p in parts.items():
        target = p * total / 100
        # whole epochs are exact; only the fractional tail is binomial
        copies = int(target // base[lang])
        assert got[lang] >= copies * base[lang], lang
        assert abs(got[lang] - target) < 0.15 * target + 10, (lang, got[lang], target)

    # every whole epoch carries the domain completely
    per_epoch = {
        (r.lang, r.epoch): r.n
        for r in mixed.groupBy("lang", "epoch").agg(F.count("*").alias("n")).collect()
    }
    for lang, p in parts.items():
        copies = int((p * total / 100) // base[lang])
        for e in range(1, copies + 1):
            assert per_epoch[(lang, e)] == base[lang], (lang, e)

    # stable under physical layout
    a = {(r.doc_id, r.epoch) for r in mixed.collect()}
    b = {
        (r.doc_id, r.epoch)
        for r in mixture_resample(
            docs.repartition(7), "lang", parts, total_rows=total, key_col="text"
        ).collect()
    }
    assert a == b

    with pytest.raises(ValueError):
        mixture_resample(docs, "lang", parts, total_rows=0)
    with pytest.raises(ValueError):
        mixture_resample(docs, "lang", {"en": -1}, total_rows=10)
    assert (
        mixture_resample(docs, "lang", {"nope": 1}, total_rows=10).count() == 0
    )
