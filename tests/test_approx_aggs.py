"""Approximate aggregates: HLL count-distinct and approx percentile
must land within their documented error bounds of the exact values on
real data (they are not bit-comparable across engines, so the bound —
not an oracle hash — is the contract)."""

from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.plans.testdata_queries import load

from .conftest import SF_CORRECTNESS


def test_approx_count_distinct_within_rsd(spark):
    li = load(spark, SF_CORRECTNESS, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_orderkey", rsd=0.02)).first()[0]
    # 5 sigma of the configured 2% relative standard deviation.
    assert abs(approx - exact) / exact < 0.10


def test_approx_percentile_within_accuracy(spark):
    orders = load(spark, SF_CORRECTNESS, "orders")
    exact = orders.select(F.expr("percentile(o_totalprice, 0.5)")).first()[0]
    approx = orders.select(
        F.expr("percentile_approx(o_totalprice, 0.5, 1000)")
    ).first()[0]
    # percentile_approx guarantees rank error <= n/accuracy; translate
    # loosely to a value tolerance via the local distribution.
    p45, p55 = orders.select(
        F.expr("percentile(o_totalprice, 0.45)"),
        F.expr("percentile(o_totalprice, 0.55)"),
    ).first()
    assert p45 <= approx <= p55, (exact, approx)
