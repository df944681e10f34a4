"""Bucketed tables must (a) round-trip data exactly and (b) produce a
ZERO-Exchange sort-merge join when both sides share the bucket key —
the co-location contract that matters at scale."""

import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.formats.bucketed import (
    BucketedTables,
)
from automation_of_building_a_transactional_data_lake_spark.plans.testdata_queries import load

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    bt = BucketedTables(spark, database="bt_test")
    orders = load(spark, SF_SMOKE, "orders")
    cust = load(spark, SF_SMOKE, "customer")
    bt.create(orders, "orders_b", "o_custkey", 4, mode="overwrite")
    bt.create(cust, "customer_b", "c_custkey", 4, mode="overwrite")
    yield bt
    bt.drop("orders_b")
    bt.drop("customer_b")


def test_roundtrip_exact(spark, bucketed):
    orders = load(spark, SF_SMOKE, "orders")
    got = bucketed.read("orders_b")
    assert got.count() == orders.count()
    assert set(got.columns) == set(orders.columns)
    assert got.agg(F.sum("o_totalprice")).first()[0] == pytest.approx(
        orders.agg(F.sum("o_totalprice")).first()[0]
    )


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = bucketed.read("orders_b")
        c = bucketed.read("customer_b")
        joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # AQE prints Final + Initial sections; judge only the final.
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final
        assert "Bucketed: true" in final
        # The join itself must not shuffle: below the SMJ (children print
        # after it) there is no Exchange — the scans' bucket distribution
        # satisfies the join requirement. The groupBy's Exchange sits
        # above the join and is allowed.
        join_part = final.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_same_join_does_shuffle(spark, bucketed):
    """Control: the identical join on plain parquet inputs needs two
    Exchanges — proving the absence above comes from bucketing."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load(spark, SF_SMOKE, "orders")
        c = load(spark, SF_SMOKE, "customer")
        joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        join_part = final.split("SortMergeJoin", 1)[1] if "SortMergeJoin" in final else final
        assert "Exchange" in join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_join_result_matches_unbucketed(spark, bucketed):
    o_b = bucketed.read("orders_b")
    c_b = bucketed.read("customer_b")
    got = (
        o_b.join(c_b, o_b.o_custkey == c_b.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    o = load(spark, SF_SMOKE, "orders")
    c = load(spark, SF_SMOKE, "customer")
    want = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_create_validates_buckets(spark):
    bt = BucketedTables(spark, database="bt_test")
    with pytest.raises(ValueError, match="n_buckets"):
        bt.create(load(spark, SF_SMOKE, "region"), "r", "r_regionkey", 0)
