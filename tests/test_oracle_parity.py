"""Every declared query must hash-match its DuckDB oracle (the local
mirror of the driver's t2 correctness gate), at sf0.001 for speed and
sf0.01 for the flagship aggregate."""

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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0  # mirrors the driver's rows>0 smoke check
    assert set(e.oracle_sql()) <= set(e.queries())
