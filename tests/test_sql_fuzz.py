"""Randomized SQL parity: hypothesis-generated filter/aggregate shapes
run through BOTH Spark SQL and DuckDB over the same parquet and must
agree exactly. Complements the 54 hand-written oracle pairs with
machine-generated breadth over the grammar the engine claims
(predicates, grouping, count/min/max/sum, HAVING, ORDER/LIMIT).

Restricted to integer columns and integer aggregates so parity is
bit-exact by construction (no float-summation or rounding questions —
those conventions are pinned by the curated oracle pairs instead).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .conftest import SF_SMOKE
from .oracle import duckdb_con, normalize

INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]

shape = st.fixed_dictionaries(
    {
        "pred_col": st.sampled_from(INT_COLS),
        "lo": st.integers(0, 6000),
        "span": st.integers(0, 4000),
        "group": st.sampled_from(GROUP_COLS),
        "agg_col": st.sampled_from(INT_COLS),
        "having_min": st.integers(0, 50),
        "limit": st.integers(1, 25),
    }
)


def _sql(s: dict) -> str:
    return f"""
    SELECT {s["group"]} AS g,
           count(*) AS n,
           min({s["agg_col"]}) AS mn,
           max({s["agg_col"]}) AS mx,
           sum(CAST({s["agg_col"]} AS BIGINT)) AS sm
    FROM lineitem
    WHERE {s["pred_col"]} BETWEEN {s["lo"]} AND {s["lo"] + s["span"]}
    GROUP BY {s["group"]}
    HAVING count(*) >= {s["having_min"]}
    ORDER BY g
    LIMIT {s["limit"]}
    """


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(s=shape)
def test_random_filter_agg_parity(spark, s):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").createOrReplaceTempView("lineitem")
    import pandas as pd

    got = normalize(spark.sql(_sql(s)).toPandas())
    con = duckdb_con(SF_SMOKE)
    want = normalize(con.sql(_sql(s)).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


window_shape = st.fixed_dictionaries(
    {
        "group": st.sampled_from(GROUP_COLS),
        "order_col": st.sampled_from(INT_COLS),
        "lo": st.integers(0, 5000),
        "span": st.integers(100, 3000),
        "topn": st.integers(1, 5),
    }
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(s=window_shape)
def test_random_window_rank_parity(spark, s):
    """dense_rank top-N per group (tie-deterministic: ties share a
    rank and ALL tied rows are emitted, so the result SET is unique)
    agrees with DuckDB."""
    import pandas as pd

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").createOrReplaceTempView("lineitem")
    sql = f"""
    SELECT g, k, rnk FROM (
      SELECT {s["group"]} AS g, {s["order_col"]} AS k,
             dense_rank() OVER (PARTITION BY {s["group"]} ORDER BY {s["order_col"]}) AS rnk
      FROM lineitem
      WHERE {s["order_col"]} BETWEEN {s["lo"]} AND {s["lo"] + s["span"]}
    ) WHERE rnk <= {s["topn"]}
    GROUP BY g, k, rnk
    ORDER BY g, k, rnk
    """
    got = normalize(spark.sql(sql).toPandas())
    con = duckdb_con(SF_SMOKE)
    want = normalize(con.sql(sql).df())
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


join_shape = st.fixed_dictionaries(
    {
        "join": st.sampled_from(["JOIN", "LEFT JOIN"]),
        "lo": st.integers(0, 1500),
        "span": st.integers(0, 1000),
        "group": st.sampled_from(["c_mktsegment", "o_orderpriority", "o_orderstatus"]),
    }
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(s=join_shape)
def test_random_join_agg_parity(spark, s):
    """Random inner/left equi-joins + aggregates agree with DuckDB
    (left-join null paths included: count(col) skips nulls in both)."""
    import pandas as pd

    for t in ("customer", "orders"):
        spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").createOrReplaceTempView(t)
    sql = f"""
    SELECT {s["group"]} AS g,
           count(o_orderkey) AS n_orders,
           count(*) AS n_rows,
           min(o_orderkey) AS mn,
           max(o_orderkey) AS mx
    FROM customer {s["join"]} orders ON c_custkey = o_custkey
    WHERE c_custkey BETWEEN {s["lo"]} AND {s["lo"] + s["span"]}
    GROUP BY {s["group"]}
    ORDER BY g NULLS FIRST
    """
    got = normalize(spark.sql(sql).toPandas())
    con = duckdb_con(SF_SMOKE)
    want = normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
