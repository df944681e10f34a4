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


window_fn_shape = st.fixed_dictionaries(
    {
        "part": st.sampled_from(GROUP_COLS),
        "order_col": st.sampled_from(INT_COLS),
        "agg_col": st.sampled_from(INT_COLS),
        "lo": st.integers(0, 5000),
        "span": st.integers(50, 1500),
        "frame_n": st.integers(0, 20),
        "frame_kind": st.sampled_from(["cum", "preceding", "following", "full", "range"]),
        "lag_off": st.integers(1, 3),
    }
)


def _window_sql(s: dict) -> str:
    # row_number/lag need a TOTAL order to be deterministic. Real TPC-H
    # has the unique key (l_orderkey, l_linenumber); the driver's
    # synthetic lineitem does NOT (duplicate pairs exist — hypothesis
    # eventually found one whose lag order differed between engines).
    # Appending the aggregated column makes every REMAINING tie group
    # indistinguishable in all projected expressions, so any engine's
    # tie order yields the identical output multiset: equal agg values
    # give equal prefix sums/mins/lag sources, and rn/cnt pair up
    # positionally regardless of which duplicate goes first.
    # rank/dense_rank are tie-stable by definition. RANGE frames with
    # an offset require exactly ONE ordering column (both engines) and
    # are deterministic under ties because the frame is value-based.
    tie = f"{s['order_col']}, l_orderkey, l_linenumber, {s['agg_col']}"
    frames = {
        "cum": "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "preceding": f"ROWS BETWEEN {s['frame_n']} PRECEDING AND CURRENT ROW",
        "following": f"ROWS BETWEEN CURRENT ROW AND {s['frame_n']} FOLLOWING",
        "full": "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    }
    if s["frame_kind"] == "range":
        framed = (
            f"PARTITION BY {s['part']} ORDER BY {s['order_col']} "
            f"RANGE BETWEEN {s['frame_n']} PRECEDING AND CURRENT ROW"
        )
    else:
        framed = f"PARTITION BY {s['part']} ORDER BY {tie} {frames[s['frame_kind']]}"
    return f"""
    SELECT {s["part"]} AS g, l_orderkey, l_linenumber,
           row_number() OVER (PARTITION BY {s["part"]} ORDER BY {tie}) AS rn,
           rank() OVER (PARTITION BY {s["part"]} ORDER BY {s["order_col"]}) AS rk,
           dense_rank() OVER (PARTITION BY {s["part"]} ORDER BY {s["order_col"]}) AS drk,
           CAST(sum({s["agg_col"]}) OVER ({framed}) AS BIGINT) AS sm,
           count(*) OVER ({framed}) AS cnt,
           min({s["agg_col"]}) OVER ({framed}) AS mn,
           lag({s["agg_col"]}, {s["lag_off"]}) OVER (PARTITION BY {s["part"]} ORDER BY {tie}) AS lg
    FROM lineitem
    WHERE {s["order_col"]} BETWEEN {s["lo"]} AND {s["lo"] + s["span"]}
    """


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(s=window_fn_shape)
def test_random_window_parity(spark, s):
    """r3 verdict #7: hypothesis-generated row_number/rank/sum-over
    shapes with random partitions, orders, and ROWS/RANGE frames agree
    with DuckDB over integer domains (windows were the biggest unfuzzed
    surface; the fuzz layer caught real bugs in r3)."""
    import pandas as pd

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").createOrReplaceTempView("lineitem")
    sql = _window_sql(s)
    got = normalize(spark.sql(sql).toPandas())
    con = duckdb_con(SF_SMOKE)
    want = normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns)
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


# -- r13: SQL-text WHERE -> where= pushdown fuzz -----------------------------

_PUSH_WHERE_ATOM = st.sampled_from([
    "id = {n}",
    "id != {n}",
    "{n} < id",
    "id <= {n}",
    "id BETWEEN {n} AND {m}",
    "id IN ({n}, {m})",
    "id NOT IN ({n}, {m})",
    "cat = 'c{k}'",
    "cat <> 'c{k}'",
    "cat IN ('c{k}', 'c0')",
    "cat IS NULL",
    "cat IS NOT NULL",
    "ts >= TIMESTAMP '2024-0{mo}-01 00:00:00'",
    "ts < TIMESTAMP '2024-0{mo}-15 12:00:00'",
    "d = DATE '2024-0{mo}-01'",
    # NOT grammar (r16): De Morgan distribution must push AND stay exact
    "NOT id = {n}",
    "NOT (id < {n})",
    "id NOT BETWEEN {n} AND {m}",
    "NOT (cat = 'c{k}')",
    "NOT cat IS NULL",
    "NOT (id < {n} OR id > {m})",
    "NOT (id = {n} AND cat = 'c{k}')",
    # unsupported shapes: must not push, must stay exact
    "upper(cat) = 'C{k}'",
    "id + 0 = {n}",
    "length(cat) > {k}",
    "NOT (upper(cat) = 'C{k}')",
])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    fmt=st.sampled_from(["delta", "iceberg", "hudi"]),
    atoms=st.lists(
        st.tuples(
            _PUSH_WHERE_ATOM,
            st.integers(0, 40),   # n
            st.integers(0, 40),   # m
            st.integers(0, 3),    # k
            st.integers(1, 6),    # mo
        ),
        min_size=1, max_size=3,
    ),
    or_group=st.booleans(),
    alias=st.booleans(),
    negate=st.booleans(),
)
def test_sql_where_pushdown_fuzz(
    spark, tmp_path_factory, fmt, atoms, or_group, alias, negate
):
    """PROPERTY (r13): for ANY WHERE clause assembled from supported
    and unsupported conjunct shapes, a single-table SELECT through
    LakeSQL over a foreign path equals plain Spark SQL over the full
    unpruned read — the pushdown derivation may only skip files, never
    change results."""
    import datetime as _dt

    from automation_of_building_a_transactional_data_lake_spark.catalog import Catalog
    from automation_of_building_a_transactional_data_lake_spark.formats.interop import (
        read_delta,
        read_hudi,
        read_iceberg,
        write_delta,
        write_hudi,
        write_iceberg,
    )
    from automation_of_building_a_transactional_data_lake_spark.sql import LakeSQL

    base = tmp_path_factory.mktemp("swf")
    rows = [
        (
            i,
            f"c{i % 4}" if i % 7 else None,
            _dt.datetime(2024, 1 + i % 6, 1 + i % 27),
            _dt.date(2024, 1 + i % 6, 1),
        )
        for i in range(45)
    ]
    df = spark.createDataFrame(
        rows, "id long, cat string, ts timestamp, d date"
    ).repartition(3)
    path = str(base / "t")
    if fmt == "delta":
        write_delta(df, path, partition_by=["cat"])
        full = read_delta(spark, path)
    elif fmt == "iceberg":
        write_iceberg(df, path, partition_by=["months(ts)"])
        full = read_iceberg(spark, path)
    else:
        write_hudi(df, path, record_key="id", partition_by=["cat"])
        full = read_hudi(spark, path)

    rendered = [
        tpl.format(n=n, m=max(n, m), k=k, mo=mo)
        for tpl, n, m, k, mo in atoms
    ]
    if or_group and len(rendered) >= 2 and all(
        " NOT IN " not in c for c in rendered[:2]
    ):
        clause = "(" + " OR ".join(rendered[:2]) + ")"
        rest = rendered[2:]
    else:
        clause, rest = rendered[0], rendered[1:]
    if negate:
        # r16: the whole leading conjunct under NOT — De Morgan must
        # distribute it (or soundly skip it) without changing results.
        clause = f"NOT ({clause})"
    where_sql = " AND ".join([clause] + rest)
    a = "t" if alias else ""
    q = (
        f"SELECT {'t.' if alias else ''}id, cat "
        f"FROM {fmt}.`{path}` {a} WHERE {where_sql}"
    )

    lake = LakeSQL(Catalog(spark, str(base / "wh")))
    got = {tuple(r) for r in lake.sql(q).collect()}
    full.createOrReplaceTempView("__push_fuzz_full")
    want = {
        tuple(r)
        for r in spark.sql(
            f"SELECT id, cat FROM __push_fuzz_full WHERE {where_sql}"
        ).collect()
    }
    assert got == want, q


@settings(max_examples=300, deadline=None)
@given(clause=st.text(min_size=0, max_size=120))
def test_sql_where_parser_never_crashes(clause):
    """PROPERTY (r13): the WHERE-clause parser must never raise on
    arbitrary text — unparseable input yields a (possibly empty)
    predicate list in lax mode and None in strict mode. A crash here
    would turn a harmless unsupported WHERE into a failed statement."""
    from automation_of_building_a_transactional_data_lake_spark.sql import (
        _mask_strings,
        _sql_parse_where_clause,
    )

    masked = _mask_strings(clause)
    out = _sql_parse_where_clause(clause, masked, None)
    assert out is None or isinstance(out, list)
    strict = _sql_parse_where_clause(clause, masked, "t", strict=True)
    assert strict is None or isinstance(strict, list)
