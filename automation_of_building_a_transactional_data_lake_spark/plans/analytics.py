"""Extended analytic query surface: join/subquery shapes beyond the
reference's own workload.

The reference's read path stops at inner equi-joins and plain
aggregates (SURVEY §2.7 "No theta/range/as-of/semi/anti joins in the
reference surface"); a user replacing it with this engine also runs
the standard warehouse shapes — outer joins, EXISTS / NOT EXISTS,
scalar subqueries, distinct aggregates, correlated-min lookups. Each
query here pairs an idiomatic-Spark program with a DuckDB oracle and
follows the aliasing/rounding conventions of
``plans.testdata_queries``.

Scale notes are per-query; the shared principles: dimension sides
stay hint-free so AQE picks broadcast from runtime sizes, facts are
never broadcast, correlated subqueries are re-expressed as windows or
joins (Spark decorrelates EXISTS into semi/anti joins natively).

TPC-H coverage is q1-q10, q12-q19, q22 (adapted to the testdata
schema). q11 and q20 need the partsupp table and q21 needs
l_receiptdate/l_commitdate — neither exists in the driver-generated
testdata, so those three are intentionally absent rather than gated
vacuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dates import col_is_ntz, epoch_micros
from ..operators.similarity import cosine_similarity_col
from .testdata_queries import QueryDef, _utc, load

# --------------------------------------------------------------------------
# q13_cust_distribution — TPC-H Q13 shape: LEFT OUTER join preserving
# customers with zero orders, then a two-level aggregate (count per
# customer, histogram of counts). Exercises the outer-join null path:
# count("o_orderkey") must skip nulls while count(*) would not.
# Scale: orders shuffles on o_custkey once; the second aggregate runs
# over |customers| rows with low-cardinality keys (map-side partials).
# --------------------------------------------------------------------------


def q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN (
    SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority <> '1-URGENT'
  ) o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# q22_idle_balance — TPC-H Q22 shape: scalar subquery (global average)
# + NOT EXISTS anti join. The scalar stays distributed: a 1-row
# aggregate cross-joined (broadcast) into the filter instead of a
# driver-side collect. The average is rounded to 2dp on BOTH sides
# before the comparison so a last-ulp difference in double summation
# order between engines cannot flip boundary rows.
# Scale: the 1-row broadcast is free; the anti join shuffles orders
# once on o_custkey (or broadcasts the filtered customer side under
# AQE when it is small).
# --------------------------------------------------------------------------


def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    cust = load(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    idle = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


Q22_ORACLE = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# q16_brand_type_suppliers — TPC-H Q16 shape: distinct aggregate
# (count(DISTINCT l_suppkey)) + negated IN-list. Spark plans
# countDistinct as a two-phase expand/aggregate; the NOT IN over
# literals pushes to the part scan as a Not(In(...)) filter.
# Scale: lineitem shuffles once on (p_brand, p_type) after the join;
# part is the AQE-broadcast side.
# --------------------------------------------------------------------------


def q16_brand_type_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    part = (
        load(spark, sf_dir, "part")
        .filter(~F.col("p_brand").isin("Brand#1", "Brand#2"))
        .filter(F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25))
        .select("p_partkey", "p_brand", "p_type")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand NOT IN ('Brand#1', 'Brand#2')
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25)
GROUP BY p_brand, p_type
"""


# --------------------------------------------------------------------------
# q2_min_price_supplier — TPC-H Q2 shape: correlated min subquery
# ("the supplier offering each part at its minimum price"),
# decorrelated into a per-key window minimum + equality filter — one
# shuffle on l_partkey instead of a re-scan per outer row. Ties on the
# exact minimum survive on both sides identically (doubles compare
# exactly; no arithmetic is performed before the equality).
# Scale: window min shuffles lineitem once; part/supplier join after
# the filter runs over ~|parts| rows (AQE broadcast).
# --------------------------------------------------------------------------


def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    cheapest = li.withColumn("min_price", F.min("l_extendedprice").over(w)).filter(
        F.col("l_extendedprice") == F.col("min_price")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 45)
        .select("p_partkey", "p_name")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cheapest.join(part, cheapest.l_partkey == part.p_partkey)
        .join(supp, cheapest.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("l_extendedprice", 2).alias("min_price"),
        )
    )


Q2_ORACLE = """
SELECT p.p_partkey, p.p_name, s.s_name, round(l.l_extendedprice, 2) AS min_price
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE p.p_size >= 45
  AND l.l_extendedprice = (
    SELECT min(l2.l_extendedprice) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
"""


# --------------------------------------------------------------------------
# q4_late_shipment_exists — TPC-H Q4 shape: EXISTS with a non-equi
# correlated term (l_shipdate > o_orderdate + 60 days), planned as a
# left-semi join with a mixed equi + range condition. Spark keeps the
# equi part as the join key (hashable) and evaluates the range term as
# a post-join residual — no nested-loop.
# Scale: the date-range filter on orders is pushed to the scan;
# lineitem shuffles once on l_orderkey.
# --------------------------------------------------------------------------


def q4_late_shipment_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape (r15 — the suite's hardest correlation:
    EXISTS + NOT EXISTS against the SAME fact table, correlated on the
    outer row's key AND a non-key column): suppliers who were the ONLY
    late supplier on a finished multi-supplier order. The synthetic
    lineitem has no commit/receipt dates, so "late" is the q4 family's
    ``l_shipdate > o_orderdate + 60 days``; the correlation structure
    is Q21's verbatim. Spark-first: the EXISTS is a ``left_semi``
    against the distinct (order, supplier) pairs, the NOT EXISTS a
    ``left_anti`` against the distinct LATE pairs — both shuffle on
    ``l_orderkey``, the same key the orders join already shuffles on,
    so the three heaviest stages co-partition; the supplier/nation
    dims broadcast. Reference analogue: the validation SQL family,
    src/sample_redshift_ml_sql_query.txt:97-133."""
    _utc(spark)
    orders_f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    any_pairs = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).distinct()
    late_pairs = late.distinct().select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    l1 = late.join(
        any_pairs,
        (late.l_orderkey == any_pairs.k2) & (late.l_suppkey != any_pairs.s2),
        "left_semi",
    ).join(
        late_pairs,
        (late.l_orderkey == late_pairs.k3)
        & (late.l_suppkey != late_pairs.s3),
        "left_anti",
    )
    sup = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        l1.join(F.broadcast(sup), l1.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


Q21_ORACLE = """
SELECT n.n_name, s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY n.n_name, s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


# --------------------------------------------------------------------------
# emb_batch_knn — batch k-nearest-neighbor: top-3 cosine neighbors for
# each of 8 query vectors in ONE pass (vs emb_knn_brute's single
# query). The query block broadcasts; similarity is a codegen'd
# higher-order-function expression; per-query top-k is a ranking
# window over q_id — the grouped generalization of
# TakeOrderedAndProject. This is the shape of dedup-against-seed-set
# and retrieval-eval jobs over embedding tables.
# Scale: candidates never shuffle for the join (broadcast nested
# loop); the window shuffles |cand| x |queries| scored rows on q_id —
# at 100 TB you first block candidates per query via the IVF index
# (operators/ann_ivf.py) and run this same window over the candidate
# subset.
# --------------------------------------------------------------------------


def emb_batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cand = emb.filter(F.col("vec_id") >= 8)
    scored = cand.crossJoin(F.broadcast(queries)).withColumn(
        "_sim", cosine_similarity_col(F.col("embedding"), F.col("q_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "q_id",
            F.col("vec_id").alias("nn_id"),
            F.round(F.col("_sim"), 6).alias("cos_sim"),
            "rn",
        )
    )


EMB_BATCH_KNN_ORACLE = """
WITH q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
  FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.q_id, e.vec_id AS nn_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_vec)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.q_vec, q.q_vec))) AS sim
  FROM embeddings e, q
  WHERE e.vec_id >= 8
)
SELECT q_id, nn_id, round(sim, 6) AS cos_sim, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT q_id, nn_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
  FROM scored
) WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# emb_ivf_batch_knn — the IVF-indexed twin of emb_batch_knn: every
# query row derives its probe lists (Arrow argsort), explodes, and
# equi-joins the index on cluster_id — corpus rows are scored only
# against queries probing their list, never broadcast-crossed. Gated
# exactly like emb_ivf_knn: with nprobe == n_centroids the probe set
# is exhaustive, so the result MUST equal the brute-force window plan
# (same oracle as emb_batch_knn); the nprobe << k scale path carries a
# recall floor in pytest.
# --------------------------------------------------------------------------


def emb_ivf_batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_ivf import build_ivf, ivf_batch_topk

    _utc(spark)
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cand = emb.filter(F.col("vec_id") >= 8)
    indexed, centroids = build_ivf(cand, k=8, iters=2)
    return ivf_batch_topk(indexed, centroids, queries, k=3, nprobe=len(centroids))


EMB_IVF_BATCH_KNN_ORACLE = EMB_BATCH_KNN_ORACLE  # exhaustive probing == brute


# --------------------------------------------------------------------------
# customer_pii_masked — the governance surface: deterministic salted
# pseudonyms (joinable tokens, value never exposed), format-preserving
# digit masking (routing prefix readable), digit redaction in
# free-text. Masking must be REPRODUCIBLE across engines — a governed
# share and its audit must agree — so the oracle states the identical
# substring/regexp/md5 transformation and the hash gate proves
# byte-parity. Pure codegen'd projections: no shuffle, no UDF.
# --------------------------------------------------------------------------


def customer_pii_masked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.masking import mask_digits, pseudonymize

    _utc(spark)
    cust = load(spark, sf_dir, "customer")
    # Three policy styles on the columns testdata actually has:
    # a joinable pseudonym, a format-preserving mask ("Customer#" stays
    # readable), and numeric generalization (k-anonymity banding).
    return cust.select(
        "c_custkey",
        pseudonymize(F.col("c_name"), salt="s4lt").alias("name_pseudonym"),
        mask_digits(F.col("c_name"), keep_prefix=9).alias("name_masked"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("double")
        .alias("acctbal_band"),
        "c_mktsegment",
    )


CUSTOMER_PII_ORACLE = """
SELECT c_custkey,
       md5('s4lt' || c_name) AS name_pseudonym,
       substr(c_name, 1, 9)
         || regexp_replace(substr(c_name, 10), '[0-9]', '*', 'g') AS name_masked,
       CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS acctbal_band,
       c_mktsegment
FROM customer
"""


# --------------------------------------------------------------------------
# events_influence_reach — RECURSIVE CTE (Spark 4's iterative plan —
# the one query class no single-pass DataFrame program expresses):
# multi-hop reachability over a graph derived in-query. Edge u -> v
# when u CLICKED item props.k on the same day v PURCHASED it; from 5
# seed users, count distinct users reachable in <= 2 hops. The UNION
# ALL recursion is bounded by the depth predicate (paths, not visited
# sets — the final DISTINCT collapses them), exactly how both engines
# evaluate it; DuckDB runs the literal same recursion independently,
# so agreement pins Spark's recursive-CTE machinery end-to-end.
# Scale: the edge set is derived and MATERIALIZED exactly ONCE before
# the recursion enters (r6 verdict: inlining the click x purchase
# DISTINCT join in the recursive member re-plans and re-executes it
# every iteration — fine at depth 2 / sf0.1, dominant at 100x). Each
# step is then one join of the frontier against the precomputed edge
# blocks — the standard iterative BSP shape (Pregel/GraphX hold edges
# resident across supersteps for the same reason); the depth bound
# keeps the path expansion polynomial.
# --------------------------------------------------------------------------


def events_influence_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").alias("k")
    d = F.col("ts").cast("date").alias("d")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("src"), k, d
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("dst"), k, d
    )
    edges = (
        clicks.join(purchases, ["k", "d"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # Materialize the edge table once; the recursive member below joins
    # only frontier x edges (the plan's edge side is a precomputed
    # scan, asserted by tests/test_extensions.py). Routed through the
    # dedup._materialize policy (r7 verdict #9): localCheckpoint on
    # local[*], cluster-safe DISK_ONLY persist elsewhere — an iterative
    # plan must not lose its only copy of the edge set with an executor.
    from ..operators.dedup import _materialize

    _materialize(edges, None).createOrReplaceTempView("__ev_edges")
    ev.createOrReplaceTempView("__ev_reach")
    return spark.sql("""
WITH RECURSIVE reach(seed, node, depth) AS (
  SELECT user_id, user_id, 0
  FROM (SELECT DISTINCT user_id FROM __ev_reach WHERE user_id < 5)
  UNION ALL
  SELECT r.seed, e.dst, r.depth + 1
  FROM reach r
  JOIN __ev_edges e ON e.src = r.node
  WHERE r.depth < 2
)
SELECT seed, CAST(count(DISTINCT node) - 1 AS BIGINT) AS n_reachable
FROM reach GROUP BY seed ORDER BY seed
""")


EVENTS_REACH_ORACLE = """
WITH RECURSIVE reach(seed, node, depth) AS (
  SELECT user_id, user_id, 0
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 5)
  UNION ALL
  SELECT r.seed, e.dst, r.depth + 1
  FROM reach r
  JOIN (
    SELECT DISTINCT c.user_id AS src, p.user_id AS dst
    FROM (SELECT user_id, json_extract_string(props, '$.k') AS k, CAST(ts AS DATE) AS d
          FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, json_extract_string(props, '$.k') AS k, CAST(ts AS DATE) AS d
          FROM events WHERE event_type = 'purchase') p
      ON c.k = p.k AND c.d = p.d AND c.user_id <> p.user_id
  ) e ON e.src = r.node
  WHERE r.depth < 2
)
SELECT seed, CAST(count(DISTINCT node) - 1 AS BIGINT) AS n_reachable
FROM reach GROUP BY seed ORDER BY seed
"""


# --------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10 shape: selective fact filter
# (returnflag) + date window + 3-way join + multi-column group + top-N
# by revenue. Exercises grouping on many mixed-type keys.
# Scale: lineitem filter pushed (returnflag='R' drops ~75%), joins
# stay hint-free; top-N is TakeOrderedAndProject.
# --------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name", "revenue",
        )
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name, revenue
FROM (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1995-10-01'
    AND o.o_orderdate <  TIMESTAMP '1996-01-01'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
)
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# --------------------------------------------------------------------------
# q12_shipmode_priority — TPC-H Q12 shape: join + two conditional
# aggregates (A4) keyed on a computed predicate; the reference's
# pivot-style CASE-WHEN aggregate over a join.
# --------------------------------------------------------------------------


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# q19_disjunctive_pred — TPC-H Q19 shape: an OR of conjunctive
# brand/size/quantity clauses across the join. Catalyst pushes the
# common (per-side) parts of the disjunction to both scans and
# evaluates the cross-table residual post-join — the standard test of
# boolean-predicate normalization.
# --------------------------------------------------------------------------


def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    clause1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    clause2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    clause3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(clause1 | clause2 | clause3).agg(
        F.round(F.sum(rev), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# q7_nation_volume — TPC-H Q7 shape: 6-way join with the SAME dim
# table joined twice under different roles (supplier nation vs
# customer nation), a symmetric disjunctive pair filter, and a
# year(date) grouping. Self-joined dims need distinct attribute ids —
# the aliasing pattern Catalyst requires.
# Scale: both nation sides broadcast; lineitem carries the pushed
# date filter; one shuffle for the final group.
# --------------------------------------------------------------------------


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(vol), 2).alias("revenue"), F.count("*").alias("n_lines"))
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# --------------------------------------------------------------------------
# orders_price_percentiles — exact interpolated percentiles (median /
# p90) per priority: Spark `percentile` and DuckDB `quantile_cont`
# share the continuous-interpolation definition, so the gate is exact
# after rounding. Scale: percentile is a full-sort-per-group
# aggregate — fine on grouped slices, never on the ungrouped fact.
# --------------------------------------------------------------------------


def orders_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90"),
            F.count("*").alias("n_orders"),
        )
    )


ORDERS_PCTL_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# customer_name_features — string-function surface (SURVEY §2.9 notes
# the reference has none): substring / upper / concat / length /
# regexp, all JVM built-ins inside one projection.
# --------------------------------------------------------------------------


def customer_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("name_upper"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.length(F.col("c_name")).alias("name_len"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_name")).alias("seg_name"),
        F.regexp_extract(F.col("c_name"), r"(\d+)$", 1).alias("name_digits"),
    )


CUST_NAME_ORACLE = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       substring(c_name, 1, 8) AS name_prefix,
       CAST(length(c_name) AS INTEGER) AS name_len,
       concat_ws('|', c_mktsegment, c_name) AS seg_name,
       coalesce(regexp_extract(c_name, '(\\d+)$', 1), '') AS name_digits
FROM customer
"""


# --------------------------------------------------------------------------
# events_asof_purchase — as-of join: each click event enriched with
# the most recent purchase (same user, purchase.ts <= click.ts),
# nulls where none precedes. Sort-based implementation
# (operators/temporal.asof_join): one shuffle on user_id + one window
# — no per-row probe, no range blow-up. The oracle decorrelates the
# same semantics as a ranked non-equi join.
# Scale: the window state is one carried row per key; skewed users
# cost sort time only, not memory blow-up.
# --------------------------------------------------------------------------


def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join

    _utc(spark)
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_asof").alias("p_event_id"),
        F.round(F.col("value_asof"), 2).alias("p_value"),
    )


EVENTS_ASOF_ORACLE = """
WITH c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), ranked AS (
  SELECT c.event_id, p.event_id AS p_event_id, p.value AS p_value,
         row_number() OVER (
           PARTITION BY c.event_id ORDER BY p.ts DESC, p.event_id DESC
         ) AS rn
  FROM c JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
)
SELECT c.event_id, c.user_id, m.p_event_id, round(m.p_value, 2) AS p_value
FROM c LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) m ON c.event_id = m.event_id
"""


# --------------------------------------------------------------------------
# events_click_purchase_attrib — bounded range join: purchase events
# within 30 minutes AFTER a click by the same user (ad-attribution
# shape). Bucketed implementation (operators/temporal):
# equi-join on (user_id, time-bucket) with the exact µs predicate as
# residual — a shuffle join, never the BNLJ Spark would plan for the
# raw non-equi condition. Gap arithmetic is in microsecond longs, so
# boundary rows are exact on both engines.
# --------------------------------------------------------------------------


def events_click_purchase_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import bounded_range_join

    _utc(spark)
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    pairs = bounded_range_join(
        clicks,
        purchases,
        on="user_id",
        left_time="c_ts",
        right_time="p_ts",
        max_gap_seconds=1800,
        direction="forward",
    )
    ntz = col_is_ntz(ev, "ts")
    return pairs.select(
        "user_id",
        "c_event_id",
        "p_event_id",
        (epoch_micros("p_ts", ntz) - epoch_micros("c_ts", ntz)).alias("gap_us"),
        F.round("value", 2).alias("p_value"),
    )


EVENTS_ATTRIB_ORACLE = """
WITH c AS (
  SELECT event_id AS c_event_id, user_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS p_event_id, user_id, ts AS p_ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c_event_id, p_event_id,
       date_diff('microsecond', c_ts, p_ts) AS gap_us,
       round(value, 2) AS p_value
FROM c JOIN p ON c.user_id = p.user_id
WHERE p_ts > c_ts AND date_diff('microsecond', c_ts, p_ts) <= 1800 * 1000000
"""


# --------------------------------------------------------------------------
# events_props_json — semi-structured surface: JSON extraction from
# the props column with built-ins (get_json_object — JVM-side, no
# UDF), then a grouped aggregate. The reference has no JSON functions
# (SURVEY §2.9); CDC envelopes in the wild carry them.
# --------------------------------------------------------------------------


def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENTS_PROPS_JSON_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# events_rolling_stats — explicit window FRAMES: a 5-row trailing
# moving average (rowsBetween) and a running total (unbounded
# preceding) per user. Complements WF1's whole-partition frame with
# the bounded-frame variants; one shuffle on user_id shared by both
# windows (same partitioning + ordering).
# --------------------------------------------------------------------------


def events_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    moving = w.rowsBetween(-4, Window.currentRow)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(moving), 4).alias("avg_5"),
        F.round(F.sum("value").over(running), 2).alias("running_total"),
        F.row_number().over(w).alias("seq"),
    )


EVENTS_ROLLING_ORACLE = """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS avg_5,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
"""


# --------------------------------------------------------------------------
# events_sessionization — per-user sessions with a 30-minute
# inactivity gap (operators/sessionize): lag + running-sum windows,
# one shuffle, then the per-session aggregate. The canonical
# clickstream/training-data operator the reference lacks entirely.
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# events_time_range_rolling — time-RANGE window frames: a 1-hour
# trailing aggregate per user, framed by the ORDER-BY VALUE (RANGE
# BETWEEN INTERVAL ... PRECEDING), not by row count. A different
# operator class from events_rolling_stats' ROWS frames: peers at the
# same timestamp aggregate together regardless of physical order, and
# the frame width adapts to event density — the canonical "activity in
# the last hour" feature. Spark's DataFrame rangeBetween is numeric,
# so the order key is epoch microseconds (exact long arithmetic);
# DuckDB states the same frame as RANGE INTERVAL over the timestamp.
# Scale: one shuffle on user_id; the running frame is O(1) memory per
# partition (sliding aggregation), never a self-join.
# --------------------------------------------------------------------------


def events_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("__us", epoch_micros("ts", col_is_ntz(ev, "ts")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("__us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


EVENTS_TIME_RANGE_ORACLE = """
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 2) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# orders_pivot_by_priority — the NATIVE dynamic pivot operator
# (relational transpose): groupBy().pivot().agg() runs Spark's
# two-phase plan — distinct pivot values resolved at planning, then
# one conditional aggregate per value — unlike events_pivot_by_type's
# hand-written sum(when) stack. Values are pinned (the stable-schema
# practice at scale: an unpinned pivot scans the column for distinct
# values first, an extra pass over 100 TB) and re-aliased to clean
# column names. Oracle: the equivalent conditional aggregate per
# priority class.
# --------------------------------------------------------------------------


def orders_pivot_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    orders = load(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pivoted = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    clean = ["urgent", "high", "medium", "not_specified", "low"]
    return pivoted.select(
        "o_orderstatus",
        *[F.col(f"`{p}`").alias(c) for p, c in zip(prios, clean)],
    )


ORDERS_PIVOT_ORACLE = """
SELECT o_orderstatus,
       round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS urgent,
       round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS high,
       round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2) AS medium,
       round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS not_specified,
       round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS low
FROM orders
GROUP BY o_orderstatus
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import session_stats

    _utc(spark)
    ev = load(spark, sf_dir, "events")
    return session_stats(ev, key_col="user_id", time_col="ts", gap_seconds=1800)


EVENTS_SESSION_ORACLE = """
WITH g AS (
  SELECT user_id, ts, value,
         date_diff('microsecond', lag(ts) OVER w, ts) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, value,
         CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS session_id
  FROM g
)
SELECT user_id, session_id,
       count(*) AS n_events,
       date_diff('microsecond', min(ts), max(ts)) AS duration_us,
       round(sum(value), 2) AS total_value
FROM s
GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# customer_churn_predict — the reference's Redshift-ML churn workload
# end-to-end (SURVEY §2.11): train on the churn feature table, batch
# inference, return per-customer predictions. Training is iterative
# (LBFGS) and not SQL-expressible — but it IS deterministic on fixed
# data, so the gate trains, asserts the model reproduces the FROZEN
# fixed point for this testdata SF (the training regression check,
# frozen_or_trained raises loudly on deviation), then scores with the
# frozen floats. The oracle carries the same literals keyed by the
# same row count, making INFERENCE hash-exact (min 4dp-rounding-
# boundary margin measured at 1.4e-4, vs ulp-level libm exp skew).
# pytest additionally asserts the three inference paths (JVM
# transform, codegen'd sigmoid, Arrow pandas UDF) agree exactly.
# --------------------------------------------------------------------------


def customer_churn_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.churn import (
        FEATURE_COLS,
        export_coefficients,
        frozen_or_trained,
        score_with_coefficients,
        train_churn_model,
    )
    from .testdata_queries import customer_churn_features

    _utc(spark)
    features = customer_churn_features(spark, sf_dir)
    model = train_churn_model(features)
    coefs, intercept = export_coefficients(model)
    coefs, intercept = frozen_or_trained(features.count(), coefs, intercept)
    scored = score_with_coefficients(features, coefs, intercept, FEATURE_COLS)
    return scored.select(
        "c_custkey", "churned", "churn_pred", F.round("churn_prob", 4).alias("churn_prob")
    )


# The logit association order ((b + c1*x1) + c2*x2) + c3*x3 matches
# ml/churn._logit exactly (left-assoc SQL +), so both engines build
# bit-identical doubles into exp(); 4dp rounding absorbs libm ulps.
# An unrecognized SF leaves m empty -> 0 oracle rows -> a LOUD
# mismatch, never a silent pass.
CHURN_PREDICT_ORACLE = """
WITH f AS (
  SELECT c.c_custkey, f.n_orders, f.total_spent, f.account_days, f.churned
  FROM customer c
  JOIN (
    SELECT o_custkey,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spent,
           date_diff('day', CAST(min(o_orderdate) AS DATE), CAST(max(o_orderdate) AS DATE)) AS account_days,
           CASE WHEN CAST(max(o_orderdate) AS DATE) < DATE '2000-01-01' THEN 1 ELSE 0 END AS churned
    FROM orders GROUP BY o_custkey
  ) f ON c.c_custkey = f.o_custkey
),
m AS (
  SELECT t.c1, t.c2, t.c3, t.b
  FROM (VALUES
    (150,  -0.2070332977407056,   -2.053683778089046e-07,  -0.0045339422774267925, 7.4883190389355185),
    (1500,  0.0013396922351493147, -1.0561798205143388e-07, -0.0036165616521028152, 4.241507011961531)
  ) AS t(n, c1, c2, c3, b)
  WHERE t.n = (SELECT count(*) FROM f)
),
z AS (
  SELECT f.c_custkey, f.churned,
         1.0 / (1.0 + exp(-(((m.b + m.c1 * CAST(f.n_orders AS DOUBLE))
                              + m.c2 * f.total_spent)
                             + m.c3 * CAST(f.account_days AS DOUBLE)))) AS p
  FROM f CROSS JOIN m
)
SELECT c_custkey, churned,
       CAST(CASE WHEN p > 0.5 THEN 1 ELSE 0 END AS INTEGER) AS churn_pred,
       round(p, 4) AS churn_prob
FROM z
"""


# --------------------------------------------------------------------------
# q6_forecast_revenue — TPC-H Q6 shape: the purest pushdown test. All
# three predicates (date range, discount band, quantity cap) must reach
# the parquet scan (`PushedFilters`), the projection must prune to four
# columns (`ReadSchema`), and the single global aggregate runs as
# partial-then-final with no intermediate shuffle of data rows.
# Scale: at 100 TB this is a scan-bound query; row-group statistics
# skip entire files outside the date range when the data is
# date-clustered (our write path sorts on the partition key for
# exactly this reason, O2/W3).
# --------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q8_market_share — TPC-H Q8 shape: 7-way join (fact + 2 roles of
# nation + region + part filter) feeding a conditional-ratio aggregate:
# share of one supplier nation's volume within a region's imports of
# one part type, per year. sum(CASE)/sum(*) stays a single aggregate
# pass — no second join against a totals subquery.
# Scale: part/nation/region broadcast; lineitem joins orders on the
# shuffle; the grouped output is |years| rows. Ratio rounded 4dp (the
# two double sums are order-sensitive in the last ulp).
# --------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    n_supp = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


Q8_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_2'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_volume
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
  AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY year(o_orderdate)
"""


# --------------------------------------------------------------------------
# q9_product_profit — TPC-H Q9 shape (adapted: the testdata has no
# partsupp, so profit omits the supplycost term): substring-match part
# filter (`p_name LIKE '%gear%'`) + supplier-nation / order-year
# grouping. LIKE '%...%' cannot push to parquet as a range, but it
# prunes before the joins (filter sits under the join in the plan).
# The per-line volume is cast to DECIMAL(18,4) before summing: with
# 175 output groups, double summation-order differences flipped 2dp
# rounding on half-cent boundaries (2/175 groups in testing); decimal
# sums are exact, so the engines agree bit-for-bit.
# Scale: part is AQE-broadcast after the LIKE filter; nation
# broadcast; the lineitem->orders join carries only matched lines.
# --------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(F.sum(vol), 2).cast("double").alias("profit"),
            F.count("*").alias("n_lines"),
        )
    )


Q9_ORACLE = """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS profit,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


# --------------------------------------------------------------------------
# q15_top_supplier — TPC-H Q15 shape: an aggregate-over-aggregate
# (max of per-supplier revenue) re-expressed without a correlated
# subquery: the 1-row max broadcasts back onto the per-supplier
# revenue. Revenue is rounded 2dp BEFORE the max/equality so a
# last-ulp double difference between engines cannot select different
# winners.
# Scale: lineitem aggregates to |suppliers| rows in one shuffle; the
# max is a 1-row broadcast; supplier join is AQE-broadcast.
# --------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(F.round(F.sum(vol), 2).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    supp = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("__mx"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# q17_small_quantity — TPC-H Q17 shape: per-group average feeding a
# row-level predicate (quantity below half the part's average).
# Expressed as groupBy+join rather than a correlated subquery; the
# comparison is exact because l_quantity is integer-valued — double
# sums of integers are exact, so avg agrees bit-for-bit across
# engines regardless of summation order.
# Scale: the per-part average is |parts| rows (broadcastable); the
# brand filter prunes before the join; single shuffle on l_partkey.
# --------------------------------------------------------------------------


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    pa = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pa, li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


Q17_ORACLE = """
WITH pa AS (
  SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN pa ON l.l_partkey = pa.l_partkey
WHERE p.p_brand = 'Brand#12' AND l.l_quantity < pa.half_avg
"""


# --------------------------------------------------------------------------
# emb_top_pairs — exact most-similar embedding pairs: all-pairs cosine
# (a.vec_id < b.vec_id) ranked descending, top 15. The exact baseline
# the LSH path (operators/similarity.lsh_near_pairs) approximates;
# the testdata plants no >0.9 duplicates, so a threshold query would
# be vacuous — ranking keeps the oracle discriminating.
# Both engines reduce the dot product sequentially over array<double>,
# so sims agree bitwise; ordering happens on full precision, rounding
# (6dp) only in the final projection.
# Scale: O(n²) — correct at verification scale only. At 100 TB the
# same ranking runs over LSH/IVF candidate buckets (X6/X8), not the
# cross product.
# --------------------------------------------------------------------------


def emb_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dot_col

    _utc(spark)
    # Norms are precomputed per vector (n sqrt-dots, not 2 per pair) and
    # the streamed side is repartitioned: the single-file scan would
    # otherwise stream the whole cross product through one task.
    n_parts = spark.sparkContext.defaultParallelism
    emb = (
        load(spark, sf_dir, "embeddings")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .withColumn("__n", F.sqrt(dot_col(F.col("embedding"), F.col("embedding"))))
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("__ea"), F.col("__n").alias("__na")
    ).repartition(n_parts, "vec_a")
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("__eb"), F.col("__n").alias("__nb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sims = pairs.withColumn(
        "_sim", dot_col(F.col("__ea"), F.col("__eb")) / (F.col("__na") * F.col("__nb"))
    )
    return (
        sims.orderBy(F.col("_sim").desc(), F.col("vec_a"), F.col("vec_b"))
        .limit(15)
        .select("vec_a", "vec_b", F.round("_sim", 6).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# emb_lsh_pairs — the SCALE path for all-pairs near-duplicate detection
# over embeddings (operators/similarity.lsh_near_pairs), gated end-to-end.
# The raw testdata plants no >=0.9-cosine pairs (max natural pair sim is
# ~0.51 at sf0.01), so the query plants its own: every 20th vector gets
# a collinear twin (embedding * 1.5, vec_id + 1_000_000). Scaling
# preserves direction exactly, so each twin pair has cosine 1.0 and —
# because sign-LSH buckets by dot-product signs — collides in EVERY
# band deterministically: recall is 1 by construction, precision is 1
# because candidates are exact-verified. The oracle is the exact
# all-pairs computation over the same planted corpus; both engines
# fold the dot product sequentially over array<double>, so the rounded
# similarity agrees bitwise.
# Scale: banded explode (8 rows/vector), hash shuffle on (band,
# bucket), bucket-local self-join — the cross product never
# materializes, unlike the oracle twin emb_top_pairs (demoted to
# non-headline: its O(n²) plan exists only to verify this one).
# --------------------------------------------------------------------------


def emb_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_near_pairs

    _utc(spark)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    twins = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    corpus = emb.unionByName(twins)
    pairs = lsh_near_pairs(corpus, dim=64, threshold=0.9)
    return pairs.select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    ).orderBy("id_a", "id_b")


EMB_LSH_PAIRS_ORACLE = """
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.5) AS embedding
  FROM embeddings WHERE vec_id % 20 = 0
)
SELECT id_a, id_b, round(sim, 6) AS cos_sim
FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.embedding, b.embedding)
           / (sqrt(list_dot_product(a.embedding, a.embedding))
              * sqrt(list_dot_product(b.embedding, b.embedding))) AS sim
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
)
WHERE sim >= 0.9
ORDER BY id_a, id_b
"""


EMB_TOP_PAIRS_ORACLE = """
SELECT vec_a, vec_b, round(sim, 6) AS cos_sim
FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
ORDER BY sim DESC, vec_a, vec_b
LIMIT 15
"""


# --------------------------------------------------------------------------
# cust_retention_setops — INTERSECT / EXCEPT (§2.5 beyond U1 union):
# customers active in both 1995 and 1996 (retained) vs active in 1995
# only (lost), counted per nation. Spark plans INTERSECT as a
# left-semi and EXCEPT as a left-anti over the distinct key sets —
# both hash-partitioned on o_custkey, no row-level set materialized.
# Scale: the two year-slices shuffle once each on o_custkey; the
# customer join is AQE-broadcast under sf, SMJ co-partitioned above.
# --------------------------------------------------------------------------


def cust_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    orders = load(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    retained = y95.intersect(y96).withColumn("status", F.lit("retained"))
    # subtract == EXCEPT (set) semantics; exceptAll would only cancel
    # one 1996 occurrence per key, leaving repeat-1995 customers behind.
    lost = y95.subtract(y96).withColumn("status", F.lit("lost"))
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        retained.unionByName(lost)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_nationkey", "status")
        .agg(F.count("*").alias("n_cust"))
    )


CUST_RETENTION_ORACLE = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
     tagged AS (
       SELECT o_custkey, 'retained' AS status FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
       UNION ALL
       SELECT o_custkey, 'lost' AS status FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
     )
SELECT c.c_nationkey, t.status, count(*) AS n_cust
FROM tagged t JOIN customer c ON t.o_custkey = c.c_custkey
GROUP BY c.c_nationkey, t.status
"""


# --------------------------------------------------------------------------
# orders_metrics_unpivot — UNPIVOT (wide->long melt): per-priority
# aggregates unpivoted into (metric, value) rows. Spark's native
# ``unpivot`` is a zero-shuffle Expand over the aggregated (tiny)
# frame; the oracle is the standard UNION ALL formulation.
# Scale: the melt happens after aggregation — |priorities| x |metrics|
# rows — so the operator cost is nil at any input size.
# --------------------------------------------------------------------------


def orders_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("double").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )
    return agg.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "total_price", "avg_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


ORDERS_UNPIVOT_ORACLE = """
WITH agg AS (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS n_orders,
         round(sum(o_totalprice), 2) AS total_price,
         round(avg(o_totalprice), 2) AS avg_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM agg
UNION ALL
SELECT o_orderpriority, 'total_price' AS metric, total_price AS value FROM agg
UNION ALL
SELECT o_orderpriority, 'avg_price' AS metric, avg_price AS value FROM agg
"""


# --------------------------------------------------------------------------
# orders_quartile_bands — NTILE window (equi-height bucketing): price
# quartiles per priority with per-band count/min/max. The window order
# includes the unique o_orderkey tiebreaker so bucket boundaries are
# deterministic; both engines give earlier buckets the extra row when
# the partition doesn't divide evenly (SQL-standard ntile).
# Scale: one shuffle on the partition key; ntile is a streaming window
# (no frame buffering); the aggregate collapses to |priorities| x 4.
# --------------------------------------------------------------------------


def orders_quartile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("band_lo"),
            F.round(F.max("o_totalprice"), 2).alias("band_hi"),
        )
    )


ORDERS_QUARTILE_ORACLE = """
SELECT o_orderpriority, CAST(quartile AS INTEGER) AS quartile, count(*) AS n_orders,
       round(min(o_totalprice), 2) AS band_lo,
       round(max(o_totalprice), 2) AS band_hi
FROM (
  SELECT o_orderpriority, o_totalprice,
         ntile(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey) AS quartile
  FROM orders
)
GROUP BY o_orderpriority, quartile
"""


# --------------------------------------------------------------------------
# events_exclusive_errors — the TPC-H q21 optimizer shape (correlated
# EXISTS + NOT EXISTS against the SAME table under different aliases),
# the one shape the suite didn't exercise; testdata has no
# partsupp/receiptdate so the q21 analog runs on events: for each
# ERROR event, EXISTS another user's event on the same (props.k, day)
# — the item was genuinely shared — and NOT EXISTS another user's
# ERROR on that same (props.k, day) — so this user's errors are
# exclusively theirs. Count per user, top 20 (q21's s_name/numwait
# with LIMIT, one-to-one).
#
# Spark-first: the two correlated subqueries decorrelate to a
# LEFT SEMI and a LEFT ANTI join on the (k, day) equi-key with the
# user inequality as a residual condition — exactly the plan Catalyst
# builds for SQL EXISTS, expressed directly in the DataFrame API. The
# oracle is the LITERAL correlated SQL; DuckDB decorrelates it
# independently, so agreement pins the decorrelation semantics, not a
# shared rewrite.
# Scale: two shuffle joins on (k, day) — no per-row subquery
# execution, no cross product; the error side shrinks first (filter
# pushdown), and the distinct-key frames broadcast under AQE when
# small.
# --------------------------------------------------------------------------


def events_exclusive_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    ev = load(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.get_json_object(F.col("props"), "$.k").alias("__k"),
        F.col("ts").cast("date").alias("__day"),
    )
    e1 = keyed.filter(F.col("event_type") == "error")
    e2 = keyed.select(
        F.col("__k").alias("k2"), F.col("__day").alias("d2"), F.col("user_id").alias("u2")
    )
    e3 = keyed.filter(F.col("event_type") == "error").select(
        F.col("__k").alias("k3"), F.col("__day").alias("d3"), F.col("user_id").alias("u3")
    )
    blamed = e1.join(
        e2,
        (e1["__k"] == e2["k2"]) & (e1["__day"] == e2["d2"]) & (e1["user_id"] != e2["u2"]),
        "leftsemi",
    ).join(
        e3,
        (F.col("__k") == e3["k3"])
        & (F.col("__day") == e3["d3"])
        & (F.col("user_id") != e3["u3"]),
        "left_anti",
    )
    return (
        blamed.groupBy("user_id")
        .agg(F.count("*").alias("n_exclusive_errors"))
        .orderBy(F.col("n_exclusive_errors").desc(), "user_id")
        .limit(20)
    )


EVENTS_EXCLUSIVE_ERRORS_ORACLE = """
SELECT e1.user_id, count(*) AS n_exclusive_errors
FROM events e1
WHERE e1.event_type = 'error'
  AND EXISTS (
    SELECT 1 FROM events e2
    WHERE json_extract_string(e2.props, '$.k') = json_extract_string(e1.props, '$.k')
      AND CAST(e2.ts AS DATE) = CAST(e1.ts AS DATE)
      AND e2.user_id <> e1.user_id)
  AND NOT EXISTS (
    SELECT 1 FROM events e3
    WHERE e3.event_type = 'error'
      AND json_extract_string(e3.props, '$.k') = json_extract_string(e1.props, '$.k')
      AND CAST(e3.ts AS DATE) = CAST(e1.ts AS DATE)
      AND e3.user_id <> e1.user_id)
GROUP BY e1.user_id
ORDER BY n_exclusive_errors DESC, user_id
LIMIT 20
"""


ANALYTICS_QUERIES: list[QueryDef] = [
    QueryDef("q13_cust_distribution", q13_cust_distribution, Q13_ORACLE),
    QueryDef("q22_idle_balance", q22_idle_balance, Q22_ORACLE, headline=False),
    QueryDef("q16_brand_type_suppliers", q16_brand_type_suppliers, Q16_ORACLE),
    QueryDef("q2_min_price_supplier", q2_min_price_supplier, Q2_ORACLE),
    QueryDef("q4_late_shipment_exists", q4_late_shipment_exists, Q4_ORACLE),
    QueryDef(
        "q21_waiting_supplier", q21_waiting_supplier, Q21_ORACLE,
        headline=False,
    ),
    QueryDef("q10_returned_items", q10_returned_items, Q10_ORACLE),
    QueryDef("q12_shipmode_priority", q12_shipmode_priority, Q12_ORACLE),
    QueryDef("q19_disjunctive_pred", q19_disjunctive_pred, Q19_ORACLE),
    QueryDef("q7_nation_volume", q7_nation_volume, Q7_ORACLE),
    QueryDef("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE, headline=False),
    QueryDef("q8_market_share", q8_market_share, Q8_ORACLE),
    QueryDef("q9_product_profit", q9_product_profit, Q9_ORACLE),
    QueryDef("q15_top_supplier", q15_top_supplier, Q15_ORACLE, headline=False),
    QueryDef("q17_small_quantity", q17_small_quantity, Q17_ORACLE),
    QueryDef("emb_lsh_pairs", emb_lsh_pairs, EMB_LSH_PAIRS_ORACLE),
    # Oracle twin of emb_lsh_pairs: O(n²) cartesian ranking, correct at
    # verification scale only — excluded from the headline bench so no
    # benchmarked plan carries a cross product.
    QueryDef("emb_top_pairs", emb_top_pairs, EMB_TOP_PAIRS_ORACLE, headline=False),
    QueryDef("cust_retention_setops", cust_retention_setops, CUST_RETENTION_ORACLE),
    QueryDef("orders_metrics_unpivot", orders_metrics_unpivot, ORDERS_UNPIVOT_ORACLE),
    QueryDef("orders_quartile_bands", orders_quartile_bands, ORDERS_QUARTILE_ORACLE, headline=False),
    QueryDef("orders_price_percentiles", orders_price_percentiles, ORDERS_PCTL_ORACLE),
    QueryDef("customer_name_features", customer_name_features, CUST_NAME_ORACLE, headline=False),
    QueryDef("emb_batch_knn", emb_batch_knn, EMB_BATCH_KNN_ORACLE),
    QueryDef("emb_ivf_batch_knn", emb_ivf_batch_knn, EMB_IVF_BATCH_KNN_ORACLE),
    QueryDef("customer_pii_masked", customer_pii_masked, CUSTOMER_PII_ORACLE),
    QueryDef("events_asof_purchase", events_asof_purchase, EVENTS_ASOF_ORACLE),
    QueryDef("events_click_purchase_attrib", events_click_purchase_attrib, EVENTS_ATTRIB_ORACLE),
    QueryDef("events_props_json", events_props_json, EVENTS_PROPS_JSON_ORACLE),
    QueryDef("events_rolling_stats", events_rolling_stats, EVENTS_ROLLING_ORACLE),
    QueryDef(
        "events_time_range_rolling", events_time_range_rolling, EVENTS_TIME_RANGE_ORACLE
    ),
    QueryDef("orders_pivot_by_priority", orders_pivot_by_priority, ORDERS_PIVOT_ORACLE),
    QueryDef("events_sessionization", events_sessionization, EVENTS_SESSION_ORACLE),
    QueryDef(
        "events_exclusive_errors", events_exclusive_errors, EVENTS_EXCLUSIVE_ERRORS_ORACLE
    ),
    QueryDef("events_influence_reach", events_influence_reach, EVENTS_REACH_ORACLE),
    QueryDef("customer_churn_predict", customer_churn_predict, CHURN_PREDICT_ORACLE, headline=False),
]

# Self-register (covers the analytics-imported-first order; see
# testdata_queries._register_extensions for the other order).
from .testdata_queries import QUERIES  # noqa: E402

for _q in ANALYTICS_QUERIES:
    QUERIES[_q.name] = _q
