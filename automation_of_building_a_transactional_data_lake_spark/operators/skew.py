"""Skew mitigation operators.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on in ``SessionFactory``) handles most sort-merge skew at runtime.
Salting remains the right tool in the two places AQE can't help:

- a **shuffled join against a replicable side** where one key carries a
  disproportionate share of rows (AQE splits oversized partitions, but
  a single monster key still lands in one task pair) — ``salted_join``
  replicates the small side per salt so the monster key fans out;
- **exact distinct counting under group skew** — ``salted_distinct_count``
  runs the classic two-phase (key, salt) partial then final reduction.

Both are pure DataFrame transformations with deterministic salting
(hash-modulo, no RNG) and equal their unsalted equivalents exactly —
unit tests pin that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s hot keys would otherwise serialize into
    single tasks: ``big`` rows get a deterministic salt in [0, n_salts)
    (hash of the full row spread via a second column when present — here
    a per-row pseudo-salt from ``monotonically_increasing_id`` would
    break determinism, so we hash the key AND a partition-local index
    surrogate: ``spark_partition_id`` is execution-dependent, also out;
    the stable choice is hashing all of big's columns), and ``small``
    is replicated once per salt value. The join key becomes
    (key, salt): the hot key's rows spread across ``n_salts`` tasks.

    Cost model: replicates ``small`` n_salts times — use when ``small``
    is broadcast-scale but the join must shuffle anyway (e.g. the big
    side's aggregation state exceeds broadcast thresholds), or as the
    deterministic fallback when AQE skew-split is unavailable.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int")
    big_s = big.withColumn("__salt", salt)
    # explode must be a top-level select expression (generators can't
    # nest inside casts); sequence(int, int) yields ints to match.
    small_s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    joined = big_s.join(small_s, [key, "__salt"], how)
    return joined.drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    count_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT count_col) per group, two-phase: partial
    distinct within (group, salt-of-value) — the skewed group's state
    spreads over ``n_salts`` reducers — then a final sum per group.
    Equivalent to the direct aggregate (each distinct value lands in
    exactly one salt bucket); at scale the first phase bounds any one
    task's hash-set size to ~1/n_salts of the group's distincts.
    Returns (group_col, n_distinct)."""
    salt = F.pmod(F.xxhash64(F.col(count_col)), F.lit(n_salts))
    partial = (
        df.select(group_col, count_col)
        .withColumn("__salt", salt)
        .groupBy(group_col, "__salt")
        .agg(F.countDistinct(count_col).alias("__partial"))
    )
    return partial.groupBy(group_col).agg(F.sum("__partial").alias("n_distinct"))
