"""Deterministic, engine-portable sampling and train/test splitting.

Not in the reference's surface — a training-data-pipeline primitive.
``DataFrame.sample``/``randomSplit`` are seed-deterministic only within
one Spark version/partitioning: the assignment depends on partition
layout, so repartitioning (or another engine) re-shuffles rows across
splits. For corpus curation the split must be a pure function of the
RECORD, not of the physical plan: hash the content key, bucket the
hash, threshold the bucket.

md5 is the portable choice (identical in Spark, DuckDB, Python,
Postgres, ...); 16 bits of it (4 hex chars -> 0..65535) give a
per-record uniform bucket with plenty of resolution for split
fractions, while keeping the hex->int conversion inside built-in
expressions on every engine.

Scale: one hash + substring per row, no shuffle, no UDF — the split
column is free at 100 TB and stable across reruns, engines, and
repartitioning, which is what makes downstream eval/holdout honest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex chars of md5


def md5_bucket_col(key: Column) -> Column:
    """Uniform bucket 0..65535 as a pure function of the key's bytes."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")


def with_split(
    df: DataFrame,
    key_col: str = "text",
    train_frac: float = 0.8,
    out_col: str = "split",
) -> DataFrame:
    """Assign 'train'/'test' deterministically by content hash. Records
    with identical keys always land in the same split (no near-dup
    leakage across the boundary for exact dupes)."""
    if not 0.0 < train_frac < 1.0:
        raise ValueError(f"train_frac must be in (0,1), got {train_frac}")
    thresh = int(train_frac * _BUCKETS)
    bucket = md5_bucket_col(F.col(key_col))
    return df.withColumn(
        out_col, F.when(bucket < thresh, F.lit("train")).otherwise(F.lit("test"))
    )


def deterministic_sample(
    df: DataFrame, key_col: str, frac: float
) -> DataFrame:
    """Keep ~frac of rows, chosen by content hash — reproducible across
    runs, engines, and physical layout (unlike ``DataFrame.sample``)."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0,1], got {frac}")
    thresh = int(frac * _BUCKETS)
    return df.filter(md5_bucket_col(F.col(key_col)) < thresh)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str = "text",
    default_frac: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-MIX rebalancing
    step of a training pipeline (downsample boilerplate-heavy domains,
    keep all of a rare language): each stratum keeps ~its fraction of
    rows, chosen by the same portable content hash as ``with_split``,
    so membership is a pure function of (record, stratum policy) and
    survives reruns, engines, and repartitioning. Strata absent from
    ``fractions`` keep ``default_frac``.

    Scale: the policy compiles to a LITERAL map expression (per-row
    lookup + one hash, no join, no shuffle, no UDF) — a million-row
    policy would want a broadcast-join variant instead, but corpus
    mixes are dozens of strata. Fractions quantize to 1/65536 via the
    same integer thresholds on every engine."""
    for name, v in list(fractions.items()) + [("default_frac", default_frac)]:
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction {name!r} must be in [0,1], got {v}")
    mapping = F.create_map(
        *[
            F.lit(x)
            for k, v in sorted(fractions.items())
            for x in (k, int(v * _BUCKETS))
        ]
    )
    thresh = F.coalesce(
        mapping[F.col(stratum_col)], F.lit(int(default_frac * _BUCKETS))
    )
    return df.filter(md5_bucket_col(F.col(key_col)) < thresh)


def stratified_cap(
    df: DataFrame,
    stratum_col: str,
    max_rows: int,
    key_col: str = "text",
) -> DataFrame:
    """Keep AT MOST ``max_rows`` rows per stratum, chosen
    deterministically — the ABSOLUTE-cap twin of ``stratified_sample``'s
    fractions ("no domain contributes more than N documents",
    the long-tail-balancing move when head domains are orders of
    magnitude larger). Selection ranks rows inside each stratum by
    (content-hash bucket, key) — a pure function of the data, so the
    kept set survives reruns, engines, and repartitioning, and a
    stratum under the cap keeps everything.

    Plan: one ranking window per stratum (hash shuffle on the stratum
    key + in-partition sort) — and because the rank filter is a
    row_number <= N on the window's own order, Catalyst plans a
    Partial+Final ``WindowGroupLimit``: every map task keeps at most N
    rows per stratum BEFORE the shuffle, so the exchanged volume is
    O(strata x N x tasks), not O(rows) — the plan shape that makes an
    exact cap viable at 100 TB. For approximate caps at extreme skew,
    compose ``stratified_sample`` with measured per-stratum fractions
    instead (no sort)."""
    from pyspark.sql.window import Window

    if max_rows < 0:
        raise ValueError(f"max_rows must be >= 0, got {max_rows}")
    w = Window.partitionBy(stratum_col).orderBy(
        md5_bucket_col(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )
