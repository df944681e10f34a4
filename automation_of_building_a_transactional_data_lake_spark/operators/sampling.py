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


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    total_rows: int,
    key_col: str = "text",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Compose a ~``total_rows`` training mix with domain proportions
    ``weights`` (normalized over the dict), UP- or DOWN-sampling each
    domain as needed — the data-MIXING step of an LLM pipeline
    (DoReMi-style static domain weights): a scarce domain repeats for
    whole EPOCHS plus a hash-thresholded fractional tail, an abundant
    one downsamples, so ``weights`` holds even when the natural corpus
    mix doesn't. Unlike ``stratified_sample`` (fractions <= 1, keep
    subsets) this op REPLICATES: the output carries ``epoch_col``
    (1-based copy index) so downstream packing/shuffling can tell
    copies apart.

    Replication and selection are pure functions of (record, policy):
    per-domain rate = weight-share x total_rows / domain count; whole
    copies materialize via ``explode(sequence(1, n))`` (no UDF), the
    fractional epoch keeps rows whose md5 bucket clears the remainder
    threshold — the same portable hash as ``with_split``, so the whole
    mix replays exactly on any engine. Domains absent from ``weights``
    drop; a weighted domain absent from the data contributes nothing
    (the realized total shrinks honestly, never re-normalizes onto
    other domains).

    Scale: ONE groupBy-count on the domain column (O(domains) rows to
    the driver — corpus mixes are dozens of domains); after that the
    policy is two literal-map lookups + one hash per row, no join, no
    shuffle. Per-domain realized counts are binomial around target
    (the hash threshold quantizes to 1/65536) — the contract is exact
    SELECTION, not exact counts."""
    from fractions import Fraction

    if total_rows <= 0:
        raise ValueError(f"total_rows must be positive, got {total_rows}")
    for d, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for domain {d!r} must be >= 0, got {w}")
    # Policy arithmetic in EXACT rationals (Fraction(str(w)) reads a
    # float weight as its decimal literal): the per-domain copy count
    # and tail threshold are integers any engine re-derives exactly —
    # integer weights make the whole policy plain BIGINT arithmetic in
    # SQL (floor((w*total)/(wsum*n)) and the 1/65536-quantized
    # remainder), so an oracle never drifts a boundary by one ulp.
    wfr = {d: Fraction(str(w)) for d, w in weights.items()}
    wsum = sum(wfr.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).count().collect()
        if r[0] is not None
    }
    policy = {}
    for d, w in wfr.items():
        n = counts.get(d)
        if w > 0 and n:
            rate = w * total_rows / (wsum * n)
            copies = int(rate)
            policy[d] = (copies, int((rate - copies) * _BUCKETS))
    if not policy:
        return df.filter(F.lit(False)).withColumn(epoch_col, F.lit(1))
    copies_map = F.create_map(
        *[F.lit(x) for d, (c, _t) in sorted(policy.items()) for x in (d, c)]
    )
    tail_map = F.create_map(
        *[F.lit(x) for d, (_c, t) in sorted(policy.items()) for x in (d, t)]
    )
    bucket = md5_bucket_col(F.col(key_col))
    upper = copies_map[F.col(domain_col)] + F.when(
        bucket < tail_map[F.col(domain_col)], F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("__mix_n", upper)
        # sequence(1, 0) would generate DESCENDING [1, 0]: guard first.
        .filter(F.col("__mix_n") >= 1)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(1), F.col("__mix_n"))))
        .drop("__mix_n")
    )
