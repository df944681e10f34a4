"""Similarity search over embedding columns (``array<float>``).

Not in the reference's surface — added as a first-class training-data
pipeline operator. Two strategies:

- ``brute_force_topk``: exact cosine top-k. The query side broadcasts;
  similarity is a whole-stage-codegen'd higher-order-function
  expression (``zip_with`` + ``aggregate``) — no Python in the hot
  path. Correct baseline at any scale where candidates x queries is
  scannable.
- ``lsh_bucket_join`` (random-hyperplane LSH): each vector hashes to a
  signed bit-signature; candidate pairs only form within a bucket, so
  the cross product never materializes. The scale path for
  all-pairs / many-query workloads.

All math is done in ``double``; callers should round only for display.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<double> columns, evaluated
    JVM-side via higher-order functions (sequential left fold — bit-
    stable across runs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def as_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def brute_force_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``vectors`` against a single-row ``query``
    DataFrame. Returns (id_col, cos_sim) ordered desc with a unique
    tiebreaker.

    Plan shape at scale: broadcast nested-loop join of the 1-row query
    against the vector scan, then TakeOrderedAndProject — one pass over
    the data, no global sort.
    """
    qcol = query_vec_col or vec_col
    q = as_double_vec(query.select(F.col(qcol).alias("__q")), "__q")
    cand = as_double_vec(vectors, vec_col)
    sims = cand.crossJoin(F.broadcast(q)).withColumn(
        "cos_sim", cosine_similarity_col(F.col(vec_col), F.col("__q"))
    )
    return (
        sims.orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "cos_sim")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-based, no numpy on
    executors needed — generated driver-side, shipped as literals)."""
    state = seed & 0x7FFFFFFF
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append((state / float(2**31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def with_lsh_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane (sign) LSH: bucket id = bit-packed signs of
    plane dot products. Cosine-similar vectors collide with high
    probability. Pure built-in expressions (arrays_zip/aggregate).
    """
    d = as_double_vec(df, vec_col)
    dim = len(d.select(F.col(vec_col)).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        sign_bit = (dot_col(F.col(vec_col), plane_col) > 0).cast("long")
        bucket = bucket + (sign_bit * F.lit(2**i).cast("long"))
    return d.withColumn(out_col, bucket)


def lsh_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Approximate all-pairs cosine similarity ≥ threshold via LSH
    bucketing: self-join ONLY within buckets (shuffle on bucket id, no
    cross product), then exact cosine verify. Scale path for near-dup
    detection over embeddings at 100 TB: bucket count grows 2^n_planes,
    keeping per-bucket candidate sets tiny.
    """
    sig = with_lsh_signature(df, vec_col, n_planes, seed).select(
        F.col(id_col), F.col(vec_col), F.col("lsh_bucket")
    )
    left = sig.alias("a")
    right = sig.alias("b")
    pairs = left.join(
        right,
        (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    with_sim = pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        cosine_similarity_col(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cos_sim"),
    )
    return with_sim.filter(F.col("cos_sim") >= threshold)
