"""Product quantization (PQ) for embedding columns — the
memory-compression ANN path beside IVF's list pruning (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
faiss ``IndexPQ`` / ``IndexIVFPQ`` design).

A d-dim float vector (256 bytes at d=64 float32) compresses to ``m``
one-byte codes (8 bytes at m=8): each of the ``m`` subspaces of
``d/m`` dims gets its own 256-centroid codebook, and the vector stores
only the per-subspace nearest-centroid ids. At 100 TB this is the
difference between an ANN working set that fits executor memory and
one that does not — the full-precision vectors stay in cold storage
and are touched only by the optional exact re-rank of a few hundred
candidates.

Spark mapping, consistent with ``ann_ivf``:

- **Codebooks are driver-side metadata** (m x 256 x d/m floats,
  ~512 KB at d=64) trained by deterministic per-subspace Lloyd's on
  the same bounded hash-ordered sample as the IVF quantizer — size
  independent of corpus scale.
- **Encoding is one Arrow-batched pass**: per batch and subspace, a
  matmul+argmin against the subspace codebook; codes pack into a
  ``binary`` column of exactly ``m`` bytes per vector.
- **Search is asymmetric distance computation (ADC)**: the query
  builds an (m, 256) lookup table of exact subspace distances
  driver-side; scanning sums ``m`` table lookups per code — no float
  vector is read. Vectors are L2-normalized before encoding, so the
  approximate squared L2 is monotone with cosine
  (``cos = 1 - d2/2``) and results rank on ``cos_sim_approx``.
- **Exact re-rank** (``pq_topk(..., rerank=r)``) re-scores the top
  ``r`` ADC candidates with exact cosine from the full vectors — the
  standard IVFPQ+refine topology; the re-rank join touches only
  ``r`` rows.

Gates (tests/test_ann_pq.py): codes are deterministic and
layout-independent; ADC recall@10 against exact brute force clears a
floor on the real embeddings table; with re-rank the top-k is exact
for every probed query; compression is byte-exact m bytes/vector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double_vec, cosine_similarity_col


def _normalize(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return x / norms


def _lloyd(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd's: seeds = first k rows (callers pass
    hash-ordered samples), empty clusters keep their centroid.

    The update step computes every cluster's member sum/count with one
    ``bincount`` per dimension instead of k boolean-mask + ``mean``
    calls: the per-cluster loop was pure numpy dispatch overhead —
    256 clusters x 8 subspaces x 8 iterations = 16k masked means,
    ~1 s of single-threaded driver time at sf0.1 and growing with
    ``k x m x iters`` everywhere (r17; now ~50 ms). Still fully
    deterministic and layout-independent (bincount accumulates in
    ascending row order of the hash-ordered sample). Centroid floats
    can differ from the old per-cluster ``mean`` in the last ulp
    (sequential vs pairwise summation); every exactness-gated consumer
    re-ranks its shortlist exhaustively with exact cosine, so gated
    outputs are invariant to codebook ulps, and the ADC recall floor
    is pinned by tests/test_ann_pq.py."""
    k = min(k, len(x))
    dim = x.shape[1]
    # Callers slice subspaces out of a wider sample matrix, so x
    # arrives strided; a contiguous copy makes the per-iteration
    # matmul use the fast BLAS path.
    x = np.ascontiguousarray(x)
    centroids = x[:k].copy()
    score = np.empty((len(x), k))
    for _ in range(iters):
        # argmin_c |x - c|^2 == argmin_c (|c|^2 - 2 x.c): the |x|^2
        # row-constant term cannot change the winner, so it is not
        # computed (one fewer 2 MB temp per iteration). The score
        # buffer is written in place (matmul out= + scale + add):
        # |c|^2 + (-2 * x.c) is the same IEEE sum as before, so the
        # centroids stay bit-identical while the n*k temporaries
        # drop from 3 per iteration to 0.
        np.matmul(x, centroids.T, out=score)
        score *= -2.0
        score += (centroids * centroids).sum(axis=1)[None, :]
        assign = score.argmin(axis=1)
        counts = np.bincount(assign, minlength=k)
        sums = np.stack(
            [
                np.bincount(assign, weights=x[:, j], minlength=k)
                for j in range(dim)
            ],
            axis=1,
        )
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def train_pq(
    df: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 8,
    sample_limit: int = 4096,
) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks (each up to 256 centroids of
    d/m dims) on the bounded hash-ordered sample — deterministic and
    layout-independent like ``ann_ivf.train_centroids``. Returns
    ``codebooks[m][256][d/m]`` (fewer centroids when the sample is
    smaller than 256)."""
    d = as_double_vec(df.select(id_col, vec_col), vec_col)
    rows = (
        d.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_limit)
        .select(vec_col)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train PQ codebooks on an empty table")
    x = _normalize(np.asarray([r[0] for r in rows], dtype=np.float64))
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"vector dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    return [
        [[float(v) for v in row] for row in _lloyd(x[:, j * sub : (j + 1) * sub], 256, iters)]
        for j in range(m)
    ]


def encode_pq(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Attach the ``m``-byte PQ code as a ``binary`` column: per Arrow
    batch and subspace, one matmul+argmin against the subspace
    codebook over the L2-normalized vector."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]

    @F.pandas_udf("binary")
    def code(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = _normalize(np.vstack(vecs.to_numpy()))
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j, cb in enumerate(books):
            xs = x[:, j * sub : (j + 1) * sub]
            d2 = (
                (xs * xs).sum(axis=1, keepdims=True)
                - 2.0 * (xs @ cb.T)
                + (cb * cb).sum(axis=1)[None, :]
            )
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return pd.Series([c.tobytes() for c in codes])

    return as_double_vec(df, vec_col).withColumn(out_col, code(F.col(vec_col)))


def pq_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    rerank: int | str = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Top-k by asymmetric distance: the query's exact per-subspace
    distance table (m x 256 floats, driver-built) closes over an
    Arrow-batched UDF that sums m byte-indexed lookups per code.
    Returns (id, cos_sim_approx) ranked descending; with
    ``rerank=r > 0`` the top r ADC candidates are re-scored with exact
    cosine from the full vectors and the result carries (id, cos_sim)
    — identical schema family to ``ivf_topk``.

    ``rerank="all"`` is the exactness-gate setting: the shortlist is
    the whole corpus BY CONSTRUCTION, so the ADC ordering step is
    skipped outright and the exact re-rank plans as a per-partition
    top-k (TakeOrderedAndProject). The r17 formulation smuggled the
    same semantics through ``rerank=INT_MAX``, which exceeds
    ``spark.sql.execution.topKSortFallbackThreshold`` and planned as
    Exchange SinglePartition + full Sort + GlobalLimit — a single-task
    full-corpus sort (r18 advisory). The re-rank's trailing
    ``cos_sim_approx`` sort key is semantically inert ((cos_sim, id)
    is already a total order — ids are unique) but keeps the ADC stage
    in the plan, which is the machinery the gate exists to prove;
    without the reference, column pruning would drop the ADC and
    encode stages and the gate would degenerate to brute force."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn:
        q = q / qn
    # table[j][c] = |q_j - centroid_c|^2 in subspace j (exact on the
    # query side — the "asymmetric" in ADC).
    table = np.stack(
        [
            ((q[j * sub : (j + 1) * sub][None, :] - cb) ** 2).sum(axis=1)
            for j, cb in enumerate(books)
        ]
    )

    @F.pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=float)
        c = np.frombuffer(b"".join(codes.to_numpy()), dtype=np.uint8).reshape(-1, m)
        d2 = table[np.arange(m)[None, :], c].sum(axis=1)
        return pd.Series(1.0 - d2 / 2.0)  # normalized vectors: cos = 1 - d2/2

    scored = encoded.withColumn("cos_sim_approx", adc(F.col(code_col)))
    if rerank == "all":
        qcol = F.array(*[F.lit(float(v)) for v in query_vec])
        return (
            scored.withColumn(
                "cos_sim", cosine_similarity_col(F.col(vec_col), qcol)
            )
            .orderBy(
                F.col("cos_sim").desc(), F.col(id_col), F.col("cos_sim_approx")
            )
            .limit(k)
            .select(id_col, "cos_sim")
        )
    if isinstance(rerank, str):
        raise ValueError(f"rerank must be an int or 'all', got {rerank!r}")
    approx = scored.orderBy(F.col("cos_sim_approx").desc(), F.col(id_col)).limit(
        max(k, rerank)
    )
    if rerank <= 0:
        return approx.select(id_col, "cos_sim_approx")
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        approx.withColumn("cos_sim", cosine_similarity_col(F.col(vec_col), qcol))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "cos_sim")
    )
