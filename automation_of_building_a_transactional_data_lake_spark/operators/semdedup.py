"""Semantic deduplication — cluster-scoped embedding-space corpus
pruning (the SemDeDup shape: Abbas et al. 2023, arXiv:2303.09540 —
k-means the corpus, then prune near-duplicates WITHIN each cluster so
the quadratic pair search never spans the whole corpus).

Spark-first: centroid assignment is a broadcast cross-join + ranking
window (centroids are few by construction); the pair search is a
self-join keyed on the cluster id — the shuffle key IS the clustering,
so each cluster's quadratic work stays inside its own partitions and
the 100-TB cost is sum-of-squares over clusters, not corpus². Cosine
is the codegen'd higher-order-function expression the ANN family
shares (``operators/similarity``) — no UDF anywhere.

The keep rule is deterministic "keep-first": a vector drops iff a
LOWER-ID vector in the same cluster is within ``threshold`` cosine.
Deliberately non-transitive (NOT EXISTS semantics, exactly
re-expressible in SQL): if a~b and b~c but not a~c, then b drops for
a, and c drops only if it is close to a surviving OR dropped lower-id
neighbor — the decision depends only on pairs, never on the drop
set, so it is order-free and embarrassingly parallel.

Reference analogue: the reference's curation is SQL-side feature prep
(src/sample_redshift_ml_sql_query.txt:54-73); semantic dedup is the
embedding-space step a pre-training corpus adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import cosine_similarity_col

__all__ = ["assign_clusters", "semantic_dedup"]


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "c_id",
    centroid_vec_col: str = "c_vec",
) -> DataFrame:
    """Nearest-centroid assignment by cosine (ties break toward the
    LOWEST centroid id — deterministic): appends ``cluster`` to every
    input row. Centroids broadcast (they are few by construction);
    the argmax is a ranking window over the scored cross-join."""
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine_similarity_col(F.col(vec_col), F.col(centroid_vec_col))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col(centroid_id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn("cluster", F.col(centroid_id_col))
        .drop("__sim", "__rn", centroid_id_col, centroid_vec_col)
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Prune the corpus: drop every vector with a LOWER-ID neighbor at
    cosine >= ``threshold`` in the same cluster. With ``centroids``
    (columns ``c_id``, ``c_vec``) the pair search is cluster-scoped —
    the SemDeDup scale path; without, one global cluster (exact but
    quadratic — the oracle/baseline setting). Returns the surviving
    rows with their ``cluster`` column attached."""
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be a cosine in [-1, 1], got {threshold}")
    if centroids is not None:
        assigned = assign_clusters(
            df, centroids, id_col=id_col, vec_col=vec_col
        )
    else:
        assigned = df.withColumn("cluster", F.lit(0))
    left = assigned.select(
        F.col("cluster").alias("__cl"),
        F.col(id_col).alias("__lid"),
        F.col(vec_col).alias("__lvec"),
    )
    # ONE anti-join states the whole rule (NOT EXISTS a lower-id
    # close neighbor). Both sides shuffle on the cluster id alone;
    # the id inequality and cosine threshold evaluate inside the
    # joined partitions, so each cluster's quadratic work never
    # leaves its executor group.
    return assigned.join(
        left,
        (F.col("cluster") == F.col("__cl"))
        & (F.col("__lid") < F.col(id_col))
        & (
            cosine_similarity_col(F.col("__lvec"), F.col(vec_col))
            >= F.lit(float(threshold))
        ),
        "left_anti",
    )
