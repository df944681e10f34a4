"""Product-quantization ANN gates: deterministic layout-independent
codes, byte-exact compression, an ADC recall floor against exact brute
force on the real embeddings, and exact top-k under re-rank."""

import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.operators.ann_ivf import (
    recall_at_k,
)
from automation_of_building_a_transactional_data_lake_spark.operators.ann_pq import (
    encode_pq,
    pq_topk,
    train_pq,
)
from automation_of_building_a_transactional_data_lake_spark.operators.similarity import (
    as_double_vec,
    cosine_similarity_col,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebooks(spark, emb):
    return train_pq(emb, m=8)


def _exact_topk(emb, qvec, k=10):
    qcol = F.array(*[F.lit(float(v)) for v in qvec])
    return [
        r.vec_id
        for r in as_double_vec(emb, "embedding")
        .filter(F.col("vec_id") != 0)
        .withColumn("s", cosine_similarity_col(F.col("embedding"), qcol))
        .orderBy(F.col("s").desc(), F.col("vec_id"))
        .limit(k)
        .collect()
    ]


def test_pq_codes_are_m_bytes_and_layout_independent(spark, emb, codebooks):
    enc = encode_pq(emb, codebooks).select("vec_id", "pq_code")
    rows = {r.vec_id: bytes(r.pq_code) for r in enc.collect()}
    assert all(len(c) == 8 for c in rows.values())  # m=8 bytes vs 256+ raw
    # same codes whatever the partitioning
    reparted = encode_pq(emb.repartition(7), codebooks).select("vec_id", "pq_code")
    assert {r.vec_id: bytes(r.pq_code) for r in reparted.collect()} == rows


def test_pq_adc_recall_floor(spark, emb, codebooks):
    """Raw ADC (no re-rank, no full vectors read) must keep a usable
    recall@10 against exact brute force across several probe queries."""
    enc = encode_pq(emb, codebooks)
    queries = [r[0] for r in emb.filter(F.col("vec_id").isin(0, 1, 2)).select("embedding").collect()]
    recalls = []
    for qvec in queries:
        got = [
            r.vec_id
            for r in pq_topk(enc.filter(F.col("vec_id") != 0), codebooks, list(qvec), k=10).collect()
        ]
        recalls.append(recall_at_k(got, _exact_topk(emb, qvec)))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_pq_rerank_recovers_exact_topk(spark, emb, codebooks):
    """ADC shortlist + exact re-rank of 100 candidates must return the
    exact brute-force top-10 (the IVFPQ+refine contract) — and the
    re-ranked scores are the true cosines."""
    enc = encode_pq(emb, codebooks)
    qvec = [r[0] for r in emb.filter(F.col("vec_id") == 0).select("embedding").collect()][0]
    got = pq_topk(
        enc.filter(F.col("vec_id") != 0), codebooks, list(qvec), k=10, rerank=100
    ).collect()
    assert [r.vec_id for r in got] == _exact_topk(emb, qvec)


def test_pq_rejects_indivisible_dim(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(emb, m=7)
