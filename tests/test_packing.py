"""operators.packing — greedy context-window sequence packing.

The driver gate (docs_pack_sequences) pins the fold against a DuckDB
recursive-CTE restatement; these tests pin the operator's CONTRACT:
capacity is respected (except oversize singleton bins), assignment is
a pure function of the data (layout-independent), and the precomputed
token-count path agrees with the derived one.
"""

import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


def _packed(spark, rows, capacity, n_buckets=2, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return pack_sequences(df, capacity=capacity, n_buckets=n_buckets, **kw)


def test_capacity_respected_and_oversize_isolated(spark):
    rows = [
        (0, "a b c"),          # 3 tokens, bucket 0
        (2, "d e"),            # 2 tokens, bucket 0
        (4, " ".join(["x"] * 10)),  # 10 tokens: OVERSIZE for cap 4
        (6, "f"),              # 1 token, bucket 0
        (1, "g h i j"),        # 4 tokens, bucket 1 (exactly full)
        (3, "k"),              # bucket 1, must open bin 1
    ]
    out = _packed(spark, rows, capacity=4).collect()
    by_id = {r.doc_id: r for r in out}
    # bucket 0 in id order: 3 -> bin 0; 2 would make 5 > 4 -> bin 1;
    # 10 oversize -> bin 2 alone; 1 -> bin 3 (2's bin is... fill=2,
    # then oversize opened bin 2 with fill 10, so f opens bin 3).
    assert by_id[0].bin == 0 and by_id[2].bin == 1
    assert by_id[4].bin == 2 and by_id[4].n_tokens == 10
    assert by_id[6].bin == 3
    assert by_id[1].bin == 0 and by_id[3].bin == 1  # bucket 1
    # No multi-doc bin exceeds capacity.
    stats = packing_stats(
        _packed(spark, rows, capacity=4), capacity=4
    ).collect()
    for s in stats:
        assert s.n_docs == 1 or s.sum_tokens <= 4
    # The exactly-full bin wastes nothing.
    full = [s for s in stats if s.bucket == 1 and s.bin == 0][0]
    assert full.sum_tokens == 4 and full.padding_frac == 0.0


def test_layout_independence(spark):
    rows = [(i, " ".join(["t"] * (i % 7 + 1))) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        (r.doc_id, r.bucket, r.bin)
        for r in pack_sequences(df, capacity=10, n_buckets=4).collect()
    )
    b = sorted(
        (r.doc_id, r.bucket, r.bin)
        for r in pack_sequences(
            df.repartition(13), capacity=10, n_buckets=4
        ).collect()
    )
    assert a == b


def test_precomputed_token_count_column(spark):
    rows = [(i, " ".join(["w"] * (i + 1))) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "tc", F.size(F.split("text", r"\s+"))
    )
    a = sorted(
        (r.doc_id, r.bin)
        for r in pack_sequences(df, capacity=6, n_buckets=1).collect()
    )
    b = sorted(
        (r.doc_id, r.bin)
        for r in pack_sequences(
            df, capacity=6, n_buckets=1, token_count_col="tc"
        ).collect()
    )
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(df, capacity=0)
    with pytest.raises(ValueError, match="n_buckets"):
        pack_sequences(df, capacity=5, n_buckets=0)
