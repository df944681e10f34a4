"""Sequence packing: greedy assignment of documents into fixed-size
context windows — the step that turns a curated corpus into training
batches (padding waste is the metric; packing multiple short documents
into one window is what every LLM data pipeline does before
tokenizer-side concatenation).

Not in the reference's surface — a training-data-pipeline primitive
(same family as sampling/dedup/decontamination).

Semantics: within each BUCKET (a hash stripe of the corpus), documents
are taken in deterministic id order and folded greedily — a document
joins the current bin while the bin's token total stays within
``capacity``, else it opens the next bin. A document larger than the
capacity gets a bin of its own (never split — document boundaries are
the packing unit here; intra-document chunking is the tokenizer's
job). Membership is a pure function of (bucket, id order, token
counts), so reruns, repartitioning, and other engines reproduce the
exact same bins.

Scale: packing is a SEQUENTIAL fold, so it cannot be one global window
function — but it parallelizes perfectly across buckets. The corpus
shuffles ONCE on the bucket key and each bucket folds inside an
Arrow-batched ``applyInPandas`` (numpy loop over ints, no per-row
Python object work); with buckets sized to executor memory
(``n_buckets`` ~ corpus_rows / 1e6 at 100 TB), the fold is
embarrassingly parallel and the only cost is the one shuffle every
grouped operator pays. Bin ids are globally unique as (bucket, bin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to (bucket, bin) under greedy packing.

    ``token_count_col`` names a precomputed count column; when None,
    counts derive from ``text_col`` as whitespace tokens (the same
    tokenization the text-stats family uses). Returns the input
    columns plus ``bucket``, ``bin`` (0-based within bucket) and
    ``n_tokens``."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if token_count_col is None:
        # Null text counts as an empty document (0 tokens), and the
        # coalesce also neutralizes legacy sizeOfNull=-1 semantics.
        n_tokens = F.coalesce(
            F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")),
            F.lit(0),
        )
        n_tokens = F.greatest(n_tokens, F.lit(0))
    else:
        n_tokens = F.col(token_count_col)
    base = df.withColumn("n_tokens", n_tokens.cast("long")).withColumn(
        "bucket", F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets)).cast("int")
    )
    from pyspark.sql.types import LongType, StructField, StructType

    # Fresh StructType: StructType.add mutates in place, and
    # DataFrame.schema is cached — extending it would corrupt `base`'s
    # own column list.
    out_schema = StructType(
        list(base.schema.fields) + [StructField("bin", LongType(), False)]
    )

    def _pack(pdf):
        import numpy as np

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        # A null or negative count would poison the fold silently (NaN
        # fill disables the capacity check forever; negatives shrink
        # it) — refuse loudly instead.
        if pdf["n_tokens"].isna().any():
            raise ValueError(
                "pack_sequences: null token counts in the batch "
                "(token_count_col carries nulls?) — clean or coalesce "
                "them upstream"
            )
        toks = pdf["n_tokens"].to_numpy()
        if (toks < 0).any():
            raise ValueError(
                "pack_sequences: negative token counts in the batch"
            )
        bins = np.zeros(len(toks), dtype=np.int64)
        cur_bin, fill = 0, 0
        for i, t in enumerate(toks):
            if fill > 0 and fill + t > capacity:
                cur_bin += 1
                fill = 0
            bins[i] = cur_bin
            fill += t
        pdf["bin"] = bins
        return pdf

    return base.groupBy("bucket").applyInPandas(_pack, out_schema)


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-(bucket, bin) accounting: document count, token total, and
    the padding fraction a fixed-``capacity`` window would waste —
    the number a data-pipeline owner actually tunes n_buckets/capacity
    against. Oversize single-document bins report fill > capacity
    (they truncate tokenizer-side; counting them as zero waste here
    would hide them)."""
    return (
        packed.groupBy("bucket", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .withColumn(
            "padding_frac",
            F.round(
                F.greatest(
                    F.lit(0.0),
                    1.0 - F.col("sum_tokens") / F.lit(float(capacity)),
                ),
                4,
            ),
        )
    )
