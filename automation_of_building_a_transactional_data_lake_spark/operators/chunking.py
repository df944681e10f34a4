"""Document chunking — fixed-size overlapping windows over a text
column, the intra-document half of training-data preparation
(``operators/packing.py`` packs whole documents into context windows
and explicitly leaves "intra-document chunking" to this step; RAG
indexing and long-document pretraining both need it).

Spark-first: the chunk count is one integer expression, chunk ids come
from ``explode(sequence(...))`` (the same epoch-replication shape
``mixture_resample`` uses), and the slice is a codegen'd ``substr`` —
no UDF, no driver loop, embarrassingly parallel over documents, so the
operator scales to a 100-TB corpus exactly as well as the scan does.

Reference analogue: the reference prepares text features row-wise in
SQL before ML (src/sample_redshift_ml_sql_query.txt:54-73); chunking
is the same row-local text transformation scaled to window extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    size: int = 200,
    overlap: int = 40,
) -> DataFrame:
    """Split ``text_col`` into overlapping character windows.

    Chunk ``i`` covers characters ``[i*stride, i*stride + size)`` with
    ``stride = size - overlap``; the final chunk may be shorter. The
    chunk count is ``1 + ceil(max(len - size, 0) / stride)`` — exactly
    enough windows to cover every character, with the last window
    starting before ``len`` whenever the text outgrows one chunk. An
    EMPTY string yields one empty chunk (the document still exists
    downstream); a NULL text yields no rows (nothing to chunk —
    ``explode`` of the null sequence drops the document, matching
    SQL's lateral-join semantics).

    Appends ``chunk_id`` (0-based), ``chunk`` and ``chunk_len`` to
    every input column. Character-based on purpose: byte/token budgets
    belong to the tokenizer (``docs_token_counts``); character windows
    are deterministic, language-agnostic and exactly reproducible in
    plain SQL, which is what makes the operator oracle-checkable.
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < size, got {overlap}"
        )
    if text_col not in df.columns:
        raise ValueError(f"no column {text_col!r} in the DataFrame")
    clobber = {"chunk_id", "chunk", "chunk_len"} & set(df.columns)
    if clobber:
        raise ValueError(
            f"input already carries {sorted(clobber)} — re-chunking "
            "chunked output would silently clobber them; rename or "
            "drop those columns first"
        )
    tq = "`" + text_col.replace("`", "``") + "`"
    stride = size - overlap
    n_chunks: Column = F.expr(
        f"1 + (greatest(length({tq}) - {size}, 0) + {stride - 1}) "
        f"div {stride}"
    )
    # greatest() ignores nulls, so the count expression alone would
    # give a NULL text one chunk; the explicit null gate makes explode
    # drop it instead (the documented lateral-join semantics).
    out = df.withColumn(
        "chunk_id",
        F.explode(
            F.when(
                F.col(text_col).isNotNull(),
                F.sequence(F.lit(0), (n_chunks - F.lit(1)).cast("int")),
            )
        ),
    )
    out = out.withColumn(
        "chunk", F.expr(f"substr({tq}, chunk_id * {stride} + 1, {size})")
    )
    return out.withColumn("chunk_len", F.length("chunk"))
