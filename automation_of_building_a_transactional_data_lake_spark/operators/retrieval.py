"""Text retrieval over the documents table: BM25 scoring.

Not in the reference's surface — a first-class training-data-pipeline
operator: corpus curation routinely ranks documents against probe
queries (topical filtering, eval-set mining, contamination checks), and
BM25 is the standard lexical ranker those pipelines start from.

Scale shape (100 TB): one explode + map-side-combined groupBy produces
per-(doc, term) frequencies — FILTERED TO THE QUERY TERMS before the
shuffle, so the shuffled volume is O(docs x |query|), not O(tokens);
document lengths ride the same tokenize pass; the per-term document
frequencies and the corpus aggregates (N, avgdl) are tiny frames that
broadcast. No UDFs anywhere — the score is a codegen'd expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for ``query`` under Okapi BM25
    (Robertson-Sparck Jones idf in the non-negative ``ln(1 + ...)``
    form Lucene uses):

        idf(t)  = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
        s(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Tokenization matches the engine's text operators (lowercased
    whitespace split). Deterministic tie-break on (score desc, id).
    Returns (id, bm25) with the score rounded to 4dp."""
    qterms = sorted({t for t in query.lower().split() if t})
    if not qterms:
        raise ValueError("query has no terms")

    # No pre-explode repartition here, deliberately: whitespace
    # tokenize is CHEAP per byte (unlike minhash shingling or trigram
    # slicing, where the X72 pre-shuffle pays for itself) — measured at
    # sf0.1, shuffling the raw text first costs more than the serial
    # scan it avoids. The two consumers (dl, qtf) re-run the light
    # explode rather than paying a materialization barrier.
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.lower(F.col(text_col)))).alias("__t")
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("__dl"))
    # Corpus aggregates as a broadcastable 1-row frame — no driver
    # collect in the plan (N and avgdl are the only scalars BM25 needs).
    corpus = dl.agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )

    qtf = (
        toks.filter(F.col("__t").isin(qterms))  # prune BEFORE the shuffle
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = qtf.groupBy("__t").agg(F.count("*").alias("__df"))

    idf = F.log(
        1.0 + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (
        F.col("__tf")
        * (k1 + 1.0)
        / (
            F.col("__tf")
            + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
        )
    )
    return (
        qtf.join(F.broadcast(dfreq), "__t")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn("__s", idf * tf_part)
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )
