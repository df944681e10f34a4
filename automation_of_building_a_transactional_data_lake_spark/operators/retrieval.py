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


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Per-query top-``k`` BM25 over a query TABLE — the shape curation
    pipelines actually run (contamination checks score every eval-set
    prompt against the corpus, not one probe string). Identical formula
    and tokenization to ``bm25_topk``; deterministic per-query
    tie-break on (rounded score desc, id).

    Scale shape (100 TB corpus x 10^3-10^5 queries): the corpus-side
    term stats are computed ONCE for the union of all query terms —
    the token explode is filtered by a broadcast semi-join on the
    distinct term set BEFORE the shuffle, so shuffled volume stays
    O(docs x |query vocabulary|), not O(tokens) and not
    O(docs x queries). The per-query fan-out then joins the slim
    (doc, term, tf) frame to the broadcast (query, term) list, and
    top-k is a per-query ranking window. The query table is the
    broadcast side by assumption (eval sets are tiny next to the
    corpus); for query sets beyond broadcast size, shard them and
    union the calls.

    Returns (query_id, doc_id, bm25 rounded to 4dp)."""
    from pyspark.sql.window import Window

    qterms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(tokens_col(F.lower(F.col(query_col))))
        ).alias("__t"),
    )
    terms = qterms.select("__t").distinct()

    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.lower(F.col(text_col)))).alias("__t")
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("__dl"))
    corpus = dl.agg(F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl"))

    qtf = (
        toks.join(F.broadcast(terms), "__t", "left_semi")  # prune BEFORE shuffle
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
        / (F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
    )
    scored = (
        qtf.join(F.broadcast(dfreq), "__t")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .join(F.broadcast(qterms), "__t")  # per-query fan-out, broadcast side
        .withColumn("__s", idf * tf_part)
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("__s"), 4).alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
