"""Text retrieval over the documents table: BM25 scoring.

Not in the reference's surface — a first-class training-data-pipeline
operator: corpus curation routinely ranks documents against probe
queries (topical filtering, eval-set mining, contamination checks), and
BM25 is the standard lexical ranker those pipelines start from.

Scale shape (100 TB): the corpus is tokenized EXACTLY ONCE into a slim
per-document frame ``(id, dl, matching-terms)`` — document length is
``size(tokens)`` (no explode, no shuffle), and the query-term filter
runs INSIDE the token array before any explode, so the only exploded
rows are the O(docs x |query|) matches. That frame is O(documents) and
materializes once (``dedup._materialize`` policy); every aggregate the
formula needs (per-term tf, document frequencies, corpus N/avgdl)
derives from it with map-side-combined shuffles. The per-term document
frequencies and the corpus aggregates are tiny frames that broadcast.
No UDFs anywhere — the score is a codegen'd expression.

(The previous formulation exploded EVERY corpus token to compute
document lengths and re-ran the tokenize per consumer branch — four
full passes over the text and an O(tokens) explode; measured 2x slower
at sf0.1 and strictly worse at scale, where the token explode dwarfs
the matching-term rows.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col


def _doc_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    qt_filter,
    materialize: str | None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """The one-pass tokenize: ``(id, __dl, __qt)`` where ``__dl`` is the
    whitespace-token count and ``__qt`` keeps only query-matching tokens
    (duplicates preserved — term frequency needs them). The token array
    is aliased in its own projection so it is computed once per row
    (inlining it would re-tokenize per consuming expression — Catalyst
    keeps non-cheap multi-use aliases in their own project). The frame
    feeds three consumers (corpus stats, tf counts, df counts), so it
    materializes once under the similarity-join policy. ``carry`` names
    extra input columns the filter needs (e.g. a broadcast term-set
    array); they are not part of the output."""
    from .dedup import _materialize

    base = docs.select(
        F.col(id_col),
        tokens_col(F.lower(F.col(text_col))).alias("__toks"),
        *[F.col(c) for c in carry],
    )
    return _materialize(
        base.select(
            F.col(id_col),
            F.size("__toks").alias("__dl"),
            F.filter("__toks", qt_filter).alias("__qt"),
        ),
        materialize,
    )


def _score_expr(k1: float, b: float):
    """BM25 per-(doc, term) contribution (Robertson-Sparck Jones idf in
    the non-negative ``ln(1 + ...)`` form Lucene uses)."""
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
    return idf * tf_part


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: str | None = None,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under Okapi BM25:

        idf(t)  = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
        s(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Tokenization matches the engine's text operators (lowercased
    whitespace split). N and avgdl count documents with at least one
    token (the classic corpus definition). Deterministic tie-break on
    (score desc, id). Returns (id, bm25) with the score rounded to 4dp.

    ``materialize`` picks how the once-tokenized per-doc frame is
    pinned (see ``dedup._materialize``): default localCheckpoint on
    ``local[*]``, cluster-safe DISK_ONLY persist elsewhere. The disk
    mode pins executor blocks for the session (r18 advisory): after
    collecting/writing the top-k on a non-local master, call
    ``dedup.release_similarity_cache()`` — or pass
    ``materialize="none"`` to trade the pin for a second tokenize
    pass — exactly as for the similarity joins."""
    qterms = sorted({t for t in query.lower().split() if t})
    if not qterms:
        raise ValueError("query has no terms")

    wd = _doc_terms(
        docs, id_col, text_col, lambda t: t.isin(*qterms), materialize
    )
    # Corpus aggregates as a broadcastable 1-row frame — no driver
    # collect in the plan (N and avgdl are the only scalars BM25 needs).
    corpus = wd.filter(F.col("__dl") > 0).agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    qtf = (
        wd.select(F.col(id_col), F.col("__dl"), F.explode("__qt").alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__tf"), F.first("__dl").alias("__dl"))
    )
    dfreq = qtf.groupBy("__t").agg(F.count("*").alias("__df"))

    return (
        qtf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(corpus))
        .withColumn("__s", _score_expr(k1, b))
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
    materialize: str | None = None,
) -> DataFrame:
    """Per-query top-``k`` BM25 over a query TABLE — the shape curation
    pipelines actually run (contamination checks score every eval-set
    prompt against the corpus, not one probe string). Identical formula
    and tokenization to ``bm25_topk``; deterministic per-query
    tie-break on (rounded score desc, id).

    Scale shape (100 TB corpus x 10^3-10^5 queries): the corpus is
    tokenized once; the union of all query terms rides along as a
    broadcast 1-row term-set array, and the per-document filter runs
    inside the token array BEFORE the explode, so shuffled volume stays
    O(docs x |query vocabulary|), not O(tokens) and not
    O(docs x queries). The per-query fan-out then joins the slim
    (doc, term, tf) frame to the broadcast (query, term) list, and
    top-k is a per-query ranking window. The query table is the
    broadcast side by assumption (eval sets are tiny next to the
    corpus); for query sets beyond broadcast size, shard them and
    union the calls.

    On a non-local master the default ``materialize`` pins a
    DISK_ONLY frame for the session — release it with
    ``dedup.release_similarity_cache()`` after the results are
    materialized, as for the similarity joins (r18 advisory).

    Returns (query_id, doc_id, bm25 rounded to 4dp)."""
    from pyspark.sql.window import Window

    qterms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(tokens_col(F.lower(F.col(query_col))))
        ).alias("__t"),
    )
    # The distinct term set as ONE broadcast row: the per-doc filter
    # can then run inside the token array (array_contains) with no
    # join machinery per token.
    term_set = qterms.agg(F.collect_set("__t").alias("__terms"))

    def _qt_filter(t):
        return F.array_contains(F.col("__terms"), t)

    wd = _doc_terms(
        docs.crossJoin(F.broadcast(term_set)),
        id_col,
        text_col,
        _qt_filter,
        materialize,
        carry=("__terms",),
    )
    corpus = wd.filter(F.col("__dl") > 0).agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    qtf = (
        wd.select(F.col(id_col), F.col("__dl"), F.explode("__qt").alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__tf"), F.first("__dl").alias("__dl"))
    )
    dfreq = qtf.groupBy("__t").agg(F.count("*").alias("__df"))

    scored = (
        qtf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(corpus))
        .join(F.broadcast(qterms), "__t")  # per-query fan-out, broadcast side
        .withColumn("__s", _score_expr(k1, b))
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
