"""Training-data decontamination: exact n-gram overlap against eval sets.

Not in the reference's surface — a first-class training-data-pipeline
operator. Before training, corpora are scrubbed of documents that
overlap benchmark/eval data; the standard check (GPT-3 appendix C /
PaLM / Llama style) flags any training document sharing an exact
length-n token n-gram with any eval document. ``bm25_topk_batch`` is
the fuzzy/lexical twin (ranked similarity); this operator is the exact
membership test pipelines actually gate on.

Scale shape (100 TB corpus x small eval suite): the corpus side
explodes its DISTINCT per-doc n-grams — O(tokens) rows — but the very
next operator is a BROADCAST hash join against the eval side's grams,
evaluated map-side inside the scan stage: non-colliding grams (the
overwhelming majority) die before any shuffle, so the only shuffle is
the per-(doc, eval) count over actual collisions. The eval side is the
broadcast side by construction (benchmarks are MBs against a corpus of
TBs); for eval suites beyond broadcast size, shard them and union.

Tokenization and sub-n behavior match the dedup family's
``shingles_col`` (lowercased whitespace tokens; documents shorter than
``n`` tokens contribute their whole token sequence as one gram), so
contamination and near-dup run off one canonicalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _with_shingle_tokens, shingles_from_tokens


def ngram_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Every (corpus doc, eval doc) pair sharing at least one exact
    length-``n`` token n-gram, with ``n_shared`` = the number of
    DISTINCT shared grams. A pipeline drops (or flags) every
    ``id_col`` that appears at all; the per-pair counts support
    thresholded policies and audits.

    Returns (id_col, eval_id_col, n_shared)."""
    # Repartition the raw text BEFORE the shingle explode: a corpus
    # arriving in few file splits would otherwise evaluate the
    # CPU-heavy shingling serially inside the scan stage (the X72
    # single-file lesson; measured 4.7 s -> 1.5 s at sf0.1). Shingling
    # is the EXPENSIVE tokenize class where the pre-shuffle pays for
    # itself (unlike BM25's cheap whitespace split).
    n_parts = corpus.sparkSession.sparkContext.defaultParallelism
    grams_c = _with_shingle_tokens(
        corpus.select(F.col(id_col), F.col(text_col)).repartition(
            n_parts, F.col(id_col)
        ),
        text_col,
    ).select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("__shingle_toks"), n)).alias("__g"),
    )
    grams_e = _with_shingle_tokens(eval_set, eval_text_col).select(
        F.col(eval_id_col),
        F.explode(shingles_from_tokens(F.col("__shingle_toks"), n)).alias("__g"),
    )
    return (
        grams_c.join(F.broadcast(grams_e), "__g")
        .groupBy(id_col, eval_id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def contaminated_ids(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
) -> DataFrame:
    """Just the corpus ids to drop — a distinct left-semi shape for the
    common "scrub the corpus" call (one column out, no pair fan-out)."""
    n_parts = corpus.sparkSession.sparkContext.defaultParallelism
    grams_c = _with_shingle_tokens(
        corpus.select(F.col(id_col), F.col(text_col)).repartition(
            n_parts, F.col(id_col)
        ),
        text_col,
    ).select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("__shingle_toks"), n)).alias("__g"),
    )
    grams_e = (
        _with_shingle_tokens(eval_set, eval_text_col)
        .select(
            F.explode(shingles_from_tokens(F.col("__shingle_toks"), n)).alias("__g")
        )
        .distinct()
    )
    return grams_c.join(F.broadcast(grams_e), "__g", "left_semi").select(id_col).distinct()
