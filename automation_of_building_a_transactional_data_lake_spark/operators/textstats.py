"""Text-analysis operators over document tables.

Not in the reference's surface — added as first-class training-data
pipeline operators. Everything here is built-in-expression-only
(split / filter / transform / aggregate higher-order functions), so the
hot path stays inside whole-stage codegen — with ONE documented
exception: Unicode normalization (``normalize_text``) has no Spark
built-in, so that single step is an Arrow-batched pandas_udf.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace tokenization shared by all operators (documented contract:
# a token is a maximal run of non-whitespace characters).
_WS = r"\s+"


def tokens_col(text: Column) -> Column:
    return F.filter(F.split(text, _WS), lambda x: x != "")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + uniqueness stats: n_chars_calc, n_tokens,
    n_uniq_tokens, uniq_token_ratio (4dp), avg_token_len (4dp)."""
    toks = tokens_col(F.col(text_col))
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return (
        df.withColumn("__toks", toks)
        .withColumn("n_chars_calc", F.length(F.col(text_col)))
        .withColumn("n_tokens", F.size(F.col("__toks")))
        .withColumn("n_uniq_tokens", F.size(F.array_distinct(F.col("__toks"))))
        .withColumn(
            "uniq_token_ratio",
            F.round(F.size(F.array_distinct(F.col("__toks"))) * F.lit(1.0) / F.size(F.col("__toks")), 4),
        )
        .withColumn(
            "avg_token_len",
            F.round(
                F.aggregate(F.col("__toks"), F.lit(0), lambda acc, x: acc + F.length(x))
                * F.lit(1.0)
                / F.size(F.col("__toks")),
                4,
            ),
        )
        .drop("__toks")
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality scoring: alpha ratio, punctuation
    ratio, whitespace ratio, mean line length — the standard cheap
    pre-filters for web-scale corpus cleaning."""
    text = F.col(text_col)
    n = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", ""))
    n_space = F.length(F.regexp_replace(text, r"[^\s]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    safe_n = F.when(n > 0, n).otherwise(F.lit(1))
    return (
        df.withColumn("alpha_ratio", F.round(n_alpha / safe_n, 4))
        .withColumn("punct_ratio", F.round(n_punct / safe_n, 4))
        .withColumn("space_ratio", F.round(n_space / safe_n, 4))
        .withColumn("digit_ratio", F.round(n_digit / safe_n, 4))
    )


# Tiny deterministic stopword lists per language for heuristic lang-id.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "dans", "une", "pas"],
    "es": ["el", "la", "los", "que", "es", "en", "una", "con"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def lang_score_col(text: Column, lang: str) -> Column:
    """Count of language-marker tokens present (token-boundary regex,
    JVM-side)."""
    toks = tokens_col(F.lower(text))
    markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-token hits;
    'und' (undetermined) when nothing matches. Deterministic tie-break
    by language code order en<de<fr<es<zh (first wins).

    The lowercased token array is computed ONCE into its own projection
    and every language's marker count reads it — inlining the tokenize
    per language re-ran it 5x per row (higher-order-function lambdas
    defeat Catalyst CSE; same finding as ``with_repetition_stats``)."""
    scored = df.select("*", tokens_col(F.lower(F.col(text_col))).alias("__lang_toks"))
    for lang in _LANG_MARKERS:
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
        scored = scored.withColumn(
            f"__score_{lang}",
            F.size(
                F.filter(F.col("__lang_toks"), lambda t: F.array_contains(markers, t))
            ),
        )
    best = F.lit("und")
    best_score = F.lit(0)
    # Iterate in reverse so earlier languages win ties (>' strictly).
    for lang in reversed(list(_LANG_MARKERS)):
        cond = F.col(f"__score_{lang}") >= best_score
        # '>=' with reverse order == first-listed wins ties, but only
        # replace when score > 0 so empty docs stay 'und'.
        best = F.when((F.col(f"__score_{lang}") > 0) & cond, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, F.col(f"__score_{lang}"))
    out = scored.withColumn(out_col, best)
    return out.drop("__lang_toks", *[f"__score_{lang}" for lang in _LANG_MARKERS])


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
) -> DataFrame:
    """Canonical text normalization — the pre-tokenize cleanup every
    corpus pipeline runs before dedup/counting so that byte-different,
    render-identical strings (composed vs combining accents, stray
    control characters, ragged whitespace) collapse to one canonical
    form: Unicode ``form`` normalization (NFC default), C0/C1-ish
    control-character strip, whitespace squash to single spaces, trim.

    Unicode normalization has no Spark built-in, so that ONE step runs
    as an Arrow-batched pandas_udf (vectorized ``unicodedata``, no
    per-row Python fn dispatch beyond the map); the strip/squash/trim
    stay codegen'd regexp expressions. Order matters and is part of
    the contract: normalize → strip controls → squash → trim, so the
    DuckDB oracle (``nfc_normalize`` + the same regexps) reproduces
    results byte-for-byte."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC|NFD|NFKC|NFKD, got {form!r}")

    def _unorm_fn(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    _unorm = pandas_udf(_unorm_fn, StringType())

    cleaned = F.regexp_replace(
        _unorm(F.col(text_col)), r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""
    )
    squashed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return df.withColumn(out_col, squashed)


def with_compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio (compressed bytes / raw
    bytes, 4dp; empty/null docs -> null) — the cheap information-
    density signal web-corpus pipelines use beside the Gopher
    repetition fractions: machine-generated boilerplate and template
    spam compress far below prose, and unlike n-gram fractions the
    ratio also catches LONG-RANGE repetition (whole duplicated
    paragraphs). Arrow-batched pandas_udf (zlib is C-speed; one call
    per row, batched transfer); deterministic for a fixed level, so
    thresholds are portable across runs."""
    import pandas as pd  # noqa: F401 — vectorized path below
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _ratio_fn(s):
        import zlib

        def one(x):
            if x is None:
                return None
            raw = x.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), 4)

        return s.map(one)

    _ratio = pandas_udf(_ratio_fn, DoubleType())
    return df.withColumn(out_col, _ratio(F.col(text_col)))


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Order-insensitive document fingerprint: sort the distinct token
    set and hash it (xxhash64). Collapses re-orderings/duplicated
    whitespace to one fingerprint — cheap canonical near-dup key."""
    toks = F.array_sort(F.array_distinct(tokens_col(F.lower(F.col(text_col)))))
    return df.withColumn(out_col, F.xxhash64(F.concat_ws("", toks)))


def with_repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1's
    repetition filters; the C4 heuristics family) — the standard cheap
    detectors for boilerplate/spam documents in web-scale corpora:

    - ``dup_token_frac``   1 - distinct/total whitespace tokens
    - ``top_token_frac``   occurrences of the most frequent token / total
    - ``dup_2gram_frac``   1 - distinct/total consecutive token 2-grams

    Plan: the distinct/total fractions are pure codegen'd array
    expressions; the mode count (``top_token_frac``) would be an
    interpreted O(distinct x total) fold as an expression, so it runs
    as explode -> (id, token) count -> per-id max — one shuffle on the
    id — and joins back (AQE broadcasts the tiny aggregate). Empty
    docs report 0.0 everywhere (left join + coalesce, no divide).

    The raw text repartitions by id BEFORE the tokenize/2-gram work:
    a corpus arriving in few file splits would otherwise evaluate the
    CPU-heavy array expressions serially inside the scan stage (the
    same trap the similarity joins hit — measured 9.4 s -> 0.7 s at
    sf0.1 on a single-file documents table). The same partitioning
    then co-locates the mode join.
    """
    # Replace semantics (r18 advisory): the r17 select('*', alias(...))
    # form APPENDS, so an input already carrying these stat columns
    # (e.g. a with_token_stats output) would yield duplicate names and
    # ambiguous-reference errors downstream. Dropping them first
    # restores the public withColumn-style contract.
    df = df.drop("n_tokens", "dup_token_frac", "dup_2gram_frac", "top_token_frac")
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(n_parts, F.col(id_col))
    toks = tokens_col(F.col(text_col))

    # Tokenize ONCE per branch: the token and 2-gram arrays are aliased
    # in their own projections so every stat reads the computed column.
    # Inlining them (the previous formulation) re-evaluated the
    # split+filter ~12x per row inside one Project — lambda-variable
    # ids defeat Catalyst's common-subexpression elimination for
    # higher-order functions, so each occurrence really ran (r17
    # measured ~2x on this operator at sf0.1; linear in text bytes at
    # any scale).
    n = F.size("__toks")
    nd = F.size(F.array_distinct("__toks"))
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ng = F.size("__grams")
    ngd = F.size(F.array_distinct("__grams"))

    base = (
        df.select("*", toks.alias("__toks"))
        .select("*", grams.alias("__grams"))
        .select(
            "*",
            n.cast("long").alias("n_tokens"),
            F.round(F.when(n > 0, 1.0 - nd / n).otherwise(F.lit(0.0)), 6).alias(
                "dup_token_frac"
            ),
            F.round(F.when(ng > 0, 1.0 - ngd / ng).otherwise(F.lit(0.0)), 6).alias(
                "dup_2gram_frac"
            ),
        )
        .drop("__toks", "__grams")
    )
    mode = (
        df.select(F.col(id_col), F.explode(toks).alias("__tok"))
        .groupBy(id_col, "__tok")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("__max_cnt"))
    )
    return (
        base.join(mode, id_col, "left")
        .withColumn(
            "top_token_frac",
            F.round(
                F.coalesce(F.col("__max_cnt") / F.col("n_tokens"), F.lit(0.0)), 6
            ),
        )
        .drop("__max_cnt")
    )


def document_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-level document-frequency table: for each distinct token,
    the number (and fraction) of documents containing it — the input
    to stop-word discovery, IDF weighting, and tokenizer-vocabulary
    seeding over a training corpus.

    Plan: distinct tokens PER DOCUMENT first (array_distinct before the
    explode, so a token counts once per doc), then one map-side-combined
    groupBy — at 100 TB this is a single count-shuffle on the token,
    never a per-doc window. The total doc count rides along as a
    literal-free cross-joined 1-row aggregate (broadcast by AQE).
    """
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    per_doc = df.select(F.col(id_col), F.explode(toks).alias("__tok"))
    freq = per_doc.groupBy("__tok").agg(F.count("*").alias("doc_freq"))
    total = df.select(F.count("*").alias("__n_docs"))
    return (
        freq.crossJoin(F.broadcast(total))
        .select(
            F.col("__tok").alias("token"),
            "doc_freq",
            F.round(F.col("doc_freq") / F.col("__n_docs"), 6).alias("doc_frac"),
        )
    )


def trigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool | None = None,
    max_broadcast_model_rows: int = 2_000_000,
    materialize: str | None = None,
) -> DataFrame:
    """Per-document average log-likelihood under a corpus-trained
    character-trigram language model — the dependency-free stand-in
    for the KenLM-style perplexity filters big text pipelines run
    (CCNet/Gopher): documents whose character statistics diverge from
    the corpus score low.

    Model: P(tri) = count(tri) / count(trigrams sharing tri's first
    two characters); both counts over the whole corpus (one explode +
    two map-side-combined groupBys). Score(d) = avg over d's trigram
    positions of ln P — every doc trigram exists in the model it
    helped train, so no smoothing term is needed. Documents shorter
    than 3 characters have no trigram positions and are excluded.

    Scale: the model frame is O(distinct character trigrams) — a few
    thousand rows on ASCII corpora, but MILLIONS on a multilingual
    100-TB crawl (CJK alone), where a forced broadcast would OOM the
    driver. The join strategy is therefore SIZE-GATED:
    ``broadcast_model=None`` (default) counts the already-materialized
    model once (one cheap job over the cached trigram frame) and
    broadcasts only when it holds at most ``max_broadcast_model_rows``
    rows; otherwise the score side shuffles on the trigram key —
    which it is already keyed by — in a plain hash join. Callers that
    know their alphabet pass ``broadcast_model=True``/``False`` to
    skip the gating count. ``materialize`` follows
    ``dedup._materialize``'s policy (None = localCheckpoint under
    local[*], DISK_ONLY persist on a cluster).

    Returns (id, n_trigrams, avg_logprob rounded to 4dp)."""
    from .dedup import _materialize

    # sequence(1, stop) DESCENDS when stop < 1 (length <= 2), silently
    # yielding bogus positions — guard short docs to an empty array.
    positions = F.when(
        F.length(text_col) >= 3,
        F.sequence(F.lit(1), F.length(text_col) - F.lit(2)),
    ).otherwise(F.array().cast("array<int>"))
    # Explode the POSITIONS, then slice with a plain substr projection:
    # a transform() lambda here would run INTERPRETED per position (the
    # round-3 higher-order-function finding — measured ~2.6x slower at
    # sf0.1), while explode+substr stays in whole-stage codegen. The
    # trigram frame feeds the model counts AND the scoring join, so it
    # materializes once (policy per dedup._materialize).
    # Repartition the raw text BEFORE the explode: a single-file corpus
    # would otherwise evaluate the whole slice pipeline serially inside
    # the scan stage (the X72 single-file lesson).
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    tris = _materialize(
        df.select(F.col(id_col), F.col(text_col))
        .repartition(n_parts, F.col(id_col))
        .select(F.col(id_col), F.col(text_col), F.explode(positions).alias("__i"))
        .select(
            F.col(id_col),
            F.col(text_col).substr(F.col("__i"), F.lit(3)).alias("__tri"),
        ),
        materialize,
    )
    # The model frame feeds the prefix aggregation, the scoring join,
    # and (when gating) the size count — materialize it once too.
    tri_counts = _materialize(
        tris.groupBy("__tri").agg(F.count("*").alias("__c3")), materialize
    )
    if broadcast_model is None:
        broadcast_model = tri_counts.count() <= max_broadcast_model_rows
    prefix_counts = (
        tri_counts.groupBy(F.substring("__tri", 1, 2).alias("__bi"))
        .agg(F.sum("__c3").alias("__c2"))
    )

    def _model_side(frame: DataFrame) -> DataFrame:
        return F.broadcast(frame) if broadcast_model else frame

    model = tri_counts.withColumn("__bi", F.substring("__tri", 1, 2)).join(
        _model_side(prefix_counts), "__bi"
    )
    return (
        tris.join(_model_side(model.select("__tri", "__c3", "__c2")), "__tri")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.round(F.avg(F.log(F.col("__c3") / F.col("__c2"))), 4).alias(
                "avg_logprob"
            ),
        )
    )
