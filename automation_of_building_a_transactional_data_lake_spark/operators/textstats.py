"""Text-analysis operators over document tables.

Not in the reference's surface — added as first-class training-data
pipeline operators. Everything here is built-in-expression-only
(split / filter / transform / aggregate higher-order functions), so the
hot path stays inside whole-stage codegen: no Python UDFs.
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
    by language code order en<de<fr<es<zh (first wins)."""
    scored = df
    for lang in _LANG_MARKERS:
        scored = scored.withColumn(f"__score_{lang}", lang_score_col(F.col(text_col), lang))
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
    return out.drop(*[f"__score_{lang}" for lang in _LANG_MARKERS])


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Order-insensitive document fingerprint: sort the distinct token
    set and hash it (xxhash64). Collapses re-orderings/duplicated
    whitespace to one fingerprint — cheap canonical near-dup key."""
    toks = F.array_sort(F.array_distinct(tokens_col(F.lower(F.col(text_col)))))
    return df.withColumn(out_col, F.xxhash64(F.concat_ws("", toks)))
