"""Column masking / pseudonymization — the governance surface a
managed warehouse needs when snapshots are shared downstream (the
reference exposes raw tables to Athena/Redshift with no masking
story; Delta/BigQuery ship this as column-level masking policies).

All expressions are engine-portable built-ins (substring, regexp,
md5), so the DuckDB oracle states the IDENTICAL transformation —
masking must be reproducible across engines or a governed share and
its audit disagree.

Scale: pure per-row codegen'd projections — no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_LEN = 2_147_483_647


def mask_digits(c: Column, keep_prefix: int = 0, mask_char: str = "*") -> Column:
    """Replace every digit after the first ``keep_prefix`` characters
    with ``mask_char`` — format-preserving masking for phone-like
    fields (separators and the routing prefix stay readable)."""
    masked_rest = F.regexp_replace(
        F.substring(c, keep_prefix + 1, _MAX_LEN), r"[0-9]", mask_char
    )
    if keep_prefix <= 0:
        return masked_rest
    return F.concat(F.substring(c, 1, keep_prefix), masked_rest)


def pseudonymize(c: Column, salt: str) -> Column:
    """Deterministic salted pseudonym (md5): equal inputs map to equal
    tokens, so joins and group-bys on the pseudonym keep working —
    referential integrity without the value. ``salt`` blocks rainbow
    lookups; rotate it to unlink datasets released at different times.
    md5 (not xxhash64) because every engine in the comparison chain
    computes the identical digest. Null stays null."""
    return F.md5(F.concat(F.lit(salt), c))


def redact_pattern(c: Column, pattern: str, replacement: str = "[REDACTED]") -> Column:
    """Replace every match of ``pattern`` (e.g. an email regex) —
    content-level redaction for free-text columns. Stick to the
    RE2-compatible regex subset (no lookbehind) so the same pattern
    runs identically on Spark (Java regex) and the oracle engine."""
    return F.regexp_replace(c, pattern, replacement)


def with_masked_columns(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Apply a masking policy: {column_name: masked expression}.
    Unlisted columns pass through untouched — the policy is explicit,
    never inferred."""
    out = df
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
    return out
