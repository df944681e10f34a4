"""HTML boilerplate removal — the web-corpus EXTRACTION step that
precedes every text-quality stage in an LLM data pipeline (the role
trafilatura/justext play in published pipelines; reference analogue:
none — this is part of the r7+ training-data operator family).

Pure Catalyst expressions — regexp chains, no UDF, whole-stage
codegen, scales with the scan. The SPEC (deterministic, re-derivable
in any RE2/Java-regex engine, which is what the DuckDB oracle does):

1. strip ``<!-- -->`` comments, ``<script>``/``<style>`` elements
   INCLUDING their content (dotall, case-insensitive, lazy);
2. block-level closers/breaks (``<br>``, ``</p>``, ``</div>``,
   ``</li>``, ``</h1..6>``, ``</tr>``) become newlines, every other
   tag disappears;
3. the six HTML core entities decode (``&lt; &gt; &quot; &#39;
   &nbsp;`` then ``&amp;`` LAST — decoding it first would
   double-decode ``&amp;lt;``);
4. horizontal whitespace collapses to one space, space-padded
   newlines tighten, 3+ newlines collapse to a paragraph break, the
   result trims.

Malformed HTML degrades gracefully: an unclosed ``<`` without ``>``
passes through (never swallowed to end-of-text), unknown entities stay
literal. Title extraction is the first ``<title>`` element's inner
text, entity-decoded and trimmed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _ci(word: str) -> str:
    """Case-insensitive tag-name pattern via EXPLICIT [xX] classes —
    not ``(?i)``: Java folds ASCII-only while RE2 folds Unicode
    (U+017F matches 's' under RE2's (?i) but not Java's), and the two
    derivations must agree byte-for-byte."""
    return "".join(
        f"[{c}{c.upper()}]" if c.isalpha() else c for c in word
    )


# (pattern, replacement) applied in order — shared by the Spark
# expressions below and restated by the DuckDB oracle.
_HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", ""),
    (rf"(?s)<{_ci('script')}\b[^>]*>.*?</{_ci('script')}>", ""),
    (rf"(?s)<{_ci('style')}\b[^>]*>.*?</{_ci('style')}>", ""),
    (
        "<(?:"
        + "|".join(
            _ci(w) for w in ("br", "/p", "/div", "/li", "/tr",
                             "/title", "/ul", "/ol", "/table")
        )
        + r"|/[hH][1-6])\b[^>]*/?>",
        "\n",
    ),
    (r"<[^>]*>", ""),
]
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: &amp;lt; must yield &lt;, not <
]
_HTML_WS_STEPS: list[tuple[str, str]] = [
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    # string-bound trim of ALL whitespace (plain trim() strips only
    # spaces; explicit class, not \s — Java's \s includes \x0B, RE2's
    # does not, and the two derivations must agree byte-for-byte)
    (r"^[ \t\n\r\f]+|[ \t\n\r\f]+$", ""),
]


def extract_html_text(col: Column | str) -> Column:
    """The visible text of an HTML document as one Column expression
    (see module spec). Null html yields null."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _HTML_STRIP_STEPS:
        c = F.regexp_replace(c, pat, rep)
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    for pat, rep in _HTML_WS_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


# The title SPEC, shared by the Column builder and the oracle
# restatement: first <title> element's inner text, all six entities
# decoded, horizontal+vertical whitespace collapsed with the same
# EXPLICIT class as the text path (Java \s and RE2 \s disagree on
# \x0B), trimmed.
_HTML_TITLE_PATTERN = rf"(?s)<{_ci('title')}\b[^>]*>(.*?)</{_ci('title')}>"
_HTML_TITLE_WS = (r"[ \t\n\r\f]+", " ")


def extract_html_title(col: Column | str) -> Column:
    """The first ``<title>`` element's inner text, entity-decoded and
    trimmed; '' when absent (regexp_extract's no-match convention)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_extract(c, _HTML_TITLE_PATTERN, 1)
    for ent, ch in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, *_HTML_TITLE_WS))


def html_oracle_sql(expr: str) -> str:
    """The extraction SPEC as a DuckDB scalar expression over
    ``expr`` — the oracle's INDEPENDENT restatement (RE2 flavor) used
    by the driver gate; kept beside the Spark chain so the two
    derivations evolve together."""
    def _rep_lit(rep: str) -> str:
        # Newlines must travel as E'\n' escaped literals — a plain
        # '...' literal keeps the backslash raw and RE2 drops the
        # unknown escape from the replacement.
        if "\n" in rep:
            return "E'" + rep.replace("'", "''").replace("\n", "\\n") + "'"
        return "'" + rep.replace("'", "''") + "'"

    out = expr
    for pat, rep in _HTML_STRIP_STEPS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', {_rep_lit(rep)}, 'g')"
    for ent, ch in _HTML_ENTITIES:
        out = f"replace({out}, '{ent}', {_rep_lit(ch)})"
    for pat, rep in _HTML_WS_STEPS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', {_rep_lit(rep)}, 'g')"
    return f"trim({out})"


def html_title_oracle_sql(expr: str) -> str:
    """``extract_html_title``'s SPEC as a DuckDB scalar expression —
    the SAME title pattern, ALL six entities in the same order, the
    same explicit whitespace class (an earlier cut decoded only &amp;
    and collapsed with \\s+, a weaker spec that passed only because
    the fixture title carried no other entity — r16 review)."""
    pat = _HTML_TITLE_PATTERN.replace("'", "''")
    out = f"regexp_extract({expr}, '{pat}', 1)"
    for ent, ch in _HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    ws = _HTML_TITLE_WS[0].replace("'", "''")
    return f"trim(regexp_replace({out}, '{ws}', ' ', 'g'))"
