"""HTML text extraction — the first step of every web-derived training
corpus (C4 / CCNet start from crawled HTML; everything downstream —
quality, dedup, lang-id — runs on EXTRACTED text).

Pinned minimal recipe, every stage a codegen built-in with an exact
DuckDB twin (both engines run the same RE2-compatible patterns — no
backreferences, inline ``(?is)`` flags — so the twin can't drift):

1. drop ``<script>``/``<style>`` element BODIES (their content is code,
   not text — and tag-stripping alone would leak ``if (a<b)`` fragments);
2. drop HTML comments;
3. every remaining tag becomes a space (block boundaries must separate
   words: ``<p>a</p><p>b</p>`` reads "a b", never "ab");
4. unescape the pinned minimal entity set (``&lt; &gt; &quot; &#39;
   &nbsp;`` first, ``&amp;`` LAST — the standard order, so double-escaped
   ``&amp;lt;`` correctly yields the literal ``&lt;``);
5. squeeze whitespace, trim.

Deliberately NOT here: DOM parsing, boilerplate/nav removal
(trafilatura-class extraction needs an HTML library this container does
not ship); this is the deterministic regex tier those tools also fall
back to, and the Spark-side plumbing is identical either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (entity, replacement) — &amp; must stay last (see module docstring)
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_BLOCK_PATTERNS = [
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"(?s)<[^>]*>",
]


def extracted_text_col(col: Column | str) -> Column:
    """The cleaned-text expression (whole-stage codegen: regexp_replace +
    replace + trim only)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in _BLOCK_PATTERNS:
        c = F.regexp_replace(c, pat, " ")
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_html(docs: DataFrame, col: str = "text", out: str = "clean_text") -> DataFrame:
    """``docs`` plus the extracted-text column — a pure narrow map, no
    shuffle; at corpus scale this runs inside the same scan stage as
    whatever consumes it."""
    return docs.withColumn(out, extracted_text_col(col))


def strip_html_sql(expr: str = "text") -> str:
    """DuckDB expression computing the identical extraction over ``expr``
    (same patterns, 'g' global flag; entity replaces via plain replace)."""
    c = expr
    for pat in _BLOCK_PATTERNS:
        quoted = pat.replace("'", "''")
        c = f"regexp_replace({c}, '{quoted}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        qch = ch.replace("'", "''")
        c = f"replace({c}, '{ent}', '{qch}')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"
