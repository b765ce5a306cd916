"""Tokenizers — JVM built-ins first, vectorized pandas UDF as the alt path.

A3 in SURVEY.md section 2. The default stays entirely inside whole-stage
codegen (``split``/``lower``/``filter`` built-ins — no Python worker at all);
the pandas-UDF variant exists because the input_hint pins "vectorized
pandas/Arrow UDFs" as the API style and it is the hook for richer code-aware
tokenization later. Both produce identical output on the same mode.

Modes:
  * ``whitespace`` — split on runs of whitespace (the rank-identity
    tokenization for the sandbox corpus, whose text is pre-normalized).
  * ``code`` — lowercase, split on non-[a-z0-9_] runs; keeps identifiers like
    ``snake_case`` whole (the source-code tokenization of the north_star).
  * ``code_split`` — the subtoken analyzer (Lucene WordDelimiterGraphFilter /
    ES ``word_delimiter``): identifiers additionally split at snake_case
    underscores, camelCase humps (acronym-aware: ``parseHTTPResponse`` ->
    parse, http, response), and letter<->digit boundaries, then lowercase —
    so a query for ``response`` finds ``HTTPResponse``, ``http_response``
    and ``httpResponse2`` alike. Boundary inserts are regexp_replace
    built-ins, so indexing stays in whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PATTERNS = {
    "whitespace": r"\s+",
    "code": r"[^a-z0-9_]+",
    "code_split": r"[^a-z0-9]+",
}
_TOKEN_PATTERNS = {
    "whitespace": r"\S+",
    "code": r"[a-z0-9_]+",
    "code_split": r"[a-z0-9]+",
}

# boundary-insert patterns, applied IN ORDER (acronym rule first so
# 'HTTPResponse' -> 'HTTP Response' before the generic hump rule runs);
# every consumer inserts a space between the two capture groups in its own
# dialect ('$1 $2' for Spark, r'\1 \2' for Python re)
_SPLIT_RULES = [
    r"([A-Z]+)([A-Z][a-z])",  # acronym -> word: HTTPResponse
    r"([a-z0-9])([A-Z])",     # camel hump: parseHttp
    r"([A-Za-z])([0-9])",     # letter -> digit
    r"([0-9])([A-Za-z])",     # digit -> letter
]


def _prep_col(col: Column, mode: str) -> Column:
    if mode == "code":
        return F.lower(col)
    if mode == "code_split":
        for pat in _SPLIT_RULES:
            col = F.regexp_replace(col, pat, r"$1 $2")
        return F.lower(col)
    return col


def doc_len_col(content: Column | str, mode: str = "whitespace") -> Column:
    """Token count WITHOUT materializing the token array — one regexp_count
    pass. Exactly equals ``size(tokens_col(content, mode))``; used where only
    the length is needed (docmap pass)."""
    col = F.col(content) if isinstance(content, str) else content
    col = _prep_col(col, mode)
    return F.regexp_count(col, F.lit(_TOKEN_PATTERNS[mode])).cast("long")


def tokens_col(content: Column | str, mode: str = "whitespace") -> Column:
    """array<string> of non-empty tokens; pure JVM built-ins (preferred path)."""
    pat = _PATTERNS[mode]
    col = F.col(content) if isinstance(content, str) else content
    col = _prep_col(col, mode)
    arr = F.split(col, pat)
    return F.filter(arr, lambda t: t != F.lit(""))


def tokenize_py(text: str, mode: str = "whitespace") -> list[str]:
    """Driver-side twin of ``tokens_col`` for normalizing QUERY text (phrases,
    term lists) with the same semantics the content was indexed under."""
    import re

    if mode == "code":
        text = text.lower()
    elif mode == "code_split":
        for pat in _SPLIT_RULES:
            text = re.sub(pat, r"\1 \2", text)
        text = text.lower()
    return [t for t in re.split(_PATTERNS[mode], text) if t]


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_whitespace_udf(content: pd.Series) -> pd.Series:
    """Arrow-vectorized alternative to ``tokens_col(..., 'whitespace')``."""
    return content.str.split()


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_code_udf(content: pd.Series) -> pd.Series:
    """Arrow-vectorized alternative to ``tokens_col(..., 'code')``."""
    return content.str.lower().str.split(r"[^a-z0-9_]+", regex=True).map(
        lambda toks: [t for t in toks if t]
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_code_split_udf(content: pd.Series) -> pd.Series:
    """Arrow-vectorized alternative to ``tokens_col(..., 'code_split')``."""
    s = content
    for pat in _SPLIT_RULES:
        s = s.str.replace(pat, r"\1 \2", regex=True)
    return s.str.lower().str.split(r"[^a-z0-9]+", regex=True).map(
        lambda toks: [t for t in toks if t]
    )
