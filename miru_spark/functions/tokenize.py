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
    "english": r"\s+",
    "ascii": r"\s+",
}
_TOKEN_PATTERNS = {
    "whitespace": r"\S+",
    "code": r"[a-z0-9_]+",
    "code_split": r"[a-z0-9]+",
    "ascii": r"\S+",  # folding never changes the token count
    "synonyms": r"\S+",  # collapse maps tokens 1:1, count unchanged
}

# A112 index-time synonym collapse (Lucene SynonymGraphFilter at index
# time, the keep-one-form strategy the ES docs recommend for index-time
# synonyms): every member of a synonym class maps to ONE canonical term
# during tokenization, so tf adds and df merges across the class and the
# idf the scorer sees is the CLASS's document frequency — the semantics
# query-time expansion (A41) approximates with max-df blending. One-way
# collapse only (no multi-token emission): token count — and therefore
# doc_len/norms — is unchanged, which keeps the fast regexp_count docmap
# path valid. The pinned table collapses a real vocabulary pair
# (sort -> order: merged stats are observable) and an out-of-vocab
# canonical (fast -> quick: the indexed term need not occur raw).
SYNONYM_COLLAPSE = {"sort": "order", "fast": "quick"}


# edge n-gram bounds (Lucene EdgeNGramTokenFilter / ES edge_ngram):
# each token emits its prefixes of length EDGE_MIN..min(len, EDGE_MAX);
# tokens longer than EDGE_MAX also emit themselves (preserveOriginal) so
# exact long-term search keeps working; tokens shorter than EDGE_MIN emit
# nothing (the ES default behavior)
EDGE_MIN = 2
EDGE_MAX = 8

# ASCII folding (Lucene ASCIIFoldingFilter / ES asciifolding) — a PINNED
# Latin-1/Latin-Extended diacritic map, applied as one translate() pass so
# the fold is a single codegen built-in and the DuckDB twin uses the exact
# same pair of strings (never a library's broader Unicode table, which
# would silently diverge between engines)
FOLD_SRC = "àáâãäåāăąçćčèéêëēĕėęěìíîïĩīĭįñńňòóôõöøōŏőùúûüũūŭůýÿžźżšśß"
# grouped by target letter; ß maps 1:1 to 's' (translate cannot expand to
# 'ss' — documented divergence from Lucene's multi-char fold)
FOLD_DST = (
    "a" * 9 + "c" * 3 + "e" * 9 + "i" * 8 + "n" * 3
    + "o" * 9 + "u" * 8 + "y" * 2 + "z" * 3 + "s" * 2 + "s"
)
assert len(FOLD_SRC) == len(FOLD_DST)

# Lucene EnglishAnalyzer's default stop set (33 words, public constant)
ENGLISH_STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with"
).split()


def _stem_en(t):
    """Lucene EnglishMinimalStemFilter: strip one trailing plural 's' when
    the token has >= 4 chars and doesn't end in 'ss'/'us'. Column in,
    Column out — stays in whole-stage codegen."""
    strip = (
        (F.length(t) >= 4)
        & t.endswith("s")
        & ~t.endswith("us")
        & ~t.endswith("ss")
    )
    return F.when(strip, t.substr(F.lit(1), F.length(t) - 1)).otherwise(t)

# ---------------------------------------------------------------------------
# Multilingual analysis (round 5 — VERDICT r4 #6): per-language stop sets
# and minimal plural stemmers, dispatched by the corpus ``lang`` column.
# The rule tables below are PINNED HERE as the spec. Their shape follows
# Lucene's public per-language *MinimalStemFilter family (plural-only
# suffix stripping; full Snowball is deliberately out of scope), but the
# exact tables are this engine's own, chosen so that every rule is a
# single-pass CASE over length/suffix tests — i.e. every stage is a
# whole-stage-codegen built-in on the Spark side and a 1:1 CASE expression
# on the DuckDB side (same discipline as the english chain, A62).
# Languages without rules (e.g. zh — CJK segmentation is out of scope for
# this whitespace corpus) pass through lowercase+split unchanged.

MULTILANG_STOPWORDS: dict[str, list[str]] = {
    "en": list(ENGLISH_STOPWORDS),
    "es": (
        "de la que el en y a los se del las un por con no una su para "
        "es al lo como mas pero sus le"
    ).split(),
    "de": (
        "der die das und in den von zu mit sich des auf für ist im dem "
        "nicht ein eine als auch es an"
    ).split(),
    "fr": (
        "le la les de des du et en un une que qui dans pour sur au aux "
        "avec ne se ce il est pas par plus"
    ).split(),
}


def _stem_es_col(t: Column) -> Column:
    """Pinned Spanish minimal stem (plural-only): -ces -> -z (luces ->
    luz); strip -es after r/l/n/d/j/z (redes -> red); else strip one
    final -s (datos -> dato; never -ss/-us)."""
    ln = F.length(t)
    return (
        F.when(
            (ln >= 5) & t.endswith("ces"),
            F.concat(t.substr(F.lit(1), ln - 3), F.lit("z")),
        )
        .when(
            (ln >= 5)
            & t.endswith("es")
            & t.substr(ln - 2, F.lit(1)).isin("r", "l", "n", "d", "j", "z"),
            t.substr(F.lit(1), ln - 2),
        )
        .when(
            (ln >= 4) & t.endswith("s") & ~t.endswith("ss") & ~t.endswith("us"),
            t.substr(F.lit(1), ln - 1),
        )
        .otherwise(t)
    )


def _stem_de_col(t: Column) -> Column:
    """Pinned German minimal stem: strip -ern, else -en/-er/-es, else one
    of -e/-n/-s — longest suffix first, min stem length 4. No umlaut
    normalization (documented divergence: Bäume does not reach Baum)."""
    ln = F.length(t)
    return (
        F.when((ln >= 7) & t.endswith("ern"), t.substr(F.lit(1), ln - 3))
        .when(
            (ln >= 6)
            & (t.endswith("en") | t.endswith("er") | t.endswith("es")),
            t.substr(F.lit(1), ln - 2),
        )
        .when(
            (ln >= 5) & (t.endswith("e") | t.endswith("n") | t.endswith("s")),
            t.substr(F.lit(1), ln - 1),
        )
        .otherwise(t)
    )


def _stem_fr_col(t: Column) -> Column:
    """Pinned French minimal stem: -eaux -> -eau (reseaux -> reseau,
    BEFORE the -aux rule, which would mangle it), -aux -> -al (journaux
    -> journal), else strip final -x or -s, else final -e (len >= 6)."""
    ln = F.length(t)
    return (
        F.when((ln >= 6) & t.endswith("eaux"), t.substr(F.lit(1), ln - 1))
        .when(
            (ln >= 6) & t.endswith("aux"),
            F.concat(t.substr(F.lit(1), ln - 3), F.lit("al")),
        )
        .when((ln >= 5) & t.endswith("x"), t.substr(F.lit(1), ln - 1))
        .when((ln >= 5) & t.endswith("s"), t.substr(F.lit(1), ln - 1))
        .when((ln >= 6) & t.endswith("e"), t.substr(F.lit(1), ln - 1))
        .otherwise(t)
    )


_LANG_STEM_COL = {
    "en": _stem_en,
    "es": _stem_es_col,
    "de": _stem_de_col,
    "fr": _stem_fr_col,
}


def tokens_col_lang(content: Column | str, lang: Column | str) -> Column:
    """Per-language analysis chain: lowercase -> whitespace split ->
    ``lang``-routed stop set -> ``lang``-routed minimal stem. The dispatch
    is ONE chain of ``when`` branches at the array level, so the whole
    thing stays in codegen; languages without rules pass through."""
    col = F.col(content) if isinstance(content, str) else content
    lg = F.col(lang) if isinstance(lang, str) else lang
    base = F.filter(
        F.split(F.lower(col), r"\s+"), lambda t: t != F.lit("")
    )
    out = None
    for code, stem in _LANG_STEM_COL.items():
        stops = MULTILANG_STOPWORDS[code]
        branch = F.transform(
            F.filter(base, lambda t: ~t.isin(*stops)), stem
        )
        out = (
            F.when(lg == code, branch)
            if out is None
            else out.when(lg == code, branch)
        )
    return out.otherwise(base)


def tokenize_py_lang(text: str, lang: str) -> list[str]:
    """Driver-side twin of :func:`tokens_col_lang` for normalizing QUERY
    text under a given language's chain."""
    import re

    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    if lang not in _LANG_STEM_COL:
        return toks
    stops = set(MULTILANG_STOPWORDS[lang])
    toks = [t for t in toks if t not in stops]

    def es(t: str) -> str:
        if len(t) >= 5 and t.endswith("ces"):
            return t[:-3] + "z"
        if len(t) >= 5 and t.endswith("es") and t[-3] in "rlndjz":
            return t[:-2]
        if (
            len(t) >= 4
            and t.endswith("s")
            and not t.endswith("ss")
            and not t.endswith("us")
        ):
            return t[:-1]
        return t

    def de(t: str) -> str:
        if len(t) >= 7 and t.endswith("ern"):
            return t[:-3]
        if len(t) >= 6 and t[-2:] in ("en", "er", "es"):
            return t[:-2]
        if len(t) >= 5 and t[-1] in "ens":
            return t[:-1]
        return t

    def fr(t: str) -> str:
        if len(t) >= 6 and t.endswith("eaux"):
            return t[:-1]
        if len(t) >= 6 and t.endswith("aux"):
            return t[:-3] + "al"
        if len(t) >= 5 and t[-1] in "xs":
            return t[:-1]
        if len(t) >= 6 and t.endswith("e"):
            return t[:-1]
        return t

    def en(t: str) -> str:
        if len(t) >= 4 and t.endswith("s") and t[-2] not in ("u", "s"):
            return t[:-1]
        return t

    stem = {"en": en, "es": es, "de": de, "fr": fr}[lang]
    return [stem(t) for t in toks]


def _stem_sql(lang: str, t: str = "t") -> str:
    """The DuckDB CASE twin of the pinned per-language stem rules —
    generated beside the rules so the two can never drift silently."""
    if lang == "en":
        return (
            f"CASE WHEN len({t}) >= 4 AND {t} LIKE '%s' "
            f"AND {t} NOT LIKE '%us' AND {t} NOT LIKE '%ss' "
            f"THEN substr({t}, 1, len({t}) - 1) ELSE {t} END"
        )
    if lang == "es":
        return (
            f"CASE WHEN len({t}) >= 5 AND {t} LIKE '%ces' "
            f"THEN substr({t}, 1, len({t}) - 3) || 'z' "
            f"WHEN len({t}) >= 5 AND {t} LIKE '%es' "
            f"AND substr({t}, len({t}) - 2, 1) IN ('r','l','n','d','j','z') "
            f"THEN substr({t}, 1, len({t}) - 2) "
            f"WHEN len({t}) >= 4 AND {t} LIKE '%s' "
            f"AND {t} NOT LIKE '%ss' AND {t} NOT LIKE '%us' "
            f"THEN substr({t}, 1, len({t}) - 1) ELSE {t} END"
        )
    if lang == "de":
        return (
            f"CASE WHEN len({t}) >= 7 AND {t} LIKE '%ern' "
            f"THEN substr({t}, 1, len({t}) - 3) "
            f"WHEN len({t}) >= 6 AND (({t} LIKE '%en') OR ({t} LIKE '%er') "
            f"OR ({t} LIKE '%es')) THEN substr({t}, 1, len({t}) - 2) "
            f"WHEN len({t}) >= 5 AND (({t} LIKE '%e') OR ({t} LIKE '%n') "
            f"OR ({t} LIKE '%s')) THEN substr({t}, 1, len({t}) - 1) "
            f"ELSE {t} END"
        )
    if lang == "fr":
        return (
            f"CASE WHEN len({t}) >= 6 AND {t} LIKE '%eaux' "
            f"THEN substr({t}, 1, len({t}) - 1) "
            f"WHEN len({t}) >= 6 AND {t} LIKE '%aux' "
            f"THEN substr({t}, 1, len({t}) - 3) || 'al' "
            f"WHEN len({t}) >= 5 AND {t} LIKE '%x' "
            f"THEN substr({t}, 1, len({t}) - 1) "
            f"WHEN len({t}) >= 5 AND {t} LIKE '%s' "
            f"THEN substr({t}, 1, len({t}) - 1) "
            f"WHEN len({t}) >= 6 AND {t} LIKE '%e' "
            f"THEN substr({t}, 1, len({t}) - 1) ELSE {t} END"
        )
    raise ValueError(f"no stem rules for lang {lang!r}")


def multilang_tok_sql(decor_sql: str = "text") -> str:
    """(doc_id, term) tokenization CTE body replicating the multilang
    chain in DuckDB: per-``lang`` stop filter and stem CASE over the same
    lowercase/whitespace split. ``decor_sql`` swaps the content expression
    (e.g. a per-lang decorated corpus)."""
    langs = list(_LANG_STEM_COL)
    stop_pred = " AND ".join(
        "NOT (lang = '{c}' AND t IN ({ws}))".format(
            c=c,
            ws=",".join(f"'{w}'" for w in MULTILANG_STOPWORDS[c]),
        )
        for c in langs
    )
    stem_case = (
        "CASE "
        + " ".join(
            f"WHEN lang = '{c}' THEN ({_stem_sql(c)})" for c in langs
        )
        + " ELSE t END"
    )
    return (
        f"SELECT doc_id, {stem_case} AS term FROM ("
        f"SELECT doc_id, lang, lower(unnest(string_split_regex("
        f"{decor_sql}, '\\s+'))) AS t FROM documents) "
        f"WHERE t <> '' AND {stop_pred}"
    )


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
    the length is needed (docmap pass). The ``english`` mode drops stopwords,
    so its length needs the filtered array (stemming preserves count)."""
    col = F.col(content) if isinstance(content, str) else content
    if mode in ("english", "edge", "shingle", "multilang", "porter"):
        return F.size(tokens_col(col, mode)).cast("long")
    if mode == "synonyms":
        col = F.lower(col)
    else:
        col = _prep_col(col, mode)
    return F.regexp_count(col, F.lit(_TOKEN_PATTERNS[mode])).cast("long")


def tokens_col(content: Column | str, mode: str = "whitespace") -> Column:
    """array<string> of non-empty tokens; pure JVM built-ins (preferred path).

    ``english`` is the Lucene EnglishAnalyzer-shaped chain: lowercase ->
    whitespace split -> default stop set -> EnglishMinimalStemFilter
    (plural-only 's' stripping) — every stage a codegen built-in, and every
    stage expressible 1:1 in the DuckDB oracle (lower/LIKE/substr), so the
    full analysis chain is value-oracled end-to-end."""
    col = F.col(content) if isinstance(content, str) else content
    if mode == "multilang":
        # per-language chain, routed by the frame's own ``lang`` column
        # (present in the canonical corpus schema end-to-end)
        return tokens_col_lang(col, F.col("lang"))
    if mode == "ascii":
        # A77 asciifolding: lowercase -> pinned diacritic fold ->
        # whitespace split; one translate() keeps it in codegen
        arr = F.split(F.translate(F.lower(col), FOLD_SRC, FOLD_DST), r"\s+")
        return F.filter(arr, lambda t: t != F.lit(""))
    if mode == "shingle":
        # A86 shingle filter (Lucene ShingleFilter / ES shingle, defaults
        # min=max=2, output_unigrams=true, separator ' '): lowercase ->
        # whitespace split -> unigrams + adjacent space-joined bigrams.
        # Bigrams via zip_with against the 1-shifted array (zip_with pads
        # the short side with NULL, which the filter drops) — higher-order
        # built-ins only, stays in codegen.
        toks = F.filter(
            F.split(F.lower(col), r"\s+"), lambda t: t != F.lit("")
        )
        shifted = F.slice(
            toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))
        )
        bigrams = F.filter(
            F.zip_with(
                toks,
                shifted,
                lambda a, b: F.when(
                    b.isNotNull(), F.concat(a, F.lit(" "), b)
                ),
            ),
            lambda x: x.isNotNull(),
        )
        return F.concat(toks, bigrams)
    if mode == "edge":
        # index-time autocomplete (A70): prefix queries become EXACT term
        # lookups — no dictionary scan at serve time. All higher-order
        # built-ins, stays in codegen.
        toks = F.filter(
            F.split(F.lower(col), r"\s+"),
            lambda t: F.length(t) >= EDGE_MIN,
        )
        return F.flatten(
            F.transform(
                toks,
                lambda t: F.concat(
                    F.transform(
                        F.sequence(
                            F.lit(EDGE_MIN),
                            F.least(F.length(t), F.lit(EDGE_MAX)),
                        ),
                        lambda n: t.substr(F.lit(1), n),
                    ),
                    # preserveOriginal for tokens past EDGE_MAX
                    F.filter(
                        F.array(t), lambda x: F.length(x) > F.lit(EDGE_MAX)
                    ),
                ),
            )
        )
    if mode == "porter":
        # full Porter stemming is beyond CASE-rule codegen — Arrow UDF
        # (see tokenize_porter_udf / functions.porter for the scale path)
        return tokenize_porter_udf(col)
    if mode == "synonyms":
        # lowercase -> whitespace split -> pinned canonical collapse; the
        # map is a codegen CASE chain (same discipline as multilang)
        arr = F.filter(
            F.split(F.lower(col), r"\s+"), lambda t: t != F.lit("")
        )

        def _collapse(t):
            out = t
            for k, v in sorted(SYNONYM_COLLAPSE.items()):
                out = F.when(t == F.lit(k), F.lit(v)).otherwise(out)
            return out

        return F.transform(arr, _collapse)
    pat = _PATTERNS[mode]
    if mode == "english":
        arr = F.split(F.lower(col), pat)
        arr = F.filter(
            arr, lambda t: (t != F.lit("")) & ~t.isin(*ENGLISH_STOPWORDS)
        )
        return F.transform(arr, _stem_en)
    col = _prep_col(col, mode)
    arr = F.split(col, pat)
    return F.filter(arr, lambda t: t != F.lit(""))


def tokenize_py(text: str, mode: str = "whitespace") -> list[str]:
    """Driver-side twin of ``tokens_col`` for normalizing QUERY text (phrases,
    term lists) with the same semantics the content was indexed under."""
    import re

    if mode == "multilang":
        raise ValueError(
            "multilang analysis is per-document-language — normalize query"
            " text with tokenize_py_lang(text, lang) instead"
        )
    if mode == "ascii":
        folded = text.lower().translate(str.maketrans(FOLD_SRC, FOLD_DST))
        return [t for t in re.split(r"\s+", folded) if t]
    if mode == "shingle":
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        return toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
    if mode == "synonyms":
        return [
            SYNONYM_COLLAPSE.get(t, t)
            for t in re.split(r"\s+", text.lower())
            if t
        ]
    if mode == "edge":
        out: list[str] = []
        for t in re.split(r"\s+", text.lower()):
            if len(t) < EDGE_MIN:
                continue
            out.extend(t[:n] for n in range(EDGE_MIN, min(len(t), EDGE_MAX) + 1))
            if len(t) > EDGE_MAX:
                out.append(t)
        return out
    if mode == "porter":
        from miru_spark.functions.porter import porter_stem

        stops = set(ENGLISH_STOPWORDS)
        return [
            porter_stem(t)
            for t in re.split(r"\s+", text.lower())
            if t and t not in stops
        ]
    if mode == "english":
        stops = set(ENGLISH_STOPWORDS)

        def stem(t: str) -> str:
            if len(t) >= 4 and t.endswith("s") and t[-2] not in ("u", "s"):
                return t[:-1]
            return t

        return [
            stem(t)
            for t in re.split(r"\s+", text.lower())
            if t and t not in stops
        ]
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
def tokenize_english_udf(content: pd.Series) -> pd.Series:
    """Arrow-vectorized alternative to ``tokens_col(..., 'english')``."""
    stops = set(ENGLISH_STOPWORDS)

    def analyze(toks):
        out = []
        for t in toks:
            if not t or t in stops:
                continue
            if len(t) >= 4 and t.endswith("s") and t[-2] not in ("u", "s"):
                t = t[:-1]
            out.append(t)
        return out

    return content.str.lower().str.split().map(analyze)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_porter_udf(content: pd.Series) -> pd.Series:
    """Full Porter-stemmed English chain (Lucene PorterStemFilter / ES
    ``porter_stem``): lowercase -> whitespace split -> default stop set ->
    Porter 1980. The stem function is not expressible as codegen built-ins
    (unlike the minimal/multilang CASE stemmers), so this mode is an
    Arrow-batched pandas UDF — the honest per-row slow path. The 100-TB
    shape is dictionary-side stemming (functions/porter.stem_corpus_dict):
    Python cost O(|vocab|) instead of O(corpus tokens), pinned
    token-identical to this UDF by test."""
    from miru_spark.functions.porter import porter_stem

    stops = set(ENGLISH_STOPWORDS)
    cache: dict[str, str] = {}

    def analyze(toks):
        out = []
        for t in toks:
            if not t or t in stops:
                continue
            s = cache.get(t)
            if s is None:
                s = cache[t] = porter_stem(t)
            out.append(s)
        return out

    return content.str.lower().str.split().map(analyze)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_code_split_udf(content: pd.Series) -> pd.Series:
    """Arrow-vectorized alternative to ``tokens_col(..., 'code_split')``."""
    s = content
    for pat in _SPLIT_RULES:
        s = s.str.replace(pat, r"\1 \2", regex=True)
    return s.str.lower().str.split(r"[^a-z0-9]+", regex=True).map(
        lambda toks: [t for t in toks if t]
    )
