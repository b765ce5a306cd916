"""Text analysis operators: quality scoring, token stats, language ID,
document fingerprinting (winnowing).

Quality metrics stay entirely in JVM built-ins (regexp_count / length /
split) — SQL-oracle-checkable. Language ID and winnowing are vectorized
pandas UDFs (rows-only checks + dedicated pytest properties).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOPWORDS = ("the", "a")  # the corpus's function words (highest-df terms)


def text_quality(docs: DataFrame, round_digits: int = 6) -> DataFrame:
    """Per-doc quality features + a pinned composite score, all built-ins."""
    text = F.col("text")
    n_chars = F.length(text)
    n_tokens = F.regexp_count(text, F.lit(r"\S+"))
    n_stop = sum(
        (F.regexp_count(text, F.lit(rf"\b{w}\b")) for w in STOPWORDS),
        F.lit(0),
    )
    n_digits = F.regexp_count(text, F.lit(r"[0-9]"))
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    avg_tok_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus spaces
    stop_ratio = n_stop / n_tokens
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(n_digits / n_chars * 10.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(n_punct / n_chars * 10.0, F.lit(1.0))) * 0.1
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_tok_len, round_digits).alias("avg_token_len"),
        F.round(stop_ratio, round_digits).alias("stopword_ratio"),
        F.round(score, round_digits).alias("quality_score"),
    ).orderBy("doc_id")


def text_quality_oracle_sql(round_digits: int = 6) -> str:
    stop_expr = " + ".join(
        rf"len(regexp_extract_all(text, '\b{w}\b'))" for w in STOPWORDS
    )
    return f"""
WITH feats AS (
  SELECT doc_id,
         LENGTH(text) AS n_chars,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         {stop_expr} AS n_stop,
         len(regexp_extract_all(text, '[0-9]')) AS n_digits,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
  FROM documents)
SELECT doc_id, n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND((n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE), {round_digits}) AS avg_token_len,
       ROUND(n_stop / CAST(n_tokens AS DOUBLE), {round_digits}) AS stopword_ratio,
       ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4
             + LEAST(n_stop / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.3
             + (1.0 - LEAST(n_digits / CAST(n_chars AS DOUBLE) * 10.0, 1.0)) * 0.2
             + (1.0 - LEAST(n_punct / CAST(n_chars AS DOUBLE) * 10.0, 1.0)) * 0.1,
             {round_digits}) AS quality_score
FROM feats ORDER BY doc_id
""".strip()


def token_stats(docs: DataFrame) -> DataFrame:
    """Corpus token-count histogram in buckets of 10 tokens."""
    n_tokens = F.regexp_count(F.col("text"), F.lit(r"\S+"))
    return (
        docs.select((F.floor(n_tokens / 10) * 10).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket")
    )


TOKEN_STATS_SQL = r"""
SELECT CAST(FLOOR(len(regexp_extract_all(text, '\S+')) / 10) * 10 AS BIGINT) AS bucket,
       COUNT(*) AS n_docs
FROM documents GROUP BY bucket ORDER BY bucket
"""

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation marks
# (the GPT-2-family pre-tokenizer shape, reduced to a regex whose semantics
# are identical in Java regex and RE2 so Spark and DuckDB agree exactly)
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_counts(docs: DataFrame, round_digits: int = 6) -> DataFrame:
    """Per-doc token counts under BOTH tokenizations a training pipeline
    budgets with: whitespace tokens and BPE-ish subword pre-tokens, plus
    chars-per-token (the compression-ratio proxy). All JVM built-ins."""
    text = F.col("text")
    n_ws = F.regexp_count(text, F.lit(r"\S+")).cast("long")
    n_bpe = F.regexp_count(F.lower(text), F.lit(BPE_ISH_PATTERN)).cast("long")
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(F.length(text) / F.greatest(n_bpe, F.lit(1)), round_digits).alias(
            "chars_per_token"
        ),
    ).orderBy("doc_id")


def token_counts_oracle_sql(round_digits: int = 6) -> str:
    return rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
         AS n_bpe_tokens,
       ROUND(LENGTH(text) / GREATEST(
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')), 1)::DOUBLE,
         {round_digits}) AS chars_per_token
FROM documents ORDER BY doc_id
""".strip()


# ------------------------------------------------------------- repetition --

def repetition_stats(docs: DataFrame, round_digits: int = 6) -> DataFrame:
    """Gopher-style repetition features (Rae et al. 2021, §A1.1), adapted to
    token streams: duplicate-token fraction, top-2-gram occurrence fraction,
    duplicate-5-gram occurrence fraction, plus the pinned keep flag a
    filtering pipeline applies before training.

    All JVM built-ins, ONE corpus pass: both gram sizes come from a single
    higher-order ``transform`` (no UDF), tagged with k and exploded once;
    one (doc_id, k, gram) count with map-side partial aggregation (shuffle
    proportional to DISTINCT grams per doc), then one conditional per-doc
    rollup — at 100-TB scale this halves the scans and co-keys both shuffle
    stages on doc_id. ``keep`` compares the ROUNDED ratios so engines
    tie-break identically.
    """
    toks = F.array_remove(F.split(F.col("text"), " "), "")
    d = (
        docs.select("doc_id", toks.alias("toks"))
        .withColumn("n", F.size("toks").cast("double"))
        .withColumn(
            "dup_token_ratio",
            F.round(
                1.0 - F.size(F.array_distinct("toks")) / F.col("n"), round_digits
            ),
        )
    )

    def grams(k: int):
        joined = ", ".join(f"element_at(toks, i+{j})" for j in range(k))
        expr = (
            f"transform(sequence(1, size(toks)-{k - 1}), "
            f"i -> struct({k} AS k, concat_ws(' ', {joined}) AS g))"
        )
        return F.when(F.size("toks") >= k, F.expr(expr)).otherwise(
            F.expr("array()").cast("array<struct<k:int,g:string>>")
        )

    counts = (
        d.select("doc_id", F.explode(F.concat(grams(2), grams(5))).alias("kg"))
        .groupBy("doc_id", "kg.k", "kg.g")
        .agg(F.count("*").alias("c"))
    )
    k2, k5 = F.col("k") == 2, F.col("k") == 5
    rollup = counts.groupBy("doc_id").agg(
        F.max(F.when(k2, F.col("c"))).alias("top2"),
        F.sum(F.when(k2, F.col("c"))).alias("tot2"),
        F.sum(F.when(k5 & (F.col("c") > 1), F.col("c")).otherwise(0)).alias("dup5"),
        F.sum(F.when(k5, F.col("c"))).alias("tot5"),
    )
    out = (
        d.join(rollup, "doc_id", "left")
        .withColumn(
            "top_2gram_ratio",
            F.round(F.coalesce(F.col("top2") / F.col("tot2"), F.lit(0.0)), round_digits),
        )
        .withColumn(
            "dup_5gram_ratio",
            F.round(F.coalesce(F.col("dup5") / F.col("tot5"), F.lit(0.0)), round_digits),
        )
        .withColumn(
            "keep",
            (F.col("top_2gram_ratio") <= 0.20)
            & (F.col("dup_5gram_ratio") <= 0.30)
            & (F.col("dup_token_ratio") <= 0.90),
        )
    )
    return out.select(
        "doc_id", "dup_token_ratio", "top_2gram_ratio", "dup_5gram_ratio", "keep"
    ).orderBy("doc_id")


def repetition_oracle_sql(round_digits: int = 6) -> str:
    """DuckDB twin of :func:`repetition_stats` — n-grams via 1-based
    inclusive list slices over UNNESTed start positions."""
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents),
base AS (
  SELECT doc_id,
         ROUND(1.0 - len(list_distinct(l)) / CAST(len(l) AS DOUBLE), {round_digits})
           AS dup_token_ratio
  FROM toks),
g2 AS (SELECT doc_id, array_to_string(l[i:i+1], ' ') AS g
       FROM toks, UNNEST(range(1, len(l))) AS u(i)),
c2 AS (SELECT doc_id, g, count(*) c FROM g2 GROUP BY 1, 2),
a2 AS (SELECT doc_id, max(c) top2, sum(c) tot2 FROM c2 GROUP BY 1),
g5 AS (SELECT doc_id, array_to_string(l[i:i+4], ' ') AS g
       FROM toks, UNNEST(range(1, len(l)-3)) AS u(i)),
c5 AS (SELECT doc_id, g, count(*) c FROM g5 GROUP BY 1, 2),
a5 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) dup5, sum(c) tot5
       FROM c5 GROUP BY 1),
r AS (
  SELECT base.doc_id,
         dup_token_ratio,
         ROUND(COALESCE(top2 / CAST(tot2 AS DOUBLE), 0.0), {round_digits})
           AS top_2gram_ratio,
         ROUND(COALESCE(dup5 / CAST(tot5 AS DOUBLE), 0.0), {round_digits})
           AS dup_5gram_ratio
  FROM base LEFT JOIN a2 USING(doc_id) LEFT JOIN a5 USING(doc_id))
SELECT doc_id, dup_token_ratio, top_2gram_ratio, dup_5gram_ratio,
       (top_2gram_ratio <= 0.20 AND dup_5gram_ratio <= 0.30
        AND dup_token_ratio <= 0.90) AS keep
FROM r ORDER BY doc_id
""".strip()


# --------------------------------------------------------- decontamination --

def ngram_col(n: int):
    """Token ``n``-gram array column over a ``toks`` column — THE single
    gram derivation shared by the exact decontamination semi-join and the
    Bloom scale path (`pipeline.bloom`): both twins' guarantees (shared
    oracle, no-false-negatives subset) require token-identical grams."""
    joined = ", ".join(f"element_at(toks, i+{j})" for j in range(n))
    return F.when(
        F.size("toks") >= n,
        F.expr(
            f"transform(sequence(1, size(toks)-{n - 1}), "
            f"i -> concat_ws(' ', {joined}))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))


def contamination_flags(
    docs: DataFrame, benchmark_ids: list[int], n: int = 8
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM training-data hygiene
    step): flag every non-benchmark doc sharing ANY token ``n``-gram with
    the benchmark set. One explode->semi-join keyed on the gram string;
    the benchmark side is tiny (distinct grams of the eval set) so the
    join broadcasts, and the corpus side streams — no all-pairs stage."""
    toks = F.array_remove(F.split(F.col("text"), " "), "")
    grams = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.explode(ngram_col(n)).alias("g")
    )
    bench = [int(i) for i in benchmark_ids]
    bench_grams = grams.filter(F.col("doc_id").isin(bench)).select("g").distinct()
    return (
        grams.filter(~F.col("doc_id").isin(bench))
        .join(bench_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )


def contamination_oracle_sql(benchmark_ids: list[int], n: int = 8) -> str:
    ids = ", ".join(str(int(i)) for i in benchmark_ids)
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents),
g AS (SELECT doc_id, array_to_string(l[i:i+{n - 1}], ' ') AS g
      FROM toks, UNNEST(range(1, len(l)-{n - 2})) AS u(i)),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id IN ({ids}))
SELECT DISTINCT doc_id FROM g
WHERE doc_id NOT IN ({ids}) AND g IN (SELECT g FROM bench)
ORDER BY doc_id
""".strip()


# ------------------------------------------------------------- language ID --

# character-trigram profiles per language; tiny pinned tables (a real system
# ships learned profiles — same plumbing, richer data)
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", " th", "he "),
    "de": ("der", "sch", "ein", "ich", "und"),
    "es": ("que", "ión", " de", "los", "nte"),
    "fr": ("les", "ent", " de", "ion", "que"),
    "zh": ("的", "是", "了", "在", "有"),
}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, confidence) via n-gram-profile hit rates —
    vectorized pandas str ops, one pass per profile. Ties break by profile
    declaration order (idxmax takes the first column); rounding happens
    OUTSIDE the UDF with F.round so the oracle's ROUND matches exactly
    (pandas .round is half-even, SQL ROUND is half-away)."""
    profiles = _LANG_PROFILES

    @F.pandas_udf("pred_lang string, confidence double")
    def lid(text: pd.Series) -> pd.DataFrame:
        lower = text.str.lower()
        n = lower.str.len().clip(lower=1)
        scores = {}
        for lang, grams in profiles.items():
            s = None
            for g in grams:
                c = lower.str.count(re.escape(g))
                s = c if s is None else s + c
            scores[lang] = s / n
        M = pd.DataFrame(scores)
        pred = M.idxmax(axis=1)
        conf = M.max(axis=1)
        pred = pred.where(conf > 0, "unknown")
        return pd.DataFrame({"pred_lang": pred, "confidence": conf})

    return docs.select("doc_id", lid(F.col(text_col)).alias("r")).select(
        "doc_id", "r.pred_lang", F.round("r.confidence", 6).alias("confidence")
    )


def lang_id_oracle_sql(round_digits: int = 6) -> str:
    """DuckDB twin of :func:`lang_id`: per-language score = non-overlapping
    profile-gram occurrences (replace-based count, same semantics as
    pandas ``str.count``) / char length; argmax with first-declared-wins
    tie-break, 'unknown' on all-zero."""

    def cnt(g: str) -> str:
        q = g.replace("'", "''")
        return f"(length(lt) - length(replace(lt, '{q}', ''))) / {len(g)}"

    score_cols = ",\n         ".join(
        f"({' + '.join(cnt(g) for g in grams)}) / greatest(length(text), 1)::DOUBLE"
        f" AS s_{lang}"
        for lang, grams in _LANG_PROFILES.items()
    )
    langs = list(_LANG_PROFILES)
    # first-declared-wins argmax: lang_i wins iff >= every later lang and
    # > no earlier lang beat it (encoded by the CASE order)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{later}" for later in langs[i + 1 :]]
        cond = " AND ".join(conds) if conds else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    pred = "CASE " + " ".join(cases) + " END"
    conf = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    return f"""
WITH s AS (
  SELECT doc_id,
         {score_cols}
  FROM (SELECT doc_id, text, lower(text) AS lt FROM documents))
SELECT doc_id,
       CASE WHEN {conf} > 0 THEN {pred} ELSE 'unknown' END AS pred_lang,
       ROUND({conf}, {round_digits}) AS confidence
FROM s ORDER BY doc_id
""".strip()


# ------------------------------------------------------------- winnowing ---

def winnow_fingerprints(
    docs: DataFrame, k: int = 4, window: int = 5
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 — the
    classic MOSS scheme): hash of token k-grams, keep the min hash of every
    ``window`` consecutive k-gram hashes, dedupe.

    Fully vectorized over each Arrow batch — NO per-row/per-k-gram Python
    (round 1 called zlib.crc32 once per k-gram inside a per-doc loop):
    tokens of the whole batch are hashed in one ``pd.util.hash_array`` call,
    k-gram hashes come from k shifted multiply-adds over the flat hash array
    (polynomial in a fixed 64-bit base, wrapping), the window minimum is one
    batch-global ``sliding_window_view`` whose cross-document windows are
    masked out, and per-doc dedupe is a lexsort + boundary diff.
    """
    coeffs = [np.uint64((0x100000001B3 ** (k - 1 - j)) % (1 << 64)) for j in range(k)]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow(text: pd.Series) -> pd.Series:
        tok_lists = text.str.split().to_numpy()
        nrows = len(tok_lists)
        lens = np.fromiter((len(t) for t in tok_lists), np.int64, nrows)
        total = int(lens.sum())
        out: list[list[int]] = [[] for _ in range(nrows)]
        if total < k:
            return pd.Series(out)
        flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
        h = pd.util.hash_array(flat)  # vectorized 64-bit string hash
        offsets = np.concatenate(([0], np.cumsum(lens)))
        n_kg = total - k + 1
        kg = np.zeros(n_kg, dtype=np.uint64)
        for j in range(k):
            kg += h[j : j + n_kg] * coeffs[j]
        m = np.maximum(lens - k + 1, 0)  # valid k-gram count per doc
        doc_pairs: list[np.ndarray] = []
        fp_pairs: list[np.ndarray] = []
        # full windows (docs with m_d >= window): batch-global sliding min,
        # keep only windows lying entirely inside one doc's k-gram range
        if n_kg >= window:
            mins = np.lib.stride_tricks.sliding_window_view(kg, window).min(axis=1)
            starts = np.arange(mins.size, dtype=np.int64)
            d = np.searchsorted(offsets, starts, side="right") - 1
            valid = starts + window <= offsets[d] + m[d]
            doc_pairs.append(d[valid])
            fp_pairs.append(mins[valid])
        # short docs (1 <= m_d < window): single fingerprint = min of the
        # doc's k-gram hashes (bounded slice min each; short docs are rare)
        short = np.flatnonzero((m >= 1) & (m < window))
        if short.size:
            smin = np.array(
                [kg[offsets[i] : offsets[i] + m[i]].min() for i in short],
                dtype=np.uint64,
            )
            doc_pairs.append(short)
            fp_pairs.append(smin)
        if not doc_pairs:
            return pd.Series(out)
        didx = np.concatenate(doc_pairs)
        fps = np.concatenate(fp_pairs).astype(np.int64)
        order = np.lexsort((fps, didx))
        didx, fps = didx[order], fps[order]
        keep = np.empty(didx.size, dtype=bool)
        keep[0] = True
        keep[1:] = (didx[1:] != didx[:-1]) | (fps[1:] != fps[:-1])
        didx, fps = didx[keep], fps[keep]
        bounds = np.flatnonzero(np.diff(didx, prepend=didx[0] - 1))
        for b, i in enumerate(didx[bounds]):
            lo = bounds[b]
            hi = bounds[b + 1] if b + 1 < bounds.size else didx.size
            out[int(i)] = fps[lo:hi].tolist()
        return pd.Series(out)

    return docs.select("doc_id", winnow(F.col("text")).alias("fingerprints"))


def winnow_overlap_pairs(docs: DataFrame, min_shared: int = 2) -> DataFrame:
    """Doc pairs sharing >= min_shared winnowed fingerprints (plagiarism-
    detection join shape: explode -> equi-join on fingerprint)."""
    fps = winnow_fingerprints(docs).select(
        "doc_id", F.explode("fingerprints").alias("fp")
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )
