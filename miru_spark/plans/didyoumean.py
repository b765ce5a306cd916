"""A75 — phrase suggester (ES ``phrase`` suggester / did-you-mean for whole
queries): per-token candidate generation from the index's fuzzy dictionary,
then a bigram-language-model rerank of the candidate phrases — 'joni hsah'
-> 'join hash' even though each token's best SINGLE-term correction is
picked without context by A37's DirectSpellChecker.

Exactly the ES design: candidates come from the term dictionary (self +
neighbors within ``max_edits``, ranked by edit distance then corpus
frequency, capped), and the reranker is the add-k bigram model of
`pipeline.lm` trained on the corpus — score(phrase) = ln P(w1) +
Σ ln P(w_{i+1}|w_i). Candidate lists are tiny (``max_candidates`` per
token), so the phrase beam is a driver-side product over collected counts:
two small filtered collects against the LM tables, no corpus pass at
query time."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index.reader import IndexReader, lev_dist_bounded as _lev_dist


def suggest_phrase(
    reader: IndexReader,
    query: str,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab_size: int,
    max_edits: int = 1,
    max_candidates: int = 5,
    k_smooth: float = 0.5,
    top_n: int = 3,
    beam: int = 64,
    total_tokens: int | None = None,
) -> list[tuple[str, float]]:
    """Top ``top_n`` corrected phrases as (suggestion, round(lm_score, 6)),
    ordered by score desc then suggestion asc. Unknown tokens with no
    dictionary neighbors stay verbatim (scored through smoothing); the
    oracle twin carries the same fallback row. ``beam`` bounds the partial
    phrases kept per position (a REAL beam — long queries stay linear, not
    max_candidates^n); it only affects queries where
    max_candidates^(position) exceeds it, so short oracle-checked queries
    are exact. Pass ``total_tokens`` (the LM's Σ unigram counts) to skip
    recomputing the train-time constant per call. Assumes the repo-wide
    pre-normalized single-space corpus convention (same as every oracle)."""
    tokens = query.split()
    if not tokens:
        raise ValueError("empty query")
    if max_candidates < 1 or top_n < 1 or beam < 1:
        raise ValueError("max_candidates, top_n, and beam must be >= 1")
    # unigram counts for every candidate, gathered in one filtered collect
    cand_lists: list[list[str]] = []
    all_cands: set[str] = set()
    for t in tokens:
        cands = reader.expand_fuzzy(t, max_edits=max_edits)
        if not cands:
            cands = [t]
        all_cands.update(cands)
        cand_lists.append(cands)
    c1 = {
        r["w1"]: int(r["c1"])
        for r in unigrams.filter(F.col("w1").isin(list(all_cands))).collect()
    }
    tot = (
        int(total_tokens)
        if total_tokens is not None
        else unigrams.agg(F.sum("c1")).first()[0] or 0
    )
    # rank each token's candidates by (edit distance, corpus freq desc,
    # term asc) — the same key the SQL twin orders by — and cap
    for i, t in enumerate(tokens):
        cand_lists[i] = sorted(
            cand_lists[i],
            key=lambda c: (_lev_dist(t, c, max_edits), -c1.get(c, 0), c),
        )[:max_candidates]
    pairs = {
        (a, b)
        for i in range(len(tokens) - 1)
        for a in cand_lists[i]
        for b in cand_lists[i + 1]
    }
    c12 = {}
    if pairs:
        w1s = list({a for a, _ in pairs})
        rows = (
            bigrams.filter(F.col("w1").isin(w1s))
            .filter(F.col("w2").isin(list({b for _, b in pairs})))
            .collect()
        )
        c12 = {(r["w1"], r["w2"]): int(r["c12"]) for r in rows}
    k, V = float(k_smooth), float(vocab_size)

    def lp_start(w: str) -> float:
        return math.log((c1.get(w, 0) + k) / (tot + k * V))

    def lp_next(a: str, b: str) -> float:
        return math.log((c12.get((a, b), 0) + k) / (c1.get(a, 0) + k * V))

    phrases: list[tuple[list[str], float]] = [([w], lp_start(w)) for w in cand_lists[0]]
    for cands in cand_lists[1:]:
        phrases = [
            (p + [w], s + lp_next(p[-1], w)) for p, s in phrases for w in cands
        ]
        if len(phrases) > beam:  # beam prune, deterministic tie-break
            phrases.sort(key=lambda r: (-r[1], r[0]))
            phrases = phrases[:beam]
    scored = sorted(
        ((" ".join(p), round(s, 6)) for p, s in phrases),
        key=lambda r: (-r[1], r[0]),
    )
    return scored[:top_n]


def phrase_suggest_oracle_sql(
    q1: str,
    q2: str,
    max_edits: int = 1,
    max_candidates: int = 5,
    k_smooth: float = 0.5,
    top_n: int = 3,
) -> str:
    """DuckDB twin for the two-token case: the same candidate ranking
    (levenshtein, corpus freq desc, term asc — capped), the same add-k
    bigram scores over a self-trained model."""
    kf, me, mc = float(k_smooth), int(max_edits), int(max_candidates)
    a = q1.replace("'", "''")
    b = q2.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents),
uni AS (SELECT w1, count(*) c1
        FROM (SELECT unnest(l) AS w1 FROM toks) GROUP BY 1),
v AS (SELECT count(*)::DOUBLE nv, sum(c1)::DOUBLE tot FROM uni),
bg AS (SELECT w1, w2, count(*) c12
       FROM (SELECT l[i] AS w1, l[i+1] AS w2
             FROM toks, UNNEST(range(1, len(l))) AS u(i)
             WHERE len(l) >= 2) GROUP BY 1, 2),
ca0 AS (SELECT w1 AS t, c1 FROM uni WHERE levenshtein(w1, '{a}') <= {me}
        ORDER BY levenshtein(w1, '{a}'), c1 DESC, w1 LIMIT {mc}),
cb0 AS (SELECT w1 AS t, c1 FROM uni WHERE levenshtein(w1, '{b}') <= {me}
        ORDER BY levenshtein(w1, '{b}'), c1 DESC, w1 LIMIT {mc}),
-- verbatim fallback, mirroring the engine: a token with no dictionary
-- neighbors stays itself, scored through smoothing
ca AS (SELECT * FROM ca0 UNION ALL
       SELECT '{a}', COALESCE((SELECT c1 FROM uni WHERE w1 = '{a}'), 0)
       WHERE NOT EXISTS (SELECT 1 FROM ca0)),
cb AS (SELECT * FROM cb0 UNION ALL
       SELECT '{b}', COALESCE((SELECT c1 FROM uni WHERE w1 = '{b}'), 0)
       WHERE NOT EXISTS (SELECT 1 FROM cb0)),
scored AS (
  SELECT ca.t || ' ' || cb.t AS suggestion,
         round(ln((ca.c1 + {kf!r}) / (v.tot + {kf!r} * v.nv))
               + ln((COALESCE(bg.c12, 0) + {kf!r})
                    / (ca.c1 + {kf!r} * v.nv)), 6) AS score
  FROM ca CROSS JOIN cb
  LEFT JOIN bg ON bg.w1 = ca.t AND bg.w2 = cb.t, v)
SELECT suggestion, score FROM scored
ORDER BY score DESC, suggestion LIMIT {int(top_n)}
""".strip()
