"""A80 — has_child / has_parent (Elasticsearch join field / Lucene
``ToParentBlockJoinQuery`` + ``ToChildBlockJoinQuery``): relational
queries over the corpus's natural parent-child hierarchy — repo (parent)
-> file (child):

* :func:`search_has_child` — "repos where some file matches Q": the
  child query runs on files, PARENTS come back, scored by ``score_mode``
  (``max | sum | avg | min | none``) over their matching children, with
  ES's ``min_children`` / ``max_children`` bounds on the matching-child
  count.
* :func:`search_has_parent` — "files whose repo matches Q": the query
  decides which parents qualify, all their children come back; with
  ``score=True`` each child inherits its parent's score (ES
  ``has_parent`` score passing), else constant 1.0.

Plan shape (and the 100-TB story): the child query is the standard
distributed BM25 candidate plan; the parent hop is ONE hash aggregation
by the parent key after a docmap projection join — both map-side
combinable, so the shuffle carries one row per (matching doc) and then
one per parent. has_parent adds a second docmap join fanning qualifying
parents back out to children; AQE broadcasts the qualifying-parent side
(it is at most one row per parent). Nothing here is quadratic and no
driver-side id list exists on either hop. ES implements the same shapes
with block-indexed parents precisely because a join at query time was
too expensive for them — Spark's hash joins over a columnar docmap ARE
that precomputation here.

ES semantic notes carried over: ``inner_hits`` (the top matching
children per returned parent) is exactly :func:`search_collapse` over
the same child query — compose them instead of a second implementation;
``score_mode="none"`` returns constant 1.0 (filter context); parents are
returned even when tombstoned children exist (tombstones already vanish
inside the child candidate plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index.reader import IndexReader

_SCORE_MODES = ("max", "sum", "avg", "min", "none")


def _check(score_mode: str, min_children: int, max_children: int | None):
    if score_mode not in _SCORE_MODES:
        raise ValueError(
            f"unknown score_mode {score_mode!r}; have {_SCORE_MODES}"
        )
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    if max_children is not None and max_children < min_children:
        raise ValueError("max_children must be >= min_children")


def _parent_agg(
    reader: IndexReader,
    terms: list[str],
    mode: str,
    score_mode: str,
    parent_field: str,
    min_children: int,
    max_children: int | None,
    round_digits: int,
    exclude: list[str] | None,
    where: dict | None,
) -> DataFrame:
    """(parent, score, n_children) for every qualifying parent — the shared
    core of has_child (ranked head) and has_parent (fan back to children)."""
    from miru_spark.plans.search import search_distributed

    scored = search_distributed(
        reader, terms, mode=mode, k=None, round_digits=round_digits,
        exclude=exclude, where=where,
    )
    dm = reader.docmap_df().select("doc_id", parent_field)
    agg_fn = {
        "max": F.max, "sum": F.sum, "avg": F.avg, "min": F.min,
        "none": lambda c: F.lit(1.0),
    }[score_mode]
    g = (
        scored.join(dm, "doc_id")
        .groupBy(parent_field)
        .agg(
            F.round(agg_fn(F.col("score")), round_digits).alias("score"),
            F.count(F.lit(1)).alias("n_children"),
        )
        .filter(F.col("n_children") >= min_children)
    )
    if max_children is not None:
        g = g.filter(F.col("n_children") <= max_children)
    return g


def search_has_child(
    reader: IndexReader,
    terms: list[str],
    mode: str = "disjunctive",
    score_mode: str = "max",
    k: int = 10,
    min_children: int = 1,
    max_children: int | None = None,
    parent_field: str = "repo",
    round_digits: int = 6,
    exclude: list[str] | None = None,
    where: dict | None = None,
) -> DataFrame:
    """ES ``has_child``: parents ranked by score_mode over their matching
    children. Returns (parent_field, score, n_children) ordered by
    (score desc, parent asc)."""
    _check(score_mode, min_children, max_children)
    g = _parent_agg(
        reader, terms, mode, score_mode, parent_field, min_children,
        max_children, round_digits, exclude, where,
    )
    return g.orderBy(F.desc("score"), F.asc(parent_field)).limit(k)


def search_has_parent(
    reader: IndexReader,
    terms: list[str],
    mode: str = "disjunctive",
    score: bool = True,
    score_mode: str = "max",
    k: int = 10,
    parent_field: str = "repo",
    round_digits: int = 6,
    exclude: list[str] | None = None,
    where: dict | None = None,
) -> DataFrame:
    """ES ``has_parent``: every child of a qualifying parent (a parent
    qualifies when >= 1 of its docs matches the query), each child
    carrying its parent's score (or 1.0 with ``score=False``). Returns
    (doc_id, score) ordered by (score desc, doc_id asc)."""
    _check(score_mode, 1, None)
    g = _parent_agg(
        reader, terms, mode, score_mode if score else "none", parent_field,
        1, None, round_digits, exclude, where,
    ).select(parent_field, "score")
    children = reader.docmap_df().select("doc_id", parent_field)
    tomb = reader.tombstones_df()
    if tomb is not None:
        # a parent qualified by its LIVE children still fans out over the
        # docmap, which keeps tombstoned siblings until purge — drop them
        # here (same live-docs discipline as every serving path)
        children = children.join(tomb, "doc_id", "left_anti")
    return (
        children.join(g, parent_field)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


_AGG_SQL = {
    "max": "max(s.score)", "sum": "sum(s.score)", "avg": "avg(s.score)",
    "min": "min(s.score)", "none": "1.0",
}


def has_child_oracle_sql(
    terms: list[str],
    mode: str = "disjunctive",
    score_mode: str = "max",
    k: int = 10,
    min_children: int = 1,
    max_children: int | None = None,
    round_digits: int = 6,
    exclude: list[str] | None = None,
) -> str:
    """DuckDB twin over the documents view (engine repo == documents
    source, the same identity the collapse oracle pins)."""
    from miru_spark.plans.relational import bm25_oracle_sql

    _check(score_mode, min_children, max_children)
    inner = bm25_oracle_sql(
        terms, mode, k=1 << 30, round_digits=round_digits, exclude=exclude
    )
    having = f"count(*) >= {min_children}"
    if max_children is not None:
        having += f" AND count(*) <= {max_children}"
    return f"""
WITH scored AS ({inner}),
dm AS (SELECT doc_id, source AS repo FROM documents)
SELECT dm.repo AS repo,
       round({_AGG_SQL[score_mode]}, {round_digits}) AS score,
       CAST(count(*) AS BIGINT) AS n_children
FROM scored s JOIN dm USING (doc_id)
GROUP BY dm.repo
HAVING {having}
ORDER BY score DESC, repo LIMIT {k}
""".strip()


def has_parent_oracle_sql(
    terms: list[str],
    mode: str = "disjunctive",
    score: bool = True,
    score_mode: str = "max",
    k: int = 10,
    round_digits: int = 6,
    exclude: list[str] | None = None,
) -> str:
    from miru_spark.plans.relational import bm25_oracle_sql

    _check(score_mode, 1, None)
    inner = bm25_oracle_sql(
        terms, mode, k=1 << 30, round_digits=round_digits, exclude=exclude
    )
    agg = _AGG_SQL[score_mode if score else "none"]
    return f"""
WITH scored AS ({inner}),
dm AS (SELECT doc_id, source AS repo FROM documents),
parents AS (
  SELECT dm.repo AS repo, round({agg}, {round_digits}) AS score
  FROM scored s JOIN dm USING (doc_id) GROUP BY dm.repo
)
SELECT dm.doc_id AS doc_id, p.score AS score
FROM dm JOIN parents p USING (repo)
ORDER BY score DESC, doc_id LIMIT {k}
""".strip()
