"""Index-path correctness entries for the driver.

The binary-index fast paths (block-max WAND, galloping intersection, and the
distributed DataFrame scorer) are checked against the SAME ANSI-SQL BM25
oracle as the relational twin — proving index build + compression + merge +
scoring end-to-end, not just the relational reformulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from miru_spark.plans.relational import (
    bm25_fuzzy_oracle_sql,
    bm25_oracle_sql,
    bm25_phrase_oracle_sql,
    bm25_prefix_oracle_sql,
    facet_oracle_sql,
)

CASES = {
    "bm25_index_wand_disj2": (["join", "dup"], "disjunctive"),
    "bm25_index_wand_disj5": (["join", "hash", "dup", "sort", "merge"], "disjunctive"),
    "bm25_index_conj2": (["join", "hash"], "conjunctive"),
    "bm25_index_conj3": (["the", "a", "data"], "conjunctive"),
}

# boolean NOT (posting-list difference): (terms, mode, exclude)
NOT_CASES = {
    "bm25_index_not_conj": (["join", "hash"], "conjunctive", ["tree"]),
    "bm25_index_not_disj": (["the", "dup"], "disjunctive", ["join", "hash"]),
}

DIST_CASES = {
    "bm25_index_dist_conj2": (["join", "hash"], "conjunctive"),
    "bm25_index_dist_disj2": (["the", "dup"], "disjunctive"),
}

DIST_NOT_CASES = {
    "bm25_index_dist_not": (["the", "a"], "conjunctive", ["dup"]),
}

# prefix queries (term-dictionary expansion -> scored OR): name -> prefix
PREFIX_CASES = {
    "bm25_index_prefix_s": "s",  # scan slow small sort spark stream
    "bm25_index_prefix_exact": "dup",  # prefix == a whole term
}

DIST_PREFIX_CASES = {
    "bm25_index_dist_prefix_c": "c",  # column customer
}

# fuzzy queries (Levenshtein <=1 dictionary expansion): name -> probe term
FUZZY_CASES = {
    "bm25_index_fuzzy_ag": "ag",  # -> a, agg (misspelling hits two terms)
    "bm25_index_fuzzy_hsh": "hsh",  # -> hash
}

# facet counts over the full candidate set: name -> (terms, mode, facet)
FACET_CASES = {
    "bm25_index_facets_conj": (["the", "a"], "conjunctive", "lang"),
    "bm25_index_facets_disj": (["join", "dup"], "disjunctive", "lang"),
}

PHRASE_DIST_CASES = {
    "bm25_index_dist_phrase2": "the a",
}


def _mk_topk(terms, mode, exclude=None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from miru_spark.plans.flagship import ensure_index
        from miru_spark.plans.search import search_topk

        reader = ensure_index(spark, sf_dir)
        rows = [
            (int(d), round(float(s), 6))
            for d, s in search_topk(reader, terms, mode=mode, k=10, exclude=exclude)
        ]
        return spark.createDataFrame(rows, "doc_id long, score double")

    return run


def _mk_dist(terms, mode, exclude=None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from miru_spark.plans.flagship import ensure_index
        from miru_spark.plans.search import search_distributed

        reader = ensure_index(spark, sf_dir)
        return search_distributed(reader, terms, mode=mode, k=10, exclude=exclude)

    return run


def _mk_prefix(prefix):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from miru_spark.plans.flagship import ensure_index
        from miru_spark.plans.search import search_prefix

        reader = ensure_index(spark, sf_dir)
        rows = [
            (int(d), round(float(s), 6))
            for d, s in search_prefix(reader, prefix, k=10)
        ]
        return spark.createDataFrame(rows, "doc_id long, score double")

    return run


def _mk_prefix_dist(prefix):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from miru_spark.plans.flagship import ensure_index
        from miru_spark.plans.search import search_distributed

        reader = ensure_index(spark, sf_dir)
        terms = reader.expand_prefix(prefix)
        return search_distributed(reader, terms, mode="disjunctive", k=10)

    return run


def _mk_fuzzy(probe):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from miru_spark.plans.flagship import ensure_index
        from miru_spark.plans.search import search_fuzzy

        reader = ensure_index(spark, sf_dir)
        rows = [
            (int(d), round(float(s), 6))
            for d, s in search_fuzzy(reader, probe, max_edits=1, k=10)
        ]
        return spark.createDataFrame(rows, "doc_id long, score double")

    return run


def _mk_facets(terms, mode, facet):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from miru_spark.plans.flagship import ensure_index
        from miru_spark.plans.search import search_facets

        reader = ensure_index(spark, sf_dir)
        return search_facets(reader, terms, mode=mode, facet_col=facet)

    return run


def _mk_phrase_dist(phrase):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from miru_spark.plans.flagship import ensure_index
        from miru_spark.plans.search import search_phrase_distributed

        reader = ensure_index(spark, sf_dir)
        return search_phrase_distributed(reader, phrase, k=10)

    return run


def register_all(register) -> None:
    for name, (terms, mode) in CASES.items():
        register(name, _mk_topk(terms, mode), bm25_oracle_sql(terms, mode))
    for name, (terms, mode, excl) in NOT_CASES.items():
        register(
            name, _mk_topk(terms, mode, excl),
            bm25_oracle_sql(terms, mode, exclude=excl),
        )
    for name, (terms, mode) in DIST_CASES.items():
        register(name, _mk_dist(terms, mode), bm25_oracle_sql(terms, mode))
    for name, (terms, mode, excl) in DIST_NOT_CASES.items():
        register(
            name, _mk_dist(terms, mode, excl),
            bm25_oracle_sql(terms, mode, exclude=excl),
        )
    for name, prefix in PREFIX_CASES.items():
        register(name, _mk_prefix(prefix), bm25_prefix_oracle_sql(prefix))
    for name, prefix in DIST_PREFIX_CASES.items():
        register(name, _mk_prefix_dist(prefix), bm25_prefix_oracle_sql(prefix))
    for name, probe in FUZZY_CASES.items():
        register(name, _mk_fuzzy(probe), bm25_fuzzy_oracle_sql(probe, max_edits=1))
    for name, (terms, mode, facet) in FACET_CASES.items():
        register(
            name, _mk_facets(terms, mode, facet),
            facet_oracle_sql(terms, mode, facet),
        )
    for name, phrase in PHRASE_DIST_CASES.items():
        register(name, _mk_phrase_dist(phrase), bm25_phrase_oracle_sql(phrase))
