"""Pluggable similarity: classic TF-IDF (Lucene ClassicSimilarity)."""

from __future__ import annotations

import numpy as np
import pytest

from miru_spark.plans.relational import classic_oracle_sql
from miru_spark.plans.search import search_classic, search_topk


@pytest.fixture(scope="module")
def cl_reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("clidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
                target_chunk=64)
    return IndexReader(spark, p)


@pytest.mark.parametrize(
    "terms,mode",
    [
        (["the", "dup"], "disjunctive"),
        (["join", "hash"], "conjunctive"),
        (["the"], "disjunctive"),
        (["the", "a", "data"], "conjunctive"),
        (["zzz_missing", "the"], "disjunctive"),
        (["zzz_missing", "the"], "conjunctive"),
    ],
    ids=lambda x: str(x),
)
def test_classic_matches_oracle(cl_reader, duck, terms, mode):
    got = search_classic(cl_reader, terms, mode=mode, k=10)
    exp = duck.execute(classic_oracle_sql(terms, mode, k=10)).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_classic_candidate_set_is_bm25s(cl_reader):
    """Same index, same candidate plan: the doc SET equals BM25's for the
    same boolean query — only scores (and hence order) differ."""
    terms = ["the", "dup"]
    cl = search_classic(cl_reader, terms, mode="conjunctive", k=10**9)
    bm = search_topk(cl_reader, terms, mode="conjunctive", k=10**9)
    assert {d for d, _ in cl} == {d for d, _ in bm}


def test_classic_differs_from_bm25_rank(cl_reader):
    """The similarity is genuinely pluggable: on a query where length
    normalization matters the two orderings are not identical (if they
    were, the test corpus would be degenerate for this purpose)."""
    cl = [d for d, _ in search_classic(cl_reader, ["the", "a"], k=50)]
    bm = [d for d, _ in search_topk(cl_reader, ["the", "a"], k=50)]
    assert cl != bm


def test_classic_reference_formula():
    """Independent numpy recompute of one posting's contribution."""
    from miru_spark.functions.bm25 import classic_np

    tf = np.array([9]); dl = np.array([16])
    got = classic_np(tf, df=4.0, doc_len=dl, n_docs=99.0)
    want = 3.0 * (1.0 + np.log(100.0 / 5.0)) ** 2 / 4.0
    assert got.shape == (1,) and abs(float(got[0]) - want) < 1e-12


def test_classic_idf_monotone(cl_reader):
    """A rarer term (smaller df) contributes more per unit sqrt(tf)/sqrt(dl)
    — idf^2 is strictly decreasing in df."""
    from miru_spark.functions.bm25 import classic_np

    tf = np.array([1]); dl = np.array([1])
    rare = float(classic_np(tf, df=1.0, doc_len=dl, n_docs=1000.0)[0])
    common = float(classic_np(tf, df=900.0, doc_len=dl, n_docs=1000.0)[0])
    assert rare > common


def test_classic_validation(cl_reader):
    with pytest.raises(ValueError):
        search_classic(cl_reader, [], k=5)
    with pytest.raises(ValueError):
        search_classic(cl_reader, ["the"], mode="bogus")
