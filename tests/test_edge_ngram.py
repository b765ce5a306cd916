"""Edge n-gram autocomplete (Lucene EdgeNGramTokenFilter / ES edge_ngram)."""

from __future__ import annotations

import pytest

from miru_spark.functions.tokenize import EDGE_MAX, EDGE_MIN, tokenize_py, tokens_col
from miru_spark.plans.relational import EDGE_TOK_SQL, bm25_oracle_sql
from miru_spark.plans.search import search_topk


def test_edge_expansion_semantics(spark):
    """Prefixes EDGE_MIN..min(len, EDGE_MAX); preserveOriginal past
    EDGE_MAX; sub-EDGE_MIN tokens dropped; both impls token-identical."""
    text = "join a superLongIdentifier"
    want = [
        "jo", "joi", "join",
        "su", "sup", "supe", "super", "superl", "superlo", "superlon",
        "superlongidentifier",
    ]
    assert tokenize_py(text, "edge") == want
    row = spark.createDataFrame([(text,)], "content string")
    assert row.select(tokens_col("content", "edge")).first()[0] == want
    assert tokenize_py("x", "edge") == []  # below EDGE_MIN
    assert EDGE_MIN == 2 and EDGE_MAX == 8


@pytest.fixture(scope="module")
def edge_reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("edgeidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
                tokenizer="edge")
    return IndexReader(spark, p)


@pytest.mark.parametrize(
    "terms,mode",
    [(["jo"], "disjunctive"), (["joi", "ha"], "conjunctive"),
     (["join"], "disjunctive"), (["me", "so"], "disjunctive"),
     (["zz"], "disjunctive")],
    ids=lambda x: str(x),
)
def test_edge_index_matches_oracle(edge_reader, duck, terms, mode):
    got = [(d, round(s, 6)) for d, s in search_topk(edge_reader, terms, mode=mode, k=10)]
    exp = duck.execute(
        bm25_oracle_sql(terms, mode, tok_sql=EDGE_TOK_SQL)
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_edge_prefix_is_exact_lookup(edge_reader):
    """The autocomplete contract: every doc containing a token starting
    with 'jo' matches the exact term 'jo' — no dictionary expansion."""
    from miru_spark.plans.search import search_count

    from tests.conftest import SF_DIR
    import pyarrow.dataset as ds

    n = search_count(edge_reader, ["jo"], mode="disjunctive").first()["n_hits"]
    tbl = ds.dataset(f"{SF_DIR}/documents.parquet").to_table().to_pydict()
    want = sum(
        any(t.startswith("jo") for t in txt.split())
        for txt in tbl["text"]
    )
    assert n == want > 0
