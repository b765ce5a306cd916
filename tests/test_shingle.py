"""Shingle filter (Lucene ShingleFilter / ES shingle) — A86."""

from __future__ import annotations

import pytest

from miru_spark.functions.tokenize import doc_len_col, tokenize_py, tokens_col
from miru_spark.plans.relational import SHINGLE_TOK_SQL, bm25_oracle_sql


def test_shingle_semantics_and_impl_identity(spark):
    rows = [("A b  c",), ("solo",), ("x y",), ("",)]
    df = spark.createDataFrame(rows, "content string")
    got = df.select(
        tokens_col("content", "shingle").alias("t"),
        doc_len_col("content", "shingle").alias("n"),
    ).collect()
    for (text,), r in zip(rows, got):
        want = tokenize_py(text, "shingle")
        assert list(r["t"]) == want, text
        assert r["n"] == len(want)
    assert tokenize_py("A b  c", "shingle") == ["a", "b", "c", "a b", "b c"]
    assert tokenize_py("solo", "shingle") == ["solo"]
    assert tokenize_py("", "shingle") == []


@pytest.fixture(scope="module")
def sh_reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("shidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
                tokenizer="shingle", target_chunk=64)
    return IndexReader(spark, p)


@pytest.mark.parametrize(
    "terms,mode",
    [
        (["join hash"], "conjunctive"),
        (["join hash", "dup"], "conjunctive"),
        (["tree node", "join hash"], "disjunctive"),
        (["the", "a b"], "conjunctive"),
    ],
    ids=lambda x: str(x),
)
def test_shingle_index_matches_oracle(sh_reader, duck, terms, mode):
    from miru_spark.plans.search import search_topk

    got = [
        (int(d), round(float(s), 6))
        for d, s in search_topk(sh_reader, terms, mode=mode, k=10)
    ]
    exp = duck.execute(
        bm25_oracle_sql(terms, mode, tok_sql=SHINGLE_TOK_SQL)
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_bigram_term_is_positionless_phrase(sh_reader, spark):
    """The shingle index's bigram lookup finds exactly the docs an exact
    phrase search finds on a positional index — the phrase-as-term trade."""
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.plans.search import search_phrase, search_topk
    from tests.conftest import SF_DIR

    import tempfile

    from miru_spark.schema import read_corpus

    p = tempfile.mkdtemp(prefix="shpos_") + "/idx"
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
                positions=True, target_chunk=64)
    pos_reader = IndexReader(spark, p)
    sh = {d for d, _ in search_topk(sh_reader, ["join hash"], k=1 << 30)}
    ph = {d for d, _ in search_phrase(pos_reader, "join hash", k=1 << 30)}
    assert sh == ph and sh


def test_shingle_vocab_contains_both_grams(sh_reader):
    """output_unigrams=true: both the unigram and the bigram are terms."""
    tps = sh_reader.fetch_terms(["join", "join hash"])
    assert set(tps) == {"join", "join hash"}
