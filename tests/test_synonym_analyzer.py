"""A112 — index-time synonym collapse (Lucene SynonymGraphFilter at index
time, keep-one-form strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.functions.tokenize import (
    SYNONYM_COLLAPSE,
    doc_len_col,
    tokenize_py,
    tokens_col,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def syn_reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus

    p = str(tmp_path_factory.mktemp("synidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
                tokenizer="synonyms")
    return IndexReader(spark, p)


def test_collapse_semantics(spark):
    """Spark column, Python twin, and doc_len fast path agree; members map
    to the canonical, everything else passes through, count unchanged."""
    rows = [
        ("sort the fast order", ["order", "the", "quick", "order"]),
        ("no members here", ["no", "members", "here"]),
        ("Sort FAST", ["order", "quick"]),  # lowercase precedes collapse
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string").select(
        tokens_col("text", "synonyms").alias("toks"),
        doc_len_col("text", "synonyms").alias("dl"),
    )
    got = df.collect()
    for (text, want), r in zip(rows, got):
        assert list(r.toks) == want, text
        assert r.dl == len(want)  # collapse is 1:1 — fast count valid
        assert tokenize_py(text, "synonyms") == want


def test_synonym_index_merges_class_stats(syn_reader, spark, duck):
    """Searching the canonical hits sort-only docs; per-doc tf is the SUM
    of the class members' raw tfs; the term's df is the merged class df;
    'sort' itself is no longer an index term."""
    from miru_spark.plans.search import search_topk

    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        F.size(F.filter("toks", lambda t: t == "sort")).alias("n_sort"),
        F.size(F.filter("toks", lambda t: t == "order")).alias("n_order"),
    ).collect()
    class_docs = {r.doc_id for r in raw if r.n_sort + r.n_order > 0}
    sort_only = {r.doc_id for r in raw if r.n_sort > 0 and r.n_order == 0}
    assert sort_only, "fixture must contain sort-without-order docs"
    hits = dict(search_topk(syn_reader, ["order"], k=10**9))
    assert set(hits) == class_docs
    assert sort_only <= set(hits)
    tps = syn_reader.fetch_terms(["order", "sort"])
    assert "sort" not in tps  # collapsed away at index time
    assert int(tps["order"].df) == len(class_docs)
    ids, tfs, _ = syn_reader.decode_term(tps["order"])
    merged = {r.doc_id: r.n_sort + r.n_order for r in raw}
    assert {int(d): int(t) for d, t in zip(ids, tfs)} == {
        d: n for d, n in merged.items() if n > 0
    }


def test_synonym_collapse_differs_from_query_time_expansion(syn_reader,
                                                            reader):
    """Index-time collapse and query-time SynonymQuery (A41) agree on the
    DOC SET but not on scores: collapse computes idf from the merged class
    df while A41 blends with the MAX member df over the raw index — the
    documented semantic gap between the two strategies."""
    from miru_spark.plans.search import search_synonym, search_topk

    collapsed = dict(search_topk(syn_reader, ["order"], k=10**9))
    expanded = dict(
        search_synonym(reader, [["sort", "order"]], k=10**9)
    )
    assert set(collapsed) == set(expanded)
    assert any(
        abs(collapsed[d] - round(expanded[d], 6)) > 1e-9 for d in collapsed
    )
