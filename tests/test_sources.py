"""Source-format adapters (A1 breadth): the same corpus served from
parquet, JSONL(.gz), and CSV must produce byte-identical indexes — i.e.
rank-identical search results and identical corpus stats."""

from __future__ import annotations

import pytest

from miru_spark.schema import corpus_from_any, read_corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def format_dirs(spark, tmp_path_factory):
    """The sf0.001 documents re-materialized as compressed JSONL and CSV."""
    base = tmp_path_factory.mktemp("fmt")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    jl = str(base / "docs_jsonl")
    docs.coalesce(2).write.option("compression", "gzip").json(jl)
    cv = str(base / "docs_csv")
    (
        docs.coalesce(2)
        .write.option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(cv)
    )
    return {"jsonl": jl, "csv": cv}


def test_corpora_identical_across_formats(spark, format_dirs):
    want = read_corpus(spark, SF_DIR)
    for fmt, path in format_dirs.items():
        got = corpus_from_any(spark, path, fmt)
        assert got.schema == want.schema, fmt
        assert got.exceptAll(want).count() == 0, fmt
        assert want.exceptAll(got).count() == 0, fmt


def test_rank_identical_indexes(spark, format_dirs, tmp_path, reader):
    """An index built from the JSONL source serves the same ranking (and
    the same corpus stats) as the parquet-built session index."""
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.plans.search import search_topk

    p = str(tmp_path / "jl_idx")
    build_index(
        spark, corpus_from_any(spark, format_dirs["jsonl"], "jsonl"), p,
        num_partitions=4,
    )
    r = IndexReader(spark, p)
    assert (r.n_docs, round(r.avgdl, 9)) == (
        reader.n_docs, round(reader.avgdl, 9)
    )
    for terms, mode in [(["join", "hash"], "conjunctive"),
                        (["the", "dup"], "disjunctive")]:
        got = search_topk(r, terms, mode=mode, k=10)
        want = search_topk(reader, terms, mode=mode, k=10)
        assert [(d, round(s, 9)) for d, s in got] == [
            (d, round(s, 9)) for d, s in want
        ]


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown corpus format"):
        corpus_from_any(spark, "/nope", "xml")
