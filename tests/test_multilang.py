"""Round 5 — multilingual analysis chain (VERDICT r4 #6).

Per-language stop sets + pinned minimal plural stemmers (Snowball-lite
CASE rules), routed by the corpus ``lang`` column; every stage a codegen
built-in with a 1:1 DuckDB CASE twin (same discipline as the english
chain, A62)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.functions.tokenize import (
    MULTILANG_STOPWORDS,
    multilang_tok_sql,
    tokenize_py,
    tokenize_py_lang,
    tokens_col_lang,
)

SF_DIR = "/root/testdata/sf0.001"

# pinned stemmer semantics, per language: (token, stem)
STEM_CASES = {
    "es": [
        ("luces", "luz"),        # -ces -> -z
        ("redes", "red"),        # -es after consonant
        ("datos", "dato"),       # plain plural -s
        ("dos", "dos"),          # too short
        ("crisis", "crisi"),     # -is is not protected (pinned rule)
        ("virus", "virus"),      # -us protected
    ],
    "de": [
        ("feldern", "feld"),     # -ern
        ("felder", "feld"),      # -er
        ("knoten", "knot"),      # -en
        ("baeume", "baeum"),     # -e (no umlaut fold: never reaches baum)
        ("rot", "rot"),          # too short
    ],
    "fr": [
        ("reseaux", "reseau"),   # -eaux -> -eau (before the -aux rule)
        ("journaux", "journal"),  # -aux -> -al
        ("arbres", "arbre"),     # -s
        ("arbre", "arbre"),      # len-5 final -e is protected
        ("grande", "grand"),     # len-6 final -e strips
    ],
    "en": [
        ("nodes", "node"),
        ("trees", "tree"),
        ("class", "class"),
    ],
}


@pytest.mark.parametrize("lang", list(STEM_CASES))
def test_pinned_stem_cases_python(lang):
    for tok, want in STEM_CASES[lang]:
        assert tokenize_py_lang(tok, lang) == [want], (lang, tok)


def test_stopwords_and_unknown_lang():
    assert tokenize_py_lang("el dato y la red", "es") == ["dato", "red"]
    assert tokenize_py_lang("der Knoten und die Felder", "de") == [
        "knot", "feld"
    ]
    assert tokenize_py_lang("les arbres du reseau", "fr") == [
        "arbre", "reseau"
    ]
    # no rules for zh: lowercase+split pass-through, nothing dropped
    assert tokenize_py_lang("les arbres du reseau", "zh") == [
        "les", "arbres", "du", "reseau"
    ]
    with pytest.raises(ValueError):
        tokenize_py("anything", "multilang")


def test_column_chain_matches_python_twin(spark):
    rows = [
        ("es", "El dato y Las Redes luces virus"),
        ("de", "Der Knoten und die Feldern baeume"),
        ("fr", "Les Arbres du Reseaux journaux grande"),
        ("en", "The Nodes and trees class"),
        ("zh", "The Nodes and trees class"),
    ]
    df = spark.createDataFrame(rows, "lang string, content string")
    got = {
        r["lang"]: r["toks"]
        for r in df.select(
            "lang", tokens_col_lang("content", "lang").alias("toks")
        ).collect()
    }
    for lang, text in rows:
        assert got[lang] == tokenize_py_lang(text, lang), lang


def test_sql_twin_matches_column_chain(spark, duck):
    """The DuckDB CASE twin produces the exact same (doc_id, term) bag as
    the Spark chain over the real corpus — the analysis stage is
    value-oracled on its own, before any index round-trip."""
    from miru_spark.schema import read_documents

    docs = read_documents(spark, SF_DIR)
    got = sorted(
        (int(r["doc_id"]), r["t"])
        for r in docs.select(
            "doc_id",
            F.explode(tokens_col_lang("text", "lang")).alias("t"),
        ).collect()
    )
    want = sorted(
        (int(d), t)
        for d, t in duck.execute(multilang_tok_sql("text")).fetchall()
    )
    assert got == want


def test_multilang_driver_case_matches_oracle(spark, duck):
    from miru_spark.plans.index_suite import (
        _multilang_tok_sql_decorated,
        q_multilang,
    )
    from miru_spark.plans.relational import bm25_oracle_sql

    got = [
        (int(r["doc_id"]), round(float(r["score"]), 6))
        for r in q_multilang(spark, SF_DIR).collect()
    ]
    want = [
        (int(d), round(float(s), 6))
        for d, s in duck.execute(
            bm25_oracle_sql(
                ["red", "dato"], "conjunctive",
                tok_sql=_multilang_tok_sql_decorated(),
            )
        ).fetchall()
    ]
    assert got == want
    assert got, "query matched no docs — decoration or chain broken"
    # only Spanish docs carry the decoration that stems to [red, dato]
    langs = {
        r["lang"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id").isin([d for d, _ in got]))
        .select("lang")
        .collect()
    }
    assert langs == {"es"}
