"""A36 — multi-field scored search (ES most_fields semantics).

Pins: per-field BM25 with per-field stats, weighted-sum combine, the
conjunctive rule (every term in >=1 field, score sums all fields), the
distributed plan's rank identity with the driver path, and the DuckDB
oracle twin.
"""
from __future__ import annotations

import numpy as np
import pytest

from miru_spark.plans.multifield import (
    build_multifield_index,
    open_field_readers,
    search_fields,
    search_fields_distributed,
)

from tests.conftest import SF_DIR

WEIGHTS = {"content": 1.0, "path": 3.0}

PATH_TOK = (
    "SELECT doc_id, unnest(string_split(regexp_replace("
    "printf('doc_%05d.txt', doc_id), '[/._-]+', ' ', 'g'), ' ')) AS term "
    "FROM documents"
)


@pytest.fixture(scope="module")
def mf_readers(spark, tmp_path_factory):
    from miru_spark.schema import read_corpus

    base = str(tmp_path_factory.mktemp("mf") / "idx")
    build_multifield_index(
        spark, read_corpus(spark, SF_DIR), base, num_partitions=4,
        target_chunk=64,
    )
    return open_field_readers(spark, base)


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def _oracle(terms, mode, k=10):
    from miru_spark.plans.relational import (
        DEFAULT_TOK_SQL,
        bm25_multifield_oracle_sql,
    )

    return _duck(
        bm25_multifield_oracle_sql(
            terms,
            {
                "content": (DEFAULT_TOK_SQL, WEIGHTS["content"]),
                "path": (PATH_TOK, WEIGHTS["path"]),
            },
            mode,
            k=k,
        )
    )


def _r6(res):
    return [(int(d), round(float(s), 6)) for d, s in res]


@pytest.mark.parametrize("mode", ["disjunctive", "conjunctive"])
@pytest.mark.parametrize("terms", [["the", "00007"], ["the", "doc"], ["txt"]])
def test_driver_matches_duck_oracle(mf_readers, mode, terms):
    got = _r6(search_fields(mf_readers, terms, weights=WEIGHTS, mode=mode))
    assert got == _oracle(terms, mode)


def test_path_weight_promotes_name_match(mf_readers):
    # doc 7's path contains '00007'; with path weighted 3x it must outrank
    # every body-only match for a query mentioning both
    got = search_fields(
        mf_readers, ["the", "00007"], weights=WEIGHTS, mode="disjunctive"
    )
    assert got[0][0] == 7


def test_conjunctive_requires_each_term_in_some_field(mf_readers):
    # 'txt' occurs only in paths (every doc), 'the' only in content:
    # conjunctive hits == docs containing 'the' at all
    got = search_fields(
        mf_readers, ["the", "txt"], weights=WEIGHTS, mode="conjunctive",
        k=10**9,
    )
    content = mf_readers["content"]
    tps = content.fetch_terms(["the"])
    the_ids = set(content.decode_term(tps["the"])[0].astype(int).tolist())
    assert set(d for d, _ in got) == the_ids
    # a term in NO field -> conjunctive empty
    assert search_fields(
        mf_readers, ["the", "zzzzz"], weights=WEIGHTS, mode="conjunctive"
    ) == []


def test_distributed_matches_driver(mf_readers):
    for mode in ("disjunctive", "conjunctive"):
        rows = search_fields_distributed(
            mf_readers, ["the", "doc"], weights=WEIGHTS, mode=mode, k=10
        ).collect()
        got = sorted(
            ((r.doc_id, round(r.score, 6)) for r in rows),
            key=lambda t: (-t[1], t[0]),
        )
        want = _r6(
            search_fields(mf_readers, ["the", "doc"], weights=WEIGHTS, mode=mode)
        )
        assert got == want


def test_zero_weight_drops_field(mf_readers):
    got = search_fields(
        mf_readers, ["the", "00007"],
        weights={"content": 1.0, "path": 0.0}, mode="disjunctive", k=10**9,
    )
    # path-only matches are gone; scores equal single-field content search
    from miru_spark.plans.search import search_topk

    want = search_topk(
        mf_readers["content"], ["the", "00007"], mode="disjunctive", k=10**9
    )
    assert _r6(got) == _r6(want)


def test_where_filter_composes(mf_readers):
    from miru_spark.filters import Range

    where = {"doc_len": Range(gte=40)}
    allow = set(
        int(d) for d in mf_readers["content"].filter_doc_ids(where)
    )
    full = search_fields(
        mf_readers, ["the", "doc"], weights=WEIGHTS, mode="disjunctive",
        k=10**9,
    )
    got = search_fields(
        mf_readers, ["the", "doc"], weights=WEIGHTS, mode="disjunctive",
        k=10, where=where,
    )
    assert _r6(got) == _r6([(d, s) for d, s in full if d in allow][:10])


def test_half_applied_delete_never_serves(spark, tmp_path_factory):
    """A doc tombstoned in only ONE field index must not be served by
    either path (tombstones union across fields)."""
    from miru_spark.index.writer import delete_docs
    from miru_spark.schema import read_corpus

    base = str(tmp_path_factory.mktemp("mfdel") / "idx")
    build_multifield_index(
        spark, read_corpus(spark, SF_DIR), base, num_partitions=4,
        target_chunk=64,
    )
    readers = open_field_readers(spark, base)
    full = search_fields(readers, ["the"], weights=WEIGHTS, k=5)
    victim = full[0][0]
    delete_docs(f"{base}/field=path", [victim])
    readers = open_field_readers(spark, base)  # fresh tombstone read
    got = search_fields(readers, ["the"], weights=WEIGHTS, k=10**9)
    assert victim not in [d for d, _ in got]
    rows = search_fields_distributed(
        readers, ["the"], weights=WEIGHTS, k=None
    ).collect()
    assert victim not in [r.doc_id for r in rows]


def test_weight_validation(mf_readers):
    with pytest.raises(ValueError, match="unknown fields"):
        search_fields(mf_readers, ["the"], weights={"nope": 1.0})
    with pytest.raises(ValueError, match=">= 0"):
        search_fields(mf_readers, ["the"], weights={"content": -1.0})
    with pytest.raises(ValueError, match="empty term list"):
        search_fields(mf_readers, [])


# ---- A74 cross_fields (ES BlendedTermQuery, term-centric blending) ---------


def _cross_oracle(terms, mode, k=10):
    from miru_spark.plans.relational import (
        DEFAULT_TOK_SQL,
        bm25_cross_fields_oracle_sql,
    )

    return bm25_cross_fields_oracle_sql(
        terms,
        {"content": (DEFAULT_TOK_SQL, WEIGHTS["content"]),
         "path": (PATH_TOK, WEIGHTS["path"])},
        mode, k=k,
    )


@pytest.mark.parametrize(
    "mode,terms",
    [("disjunctive", ["the", "00007"]), ("conjunctive", ["the", "00007"]),
     ("conjunctive", ["txt", "join"]), ("disjunctive", ["doc"])],
    ids=lambda x: str(x),
)
def test_cross_fields_matches_oracle(mf_readers, mode, terms):
    from miru_spark.plans.multifield import search_fields_cross

    got = _r6(search_fields_cross(mf_readers, terms, weights=WEIGHTS, mode=mode))
    assert got == _duck(_cross_oracle(terms, mode))


def test_cross_fields_term_centric_and(mf_readers):
    """'txt join' conjunctive: txt exists only in path, join only in
    content — cross_fields (term in SOME field) matches; best_fields
    (one field must contain every term) rejects every doc."""
    from miru_spark.plans.dismax import search_fields_dismax
    from miru_spark.plans.multifield import search_fields_cross

    cross = search_fields_cross(
        mf_readers, ["txt", "join"], weights=WEIGHTS, mode="conjunctive"
    )
    best = search_fields_dismax(
        mf_readers, ["txt", "join"], weights=WEIGHTS, mode="conjunctive"
    )
    assert cross and not best


def test_cross_fields_degenerate_identity(mf_readers):
    """No term of this corpus occurs in BOTH fields, so blending is the
    identity: for a single-field term, cross_fields == most_fields exactly
    (blend-of-one df, max-of-one contribution)."""
    from miru_spark.plans.multifield import search_fields, search_fields_cross

    cross = search_fields_cross(mf_readers, ["doc"], weights=WEIGHTS, k=1000)
    most = search_fields(mf_readers, ["doc"], weights=WEIGHTS, k=1000)
    assert cross == most and cross


def test_cross_fields_blended_df_on_spanning_term(spark, tmp_path_factory):
    """A term living in BOTH fields with different dfs: the blended df
    (max across fields) must change scores vs most_fields' per-field idf,
    and the term-doc contribution must be the MAX field score, not the
    sum."""
    from pyspark.sql import functions as F

    from miru_spark.plans.multifield import (
        build_multifield_index,
        open_field_readers,
        search_fields,
        search_fields_cross,
    )

    rows = [
        # 'alpha' in EVERY path, but only docs 0-1 have it in content
        (0, "alpha beta common", "alpha_0.txt"),
        (1, "alpha gamma common", "alpha_1.txt"),
        (2, "delta beta common", "alpha_2.txt"),
        (3, "gamma delta common", "alpha_3.txt"),
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id long, content string, path string"
    ).withColumn("repo", F.lit("r")).withColumn("lang", F.lit("en")) \
        .withColumn("commit", F.lit("v0"))
    base = str(tmp_path_factory.mktemp("mfspan") / "idx")
    build_multifield_index(spark, corpus, base, num_partitions=2)
    readers = open_field_readers(spark, base)
    w = {"content": 1.0, "path": 1.0}
    cross = dict(search_fields_cross(readers, ["alpha"], weights=w, k=100))
    most = dict(search_fields(readers, ["alpha"], weights=w, k=100))
    assert set(cross) == set(most) == {0, 1, 2, 3}
    # docs 0-1 match in both fields: most SUMS the two contributions,
    # cross takes the max — and the blended df (4, from path) lowers the
    # content-side idf (df 2) — so values must differ there
    assert any(abs(cross[d] - most[d]) > 1e-9 for d in (0, 1))


# ---------------------------------------------------------------------------
# A91 combined_fields (CombinedFieldQuery)


def _combined_oracle(terms, mode, k=10):
    from miru_spark.plans.relational import (
        DEFAULT_TOK_SQL,
        bm25_combined_fields_oracle_sql,
    )

    return bm25_combined_fields_oracle_sql(
        terms,
        {"content": (DEFAULT_TOK_SQL, WEIGHTS["content"]),
         "path": (PATH_TOK, WEIGHTS["path"])},
        mode, k=k,
    )


@pytest.mark.parametrize(
    "mode,terms",
    [("disjunctive", ["txt", "the"]), ("conjunctive", ["txt", "the"]),
     ("conjunctive", ["txt", "join"]), ("disjunctive", ["doc", "00007"])],
    ids=lambda x: str(x),
)
def test_combined_fields_matches_oracle(mf_readers, mode, terms):
    from miru_spark.plans.multifield import search_fields_combined

    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in search_fields_combined(
            mf_readers, terms, weights=WEIGHTS, mode=mode
        ).collect()
    ]
    assert got == [(int(d), float(s)) for d, s in _duck(_combined_oracle(terms, mode))]
    assert got


def test_combined_fields_single_saturation_semantics(mf_readers):
    """The defining difference vs cross_fields: combined_fields saturates
    ONE summed tf, so a doc's per-term contribution uses tf from BOTH
    fields at once, while cross_fields takes the max field. On 'doc'
    (path-only term) both must agree up to the stats change; on a query
    mixing fields the rankings legitimately differ — pin the invariant
    that combined conjunctive accepts cross-field term splits."""
    from miru_spark.plans.multifield import search_fields_combined

    got = search_fields_combined(
        mf_readers, ["txt", "join"], weights=WEIGHTS, mode="conjunctive"
    ).collect()
    assert got  # txt lives only in path, join only in content


def test_combined_fields_validation(mf_readers):
    from miru_spark.plans.multifield import search_fields_combined

    with pytest.raises(ValueError, match="unknown mode"):
        search_fields_combined(mf_readers, ["a"], mode="weird")
    with pytest.raises(ValueError, match="empty term list"):
        search_fields_combined(mf_readers, [])


def test_combined_fields_missing_term_conjunctive_empty(mf_readers):
    from miru_spark.plans.multifield import search_fields_combined

    assert not search_fields_combined(
        mf_readers, ["txt", "zzznope"], weights=WEIGHTS, mode="conjunctive"
    ).collect()
