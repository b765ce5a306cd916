from __future__ import annotations

import pytest

from miru_spark.plans.relational import bm25_oracle_sql, bm25_search_relational
from miru_spark.schema import read_corpus
from tests.conftest import SF_DIR

CASES = [
    (["join", "hash"], "conjunctive"),
    (["the", "a"], "conjunctive"),
    (["dup"], "conjunctive"),
    (["join", "hash", "dup"], "disjunctive"),
    (["the", "missing_term_zzz"], "disjunctive"),
    (["missing_term_zzz"], "conjunctive"),
]


@pytest.mark.parametrize("terms,mode", CASES, ids=lambda x: str(x))
def test_relational_matches_oracle(spark, duck, terms, mode):
    got = bm25_search_relational(read_corpus(spark, SF_DIR), terms, mode=mode).collect()
    exp = duck.execute(bm25_oracle_sql(terms, mode)).fetchall()
    assert [(r.doc_id, r.score) for r in got] == [(d, s) for d, s in exp]
