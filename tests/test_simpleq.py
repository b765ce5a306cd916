"""simple_query_string (ES simple_query_string, lenient parser) — A88."""

from __future__ import annotations

import pytest

from miru_spark.plans.booltree import (
    BAnd,
    BNot,
    BOr,
    BPhrase,
    BTerm,
    search_bool,
)
from miru_spark.plans.simpleq import (
    IMPOSSIBLE,
    parse_simple,
    search_simple,
    simple_oracle_sql,
)


# -- translation semantics (no index needed) --------------------------------


def test_operators_fold_left_associative():
    assert parse_simple("the + a | data") == BOr(
        (BAnd((BTerm("the"), BTerm("a"))), BTerm("data"))
    )
    assert parse_simple("the+a") == BAnd((BTerm("the"), BTerm("a")))
    assert parse_simple("foo|bar") == BOr((BTerm("foo"), BTerm("bar")))


def test_default_operator():
    assert parse_simple("a b") == BOr((BTerm("a"), BTerm("b")))
    assert parse_simple("a b", default_operator="and") == BAnd(
        (BTerm("a"), BTerm("b"))
    )
    with pytest.raises(ValueError):
        parse_simple("a", default_operator="xor")


def test_negation_applies_group_wide():
    """'a -b c' == (a OP c) AND NOT b — must_not at the boolean level."""
    assert parse_simple("a -b c") == BAnd(
        (BOr((BTerm("a"), BTerm("c"))), BNot(BTerm("b")))
    )
    assert parse_simple("a -(b | c)") == BAnd(
        (BTerm("a"), BNot(BOr((BTerm("b"), BTerm("c")))))
    )
    # pure negative matches nothing (the impossible sentinel)
    node = parse_simple("-dup")
    assert node == BAnd((BTerm(IMPOSSIBLE), BNot(BTerm("dup"))))


def test_phrases_and_groups():
    assert parse_simple('"tree node" + the') == BAnd(
        (BPhrase(("tree", "node")), BTerm("the"))
    )
    assert parse_simple("(the | a) + data") == BAnd(
        (BOr((BTerm("the"), BTerm("a"))), BTerm("data"))
    )
    # single-word phrase degrades to a term; phrase slop suffix accepted
    assert parse_simple('"solo"') == BTerm("solo")
    assert parse_simple('"tree node"~2') == BPhrase(("tree", "node"))


@pytest.mark.parametrize(
    "broken,expect",
    [
        ('the "unterminated + a', BAnd((BOr((BTerm("the"), BTerm("unterminated"))), BTerm("a")))),
        ("the ) a", BOr((BTerm("the"), BTerm("a")))),
        ("( the a", BOr((BTerm("the"), BTerm("a")))),
        ("| the |", BTerm("the")),
        ("the -", BTerm("the")),
        ("--dup the", BAnd((BTerm("the"), BNot(BTerm("dup"))))),
        ("foo-bar", BTerm("foo-bar")),
        ("", None),
        ("()", None),
        ("| + |", None),
    ],
    ids=lambda x: repr(x) if isinstance(x, str) else "tree",
)
def test_leniency_never_raises(broken, expect):
    assert parse_simple(broken) == expect


# -- serving (index-backed) --------------------------------------------------


@pytest.fixture(scope="module")
def pos_reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("sqidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
                positions=True, target_chunk=64)
    return IndexReader(spark, p)


@pytest.mark.parametrize(
    "q",
    ["the + a | -dup data", "the a", "(join | hash) + the", '-dup + the'],
    ids=lambda x: repr(x),
)
def test_simple_matches_oracle(pos_reader, duck, q):
    got = search_simple(pos_reader, q, k=10)
    exp = duck.execute(simple_oracle_sql(q, k=10)).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_expansions_resolve_through_dictionary(pos_reader):
    """'jo*' expands over the term dictionary; 'hashh~1' fuzzy-expands —
    each equals the hand-built OR of its expansion."""
    exp_prefix = pos_reader.expand_prefix("jo")
    got = search_simple(pos_reader, "jo*", k=1 << 30)
    want = search_bool(
        pos_reader,
        BOr(tuple(BTerm(t) for t in exp_prefix))
        if len(exp_prefix) > 1 else BTerm(exp_prefix[0]),
        k=1 << 30,
    )
    assert got == want and got
    exp_fuzzy = pos_reader.expand_fuzzy("hashh", max_edits=1)
    got_f = search_simple(pos_reader, "hashh~1", k=1 << 30)
    want_f = search_bool(
        pos_reader,
        BOr(tuple(BTerm(t) for t in exp_fuzzy))
        if len(exp_fuzzy) > 1 else BTerm(exp_fuzzy[0]),
        k=1 << 30,
    )
    assert got_f == want_f and got_f


def test_no_match_paths_return_empty(pos_reader):
    assert search_simple(pos_reader, "-dup", k=10) == []
    assert search_simple(pos_reader, "", k=10) == []
    assert search_simple(pos_reader, "zzzz*", k=10) == []  # empty expansion
    with pytest.raises(ValueError):
        simple_oracle_sql("")
    with pytest.raises(ValueError):
        parse_simple("a", max_expansions=0)


def test_oracle_refuses_expansion_queries():
    # * / ~ clauses resolve through the index at query time, so no static
    # SQL oracle exists; silently mapping them to the IMPOSSIBLE sentinel
    # would produce a wrong-but-valid oracle (ADVICE r03).
    for q in ("pre* other", "term~ other", "a | (b + pre*)", "-x term~2 y"):
        with pytest.raises(ValueError, match="expansion"):
            simple_oracle_sql(q)
    # expansion-free queries still produce an oracle
    assert "SELECT" in simple_oracle_sql("a + b | -c").upper()
