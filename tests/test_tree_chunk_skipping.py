"""Windowed block-max chunk skipping for boolean trees (A19/A56).

Round 4's distributed tree scorer decoded EVERY chunk of every leaf term;
_tree_blockmax_prune now drops chunk rows before the mapInArrow decode via
two stacked criteria (feasibility/liveness + a sufficient-leaf theta over
the windowed tree upper bound — soundness notes in plans/booltree.py).
These tests pin (a) that the prune actually skips chunks on AND-shaped and
theta-eligible trees, (b) exact rank/score identity with the unpruned run
and with the driver evaluator across tree shapes incl. NOT, and (c) the
gates (phrases, k=None) stay sound.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from miru_spark.plans import booltree as B
from miru_spark.plans.booltree import search_bool, search_bool_distributed


@pytest.fixture(scope="module")
def pos_reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("treeskipidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
                positions=True, target_chunk=64)
    return IndexReader(spark, p)


@pytest.fixture(scope="module")
def skew_reader(spark, tmp_path_factory):
    """A corpus with genuine doc-range structure (the fixture corpus is
    frontier-homogeneous, where no sound algorithm can skip): 'rare' only
    in docs [0, 50); every doc carries 'hot' and 'alt'; the upper half is
    padded ~160 tokens longer so hot-term contributions are uniformly weak there."""
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import corpus_from_documents

    n = 2000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("hot alt"),
            F.when(F.col("id") < 50, F.lit("rare")).otherwise(F.lit("x")),
            F.when(
                F.col("id") >= n // 2,
                F.concat_ws(" ", F.array_repeat(F.lit("pad"), 160)),
            ).otherwise(F.lit("y")),
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
        F.lit(0).alias("n_chars"),
    )
    p = str(tmp_path_factory.mktemp("skewidx") / "idx")
    build_index(
        spark, corpus_from_documents(docs), p,
        num_partitions=8, target_chunk=128,
    )
    return IndexReader(spark, p)

TREES = [
    "(join OR hash) AND (sort OR merge)",
    "(the AND data) OR dup",
    "(join OR hash) AND sort NOT (tree OR node)",
    "a AND (b OR c) AND NOT dup",
    "join AND hash OR dup",
    "(join^2 OR hash) AND the",
    "the OR a",
    "the AND data",
    "the AND license",  # 'license' absent from the fixture: empty result
]


def _dist(reader, q, k=10, prune_gate=None):
    return [
        (int(r["doc_id"]), float(r["score"]))
        for r in search_bool_distributed(
            reader, q, k=k, prune_gate=prune_gate
        ).collect()
    ]


@pytest.mark.parametrize("q", TREES)
def test_tree_pruned_matches_unpruned_and_driver(reader, q):
    """Gate forced open: pruned distributed == unpruned distributed ==
    driver evaluator, for every tree shape incl. NOT and boosts."""
    pruned = _dist(reader, q, prune_gate=0)
    unpruned = _dist(reader, q, prune_gate=1 << 62)
    assert pruned == unpruned, q
    assert pruned == search_bool(reader, q, k=10), q
    if "b OR c" not in q and "license" not in q:
        assert pruned, q  # the others legitimately have fixture hits


def test_feasibility_prune_skips_chunks(skew_reader):
    """'rare AND hot': the hot term's chunks outside the rare term's
    [0, 50) coverage cannot host a match — the feasibility criterion must
    drop them (the flat conjunctive range-prune restated through the tree
    walk), and the results must equal driver + unpruned."""
    q = "rare AND hot"
    pruned = _dist(skew_reader, q, prune_gate=0)
    stats = B.LAST_TREE_PRUNE_STATS
    assert stats.get("pruned"), stats
    assert stats["chunks_kept"] < stats["chunks_total"], stats
    assert pruned == _dist(skew_reader, q, prune_gate=1 << 62)
    assert pruned == search_bool(skew_reader, q, k=10)
    assert pruned


def test_theta_prune_skips_chunks_on_or_tree(skew_reader):
    """'hot OR (hot AND rare)': 'hot' is a sufficient leaf, so theta > 0
    is derivable from its chunk LBs, and the padded upper half's weak
    chunks must fall below the windowed bound."""
    q = "hot OR (hot AND rare)"
    pruned = _dist(skew_reader, q, k=3, prune_gate=0)
    stats = B.LAST_TREE_PRUNE_STATS
    assert stats.get("theta", 0.0) > 0.0, stats
    assert stats.get("pruned"), stats
    assert stats["chunks_kept"] < stats["chunks_total"], stats
    assert pruned == _dist(skew_reader, q, k=3, prune_gate=1 << 62)
    assert pruned == search_bool(skew_reader, q, k=3)


def test_window_bound_prunes_equal_strength_disjunction(skew_reader):
    """The round-4 gap, pinned: 'hot alt' is an equal-strength disjunction
    (identical coverage, so per-term global UB maxima are equal and the
    sum-UB rule provably keeps everything), but the padded upper half has
    uniformly weak STACKED coverage — the windowed bound must drop those
    chunks while staying rank-identical to the exhaustive twin."""
    from miru_spark.plans import search as S

    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in S.search_distributed(
            skew_reader, ["hot", "alt"], mode="disjunctive", k=3,
            prune_gate=0,
        ).collect()
    ]
    stats = S.LAST_PRUNE_STATS
    assert stats.get("pruned"), stats
    assert stats["chunks_kept"] < stats["chunks_total"], stats
    want = [
        (d, round(s, 6))
        for d, s in S.search_exhaustive(
            skew_reader, ["hot", "alt"], mode="disjunctive", k=3
        )
    ]
    assert got == want


def test_not_side_terms_never_pruned(reader):
    """Chunks of NOT-side terms must all survive (dropping one could flip
    ~isNotNull false->true and admit an excluded doc)."""
    q = "the AND license NOT dup"
    _dist(reader, q, prune_gate=0)
    stats = B.LAST_TREE_PRUNE_STATS
    if stats.get("pruned"):
        # re-derive the kept set and check every 'dup' chunk survived
        from miru_spark.plans.flagship import ensure_index  # noqa: F401

        chunks = reader.postings_df(["the", "license", "dup"])
        tdf = chunks.groupBy("term").agg(F.sum("df_chunk").alias("df_global"))
        chunks = chunks.join(F.broadcast(tdf), "term")
        kept, st = B._tree_blockmax_prune(
            chunks,
            B.parse_bool(q),
            10,
            float(reader.n_docs),
            float(reader.avgdl),
            6,
            allow_theta=True,
        )
        n_dup_all = chunks.filter(F.col("term") == "dup").count()
        n_dup_kept = kept.filter(F.col("term") == "dup").count()
        assert n_dup_kept == n_dup_all
    # and the result is still correct either way
    assert _dist(reader, q, prune_gate=0) == search_bool(reader, q, k=10)


def test_k_none_feasibility_only(skew_reader):
    """k=None returns the full match set: theta must stay 0 (feasibility
    pruning only) and the row set must equal the unpruned run."""
    q = "rare AND hot"
    got = search_bool_distributed(skew_reader, q, k=None, prune_gate=0)
    rows_p = {(int(r["doc_id"]), float(r["score"])) for r in got.collect()}
    assert B.LAST_TREE_PRUNE_STATS.get("theta", 0.0) == 0.0
    assert B.LAST_TREE_PRUNE_STATS.get("pruned"), B.LAST_TREE_PRUNE_STATS
    ref = search_bool_distributed(skew_reader, q, k=None, prune_gate=1 << 62)
    rows_u = {(int(r["doc_id"]), float(r["score"])) for r in ref.collect()}
    assert rows_p == rows_u
    assert rows_p


def test_phrase_trees_skip_the_prune(pos_reader):
    """Phrase leaves gate the prune off entirely; results still correct."""
    q = '(join OR hash) AND "the a"'
    got = _dist(pos_reader, q, prune_gate=0)
    assert B.LAST_TREE_PRUNE_STATS == {}
    assert got == search_bool(pos_reader, q, k=10)


def test_fuzz_random_trees_pruned_vs_unpruned(reader):
    """Random trees over the fixture vocabulary: pruned == unpruned."""
    vocab = [
        r["term"]
        for r in reader.postings_df()
        .groupBy("term")
        .agg(F.sum("df_chunk").alias("df"))
        .orderBy(F.desc("df"))
        .limit(30)
        .collect()
    ]
    rng = np.random.RandomState(7)

    def gen(depth):
        if depth >= 2 or rng.rand() < 0.4:
            t = vocab[rng.randint(len(vocab))]
            return t if rng.rand() < 0.8 else f"{t}^2"
        op = rng.choice([" AND ", " OR "])
        kids = [gen(depth + 1) for _ in range(rng.randint(2, 4))]
        expr = op.join(f"({k})" for k in kids)
        if op == " AND " and rng.rand() < 0.3:
            expr += f" NOT {vocab[rng.randint(len(vocab))]}"
        return expr

    for _ in range(10):
        q = gen(0)
        assert _dist(reader, q, prune_gate=0) == _dist(
            reader, q, prune_gate=1 << 62
        ), q
