"""Cluster-representative dedup output (round-3 scale fix): a duplicate
cluster of m docs must cost and emit O(m), never O(m^2) pairs; SimHash chunk
geometry must be pigeonhole-sound for the requested hamming radius."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.pipeline.dedup import (
    SIMHASH_BITS,
    min_label_components,
    minhash_dedup_clusters,
    minhash_lsh_pairs,
    simhash_chunk_spec,
    simhash_dedup_clusters,
    simhash_near_pairs,
)


def _boilerplate_corpus(spark, m: int, base: int = 0, salt: str = "x"):
    """m near-identical docs (one boilerplate cluster) — each doc repeats the
    same long template with a 1-token suffix change every 4 docs, so
    pairwise 3-gram Jaccard stays high."""
    template = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (base + i, f"{template} {salt}{i % 4}")
        for i in range(m)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cluster_output_is_linear_in_cluster_size(spark):
    """VERDICT r2 'done =' criterion: a 1k-doc duplicate cluster yields O(m)
    output rows (one per member), not O(m^2) pairs."""
    m = 1000
    docs = _boilerplate_corpus(spark, m)
    out = minhash_dedup_clusters(docs, threshold=0.5).collect()
    assert len(out) == m  # one row per member, including the rep
    reps = {r.cluster_rep for r in out}
    assert reps == {0}  # min doc_id of the cluster
    assert {r.doc_id for r in out} == set(range(m))


def test_clusters_match_pair_components_on_distinct_groups(spark):
    """Three well-separated duplicate groups + singletons: cluster output ==
    connected components of the verified pairs."""
    g1 = _boilerplate_corpus(spark, 5, base=0, salt="a")
    g2 = _boilerplate_corpus(spark, 4, base=100, salt="b")
    singles = spark.createDataFrame(
        [(200 + i, " ".join(f"uniq{i}_{j}" for j in range(30))) for i in range(3)],
        "doc_id long, text string",
    )
    # make the groups mutually dissimilar: distinct token namespaces
    g1 = g1.withColumn("text", F.concat(F.lit("alpha "), "text"))
    g2 = g2.withColumn(
        "text", F.regexp_replace("text", "tok", "other")
    )
    docs = g1.unionByName(g2).unionByName(singles)

    clusters = {
        r.doc_id: r.cluster_rep
        for r in minhash_dedup_clusters(docs, threshold=0.5).collect()
    }
    # union-find over the exact pair output
    pairs = minhash_lsh_pairs(docs, threshold=0.5).collect()
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p.doc_a), find(p.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in parent}
    assert clusters == want
    assert set(clusters.values()) == {0, 100}  # two groups, min-id reps
    assert not any(d >= 200 for d in clusters)  # singletons emit nothing


def test_min_label_components_chain(spark):
    """Propagation crosses bucket boundaries: a chain a-b, b-c, c-d collapses
    to one component labeled by the chain minimum."""
    edges = spark.createDataFrame(
        [(3, 7), (7, 9), (9, 1), (20, 30)], "a long, b long"
    )
    got = {r.doc_id: r.cluster_rep for r in min_label_components(edges).collect()}
    assert got == {1: 1, 3: 1, 7: 1, 9: 1, 20: 20, 30: 20}


def test_min_label_components_raises_when_unconverged(spark):
    """A component whose diameter exceeds max_iter must raise, never return
    partial labels (a silently split duplicate cluster)."""
    chain = [(i, i + 1) for i in range(8)]  # path graph, diameter 8
    edges = spark.createDataFrame(chain, "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(edges, max_iter=3)
    # and enough rounds resolves the same graph to the single minimum
    got = {r.doc_id: r.cluster_rep
           for r in min_label_components(edges, max_iter=10).collect()}
    assert set(got.values()) == {0}


@pytest.mark.parametrize("max_hamming", [0, 3, 4, 10, 31])
def test_simhash_chunk_spec_sound(max_hamming):
    spec = simhash_chunk_spec(max_hamming)
    assert len(spec) >= max_hamming + 1  # pigeonhole
    assert sum(w for _, w in spec) == SIMHASH_BITS
    offs = [o for o, _ in spec]
    assert offs == sorted(offs) and offs[0] == 0  # disjoint cover
    for (o1, w1), (o2, _) in zip(spec, spec[1:]):
        assert o1 + w1 == o2


def test_simhash_adversarial_hamming_within_radius_is_candidate(spark):
    """Round-2 failure mode: 4 fixed chunks missed pairs with hamming 4-10
    when the flips spread across every chunk. Derived geometry must catch a
    pair whose flips hit max_hamming DIFFERENT chunks."""
    max_hamming = 10
    spec = simhash_chunk_spec(max_hamming)
    base = 0
    flipped = base
    for off, _w in spec[:max_hamming]:  # one flip in each of 10 chunks
        flipped ^= 1 << off
    # inject fingerprints directly through the chunk/join machinery
    from miru_spark.pipeline.dedup import _simhash_chunks

    fp = spark.createDataFrame(
        [(1, base), (2, flipped)], "doc_id long, fingerprint long"
    )
    chunks = _simhash_chunks(fp, max_hamming)
    x, y = chunks.alias("x"), chunks.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.chunk_idx") == F.col("y.chunk_idx"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .count()
    )
    assert cand == 1  # pigeonhole: >= 1 shared chunk survives


def test_simhash_clusters_on_identical_docs(spark):
    docs = spark.createDataFrame(
        [(i, "the same exact content repeated here") for i in range(6)]
        + [(99, "completely different words entirely unrelated text")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.cluster_rep for r in simhash_dedup_clusters(docs, 0).collect()}
    assert got == {i: 0 for i in range(6)}


def test_bucket_cap_skips_mega_buckets(spark):
    """max_bucket_size drops degenerate buckets from the pair self-join; the
    1k-doc boilerplate cluster emits ZERO pairs under a small cap (its
    buckets all exceed it) while small clusters are untouched."""
    big = _boilerplate_corpus(spark, 200)
    small = _boilerplate_corpus(spark, 3, base=5000, salt="zz")
    small = small.withColumn("text", F.regexp_replace("text", "tok", "sm"))
    docs = big.unionByName(small)
    capped = minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=10).collect()
    assert all(p.doc_a >= 5000 for p in capped)  # big cluster suppressed
    assert len(capped) == 3  # the 3-doc cluster's pairs survive
    sim = simhash_near_pairs(docs, max_hamming=2, max_bucket_size=10).collect()
    assert all(p.doc_a >= 5000 for p in sim)


def test_simhash_jaccard_variants_match_exact_twins(spark, duck):
    """r4 oracle upgrade pin: at (max_hamming=10, threshold=0.12) the SimHash
    chunk buckets recall EVERY exact 3-gram-Jaccard pair of the sf0.01
    corpus, so the exact-verified pairs equal the exact all-pairs SQL and
    the clusters equal its recursive-CTE components — the property that
    makes pipe_dedup_fingerprint value-oracled."""
    from tests.conftest import SF_DIR
    from miru_spark.pipeline.dedup import (
        components_oracle_sql,
        ngram_jaccard_oracle_sql,
        simhash_jaccard_clusters,
        simhash_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs_sql = ngram_jaccard_oracle_sql(0.12)
    got_pairs = sorted(
        tuple(r)
        for r in simhash_jaccard_pairs(
            docs, max_hamming=10, threshold=0.12
        ).collect()
    )
    assert got_pairs == sorted(tuple(r) for r in duck.execute(pairs_sql).fetchall())
    got_cl = sorted(
        tuple(r)
        for r in simhash_jaccard_clusters(
            docs, max_hamming=10, threshold=0.12
        ).collect()
    )
    want_cl = sorted(
        tuple(r)
        for r in duck.execute(components_oracle_sql(pairs_sql)).fetchall()
    )
    assert got_cl == want_cl


def test_components_oracle_sql_chain(duck):
    """The recursive-CTE components twin labels a 3-link chain with its min
    doc_id even though no direct pair spans the chain ends."""
    from miru_spark.pipeline.dedup import components_oracle_sql

    sql = components_oracle_sql(
        "SELECT * FROM (VALUES (1, 2), (2, 3), (3, 4), (10, 11)) "
        "AS t(doc_a, doc_b) ORDER BY doc_a"
    )
    got = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)]
