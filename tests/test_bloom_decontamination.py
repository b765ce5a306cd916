"""Bloom-filter decontamination: no false negatives vs the exact twin."""

from __future__ import annotations

import numpy as np
import pytest

from miru_spark.pipeline.bloom import (
    _positions,
    build_ngram_bloom,
    contamination_flags_bloom,
)
from miru_spark.pipeline.textqual import contamination_flags


BENCH_IDS = list(range(10))


@pytest.fixture(scope="module")
def docs(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bloom_no_false_negatives_and_fpr(spark, docs):
    """Every doc the exact semi-join flags is Bloom-flagged (the filter's
    hard guarantee); with a generously sized filter the two outputs are
    identical here (false positives need hash collisions on all k probes)."""
    exact = {r.doc_id for r in contamination_flags(docs, BENCH_IDS, n=8).collect()}
    bits = build_ngram_bloom(docs, BENCH_IDS, n=8, n_bits=1 << 20, k_hashes=4)
    bloom = {
        r.doc_id
        for r in contamination_flags_bloom(docs, BENCH_IDS, bits, n=8).collect()
    }
    assert exact <= bloom
    extra = bloom - exact
    assert len(extra) <= max(2, len(exact) // 10)  # generous m -> ~no FPs


def test_bloom_tiny_filter_still_no_false_negatives(spark, docs):
    """Even a deliberately undersized filter (high FPR) never loses a
    contaminated doc — the property that makes Bloom safe for hygiene."""
    exact = {r.doc_id for r in contamination_flags(docs, BENCH_IDS, n=8).collect()}
    bits = build_ngram_bloom(docs, BENCH_IDS, n=8, n_bits=1 << 10, k_hashes=2)
    bloom = {
        r.doc_id
        for r in contamination_flags_bloom(
            docs, BENCH_IDS, bits, n=8, k_hashes=2
        ).collect()
    }
    assert exact <= bloom


def test_bloom_determinism_and_validation(spark, docs):
    a = build_ngram_bloom(docs, BENCH_IDS, n_bits=1 << 16)
    b = build_ngram_bloom(docs, BENCH_IDS, n_bits=1 << 16)
    assert np.array_equal(a, b) and a.dtype == np.uint8 and a.size == (1 << 16) >> 3
    with pytest.raises(ValueError):
        build_ngram_bloom(docs, BENCH_IDS, n_bits=1000)  # not a power of two
    # empty eval set -> all-zero bits -> nothing flagged
    z = build_ngram_bloom(docs, benchmark_ids=[10**9], n_bits=1 << 16)
    assert not z.any()


def test_double_hashing_probe_spread():
    g = np.array(["a b c", "d e f", "a b c"], dtype=object)
    pos = _positions(g, 1 << 16, 4)
    assert pos.shape == (3, 4)
    assert (pos[0] == pos[2]).all()           # same gram -> same probes
    assert len(set(pos[0].tolist())) == 4     # odd h2 -> distinct probes
    assert (pos != _positions(g, 1 << 16, 4)).sum() == 0  # deterministic
