"""Fuzz the block-max WAND safety property: for many seeded random queries,
WAND top-k must equal exhaustive top-k exactly (Ding & Suel's safety
guarantee). This is the test family that caught the tied-pivot upper-bound
bug (an iterator after the pivot positioned at the same docid must be
included in the skip bound)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from miru_spark.plans.search import search_exhaustive, search_topk

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window",
]


def _cases():
    rng = random.Random(1234)
    cases = []
    for i in range(60):
        n = rng.choice([1, 2, 2, 3, 3, 4, 5, 6])
        terms = rng.sample(VOCAB, n)
        if i % 7 == 0:
            terms.append(terms[0])  # deliberate duplicate
        mode = "disjunctive" if i % 2 else "conjunctive"
        k = rng.choice([1, 3, 10, 25])
        cases.append((terms, mode, k))
    return cases


@pytest.mark.parametrize(
    "terms,mode,k", _cases(), ids=[f"{i}" for i in range(len(_cases()))]
)
def test_wand_equals_exhaustive_fuzz(reader, terms, mode, k):
    fast = search_topk(reader, terms, mode=mode, k=k, strategy="wand")
    ex = search_exhaustive(reader, terms, mode=mode, k=k)
    assert [d for d, _ in fast] == [d for d, _ in ex]
    np.testing.assert_allclose(
        [s for _, s in fast], [s for _, s in ex], rtol=0, atol=1e-9
    )
