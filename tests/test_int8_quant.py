"""Int8 scalar quantization (Lucene int8_hnsw storage trade)."""

from __future__ import annotations

import numpy as np
import pytest

from miru_spark.pipeline.similarity import (
    ann_int8_topk,
    cosine_topk_bruteforce,
    quantize_int8,
)


@pytest.fixture(scope="module")
def emb(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.filter("vec_id = 0").first()
    return [float(x) for x in row["embedding"]]


def test_codes_are_4x_smaller_and_reconstruct(emb):
    dim = len(emb.first()["embedding"])
    rows = quantize_int8(emb).collect()
    assert all(len(r["codes"]) == dim for r in rows)  # 1 byte/dim vs 4
    # reconstruction error small: cos(original, dequantized) ~ 1
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for r in rows[:20]:
        v = orig[r["vec_id"]]
        v = v / (np.linalg.norm(v) or 1.0)
        deq = np.frombuffer(r["codes"], dtype=np.int8).astype(np.float64) * r["scale"]
        cos = float(v @ deq / (np.linalg.norm(deq) or 1.0))
        assert cos > 0.999


def test_int8_recall_and_rerank_exactness(emb, qvec):
    exact = [r["vec_id"] for r in cosine_topk_bruteforce(emb, qvec, k=10).collect()]
    approx = [r["vec_id"] for r in ann_int8_topk(emb, qvec, k=10).collect()]
    assert len(set(exact) & set(approx)) >= 9  # compressed-domain recall
    rr = cosine_topk_bruteforce(emb, qvec, k=10).collect()
    rr2 = ann_int8_topk(emb, qvec, k=10, rerank=50).collect()
    # rerank window >> k: exact-cosine values, identical to brute force
    assert [(r["vec_id"], r["cos"]) for r in rr] == [
        (r["vec_id"], r["cos"]) for r in rr2
    ]


def test_quantization_deterministic(emb):
    a = {r["vec_id"]: r["codes"] for r in quantize_int8(emb).collect()}
    b = {r["vec_id"]: r["codes"] for r in quantize_int8(emb.repartition(7)).collect()}
    assert a == b


def test_empty_label_filter_raises(emb, qvec):
    # [] must not silently mean "no filter" (ADVICE r03): the exact path
    # (cosine_topk_filtered) raises, so the compressed path must too.
    with pytest.raises(ValueError, match="non-empty"):
        ann_int8_topk(emb, qvec, k=3, label_in=[])
