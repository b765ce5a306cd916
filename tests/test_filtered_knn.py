"""Filtered kNN (ES knn query with filter — pre-filter semantics) — A87."""

from __future__ import annotations

import pytest

from miru_spark.pipeline.similarity import (
    ann_int8_topk,
    cosine_topk_bruteforce,
    cosine_topk_filtered,
    filtered_knn_oracle_sql,
)


@pytest.fixture(scope="module")
def emb(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    from pyspark.sql import functions as F

    row = emb.filter(F.col("vec_id") == 0).collect()[0]
    return [float(x) for x in row["embedding"]]


@pytest.mark.parametrize("labels", [[3, 7], [0], [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]])
def test_filtered_knn_matches_oracle(emb, qvec, duck, labels):
    got = sorted(
        tuple(r)
        for r in cosine_topk_filtered(emb, qvec, label_in=labels, k=10).collect()
    )
    exp = sorted(
        tuple(r)
        for r in duck.execute(filtered_knn_oracle_sql(labels, k=10)).fetchall()
    )
    assert got == exp


def test_prefilter_beats_postfilter(emb, qvec):
    """The semantics that justify pre-filtering: post-filtering a global
    top-k returns fewer than k survivors under a selective filter, while
    the pre-filter always fills k from the filtered set — and every
    post-filter survivor appears in the pre-filtered result."""
    labels = [3]
    k = 10
    pre = cosine_topk_filtered(emb, qvec, label_in=labels, k=k).collect()
    global_k = cosine_topk_bruteforce(emb, qvec, k=k).collect()
    lbl = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    post = [r for r in global_k if lbl[r["vec_id"]] in labels]
    assert len(pre) == k
    assert len(post) < k  # ~10% selectivity: the global top-10 can't fill it
    assert {r["vec_id"] for r in post} <= {r["vec_id"] for r in pre}
    assert all(lbl[r["vec_id"]] in labels for r in pre)


def test_int8_filtered_prefilters_compressed_scan(emb, qvec):
    """The compressed-domain scan composes with the pre-filter: with an
    exact-rerank window covering the filtered set, the int8 path equals the
    exact filtered brute force value-for-value; without rerank, recall of
    the filtered top-10 stays >= 9/10."""
    labels = [3, 7]
    exact = cosine_topk_filtered(emb, qvec, label_in=labels, k=10).collect()
    rer = ann_int8_topk(
        emb, qvec, k=10, rerank=120, label_in=labels
    ).collect()
    assert [(r["vec_id"], r["cos"]) for r in rer] == [
        (r["vec_id"], r["cos"]) for r in exact
    ]
    approx = ann_int8_topk(emb, qvec, k=10, label_in=labels).collect()
    hits = {r["vec_id"] for r in approx} & {r["vec_id"] for r in exact}
    assert len(hits) >= 9
    lbl = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    assert all(lbl[r["vec_id"]] in labels for r in approx)


def test_filtered_knn_validation(emb, qvec):
    with pytest.raises(ValueError):
        cosine_topk_filtered(emb, qvec, label_in=[], k=10)
    with pytest.raises(ValueError):
        filtered_knn_oracle_sql([])
