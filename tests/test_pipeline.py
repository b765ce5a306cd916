from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """Every pair the exact Jaccard twin finds at a high threshold must be
    recalled by MinHash LSH banding (16 bands x 4 rows: recall at j=0.12 for
    candidate generation is ~1-(1-j^4)^16; verified pairs use exact Jaccard,
    so precision is 1.0 by construction — we check containment + values)."""
    from miru_spark.pipeline.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.25).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.25).collect()
    }
    # precision: every LSH pair is exact-verified with the same value
    for pair, j in lsh.items():
        assert pair in exact and abs(exact[pair] - j) < 1e-9
    # recall at this threshold on this corpus
    assert set(exact) == set(lsh)


def test_minhash_signatures_deterministic(spark, docs):
    from miru_spark.pipeline.dedup import minhash_signatures

    a = {r.doc_id: tuple(r.sig) for r in minhash_signatures(docs.limit(50)).collect()}
    b = {r.doc_id: tuple(r.sig) for r in minhash_signatures(docs.limit(50).repartition(7)).collect()}
    assert a == b


def test_simhash_identical_docs_equal_fp(spark, docs):
    from miru_spark.pipeline.dedup import simhash_fingerprints

    # duplicate a doc under a new id: fingerprints must be equal
    d0 = docs.limit(20)
    dup = d0.filter(F.col("doc_id") == d0.collect()[0].doc_id).withColumn(
        "doc_id", F.lit(999_999).cast("long")
    )
    fps = {
        r.doc_id: r.fingerprint
        for r in simhash_fingerprints(d0.unionByName(dup)).collect()
    }
    assert fps[999_999] == fps[min(fps)]
    from miru_spark.pipeline.dedup import simhash_near_pairs

    pairs = simhash_near_pairs(d0.unionByName(dup), max_hamming=0).collect()
    assert any(p.doc_b == 999_999 and p.hamming == 0 for p in pairs)


def test_exact_dedup_keeps_min_doc_id(spark, docs):
    from miru_spark.pipeline.dedup import exact_dedup

    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = exact_dedup(docs.unionByName(dup))
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert len(kept) == docs.count()
    assert not any(k >= 1_000_000 for k in kept)


def test_ann_lsh_recall(spark, emb):
    """LSH top-k must recall most of the true top-k (seeded hyperplanes)."""
    from miru_spark.pipeline.similarity import ann_lsh_topk, cosine_topk_bruteforce

    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).collect()[0].embedding]
    true = [r.vec_id for r in cosine_topk_bruteforce(emb, q, k=5).collect()]
    # random 64-d embeddings: best cosine ~0.3 -> angle ~72 deg -> expected
    # hamming ~6.4/16 bits; probe radius 8 gives ~0.7 recall
    approx = [r.vec_id for r in ann_lsh_topk(emb, q, k=5, max_hamming=8).collect()]
    assert true[0] == approx[0] == 3  # the query vector itself
    assert len(set(true) & set(approx)) >= 2


def test_ann_ivf_recall(spark, emb):
    from miru_spark.pipeline.similarity import ann_ivf_topk, cosine_topk_bruteforce

    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).collect()[0].embedding]
    true = [r.vec_id for r in cosine_topk_bruteforce(emb, q, k=5).collect()]
    approx = [r.vec_id for r in ann_ivf_topk(emb, q, k=5, n_probe=8).collect()]
    assert approx[0] == 7
    assert len(set(true) & set(approx)) >= 3


def test_multimodal_roundtrip_and_stub(spark, docs):
    from miru_spark.pipeline.multimodal import (
        decode_media,
        extract_features,
        resize_media,
        synthesize_media,
    )

    media = synthesize_media(docs.limit(10))
    rows = media.collect()
    assert len(rows) == 10
    w, h, px = decode_media(bytes(rows[0].payload))
    assert w == rows[0].meta.width and h == rows[0].meta.height
    assert px.size == w * h

    feats = extract_features(media).collect()
    assert all(abs(sum(r.histogram) - 1.0) < 1e-6 for r in feats if r.width * r.height)

    small = resize_media(media, 4, 4).collect()
    for r in small:
        w2, h2, px2 = decode_media(bytes(r.payload))
        assert (w2, h2) == (4, 4) and px2.size == 16

    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG....", fmt="png")


def test_winnow_shift_property(spark, docs):
    """Identical docs share all fingerprints; winnowing is deterministic."""
    from miru_spark.pipeline.textqual import winnow_fingerprints

    d = docs.limit(5)
    a = {r.doc_id: tuple(r.fingerprints) for r in winnow_fingerprints(d).collect()}
    b = {r.doc_id: tuple(r.fingerprints) for r in winnow_fingerprints(d.repartition(3)).collect()}
    assert a == b
    assert all(len(v) > 0 for v in a.values())


def test_lang_id_shapes(spark, docs):
    from miru_spark.pipeline.textqual import lang_id

    out = lang_id(docs.limit(50)).collect()
    assert len(out) == 50
    assert all(r.pred_lang in {"en", "de", "es", "fr", "zh", "unknown"} for r in out)
    # synthetic multilingual micro-fixture with unambiguous trigrams
    fix = spark.createDataFrame(
        [
            (1, "the thing and the other thing going"),
            (2, "der schöne ich und einmal schon"),
            (3, "的 是 了 在 有"),
        ],
        "doc_id long, text string",
    )
    pred = {r.doc_id: r.pred_lang for r in lang_id(fix).collect()}
    assert pred == {1: "en", 2: "de", 3: "zh"}
