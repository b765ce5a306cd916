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


def test_minhash_signatures_match_reference(spark, docs):
    """The shuffle-free mapInPandas signature stage must equal an independent
    explode-based reference computed driver-side from the same JVM xxhash64
    shingle hashes (guards the round-2 rewrite that removed the 64-group
    applyInPandas ceiling)."""
    from miru_spark.pipeline.dedup import (
        _MERSENNE,
        _perm_coeffs,
        doc_shingles,
        minhash_signatures,
    )

    d = docs.limit(40)
    got = {r.doc_id: tuple(r.sig) for r in minhash_signatures(d).collect()}
    ref_rows = (
        doc_shingles(d).select("doc_id", F.xxhash64("shingle").alias("h")).toPandas()
    )
    a_co, b_co = _perm_coeffs(64, 42)
    want = {}
    for doc_id, grp in ref_rows.groupby("doc_id"):
        h = grp["h"].to_numpy("int64").astype("uint64")
        sig = tuple(
            int(((a_co[j] * h + b_co[j]) % np.uint64(_MERSENNE)).min().astype("int64"))
            for j in range(64)
        )
        want[int(doc_id)] = sig
    assert got == want


def test_simhash_match_reference(spark, docs):
    """mapInPandas SimHash equals a tf-weighted explode-based reference."""
    from miru_spark.pipeline.dedup import simhash_fingerprints, tokens

    d = docs.limit(40)
    got = {r.doc_id: r.fingerprint for r in simhash_fingerprints(d).collect()}
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .select("doc_id", F.xxhash64("term").alias("h"), "tf")
        .toPandas()
    )
    want = {}
    for doc_id, grp in tf.groupby("doc_id"):
        h = grp["h"].to_numpy("int64").astype("uint64")
        w = grp["tf"].to_numpy("float64")
        bits = ((h[:, None] >> np.arange(64, dtype="uint64")) & np.uint64(1)).astype(
            "float64"
        )
        sums = ((bits * 2.0 - 1.0) * w[:, None]).sum(axis=0)
        fp = ((sums > 0).astype("uint64") * (np.uint64(1) << np.arange(64, dtype="uint64"))).sum(
            dtype="uint64"
        )
        want[int(doc_id)] = int(fp.astype("int64"))
    assert got == want


def test_ann_indexes_prune_partitions(spark, emb, tmp_path):
    """Persisted ANN structures: a probe must scan ONLY the matching
    partition directories (IVF: n_probe cluster dirs; LSH: prefix dirs)."""
    from miru_spark.pipeline.similarity import (
        ann_ivf_query,
        ann_lsh_query,
        build_ivf_index,
        build_lsh_index,
    )

    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).collect()[0].embedding]

    import json
    import shutil

    import numpy as np

    # IVF: compute the 2 probed clusters, DELETE every other cluster dir —
    # the probe must still run and return identical rows (proof it never
    # touches the non-probed directories)
    ivf = str(tmp_path / "ivf")
    build_ivf_index(emb, ivf, n_clusters=8)
    before = ann_ivf_query(spark, ivf, q, k=5, n_probe=2).collect()
    cents = np.asarray(
        json.load(open(f"{ivf}/centroids.json"))["centroids"], dtype="float64"
    )
    probe = set(
        int(c)
        for c in (((cents - np.asarray(q)[None, :]) ** 2).sum(axis=1)).argsort()[:2]
    )
    for c in range(8):
        if c not in probe:
            shutil.rmtree(f"{ivf}/vectors/cluster={c}", ignore_errors=True)
    after = ann_ivf_query(spark, ivf, q, k=5, n_probe=2).collect()
    assert before == after and len(before) == 5

    # LSH at max_hamming=0: only the query bucket's prefix dir may be read
    from miru_spark.pipeline.similarity import (
        LSH_PREF_BITS,
        _query_bucket,
    )

    lsh = str(tmp_path / "lsh")
    build_lsh_index(emb, lsh)
    before = ann_lsh_query(spark, lsh, q, k=5, max_hamming=0).collect()
    params = json.load(open(f"{lsh}/lsh.json"))
    qpref = _query_bucket(q, params["dim"], params["n_bits"], params["seed"]) >> (
        params["n_bits"] - LSH_PREF_BITS
    )
    import os

    for d in os.listdir(f"{lsh}/vectors"):
        if d.startswith("bucket_pref=") and d != f"bucket_pref={qpref}":
            shutil.rmtree(f"{lsh}/vectors/{d}", ignore_errors=True)
    after = ann_lsh_query(spark, lsh, q, k=5, max_hamming=0).collect()
    assert before == after


def test_assign_doc_ids_deterministic(spark):
    """Range-partitioned doc_id assignment: same ids at any parallelism."""
    from miru_spark.schema import assign_doc_ids

    rows = [
        (f"repo{i % 7}", f"path{i:04d}", "v0", "en", f"content {i}")
        for i in range(200)
    ]
    base = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    a = {
        (r.repo, r.path): r.doc_id
        for r in assign_doc_ids(base.repartition(2)).collect()
    }
    b = {
        (r.repo, r.path): r.doc_id
        for r in assign_doc_ids(base.repartition(8)).collect()
    }
    assert a == b
    ids = sorted(a.values())
    assert ids == list(range(200))  # dense 0-based, no gaps
    # ids follow (repo, path, commit) sort order
    by_key = sorted(a.keys())
    assert [a[k] for k in by_key] == list(range(200))


def test_cosine_near_pairs_blocked_equals_naive(spark, emb):
    """The block-matrix rewrite must emit exactly the naive cross-join's
    pairs — forced multi-block (block=64) so diagonal AND cross-block
    groups are both exercised."""
    from pyspark.sql import functions as F

    from miru_spark.pipeline.similarity import cosine_col, cosine_near_pairs

    got = [
        (r.id_a, r.id_b, r.cos)
        for r in cosine_near_pairs(emb, threshold=0.3, block=64).collect()
    ]
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    naive = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_col(F.col("emb_a"), F.col("emb_b")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= 0.3)
        .orderBy("id_a", "id_b")
    )
    want = [(r.id_a, r.id_b, r.cos) for r in naive.collect()]
    assert got and got == want


def test_semantic_dedup_single_cluster_equals_exact(spark, emb):
    """SemDeDup with n_clusters=1 IS embedding_dedup (the driver-oracle
    identity); forced multi-block so the within-key plumbing is real."""
    from miru_spark.pipeline.similarity import embedding_dedup, semantic_dedup

    got = [r.vec_id for r in semantic_dedup(emb, n_clusters=1, threshold=0.4, block=64).collect()]
    want = [r.vec_id for r in embedding_dedup(emb, threshold=0.4).collect()]
    assert got == want
    n_all = emb.count()
    assert 0 < len(got) < n_all  # dedup actually bites on the fixture


def test_semantic_dedup_multicluster_recall(spark, emb):
    """Multi-cluster SemDeDup: deterministic, keeps every doc the exact
    twin keeps (within-cluster pairs are a SUBSET of all pairs, so fewer
    docs get dropped — the paper's documented recall trade), and still
    removes most duplicates on the fixture."""
    from miru_spark.pipeline.similarity import embedding_dedup, semantic_dedup

    exact_kept = {r.vec_id for r in embedding_dedup(emb, threshold=0.4).collect()}
    sem1 = [r.vec_id for r in semantic_dedup(emb, n_clusters=4, threshold=0.4).collect()]
    sem2 = [r.vec_id for r in semantic_dedup(emb, n_clusters=4, threshold=0.4).collect()]
    assert sem1 == sem2  # seeded centroids + deterministic sample
    kept = set(sem1)
    assert exact_kept <= kept
    n_all = emb.count()
    removed_exact = n_all - len(exact_kept)
    removed_sem = n_all - len(kept)
    assert removed_sem >= removed_exact * 0.6, (removed_sem, removed_exact)
