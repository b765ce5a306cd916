"""Sequence packing (concat-and-chunk placement) + DSIR importance resampling."""

from __future__ import annotations

import pytest

from miru_spark.pipeline.dsir import dsir_oracle_sql, dsir_resample, dsir_weights
from miru_spark.pipeline.packing import pack_sequences, pack_sequences_oracle_sql
from tests.conftest import SF_DIR

L = 128


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def placement(docs):
    return {
        r.doc_id: r for r in pack_sequences(docs, L, bucket_width=7).collect()
    }


def test_pack_matches_oracle(duck, docs):
    got = sorted(
        tuple(r) for r in pack_sequences(docs, L, bucket_width=7).collect()
    )
    want = sorted(tuple(r) for r in duck.execute(pack_sequences_oracle_sql(L)).fetchall())
    assert got == want


def test_pack_bucket_width_free(docs):
    """Placement is a pure function of (doc_id, n_tokens): the two-level
    prefix-sum decomposition must not leak into the result."""
    a = sorted(tuple(r) for r in pack_sequences(docs, L, bucket_width=1).collect())
    b = sorted(tuple(r) for r in pack_sequences(docs, L, bucket_width=10**9).collect())
    assert a == b


def test_pack_tiles_the_stream(placement):
    """Consecutive docs abut exactly: next doc's global start position ==
    previous start + previous n_tokens (the stream has no gaps/overlaps)."""
    rows = [placement[k] for k in sorted(placement)]
    pos = 0
    for r in rows:
        assert r.seq_id * L + r.seq_off == pos
        pos += r.n_tokens
    first = rows[0]
    assert (first.seq_id, first.seq_off) == (0, 0)


def test_pack_span_counts(placement):
    for r in placement.values():
        assert 0 <= r.seq_off < L
        if r.n_tokens == 0:
            assert r.n_seqs == 0
        else:
            start = r.seq_id * L + r.seq_off
            last = start + r.n_tokens - 1
            assert r.n_seqs == last // L - r.seq_id + 1


def test_pack_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
    with pytest.raises(ValueError):
        pack_sequences(docs, L, bucket_width=0)


def test_dsir_matches_oracle(duck, docs):
    got = sorted(tuple(r) for r in dsir_weights(docs, "lang = 'en'", 512).collect())
    want = sorted(
        tuple(r)
        for r in duck.execute(dsir_oracle_sql("lang = 'en'", n_buckets=512)).fetchall()
    )
    assert got == want


def test_dsir_resample_is_topk_of_weights(docs):
    w = dsir_weights(docs, "lang = 'en'", 512).collect()
    want = [
        (r.doc_id, r.log_w)
        for r in sorted(w, key=lambda r: (-r.log_w, r.doc_id))[:20]
    ]
    got = [tuple(r) for r in dsir_resample(docs, "lang = 'en'", 20, 512).collect()]
    assert got == want


def test_dsir_separates_target_from_rest(docs):
    """The selected subset should be enriched in target-language docs: the
    likelihood ratio is trained on lang='en' vs all, so en docs must score
    higher on average than the corpus at large."""
    rows = dsir_weights(docs, "lang = 'en'", 512).collect()
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    en = [r.log_w for r in rows if langs[r.doc_id] == "en"]
    rest = [r.log_w for r in rows if langs[r.doc_id] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_dsir_layout_independent(docs):
    a = sorted(tuple(r) for r in dsir_weights(docs.repartition(2), "lang = 'en'", 512).collect())
    b = sorted(tuple(r) for r in dsir_weights(docs.repartition(16), "lang = 'en'", 512).collect())
    assert a == b


def test_dsir_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        dsir_weights(docs, "lang = 'en'", 0)
    with pytest.raises(ValueError):
        dsir_resample(docs, "lang = 'en'", 0)
