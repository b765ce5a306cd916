"""On-disk posting-list format: blocked, delta-encoded, varint/PFOR-compressed.

A final index row ("chunk") holds one contiguous slice of one term's posting
list (hot terms are split across several chunk rows by the salted merge —
bucket 0..S-1 — so no single row ever exceeds ~target_chunk postings; this is
what keeps the format viable when a hot term like 'import' matches billions of
docs at 10^12-file scale).

Chunk blob layout — a sequence of blocks of up to BLOCK_SIZE postings; each
block is three back-to-back compressed integer streams:

    [gaps][tfs][doc_lens]

* gaps: delta-encoded docIDs; block 0's first gap is the absolute docID,
  block k's first gap is the delta from block k-1's last docID, so a chunk is
  fully self-contained (distributable scoring) while blocks remain
  independently decodable given the previous block's last_docid from metadata.
* tfs: term frequencies; doc_lens: per-doc token counts (Lucene-norm-style —
  duplicated from the docmap so scoring never joins the docmap).
* codec: CODEC_VARINT (v1, self-delimiting given the block's n from metadata)
  or CODEC_PFOR (v2, self-describing blocks).

Per-block metadata (kept as an array<struct> DataFrame column next to the
blob — SURVEY.md A9): byte offset, n postings, last docID, and the exact BM25
max-score upper bound (double, NOT float32 — a rounded-down bound would make
block-max WAND skip unsafely).

All functions are pure numpy; they run inside Arrow-vectorized UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from miru_spark.functions import bm25
from miru_spark.functions.codecs import (
    CODEC_PFOR,
    CODEC_VARINT,
    delta_decode,
    delta_encode,
    pfor_decode,
    pfor_encode,
    varint_decode,
    varint_encode,
)

BLOCK_SIZE = 128


@dataclass
class BlockMeta:
    offset: int
    n: int
    last_docid: int
    max_score: float

    def as_dict(self) -> dict:
        return {
            "offset": self.offset,
            "n": self.n,
            "last_docid": self.last_docid,
            "max_score": self.max_score,
        }


def _enc(values: np.ndarray, codec: int) -> bytes:
    return varint_encode(values) if codec == CODEC_VARINT else pfor_encode(values)


def _dec(blob, offset: int, n: int, codec: int):
    if codec == CODEC_VARINT:
        return varint_decode(blob, offset, count=n)
    return pfor_decode(blob, offset)


def pack_chunk(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    codec: int = CODEC_VARINT,
    idf: float | None = None,
    avgdl: float | None = None,
) -> tuple[bytes, list[dict]]:
    """Ascending absolute docIDs (+tf, +doc_len) -> (blob, block metadata).

    ``idf``/``avgdl`` fill in the exact per-block BM25 max-score bound; pass
    None at segment stage (scores need global stats, only known post-merge).
    """
    assert docids.size == tfs.size == dls.size
    parts: list[bytes] = []
    metas: list[dict] = []
    offset = 0
    base = 0
    for s in range(0, docids.size, BLOCK_SIZE):
        ids = docids[s : s + BLOCK_SIZE]
        btf = tfs[s : s + BLOCK_SIZE]
        bdl = dls[s : s + BLOCK_SIZE]
        gaps = delta_encode(ids, base=base)
        blk = _enc(gaps, codec) + _enc(btf.astype(np.uint64), codec) + _enc(
            bdl.astype(np.uint64), codec
        )
        max_score = (
            bm25.max_block_score(btf, idf, bdl, avgdl) if idf is not None else 0.0
        )
        metas.append(
            BlockMeta(offset, int(ids.size), int(ids[-1]), max_score).as_dict()
        )
        parts.append(blk)
        offset += len(blk)
        base = int(ids[-1])
    return b"".join(parts), metas


def unpack_block(blob, meta: dict, prev_last_docid: int, codec: int):
    """Decode one block -> (docids, tfs, dls) as uint64 arrays."""
    off = int(meta["offset"])
    n = int(meta["n"])
    gaps, used = _dec(blob, off, n, codec)
    off += used
    tfs, used = _dec(blob, off, n, codec)
    off += used
    dls, _ = _dec(blob, off, n, codec)
    docids = delta_decode(gaps, base=prev_last_docid)
    return docids, tfs, dls


def unpack_chunk(blob, metas: list[dict], codec: int):
    """Decode a whole chunk -> (docids, tfs, dls)."""
    ids_l, tf_l, dl_l = [], [], []
    prev = 0
    for m in metas:
        ids, tfs, dls = unpack_block(blob, m, prev, codec)
        ids_l.append(ids)
        tf_l.append(tfs)
        dl_l.append(dls)
        prev = int(m["last_docid"])
    if not ids_l:
        e = np.empty(0, dtype=np.uint64)
        return e, e.copy(), e.copy()
    return np.concatenate(ids_l), np.concatenate(tf_l), np.concatenate(dl_l)


# ------------------------------------------------- segment (pre-merge) form --

def seg_pack(docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """Per-partition segment payload: three plain varint streams (always
    varint — segments are transient; PFOR pays off only on the final index)."""
    gaps = delta_encode(np.ascontiguousarray(docids, dtype=np.uint64))
    return (
        varint_encode(gaps)
        + varint_encode(np.ascontiguousarray(tfs, dtype=np.uint64))
        + varint_encode(np.ascontiguousarray(dls, dtype=np.uint64))
    )


def seg_unpack(blob, n: int):
    gaps, used = varint_decode(blob, 0, count=n)
    tfs, used2 = varint_decode(blob, used, count=n)
    dls, _ = varint_decode(blob, used + used2, count=n)
    return delta_decode(gaps), tfs, dls


CODECS = {"varint": CODEC_VARINT, "pfor": CODEC_PFOR}
