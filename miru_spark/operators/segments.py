"""A4 — per-partition posting-list (segment) build via ``mapInArrow``.

The canonical JVM->Python Arrow crossing of the build pipeline
(north_star: "per-partition sorted posting lists ... via mapPartitions over
Arrow batches"). Each executor core receives the Arrow batches of one Spark
partition, accumulates (term, doc_id, tf, doc_len) in pandas/numpy, and emits
one segment row per (logical_partition, term) with a varint-compressed
payload. No per-row Python anywhere — tokenizing happened JVM-side, counting
is a vectorized groupby, encoding is numpy.

Logical partitions (``partition_id = doc_id // docs_per_partition``) are
decoupled from Spark partitions: they are the deterministic checkpoint/resume
and lineage unit (SURVEY.md A12) and their docID ranges are contiguous and
ordered, which turns the later merge into a cheap ordered concat. A Spark
partition may carry several logical partitions; the builder groups by pid
internally, so correctness never depends on Spark's physical partitioning —
that is what makes the index byte-identical at any parallelism (the
two-cluster-size determinism requirement).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from miru_spark.index.format import pos_gaps_encode, seg_pack
from miru_spark.functions.codecs import varint_encode

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("partition_id", T.LongType(), False),
        T.StructField("df_local", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("pos", T.BinaryType(), True),  # null unless positions=True
    ]
)

_ARROW_SEGMENT = pa.schema(
    [
        ("term", pa.string()),
        ("partition_id", pa.int64()),
        ("df_local", pa.int64()),
        ("n_tokens", pa.int64()),
        ("blob", pa.binary()),
        ("pos", pa.binary()),
    ]
)


def _make_segment_builder(docs_per_part: int, positions: bool = False):
    def _build_segments(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        """One call per Spark partition. Fully vectorized: Arrow
        dictionary-encodes tokens to int32 codes, then one numpy lexsort +
        run-length pass replaces any hash-based groupby (no object-dtype
        pandas in the hot path — this stage touches every token of the
        corpus)."""
        tok_chunks: list[pa.Array] = []
        docid_per_tok: list[np.ndarray] = []
        doc_chunks: list[np.ndarray] = []
        dl_chunks: list[np.ndarray] = []
        pos_chunks: list[np.ndarray] = []
        for batch in batches:
            tokens = batch.column("tokens")
            if isinstance(tokens, pa.ChunkedArray):
                tokens = tokens.combine_chunks()
            counts = np.diff(np.asarray(tokens.offsets))
            d = np.asarray(batch.column("doc_id"))
            tok_chunks.append(tokens.flatten())
            docid_per_tok.append(np.repeat(d, counts))
            doc_chunks.append(d)
            dl_chunks.append(np.asarray(batch.column("doc_len")))
            if positions:
                # within-doc 0-based token index for every occurrence
                tot = int(counts.sum())
                starts_b = np.concatenate(([0], np.cumsum(counts)[:-1]))
                pos_chunks.append(
                    np.arange(tot, dtype=np.int64) - np.repeat(starts_b, counts)
                )
        if not tok_chunks or sum(len(c) for c in tok_chunks) == 0:
            # partition of zero docs, or docs that all tokenize to nothing
            yield pa.RecordBatch.from_pylist([], schema=_ARROW_SEGMENT)
            return
        # dictionary-encode per chunk then unify: avoids combine_chunks()'s
        # int32-offset 2GB-per-partition ceiling on the flattened strings
        dict_ca = pa.chunked_array(tok_chunks).dictionary_encode().unify_dictionaries()
        codes = np.concatenate(  # int32 — keep narrow, this stage
            [np.asarray(c.indices) for c in dict_ca.chunks]
        )
        doc_ids = np.concatenate(docid_per_tok)  # is memory-bandwidth-bound
        terms = dict_ca.chunk(0).dictionary.to_pylist()
        # per-doc doc_len lookup table (sorted by doc_id) — doc_len is NOT
        # materialized per token
        doc_u = np.concatenate(doc_chunks)
        dl_u = np.concatenate(dl_chunks)
        du_order = np.argsort(doc_u)
        doc_u, dl_u = doc_u[du_order], dl_u[du_order]

        lo = int(doc_ids.min())
        span = int(doc_ids.max()) - lo + 1
        n_codes = int(codes.max()) + 1
        nbins = n_codes * span
        pos_s = occ_starts = None
        if not positions and nbins <= max(4 * doc_ids.size, 1 << 22):
            # bincount path: O(n + bins), no sort at all. Bin order is
            # code-major then doc ascending — exactly posting order.
            key = codes.astype(np.int64) * span + (doc_ids - lo)
            counts_b = np.bincount(key, minlength=nbins)
            nz = np.flatnonzero(counts_b)
            tf = counts_b[nz]
            p_code = nz // span
            p_doc = nz % span + lo
        else:
            # general path: one fused-key argsort (or 2-key lexsort) +
            # run-length. Sorting by (code, doc_id) suffices: pid is
            # monotone in doc_id, so pid runs stay contiguous per code.
            # (positions force this path: the bincount path has no
            # occurrence ordering to gather position values from; the
            # STABLE sort keeps each (term, doc) group's occurrences in
            # original, i.e. ascending-position, order)
            if nbins < (1 << 62):
                order = np.argsort(
                    codes.astype(np.int64) * span + (doc_ids - lo), kind="stable"
                )
            else:
                order = np.lexsort((doc_ids, codes))
            codes_s, doc_s = codes[order], doc_ids[order]
            change = np.empty(doc_s.size, dtype=bool)
            change[0] = True
            np.logical_or(np.diff(doc_s) != 0, np.diff(codes_s) != 0, out=change[1:])
            occ_starts = np.flatnonzero(change)
            tf = np.diff(np.append(occ_starts, doc_s.size))
            p_doc, p_code = doc_s[occ_starts], codes_s[occ_starts].astype(np.int64)
            if positions:
                pos_s = np.concatenate(pos_chunks)[order]
        p_pid = p_doc // docs_per_part
        p_dl = dl_u[np.searchsorted(doc_u, p_doc)]
        # posting-list boundaries at any (code, pid) change
        pchange = np.empty(p_doc.size, dtype=bool)
        pchange[0] = True
        np.logical_or(np.diff(p_code) != 0, np.diff(p_pid) != 0, out=pchange[1:])
        pl_starts = np.flatnonzero(pchange)
        pl_ends = np.append(pl_starts[1:], p_doc.size)

        rows: dict[str, list] = {
            "term": [], "partition_id": [], "df_local": [], "n_tokens": [],
            "blob": [], "pos": [],
        }
        occ_total = doc_ids.size
        for s, e in zip(pl_starts, pl_ends):
            docids = p_doc[s:e].astype(np.uint64)
            tfs = tf[s:e].astype(np.uint64)
            rows["term"].append(terms[p_code[s]])
            rows["partition_id"].append(int(p_pid[s]))
            rows["df_local"].append(int(e - s))
            rows["n_tokens"].append(int(tfs.sum()))
            rows["blob"].append(seg_pack(docids, tfs, p_dl[s:e].astype(np.uint64)))
            if pos_s is not None:
                o0 = int(occ_starts[s])
                o1 = int(occ_starts[e]) if e < occ_starts.size else occ_total
                rows["pos"].append(
                    varint_encode(
                        pos_gaps_encode(pos_s[o0:o1].astype(np.uint64), tfs)
                    )
                )
            else:
                rows["pos"].append(None)
        yield pa.RecordBatch.from_pydict(rows, schema=_ARROW_SEGMENT)

    return _build_segments


def build_segments(
    corpus_with_ids: DataFrame,
    num_partitions: int,
    n_docs: int,
    tokenizer: str = "whitespace",
    positions: bool = False,
) -> DataFrame:
    """corpus (doc_id, content, ...) -> segment rows.

    ``partition_id = doc_id // ceil(n_docs / num_partitions)`` — deterministic,
    contiguous, ordered. The ONE shuffle of this stage moves raw ``content``
    (2-3x smaller than materialized token arrays); tokenization happens
    post-shuffle, pipelined into the Arrow crossing, so token arrays never
    hit the shuffle files or a cache — this stage is memory-bandwidth-bound
    and bytes moved is the scaling ceiling.

    Hash-partitioned on pid (NOT range: the range partitioner's sampling
    pass would re-scan the whole corpus including content). Choose
    ``num_partitions`` of ~4x the core count: hash collisions then average
    out across task waves instead of creating stragglers, and the
    checkpoint/resume unit gets finer. Correctness never depends on physical
    partitioning — the builder groups by pid internally.
    """
    from miru_spark.functions.tokenize import tokens_col

    docs_per_part = max(1, -(-n_docs // num_partitions))
    with_pid = corpus_with_ids.select(
        "doc_id",
        (F.col("doc_id") / F.lit(docs_per_part)).cast("long").alias("partition_id"),
        "content",
        "lang",  # the multilang tokenizer routes its chain on this column
    )
    toks = tokens_col("content", tokenizer)
    return (
        with_pid.repartition(num_partitions, "partition_id")
        .select("doc_id", toks.alias("tokens"))
        .withColumn("doc_len", F.size("tokens").cast("long"))
        .mapInArrow(_make_segment_builder(docs_per_part, positions), SEGMENT_SCHEMA)
        # lineage columns, computed IN the write pass while the blob is in
        # memory: the manifest aggregation then reads only these scalars
        # instead of re-reading every blob from disk (a full-index read-back
        # that serialized the build — parquet page CRCs already guard
        # bit-rot; this hash guards logical identity across resume)
        .withColumn("row_xxh", F.xxhash64("term", "df_local", "blob"))
        .withColumn("blob_bytes", F.length("blob").cast("long"))
    )
