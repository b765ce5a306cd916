"""Bloom-filter benchmark decontamination — the broadcast-bits scale path.

`textqual.contamination_flags` is the exact twin: explode corpus n-grams and
semi-join the eval set's distinct grams. That join is right while the eval
side is join-sized; when the protected set grows to hundreds of millions of
grams (every public benchmark + held-out splits + canaries), the scale move
is the classic one (Bloom 1970; the same trade Lee et al. 2022 and most
production decontamination stacks make): pack the eval grams into an m-bit
Bloom filter ONCE, broadcast the bits (m/8 bytes, e.g. 64 MB for m=2^29 —
executor-cache-sized at any corpus size), and probe each corpus gram locally
inside a vectorized `mapInPandas` pass. No shuffle, no join: the corpus side
is one streaming scan whatever its size, and the filter guarantees NO FALSE
NEGATIVES — a contaminated doc is always flagged; false positives only cost
over-removal, bounded by (1 - e^{-kn/m})^k.

Hashing is `pandas.util.hash_array` (the repo's vectorized 64-bit hash, same
as winnowing) with double hashing pos_i = (h1 + i*h2) mod m — k derived
probes from two independent hashes (Kirsch & Mitzenmacher 2006).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# the ONE gram derivation, shared with the exact semi-join twin — the
# no-false-negatives guarantee requires token-identical grams on both paths
from miru_spark.pipeline.textqual import ngram_col as _gram_col  # noqa: E402


def _positions(grams: np.ndarray, n_bits: int, k_hashes: int) -> np.ndarray:
    """(len(grams), k) bit positions via double hashing of two seeded
    hash_array passes. |h2 forced odd so the k probes never collapse."""
    h1 = pd.util.hash_array(grams, hash_key="0123456789abcdef")
    h2 = pd.util.hash_array(grams, hash_key="fedcba9876543210") | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(
        np.int64
    )


def build_ngram_bloom(
    docs: DataFrame,
    benchmark_ids: list[int],
    n: int = 8,
    n_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> np.ndarray:
    """Pack the benchmark docs' distinct token n-grams into a Bloom bit
    array (uint8, n_bits/8 bytes). The eval side is the SMALL side: one
    distinct over its grams, hashes collected (bounded by eval-set size),
    bits set driver-side."""
    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")
    bench = [int(i) for i in benchmark_ids]
    toks = F.array_remove(F.split(F.col("text"), " "), "")
    grams = (
        docs.filter(F.col("doc_id").isin(bench))
        .select(toks.alias("toks"))
        .select(F.explode(_gram_col(n)).alias("g"))
        .distinct()
    )
    gvals = np.array([r["g"] for r in grams.collect()], dtype=object)
    bits = np.zeros(n_bits >> 3, dtype=np.uint8)
    if gvals.size:
        pos = _positions(gvals, n_bits, k_hashes).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def contamination_flags_bloom(
    docs: DataFrame,
    benchmark_ids: list[int],
    bits: np.ndarray,
    n: int = 8,
    k_hashes: int = 4,
) -> DataFrame:
    """Docs sharing ANY token n-gram with the filtered benchmark set —
    superset of the exact `contamination_flags` output (no false
    negatives), with Bloom-rate false positives. One broadcast + one
    streaming mapInPandas scan; zero shuffle on the corpus side."""
    n_bits = int(bits.size) << 3
    bench = set(int(i) for i in benchmark_ids)
    sc = docs.sparkSession.sparkContext
    bbits = sc.broadcast(bits)

    def probe(batches):
        local = bbits.value
        for pdf in batches:
            # batch-vectorized: ONE hash pass over every gram in the batch
            # (two keyed hash_array calls total), then a per-row any()
            # via count-reduceat over the row boundaries — no per-doc loop
            lens = pdf["grams"].map(len).to_numpy(dtype=np.int64)
            if lens.sum() == 0:
                yield pd.DataFrame({"doc_id": pdf["doc_id"][:0]})
                continue
            flat = np.concatenate(
                [np.asarray(g, dtype=object) for g in pdf["grams"] if len(g)]
            )
            pos = _positions(flat, n_bits, k_hashes)
            present = (
                local[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))
            ) != 0
            # sentinel 0 keeps boundaries of trailing empty rows in range
            gram_hit = np.append(present.all(axis=1).astype(np.int64), 0)
            bounds = np.zeros(len(pdf), dtype=np.int64)
            np.cumsum(lens[:-1], out=bounds[1:])
            counts = np.add.reduceat(gram_hit, bounds)
            counts[lens == 0] = 0  # empty rows read a stray single element
            yield pd.DataFrame({"doc_id": pdf["doc_id"][counts > 0]})

    toks = F.array_remove(F.split(F.col("text"), " "), "")
    cand = (
        docs.filter(~F.col("doc_id").isin(list(bench)))
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", _gram_col(n).alias("grams"))
    )
    out_schema = T.StructType([T.StructField("doc_id", T.LongType())])
    return cand.mapInPandas(probe, out_schema).orderBy("doc_id")
