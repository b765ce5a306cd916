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
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from miru_spark.index.format import seg_pack

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("partition_id", T.LongType(), False),
        T.StructField("df_local", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)

_ARROW_SEGMENT = pa.schema(
    [
        ("term", pa.string()),
        ("partition_id", pa.int64()),
        ("df_local", pa.int64()),
        ("n_tokens", pa.int64()),
        ("blob", pa.binary()),
    ]
)


def _build_segments(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """One call per Spark partition. Accumulate exploded (pid, term, doc)
    counts across batches, then emit one row per (pid, term)."""
    frames: list[pd.DataFrame] = []
    for batch in batches:
        tokens = batch.column("tokens")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = tokens.flatten()
        # token i belongs to the row whose list covers position i
        offsets = np.asarray(tokens.offsets)
        counts = np.diff(offsets)
        doc_ids = np.repeat(np.asarray(batch.column("doc_id")), counts)
        pids = np.repeat(np.asarray(batch.column("partition_id")), counts)
        dls = np.repeat(np.asarray(batch.column("doc_len")), counts)
        frames.append(
            pd.DataFrame(
                {
                    "pid": pids,
                    "term": flat.to_pandas(),
                    "doc_id": doc_ids,
                    "dl": dls,
                }
            )
        )
    if not frames:
        yield pa.RecordBatch.from_pylist([], schema=_ARROW_SEGMENT)
        return
    tok = pd.concat(frames, ignore_index=True)
    tf = (
        tok.groupby(["pid", "term", "doc_id"], sort=True)
        .agg(tf=("dl", "size"), dl=("dl", "first"))
        .reset_index()
    )
    rows: dict[str, list] = {"term": [], "partition_id": [], "df_local": [], "n_tokens": [], "blob": []}
    # per (pid, term): docids already ascending thanks to sort=True groupby
    for (pid, term), g in tf.groupby(["pid", "term"], sort=True):
        docids = g["doc_id"].to_numpy(dtype=np.uint64)
        tfs = g["tf"].to_numpy(dtype=np.uint64)
        dls_a = g["dl"].to_numpy(dtype=np.uint64)
        rows["term"].append(term)
        rows["partition_id"].append(int(pid))
        rows["df_local"].append(int(docids.size))
        rows["n_tokens"].append(int(tfs.sum()))
        rows["blob"].append(seg_pack(docids, tfs, dls_a))
    yield pa.RecordBatch.from_pydict(rows, schema=_ARROW_SEGMENT)


def build_segments(
    normalized: DataFrame, num_partitions: int, n_docs: int | None = None
) -> DataFrame:
    """normalized corpus (doc_id, tokens, doc_len, ...) -> segment rows.

    ``partition_id = doc_id // ceil(n_docs / num_partitions)`` — deterministic,
    contiguous, ordered. Physically repartitions by pid so each logical
    partition's postings are built by a single task (locality for the
    checkpoint unit), but correctness does not depend on it.
    """
    if n_docs is None:
        n_docs = normalized.count()
    docs_per_part = max(1, -(-n_docs // num_partitions))
    with_pid = normalized.select(
        "doc_id",
        (F.col("doc_id") / F.lit(docs_per_part)).cast("long").alias("partition_id"),
        "tokens",
        "doc_len",
    )
    return with_pid.repartition(num_partitions, "partition_id").mapInArrow(
        _build_segments, SEGMENT_SCHEMA
    )
