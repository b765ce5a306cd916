"""A43 — merge independently built indexes (Lucene IndexWriter.addIndexes).

The cluster-scale build pattern this enables: shard the corpus, build each
shard's index as an independent job (fault domains stay small, stragglers
don't hold the others), then combine the finished indexes into one serving
index with ONE bounded merge pass — no re-tokenization, no touching the
source corpora.

Semantics follow Lucene's ``addIndexes``: documents are renumbered
sequentially in source order (source ``i``'s doc ``d`` becomes
``offset_i + d``), corpus statistics (df / n_docs / n_tokens / avgdl) are
recomputed exactly, and the result is rank-identical to a single build over
the concatenated corpus (pytest-asserted). Sources with pending tombstones
are rejected — purge first, exactly like Lucene forces ``maybeMerge`` to
apply deletes before a segment is copied.

Plan shape (Spark-first): per source, one ``mapInArrow`` pass decodes each
final chunk, offsets its doc_ids, and re-emits it as a SEGMENT row (the
builder's intermediate representation — position streams pass through
byte-identical since positions are within-doc); the union of all sources'
segment rows then flows through the SAME salted merge + compacted sink the
normal build uses. Cost class O(total postings) with no shuffle before the
merge's own term shuffle — the same class as a Lucene background merge.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.functions.codecs import CODEC_VARINT
from miru_spark.operators.merge import DEFAULT_TARGET_CHUNK, merge_segments
from miru_spark.operators.segments import _ARROW_SEGMENT, SEGMENT_SCHEMA
from miru_spark.index.writer import (
    N_TERM_PREFIX_BUCKETS,
    _write_manifest,
    compaction_files_per_dir,
    term_pref_col,
    write_term_dictionary,
)


def _chunks_to_segments(doc_offset: int, pid_base: int):
    """mapInArrow kernel: final chunk rows of ONE source -> segment rows
    with doc_ids shifted by ``doc_offset``. partition_id = pid_base +
    bucket keeps per-term docID ranges disjoint AND ordered across sources
    (buckets are contiguous ascending docID ranges within a source, and
    pid_base strictly separates sources), which is the invariant
    merge_segments' bucketing window requires."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        from miru_spark.index.format import seg_pack, unpack_chunk

        off = np.uint64(doc_offset)
        for batch in batches:
            out = []
            for row in batch.to_pylist():
                ids, tfs, dls = unpack_chunk(
                    row["blob"], row["blocks"], int(row["codec"])
                )
                out.append(
                    {
                        "term": row["term"],
                        "partition_id": pid_base + int(row["bucket"]),
                        "df_local": int(ids.size),
                        "n_tokens": int(tfs.sum()),
                        "blob": seg_pack(ids + off, tfs, dls),
                        # positions are within-doc varint gap streams in
                        # BOTH representations: renumbering can't touch them
                        "pos": row.get("pos_blob"),
                    }
                )
            if out:
                yield pa.RecordBatch.from_pylist(out, schema=_ARROW_SEGMENT)

    return fn


def _source_postings(spark: SparkSession, src: str, reader) -> DataFrame:
    if reader.snapshot is not None:
        from miru_spark.index import snapshots as snapmod

        return spark.read.option("basePath", f"{src}/postings").parquet(
            *snapmod.snapshot_files(src)
        )
    return spark.read.parquet(f"{src}/postings")


def merge_indexes(
    spark: SparkSession,
    sources: list[str],
    dest: str,
    codec: int = CODEC_VARINT,
    target_chunk: int = DEFAULT_TARGET_CHUNK,
) -> dict:
    """Merge finished indexes at ``sources`` into a new index at ``dest``.

    Returns the merged index's manifest. Raises if the sources disagree on
    tokenizer or positions (their postings wouldn't be comparable), or if
    any source has pending deletes (purge first)."""
    from miru_spark.index.reader import IndexReader

    if len(sources) < 2:
        raise ValueError("merge_indexes needs at least two sources")
    t0 = time.time()
    readers = [IndexReader(spark, s) for s in sources]
    tokenizers = {r.stats.get("tokenizer", "whitespace") for r in readers}
    if len(tokenizers) > 1:
        raise ValueError(
            f"sources use different tokenizers {sorted(tokenizers)}; their "
            "terms are not comparable"
        )
    positions = {bool(r.stats.get("positions", False)) for r in readers}
    if len(positions) > 1:
        raise ValueError(
            "sources disagree on positional postings; rebuild the odd one "
            "out (a merged index must serve phrase queries from every doc "
            "or none)"
        )
    for s, r in zip(sources, readers):
        tomb = getattr(r, "tombstones", None)
        if tomb is not None and tomb.size > 0:
            raise ValueError(
                f"source {s} has {tomb.size} pending deletes; purge_deleted "
                "it first (merging would resurrect them)"
            )

    # sequential renumbering: source i's ids shift past every earlier
    # source's id RANGE (max_id + 1, not n_docs — a previously-purged
    # source has holes and ids beyond n_docs)
    seg_dfs = []
    doc_off = 0
    pid_base = 0
    docmaps = []
    base_cols = None
    for s, r in zip(sources, readers):
        dm = r.docmap_df()
        if base_cols is None:
            base_cols = list(dm.columns)
        elif set(dm.columns) != set(base_cols):
            raise ValueError(
                f"source {s} docmap columns {sorted(dm.columns)} != "
                f"{sorted(base_cols)}"
            )
        hi = dm.agg(
            F.max("doc_id").alias("m"), F.count("*").alias("n")
        ).collect()[0]
        post = _source_postings(spark, s, r)
        max_bucket = post.agg(F.max("bucket").alias("b")).collect()[0]["b"]
        seg_dfs.append(
            post.mapInArrow(
                _chunks_to_segments(doc_off, pid_base), SEGMENT_SCHEMA
            )
        )
        docmaps.append(
            dm.withColumn("doc_id", F.col("doc_id") + F.lit(doc_off))
            .select(*base_cols)
        )
        doc_off += int(hi["m"]) + 1
        pid_base += int(max_bucket) + 1

    segments = seg_dfs[0]
    for d in seg_dfs[1:]:
        segments = segments.unionByName(d)
    has_pos = positions.pop()

    merged = merge_segments(
        segments, codec=codec, target_chunk=target_chunk
    ).withColumn("term_pref", term_pref_col(F.col("term")))
    n_tokens = sum(int(r.stats["n_tokens"]) for r in readers)
    files_per_dir = compaction_files_per_dir(n_tokens)
    merged = merged.repartition(
        N_TERM_PREFIX_BUCKETS * files_per_dir,
        "term_pref",
        F.pmod(F.xxhash64("term"), F.lit(files_per_dir)),
    )
    merged.write.mode("overwrite").partitionBy("term_pref").parquet(
        f"{dest}/postings"
    )

    docmap = docmaps[0]
    for d in docmaps[1:]:
        docmap = docmap.unionByName(d)
    docmap.write.mode("overwrite").parquet(f"{dest}/docmap")

    n_docs = sum(int(r.stats["n_docs"]) for r in readers)
    final = spark.read.parquet(f"{dest}/postings")
    write_term_dictionary(
        final.withColumnRenamed("df_chunk", "df_local"), dest, n_tokens
    )
    stats_out = {
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "avgdl": n_tokens / max(n_docs, 1),
        "codec": int(codec),
        "tokenizer": tokenizers.pop(),
        "target_chunk": int(target_chunk),
        "positions": has_pos,
        "k1": 1.2,
        "b": 0.75,
    }
    with open(f"{dest}/stats.json", "w") as f:
        json.dump(stats_out, f, indent=1, sort_keys=True)
    manifest = {
        "version": 1,
        "operation": "add_indexes",
        "sources": list(sources),
        "tokenizer": stats_out["tokenizer"],
        "codec": int(codec),
        "positions": has_pos,
        "n_docs": n_docs,
        "partitions": {},
        "metrics": {"merge_secs": round(time.time() - t0, 3)},
    }
    _write_manifest(f"{dest}/manifest.json", manifest)
    return manifest
