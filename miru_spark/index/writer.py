"""A11/A12/A13 — index sink, per-partition checkpoint/resume, build metrics.

On-disk layout (plain parquet + JSON manifest; Iceberg's runtime jar is not
available offline, so the sink is behind this module's interface and the
manifest supplies the atomic-commit + lineage role that Iceberg snapshots
would — SURVEY.md section 7 M8 note):

    index_path/
      docmap/                parquet, sorted by doc_id
      segments/              parquet, partitioned by partition_id  (checkpoint)
      postings/              parquet, partitioned by term_pref = crc32(term) % NB,
                             dir-aligned compaction (~512 MB files)
      df/                    TERM DICTIONARY: range-partitioned, term-sorted
                             (statistics-pruned prefix/regex/suggest seeks)
      fuzzy/                 optional FastSS deletion-neighborhood table
                             (build_fuzzy_dictionary)
      tombstones/            optional delete tombstones (delete_docs;
                             purge_deleted rewrites and clears)
      stats.json             {n_docs, avgdl, n_tokens, codec, ...}
      manifest.json          per-logical-partition lineage + metrics, atomic
      _snapshots/            optional Iceberg-style snapshot manifests

``term_pref`` directory-partitioning is the "seek to the posting list": a
query computes its terms' prefixes and Catalyst prunes every other directory
at scan planning time. NB=64 keeps directory count flat no matter how large
the vocabulary grows (partitioning by raw term would explode at real-corpus
vocab sizes).

Checkpoint/resume: the segment stage is the expensive pass over the raw
corpus, so it is the resume unit. Segments are written partitioned by
logical partition_id; manifest.json records per-pid status + rowcounts + a
commutative xxhash64 checksum. A resumed build anti-joins the corpus's pids
against COMMITTED manifest rows, builds only the missing ones, appends, and
re-merges. The manifest is written via tmp-file + atomic rename.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.functions.codecs import CODEC_VARINT
from miru_spark.operators.docmap import docmap_direct
from miru_spark.operators.merge import DEFAULT_TARGET_CHUNK, merge_segments
from miru_spark.operators.segments import build_segments

N_TERM_PREFIX_BUCKETS = 64


def term_pref_col(term):
    """crc32(term) % NB — chosen because zlib.crc32 computes the identical
    value driver-side, letting the query path prune partitions without
    launching a Spark job."""
    return F.pmod(F.crc32(term.cast("binary")), F.lit(N_TERM_PREFIX_BUCKETS)).cast(
        "int"
    )


def term_pref_py(term: str) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % N_TERM_PREFIX_BUCKETS


def _write_manifest(path: str, manifest: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, f"{path}")


def read_manifest(index_path: str) -> dict | None:
    p = f"{index_path}/manifest.json"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def compaction_files_per_dir(
    n_tokens: int, target_file_bytes: int = 512 << 20
) -> int:
    """Postings files per term_pref dir: sized so each file is ~512 MB
    (posting bytes ~ 1.5 B/token post-compression), min 1. Bounds both the
    per-dir file count (query fetch = file opens) and the per-task write."""
    est_bytes = int(n_tokens * 1.5)
    return max(1, est_bytes // (N_TERM_PREFIX_BUCKETS * target_file_bytes) + 1)


def delete_docs(index_path: str, doc_ids) -> int:
    """Tombstone-delete documents (Lucene live-docs style): appends the ids
    to ``index_path/tombstones/`` (one parquet file per call, driver-side,
    no Spark job). Readers filter tombstoned docs out of every serving path
    immediately; postings/docmap/stats stay untouched until
    :func:`purge_deleted` physically rewrites them (standard semantics —
    scores drift slightly until purge because df/avgdl still count deleted
    docs, exactly as in Lucene before a merge).

    Returns the total tombstone count after the append.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = sorted({int(i) for i in doc_ids})
    if not ids:
        raise ValueError("no doc_ids to delete")
    d = f"{index_path}/tombstones"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())}),
        f"{d}/delete-{int(time.time() * 1e6)}-{os.getpid()}.parquet",
    )
    import pyarrow.dataset as pads

    return pads.dataset(d, format="parquet").count_rows()


_PURGE_SENTINEL = "_purge_swap.json"


def complete_purge_swap(index_path: str) -> bool:
    """Crash-safe directory swap for the purge rewrite, as a ROLL-FORWARD
    routine: the purge writes ``<dir>_purged`` completely, drops a sentinel
    listing the dirs, then calls this to swap. A crash anywhere mid-swap
    leaves the sentinel behind, and the next reader/purge call re-enters
    here and finishes the same sequence (every state is distinguishable
    from the dirs present). Round 2 did ``rmtree + rename`` — a crash
    between the two lost the postings directory outright.

    Returns True when a sentinel was found (swap performed/completed).
    """
    import shutil

    p = os.path.join(index_path, _PURGE_SENTINEL)
    if not os.path.exists(p):
        return False
    with open(p) as f:
        dirs = json.load(f)["dirs"]
    for d in dirs:
        cur = os.path.join(index_path, d)
        old = os.path.join(index_path, f"{d}_old")
        new = os.path.join(index_path, f"{d}_purged")
        if os.path.isdir(new):
            if os.path.isdir(cur):
                os.rename(cur, old)  # retire the pre-purge dir
            os.rename(new, cur)  # atomic: readers flip to the purged dir
        # else: rename already happened before the crash
        if os.path.isdir(old):
            shutil.rmtree(old)
    os.unlink(p)
    return True


def purge_deleted(spark: SparkSession, index_path: str) -> dict:
    """Physically remove tombstoned documents: one mapInArrow pass decodes
    every chunk, drops dead postings, and re-encodes (block metadata and
    impact frontiers rebuilt); docmap/df/stats are recomputed and the
    tombstone directory cleared. O(index), run it like a Lucene merge —
    when the deleted fraction justifies the rewrite.

    Directory-layout indexes swap ``postings``/``docmap`` via the
    crash-safe roll-forward protocol (:func:`complete_purge_swap`).
    Snapshot-protocol indexes never rewrite committed files: the rewritten
    chunks land as NEW data files and a new snapshot (operation='purge')
    is committed with recomputed stats and its own docmap version, so
    time travel to any pre-purge snapshot still works (and, since pinned
    readers ignore tombstones, shows the pre-DELETE document set with that
    version's scores). Limitation: the term dictionary (df/dictionary
    dirs) always reflects the CURRENT state — a time-traveled prefix/fuzzy
    expansion may miss terms whose last posting was purged.
    """
    import shutil

    import pyarrow as pa

    from miru_spark.index import snapshots as snapmod
    from miru_spark.index.format import pack_chunk, unpack_chunk
    from miru_spark.index.reader import IndexReader

    complete_purge_swap(index_path)  # finish any crashed prior purge first
    # incrementally-finalized indexes (streaming finalize) delta-merge from
    # the segments/batch=N checkpoint on the NEXT finalize — purging only
    # the chunk rows would let that re-merge resurrect dead postings. The
    # segment rows get the same decode-filter-reencode pass (below) through
    # the same crash-safe sentinel swap.
    incremental = os.path.exists(f"{index_path}/_merged.json") and os.path.isdir(
        f"{index_path}/segments"
    )
    reader = IndexReader(spark, index_path)
    dead = reader.tombstones
    if dead is None or dead.size == 0:
        return dict(reader.stats)
    if dead.size >= reader.n_docs:
        raise ValueError(
            "purge would delete every remaining document; drop the index "
            "instead of purging it"
        )
    dead_list = [int(i) for i in dead]
    positions = bool(reader.stats.get("positions", False))

    snap = reader.snapshot
    if snap is not None:
        # read exactly the current snapshot's files (the postings dir may
        # hold files of other snapshots — append-only protocol)
        post = spark.read.option("basePath", f"{index_path}/postings").parquet(
            *snapmod.snapshot_files(index_path)
        )
    else:
        post = spark.read.parquet(f"{index_path}/postings")
    out_schema = post.schema

    def rewrite(batches):
        import numpy as np

        from miru_spark.index.format import unpack_positions

        dead_np = np.array(dead_list, dtype=np.uint64)
        for batch in batches:
            rows = batch.to_pylist()
            out = []
            for row in rows:
                ids, tfs, dls = unpack_chunk(
                    row["blob"], row["blocks"], int(row["codec"])
                )
                keep = ~np.isin(ids, dead_np, assume_unique=True)
                if keep.all():
                    out.append(row)
                    continue
                if not keep.any():
                    continue  # chunk entirely deleted
                pos = None
                if positions and row.get("pos_blob") is not None:
                    flat = unpack_positions(row["pos_blob"], tfs)
                    pos = flat[np.repeat(keep, tfs.astype(np.int64))]
                blob, metas, (ci_tf, ci_dl), pos_blob = pack_chunk(
                    ids[keep], tfs[keep], dls[keep],
                    codec=int(row["codec"]),
                    positions=pos,
                )
                row = dict(
                    row,
                    df_chunk=int(keep.sum()),
                    first_docid=int(ids[keep][0]),
                    last_docid=int(ids[keep][-1]),
                    blob=blob,
                    blob_bytes=len(blob),  # dropped if schema predates it
                    pos_blob=pos_blob,
                    i_tf=ci_tf,
                    i_dl=ci_dl,
                    blocks=metas,
                )
                out.append(row)
            if out:
                yield pa.RecordBatch.from_pylist(out, schema=batch.schema)

    if incremental:
        # rewrite the segment checkpoint: same filter, segment row form
        # (seg_pack varint triple + optional position stream). Idempotent —
        # re-running on already-purged segments is a pass-through.
        seg_df = spark.read.parquet(f"{index_path}/segments")
        seg_schema = seg_df.schema

        def rewrite_segments(batches):
            import numpy as np

            from miru_spark.functions.codecs import varint_encode
            from miru_spark.index.format import (
                pos_gaps_encode,
                seg_pack,
                seg_unpack,
                unpack_positions,
            )

            dead_np = np.array(dead_list, dtype=np.uint64)
            for batch in batches:
                out = []
                for row in batch.to_pylist():
                    n = int(row["df_local"])
                    ids, tfs, dls = seg_unpack(row["blob"], n)
                    keep = ~np.isin(ids, dead_np, assume_unique=True)
                    if keep.all():
                        out.append(row)
                        continue
                    if not keep.any():
                        continue
                    new_pos = row.get("pos")
                    if new_pos is not None:
                        flat = unpack_positions(new_pos, tfs)
                        kept_flat = flat[np.repeat(keep, tfs.astype(np.int64))]
                        new_pos = bytes(
                            varint_encode(
                                pos_gaps_encode(
                                    kept_flat.astype(np.uint64),
                                    tfs[keep].astype(np.int64),
                                )
                            )
                        )
                    out.append(
                        dict(
                            row,
                            df_local=int(keep.sum()),
                            n_tokens=int(tfs[keep].sum()),
                            blob=seg_pack(ids[keep], tfs[keep], dls[keep]),
                            pos=new_pos,
                        )
                    )
                if out:
                    yield pa.RecordBatch.from_pylist(out, schema=batch.schema)

        # preserve the stream writer's segments/batch=N/partition_id=M
        # directory layout exactly — a later micro-batch appends new
        # batch=M dirs next to these, and mixed layouts break the read
        part_cols = [c for c in ("batch", "partition_id") if c in seg_df.columns]
        seg_out = seg_df.mapInArrow(rewrite_segments, seg_schema)
        # refresh the lineage columns the stream writer computed at append
        # time — the rewrite changed blob/df_local, so carrying the old
        # values would leave stale checksums/byte counts on purged rows
        if "row_xxh" in seg_df.columns:
            seg_out = seg_out.withColumn(
                "row_xxh", F.xxhash64("term", "df_local", "blob")
            )
        if "blob_bytes" in seg_df.columns:
            seg_out = seg_out.withColumn(
                "blob_bytes", F.length("blob").cast("long")
            )
        w = seg_out.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(f"{index_path}/segments_purged")

    if snap is not None:
        # ---- snapshot protocol: never rewrite committed files ----
        if incremental:
            # segments swap via its own sentinel (postings/docmap go
            # through the snapshot commit, not the swap protocol). A crash
            # between this swap and the snapshot commit is safe: the
            # tombstones are only cleared at the very end, so a re-run
            # re-filters (a no-op on already-purged rows) and completes.
            with open(f"{index_path}/{_PURGE_SENTINEL}", "w") as f:
                json.dump({"dirs": ["segments"]}, f)
            complete_purge_swap(index_path)
        before = snapmod._walk_postings(index_path)
        post.mapInArrow(rewrite, out_schema).write.mode("append").partitionBy(
            "term_pref"
        ).parquet(f"{index_path}/postings")
        new_files = snapmod._walk_postings(index_path) - before
        next_sid = (snapmod.current_snapshot_id(index_path) or 0) + 1
        docmap_dir = f"docmap-v{next_sid}"
        docmap = spark.read.parquet(
            f"{index_path}/{snap.get('docmap', 'docmap')}"
        ).filter(~F.col("doc_id").isin(dead_list))
        # overwrite: a purge that crashed after this write but before its
        # snapshot commit left an orphan docmap version; retrying reuses it
        docmap.write.mode("overwrite").parquet(f"{index_path}/{docmap_dir}")
        docmap = spark.read.parquet(f"{index_path}/{docmap_dir}")
    else:
        # ---- directory layout: crash-safe roll-forward swap ----
        post.mapInArrow(rewrite, out_schema).write.mode("overwrite").partitionBy(
            "term_pref"
        ).parquet(f"{index_path}/postings_purged")
        dm = spark.read.parquet(f"{index_path}/docmap").filter(
            ~F.col("doc_id").isin(dead_list)
        )
        dmw = dm.write.mode("overwrite")
        if "batch" in dm.columns:
            # incremental docmaps live in docmap/batch=N dirs; the stream
            # appends new batch dirs after purge, so the layout must survive
            dmw = dmw.partitionBy("batch")
        dmw.parquet(f"{index_path}/docmap_purged")
        # all _purged dirs are durable -> sentinel -> swap (re-entrant on
        # crash: the next reader/purge rolls the same sequence forward)
        swap_dirs = ["postings", "docmap"] + (["segments"] if incremental else [])
        with open(f"{index_path}/{_PURGE_SENTINEL}", "w") as f:
            json.dump({"dirs": swap_dirs}, f)
        complete_purge_swap(index_path)
        docmap = spark.read.parquet(f"{index_path}/docmap")

    stats_row = docmap.agg(
        F.count("*").alias("n"), F.sum("doc_len").alias("tok")
    ).collect()[0]
    n_docs, n_tokens = int(stats_row["n"]), int(stats_row["tok"] or 0)
    stats = dict(
        reader.stats,
        n_docs=n_docs,
        n_tokens=n_tokens,
        avgdl=n_tokens / max(n_docs, 1),
    )
    if snap is not None:
        snapmod.commit_snapshot(
            index_path, new_files, stats, operation="purge",
            extra={"docmap": docmap_dir, "purged_doc_ids": sorted(dead_list)},
        )
        segs = spark.read.option("basePath", f"{index_path}/postings").parquet(
            *snapmod.snapshot_files(index_path)
        )
    else:
        segs = spark.read.parquet(f"{index_path}/postings")
    write_term_dictionary(
        segs.withColumnRenamed("df_chunk", "df_local"), index_path, n_tokens
    )
    with open(f"{index_path}/stats.json", "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)
    shutil.rmtree(f"{index_path}/tombstones", ignore_errors=True)
    if not incremental:
        # a BATCH build's segment checkpoint still contains the dead
        # postings: any later resume from it would RESURRECT them.
        # Invalidate it — a resumed build regenerates segments from the
        # (corrected) corpus. Incremental indexes instead had their
        # segments rewritten above (the delta-merge needs them).
        shutil.rmtree(f"{index_path}/segments", ignore_errors=True)
    man = read_manifest(index_path)
    if man is not None:
        man["partitions"] = {}
        man["purged"] = sorted(dead_list)
        _write_manifest(f"{index_path}/manifest.json", man)
    return stats


def write_term_dictionary(
    segments: DataFrame, index_path: str, n_tokens: int
) -> None:
    """Global df doubles as the TERM DICTIONARY: range-partitioned and
    sorted by term, so a prefix/range lookup opens only the files and
    row-groups whose term [min,max] statistics overlap (the Spark-native
    stand-in for a Lucene FST seek). File count scales with vocabulary size
    (~4M terms per file via the token-count proxy), never a fixed constant.
    Shared by the batch build and the streaming finalize so prefix/suggest/
    fuzzy serve identically from either."""
    df_parts = max(1, min(200, int(n_tokens // 50_000_000) + 1))
    (
        segments.groupBy("term")
        .agg(F.sum("df_local").alias("df"))
        .repartitionByRange(df_parts, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{index_path}/df")
    )


def build_fuzzy_dictionary(spark: SparkSession, index_path: str) -> int:
    """SymSpell/FastSS-style deletion-neighborhood dictionary (Bocek et al.
    2007, "Fast Similarity Search in Large Dictionaries"): for every
    vocabulary term, emit the term itself plus every single-character
    deletion, as (variant, term) rows range-partitioned and sorted by
    variant. dist(q, t) <= 1 iff the two deletion neighborhoods intersect,
    so a fuzzy query becomes |q|+1 statistics-pruned variant seeks instead
    of a full-dictionary scan — the FST-free scale path for 1e9-term
    vocabularies (~(1+avg_len) rows per term, linear in the dictionary).

    Derived purely from the committed index/df table, so it can be added to
    an existing index; returns the variant rowcount.
    """
    terms = spark.read.parquet(f"{index_path}/df").select("term")
    variants = terms.select(
        F.explode(
            F.array_union(
                F.array(F.col("term")),
                F.expr(
                    "transform(sequence(1, length(term)), "
                    "i -> concat(substring(term, 1, i-1), substring(term, i+1, length(term))))"
                ),
            )
        ).alias("variant"),
        "term",
    )
    n_terms = terms.count()
    parts = max(1, min(200, n_terms // 4_000_000 + 1))
    (
        variants.repartitionByRange(parts, "variant")
        .sortWithinPartitions("variant", "term")
        .write.mode("overwrite")
        .parquet(f"{index_path}/fuzzy")
    )
    # rowcount from parquet FOOTERS only (no data re-scan of an artifact
    # that is ~(1+avg_len) rows per vocabulary term)
    import pyarrow.dataset as pads

    return sum(
        frag.metadata.num_rows
        for frag in pads.dataset(
            f"{index_path}/fuzzy", format="parquet"
        ).get_fragments()
    )


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_path: str,
    num_partitions: int = 16,
    tokenizer: str = "whitespace",
    codec: int = CODEC_VARINT,
    target_chunk: int = DEFAULT_TARGET_CHUNK,
    resume: bool = False,
    positions: bool = False,
    snapshots: bool = False,
) -> dict:
    """Full build pipeline (SURVEY.md section 3.1). Returns the manifest.

    ``positions=True`` adds Lucene-style positional postings (a separate
    varint stream per chunk row, column-pruned away by every non-phrase
    query) enabling exact phrase search straight from the index.

    ``snapshots=True`` commits the postings through the Iceberg-style
    snapshot protocol (index/snapshots.py): append-only data files + an
    atomically-flipped current-snapshot pointer, giving atomic commits,
    time travel, and manifest-driven pruning."""
    t0 = time.time()
    timings: dict[str, float] = {}

    def mark(name: str, since: list[float]) -> None:
        now = time.time()
        timings[name] = round(now - since[0], 3)
        since[0] = now

    tick = [t0]
    # No persist of a normalized corpus: this pipeline is memory-bandwidth-
    # bound, and materializing a tokens+sha cache costs more traffic than the
    # two cheap passes it would save. Pass 1 (segments) shuffles raw content
    # by logical partition and tokenizes post-shuffle; pass 2 (docmap) is a
    # shuffle-free projection. Corpus stats derive from segment aggregates.
    from miru_spark.schema import assign_doc_ids

    corpus = assign_doc_ids(corpus)
    n_docs = corpus.count()  # parquet rowcount pushdown: metadata-only
    mark("normalize_stats", tick)

    docs_per_part = max(1, -(-n_docs // num_partitions))
    committed: set[int] = set()
    manifest = read_manifest(index_path) if resume else None
    if (
        manifest
        and manifest.get("docs_per_part") == docs_per_part
        and manifest.get("tokenizer") == tokenizer
        and bool(manifest.get("positions", False)) == positions
    ):
        committed = {
            int(pid)
            for pid, seg in manifest.get("partitions", {}).items()
            if seg.get("status") == "COMMITTED"
        }

    to_build = corpus
    if committed:
        to_build = corpus.filter(
            ~((F.col("doc_id") / F.lit(docs_per_part)).cast("long")).isin(
                [int(p) for p in committed]
            )
        )

    seg_path = f"{index_path}/segments"
    if committed and os.path.isdir(seg_path):
        # drop partially-written (uncommitted) partition dirs before appending
        import shutil

        for d in os.listdir(seg_path):
            if d.startswith("partition_id="):
                pid = int(d.split("=", 1)[1])
                if pid not in committed:
                    shutil.rmtree(f"{seg_path}/{d}", ignore_errors=True)
    n_new = to_build.count() if committed else n_docs
    mark("resume_filter_count", tick)
    if n_new > 0:
        segments_new = build_segments(
            to_build, num_partitions, n_docs=n_docs, tokenizer=tokenizer,
            positions=positions,
        )
        (
            segments_new.write.mode("append" if committed else "overwrite")
            .partitionBy("partition_id")
            .parquet(seg_path)
        )
    mark("segments_write", tick)
    build_secs = time.time() - t0

    # lineage + metrics per logical partition, from the durable segment files
    segments = spark.read.parquet(seg_path)
    part_stats = {
        str(r["partition_id"]): {
            "status": "COMMITTED",
            "n_terms": int(r["n_terms"]),
            "n_postings": int(r["n_postings"]),
            "n_tokens": int(r["n_tokens"]),
            "bytes": int(r["bytes"]),
            "checksum_xxh64_xor": str(r["checksum"]),
        }
        for r in segments.groupBy("partition_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("df_local").alias("n_postings"),
            F.sum("n_tokens").alias("n_tokens"),
            # scalar lineage columns written by build_segments: the agg scan
            # prunes to ints and never touches the blob pages (pre-columns
            # indexes fall back to the read-back expressions)
            (
                F.sum("blob_bytes")
                if "blob_bytes" in segments.columns
                else F.sum(F.length("blob"))
            ).alias("bytes"),
            (
                F.expr("bit_xor(row_xxh)")
                if "row_xxh" in segments.columns
                else F.expr("bit_xor(xxhash64(term, df_local, blob))")
            ).alias("checksum"),
        )
        .collect()
    }
    n_tokens = sum(p["n_tokens"] for p in part_stats.values())
    avgdl = n_tokens / max(n_docs, 1)
    stats = {"n_docs": n_docs, "avgdl": avgdl, "n_tokens": n_tokens}
    mark("manifest_agg", tick)

    # merge -> final postings, directory-partitioned by term prefix.
    # COMPACTION: without it, every merge reducer writes its own file into
    # every term_pref dir it touches (shuffle_partitions files per dir), and
    # query-time fetch cost becomes file-OPEN bound — measured 770 ms/query
    # at 500k docs with 64 files/dir vs ~15 ms compacted. Repartitioning on
    # (term_pref, term-hash % files_per_dir) gives exactly files_per_dir
    # files per dir; files_per_dir scales with corpus bytes (~512 MB
    # target files) so tasks stay bounded at any index size.
    merged = merge_segments(
        segments, codec=codec, target_chunk=target_chunk
    ).withColumn("term_pref", term_pref_col(F.col("term")))
    files_per_dir = compaction_files_per_dir(n_tokens)
    merged = merged.repartition(
        N_TERM_PREFIX_BUCKETS * files_per_dir,
        "term_pref",
        F.pmod(F.xxhash64("term"), F.lit(files_per_dir)),
    )
    if snapshots:
        from miru_spark.index import snapshots as snapmod

        before = snapmod._walk_postings(index_path)
        merged.write.mode("append").partitionBy("term_pref").parquet(
            f"{index_path}/postings"
        )
        new_files = snapmod._walk_postings(index_path) - before
    else:
        merged.write.mode("overwrite").partitionBy("term_pref").parquet(
            f"{index_path}/postings"
        )
    # compression metrics from scalar columns only: count(*) is a parquet
    # rowcount pushdown and df_chunk/blob_bytes are tiny int pages — the
    # blob pages themselves are never re-read (this agg used to read the
    # whole index back and serialized the tail of every build)
    post_df = spark.read.parquet(f"{index_path}/postings")
    # pre-columns generations (snapshot appends / carried delta rows from an
    # index built before the lineage columns existed) may lack blob_bytes
    # entirely, or read it as null from old files — fall back to the blob
    # length for exactly those rows
    bytes_expr = (
        F.sum(F.coalesce(F.col("blob_bytes"), F.length("blob").cast("long")))
        if "blob_bytes" in post_df.columns
        else F.sum(F.length("blob"))
    )
    post = post_df.agg(
        F.count("*").alias("chunks"),
        F.sum("df_chunk").alias("postings"),
        bytes_expr.alias("bytes"),
    ).collect()[0]
    compression = {
        "n_chunks": int(post["chunks"]),
        "n_postings": int(post["postings"]),
        "postings_bytes": int(post["bytes"]),
        "bytes_per_posting": round(post["bytes"] / max(post["postings"], 1), 3),
    }
    mark("merge_write", tick)

    write_term_dictionary(segments, index_path, n_tokens)
    # pass 2: docmap — shuffle-free projection (sha256 in Arrow workers,
    # doc_len via one regexp_count), written as scanned
    docmap_direct(corpus, tokenizer).write.mode("overwrite").parquet(
        f"{index_path}/docmap"
    )
    mark("df_docmap_write", tick)

    total_secs = time.time() - t0
    stats_out = dict(
        stats,
        codec=int(codec),
        tokenizer=tokenizer,
        num_partitions=num_partitions,
        docs_per_part=docs_per_part,
        target_chunk=int(target_chunk),
        positions=positions,
        k1=1.2,
        b=0.75,
    )
    with open(f"{index_path}/stats.json", "w") as f:
        json.dump(stats_out, f, indent=1, sort_keys=True)
    if snapshots:
        from miru_spark.index import snapshots as snapmod

        snapmod.commit_snapshot(
            index_path, new_files, stats_out, operation="build"
        )

    full_manifest = {
        "version": 1,
        "docs_per_part": docs_per_part,
        "tokenizer": tokenizer,
        "codec": int(codec),
        "positions": positions,
        "n_docs": n_docs,
        "partitions": part_stats,
        "metrics": {
            "build_secs": round(total_secs, 3),
            "segment_secs": round(build_secs, 3),
            "docs_per_sec": round(n_docs / total_secs, 2) if total_secs else None,
            "stage_secs": timings,
            "compression": compression,
            "resumed_partitions": sorted(committed),
            "built_docs": int(n_new),
        },
    }
    _write_manifest(f"{index_path}/manifest.json", full_manifest)
    return full_manifest
