"""Tier-C — incremental indexing + streaming analytics (Structured Streaming).

The batch build (SURVEY.md A1-A13) is resumable but offline; this module adds
the streaming surfaces:

* ``incremental_index_stream`` — ``readStream`` over a corpus directory;
  every micro-batch runs the SAME segment builder (A4) via ``foreachBatch``
  and appends durable segment + docmap rows keyed by logical partition.
  ``finalize_streamed_index`` then runs the identical salted merge + sink, so
  a streamed index is bit-compatible with a batch build of the same corpus
  (asserted in tests). Micro-batches never rewrite committed segments —
  the manifest/lineage story is the same as batch resume.
* ``windowed_event_counts`` — tumbling-window aggregation with a watermark
  over the ``events`` shape (late data handled by Spark state eviction).
* ``running_source_stats`` — ``applyInPandasWithState`` custom stateful
  operator: per-source running document/char counters that survive across
  micro-batches (the custom-stateful-operator surface).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from miru_spark.operators.docmap import docmap_direct
from miru_spark.operators.segments import build_segments
from miru_spark.schema import CORPUS_SCHEMA


def stream_corpus(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of corpus parquet drops (one file per drop)."""
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), *CORPUS_SCHEMA.fields]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def incremental_index_stream(
    stream: DataFrame,
    index_path: str,
    docs_per_part: int,
    num_partitions: int = 8,
    tokenizer: str = "whitespace",
    checkpoint_dir: str | None = None,
    positions: bool = False,
):
    """writeStream.foreachBatch: segment-build + docmap-append each batch.

    ``docs_per_part`` is FIXED config here (not derived from a global count,
    which a stream doesn't have): pid = doc_id // docs_per_part stays
    deterministic however the stream is chunked.
    """
    import json

    # persist the stream's analyzer/partitioning config next to the index:
    # later update_documents/finalize calls must reproduce it exactly (a
    # different docs_per_part would break the "pid ranges ordered by docID"
    # merge invariant; a different tokenizer would silently mix analyzers)
    meta_path = f"{index_path}/_stream_meta.json"
    meta = {
        "docs_per_part": int(docs_per_part),
        "num_partitions": int(num_partitions),
        "tokenizer": tokenizer,
        "positions": bool(positions),
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        frozen = {k: prev.get(k) for k in ("docs_per_part", "tokenizer", "positions")}
        want = {k: meta[k] for k in frozen}
        if frozen != want:
            raise ValueError(
                f"stream config {want} conflicts with the index's recorded "
                f"config {frozen}; restart with the original settings or "
                "rebuild"
            )
    else:
        os.makedirs(index_path, exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump(meta, f)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a micro-batch can re-run after a
        # failure/restart with the SAME batch_id and (file source +
        # checkpointed offsets) the same rows. Writes are therefore keyed by
        # batch_id and overwrite their own directory — a retry replaces its
        # previous partial/duplicate output instead of appending doubled
        # postings/docmap rows (which would silently inflate df and n_docs).
        if batch_df.isEmpty():
            return
        n_hint = docs_per_part * num_partitions
        segs = build_segments(
            batch_df, num_partitions, n_docs=n_hint, tokenizer=tokenizer,
            positions=positions,
        )
        # build_segments derives dpp = ceil(n_docs/num_partitions); feeding
        # the hint keeps dpp == docs_per_part exactly
        segs.write.mode("overwrite").partitionBy("partition_id").parquet(
            f"{index_path}/segments/batch={batch_id}"
        )
        docmap_direct(batch_df, tokenizer).write.mode("overwrite").parquet(
            f"{index_path}/docmap/batch={batch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{index_path}/_stream_checkpoint",
        )
        .trigger(availableNow=True)
    )
    return writer.start()


def _align_chunk_columns(carried: DataFrame, target_cols: list[str]) -> DataFrame:
    """Align carried chunk rows to the current merge output schema.

    Postings written before the lineage columns existed lack ``blob_bytes``
    (and a mixed-generation read can surface it as null) — synthesize it
    from the blob length for exactly those rows instead of failing the
    select with an unresolved column."""
    if "blob_bytes" in target_cols:
        filled = (
            F.coalesce(F.col("blob_bytes"), F.length("blob").cast("long"))
            if "blob_bytes" in carried.columns
            else F.length("blob").cast("long")
        )
        carried = carried.withColumn("blob_bytes", filled)
    missing = [c for c in target_cols if c not in carried.columns]
    if missing:
        raise ValueError(
            f"carried postings lack columns {missing}; the on-disk index "
            "predates the current chunk schema — rebuild or full re-finalize"
        )
    return carried.select(*target_cols)


def finalize_streamed_index(
    spark: SparkSession,
    index_path: str,
    num_partitions: int = 8,
    codec: int | None = None,
    target_chunk: int | None = None,
    snapshots: bool = False,
) -> dict:
    """Merge streamed segments into the final queryable index — the same
    salted merge + term_pref sink as the batch path.

    DELTA-MERGE: chunk rows are stats-free (impact frontiers, index/format.py),
    so a chunk stays valid as n_docs/avgdl/df grow. A re-finalize after new
    micro-batches therefore re-merges ONLY the terms those batches touched:
    term_pref directories containing no touched term are left untouched on
    disk (byte-identical), and within touched directories the untouched
    terms' existing chunk rows are carried over unchanged. Cost is
    O(postings of touched terms) + O(touched directories), not O(index).
    Corpus stats are recomputed from the docmap (cheap aggregates) and live
    only in stats.json. Merged batch ids are recorded in _merged.json so a
    crashed finalize re-runs its delta idempotently.

    ``snapshots=True`` routes the sink through the Iceberg-style snapshot
    protocol (index/snapshots.py): data files are append-only, each
    finalize commits a new snapshot atomically, untouched files are SHARED
    between snapshots verbatim, and readers can time-travel to any
    retained version (scoring with that version's stats).
    """
    import json

    from miru_spark.functions.codecs import CODEC_VARINT
    from miru_spark.index.writer import term_pref_col
    from miru_spark.operators.merge import DEFAULT_TARGET_CHUNK, merge_segments

    codec = codec or CODEC_VARINT
    target_chunk = target_chunk or DEFAULT_TARGET_CHUNK
    segments = spark.read.parquet(f"{index_path}/segments")
    docmap = spark.read.parquet(f"{index_path}/docmap")
    post_path = f"{index_path}/postings"
    merged_meta = f"{index_path}/_merged.json"

    batches = sorted(r[0] for r in segments.select("batch").distinct().collect())
    prev_batches: list = []
    if os.path.exists(merged_meta):
        with open(merged_meta) as f:
            prev_batches = json.load(f).get("merged_batches", [])
    new_batches = [b for b in batches if b not in prev_batches]

    from miru_spark.index import snapshots as snapmod

    n_docs = docmap.count()
    n_tokens = docmap.agg(F.sum("doc_len")).collect()[0][0]
    avgdl = n_tokens / max(n_docs, 1)
    has_pos = (
        "pos" in segments.columns
        and segments.filter(F.col("pos").isNotNull()).limit(1).count() > 0
    )
    if has_pos and segments.filter(F.col("pos").isNull()).limit(1).count() > 0:
        # Positions were enabled mid-stream: the merge would silently drop
        # the position stream for terms whose (term,bucket) groups mix null
        # and non-null pos rows while stats still said positions=true, and
        # phrase/near queries would then crash or miss matches. Fail fast —
        # mirrors the batch resume guard on manifest['positions'].
        raise ValueError(
            "segments mix positional and non-positional micro-batches "
            "(positions toggled mid-stream); rebuild the index with a "
            "consistent positions= setting"
        )
    stream_meta: dict = {}
    meta_path = f"{index_path}/_stream_meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stream_meta = json.load(f)
    stats = {
        "n_docs": int(n_docs),
        "avgdl": float(avgdl),
        "n_tokens": int(n_tokens),
        "codec": int(codec),
        "positions": has_pos,
        "tokenizer": stream_meta.get("tokenizer", "whitespace"),
        "k1": 1.2,
        "b": 0.75,
        "incremental": True,
    }

    from miru_spark.index.writer import N_TERM_PREFIX_BUCKETS, compaction_files_per_dir

    fpd = compaction_files_per_dir(int(stats.get("n_tokens", 0)))

    def compact(df):
        # dir-aligned compaction: same rationale as the batch writer (file
        # opens dominate query fetch when every reducer writes every dir)
        return df.repartition(
            N_TERM_PREFIX_BUCKETS * fpd, "term_pref",
            F.pmod(F.xxhash64("term"), F.lit(fpd)),
        )

    prev_snap = snapmod.read_snapshot(index_path) if snapshots else None
    have_prior = prev_snap is not None if snapshots else os.path.isdir(post_path)
    if prev_batches and new_batches and have_prior:
        # ---- delta path: re-merge only terms the new batches touched ----
        touched_terms = (
            segments.filter(F.col("batch").isin(new_batches))
            .select("term")
            .distinct()
        )
        touched_seg = segments.join(touched_terms, "term", "left_semi")
        merged_new = merge_segments(
            touched_seg, codec=codec, target_chunk=target_chunk
        ).withColumn("term_pref", term_pref_col(F.col("term")))
        prefs = sorted(
            r[0]
            for r in touched_terms.select(
                term_pref_col(F.col("term")).alias("p")
            )
            .distinct()
            .collect()
        )
        if snapshots:
            # carried rows come from the CURRENT SNAPSHOT's files (never the
            # raw directory, which may hold superseded/uncommitted files);
            # append-only writes make reading-while-writing safe
            src = snapmod.snapshot_files(index_path, prefs=prefs)
            carried = (
                spark.read.option("basePath", post_path).parquet(*src)
                .join(touched_terms, "term", "left_anti")
                if src
                else None
            )
            out = merged_new
            if carried is not None:
                out = out.unionByName(
                    _align_chunk_columns(carried, merged_new.columns)
                )
            before = snapmod._walk_postings(index_path)
            compact(out).write.mode("append").partitionBy("term_pref").parquet(post_path)
            new_files = snapmod._walk_postings(index_path) - before
            kept = {
                p
                for p, pref in prev_snap["files"].items()
                if pref not in set(prefs)
            }
            snapmod.commit_snapshot(
                index_path, kept | new_files, stats, operation="delta-merge"
            )
        else:
            carried = (
                spark.read.parquet(post_path)
                .filter(F.col("term_pref").isin(prefs))
                .join(touched_terms, "term", "left_anti")
            )
            out = merged_new.unionByName(
                _align_chunk_columns(carried, merged_new.columns)
            )
            # materialize BEFORE overwriting the directory we just read from
            out = out.localCheckpoint(eager=True)
            # per-writer option, NOT spark.conf.set: a session-level
            # partitionOverwriteMode=dynamic would silently turn every later
            # mode('overwrite').partitionBy(...) write in this session into a
            # partition-level overwrite that keeps stale files
            compact(out).write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("term_pref").parquet(post_path)
    elif new_batches or not have_prior:
        merged = compact(
            merge_segments(
                segments, codec=codec, target_chunk=target_chunk
            ).withColumn("term_pref", term_pref_col(F.col("term")))
        )
        if snapshots:
            before = snapmod._walk_postings(index_path)
            merged.write.mode("append").partitionBy("term_pref").parquet(post_path)
            new_files = snapmod._walk_postings(index_path) - before
            snapmod.commit_snapshot(index_path, new_files, stats, operation="build")
        else:
            merged.write.mode("overwrite").partitionBy("term_pref").parquet(
                post_path
            )

    from miru_spark.index.writer import write_term_dictionary

    write_term_dictionary(segments, index_path, int(stats.get("n_tokens", 0)))
    with open(f"{index_path}/stats.json", "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)
    with open(merged_meta, "w") as f:
        json.dump({"merged_batches": batches}, f)
    return stats


def update_documents(
    spark: SparkSession,
    index_path: str,
    updates: DataFrame,
    num_partitions: int = 8,
    tokenizer: str | None = None,
    snapshots: bool = False,
) -> dict:
    """Upsert documents into an incremental-layout index — Lucene
    ``IndexWriter.updateDocument`` semantics: atomically (a) tombstone the
    replaced doc_ids and (b) index the new versions as a fresh delta batch,
    then delta-merge so only the terms the updated docs touch are
    re-merged (O(delta), not O(index)).

    ``updates`` carries the corpus columns (repo, path, commit, lang,
    content) plus an optional ``doc_id`` = the CURRENT id of the doc each
    row replaces; rows with a null ``doc_id`` (or no column) are pure
    inserts. New versions always get FRESH doc_ids above the current max
    (doc_id space is append-only — ids are never reused, so pre-update
    readers and time-traveled snapshots stay consistent).

    Standard pre-merge drift applies: until a purge/rebuild, corpus stats
    (n_docs/avgdl/df) still count the superseded versions, exactly as
    Lucene scores drift between updateDocument and the next segment merge.
    Tombstoned versions are filtered from every serving path immediately.

    Scale shape: the delta batch is built/merged distributed; only the
    replaced-id list passes through the driver (one column of the update
    batch — for bulk reindexing beyond driver memory, shard into multiple
    calls or rebuild). Returns {n_updated, n_inserted, batch, stats} plus
    an ``id_map`` list of (old_doc_id, new_doc_id) pairs.
    """
    import json

    from miru_spark.index.writer import delete_docs

    seg_root = f"{index_path}/segments"
    # the batch builder also keeps a segments/ dir (resume unit) — the
    # incremental layout is distinguished by its batch= partitioning
    if not (
        os.path.isdir(seg_root)
        and any(e.startswith("batch=") for e in os.listdir(seg_root))
    ):
        raise ValueError(
            "update_documents needs the incremental layout (segments/batch=N "
            "+ docmap batches); for a batch-built index, rebuild or use "
            "delete_docs + a new build"
        )
    with open(f"{index_path}/stats.json") as f:
        stats0 = json.load(f)
    stream_meta: dict = {}
    if os.path.exists(f"{index_path}/_stream_meta.json"):
        with open(f"{index_path}/_stream_meta.json") as f:
            stream_meta = json.load(f)

    # the analyzer is index state, not call-site choice: default to the
    # recorded one; an explicit conflicting override would silently mix
    # analyzers inside one index, so refuse it
    recorded_tok = stream_meta.get("tokenizer") or stats0.get("tokenizer")
    if tokenizer is None:
        tokenizer = recorded_tok or "whitespace"
    elif recorded_tok is not None and tokenizer != recorded_tok:
        raise ValueError(
            f"tokenizer={tokenizer!r} conflicts with the index's recorded "
            f"analyzer {recorded_tok!r}; omit the argument to reuse it"
        )

    docmap = spark.read.parquet(f"{index_path}/docmap")
    max_id = docmap.agg(F.max("doc_id")).collect()[0][0] or 0
    live_ids = docmap.select("doc_id")

    has_old = "doc_id" in updates.columns
    # one update row per natural key: duplicates would fan out the old→new
    # id join below and make "which row replaces doc X" ambiguous
    n_rows = updates.count()
    n_keys = updates.select("repo", "path", "commit").distinct().count()
    if n_keys != n_rows:
        raise ValueError(
            f"update batch has {n_rows - n_keys} duplicate "
            "(repo, path, commit) keys; collapse to one row per document "
            "per call (or split into successive calls)"
        )
    # fresh ids: deterministic dense rank over the natural key, shifted
    # past the current max — identical to assign_doc_ids but offset
    from miru_spark.schema import assign_doc_ids

    body = updates.drop("doc_id") if has_old else updates
    renumbered = assign_doc_ids(body).withColumn(
        "doc_id", F.col("doc_id") + F.lit(int(max_id) + 1)
    )
    n_new = renumbered.count()
    if n_new == 0:
        raise ValueError("no update rows")

    existing = {
        int(e.split("=", 1)[1])
        for e in os.listdir(seg_root)
        if e.startswith("batch=")
    }
    bid = (max(existing) + 1) if existing else 0

    # the delta batch must bucket doc_ids with the SAME divisor as every
    # earlier batch (pid = doc_id // docs_per_part): a batch-sized divisor
    # would give the new (higher) ids pids that collide with old pid ranges,
    # the merge's order-by-pid would interleave them, and chunk docid ranges
    # would overlap — seeks/WAND then silently miss matching docs
    if "docs_per_part" in stream_meta:
        dpp = int(stream_meta["docs_per_part"])
    else:
        # pre-meta index: tightest provably-safe divisor. max_pid =
        # max_id // dpp implies dpp >= ceil((max_id+1)/(max_pid+1)), and any
        # divisor <= every prior batch's keeps new pids >= all prior pids
        # (ids only grow), preserving the ordered-pid merge invariant.
        max_pid = (
            spark.read.parquet(seg_root)
            .agg(F.max("partition_id"))
            .collect()[0][0]
            or 0
        )
        dpp = max(1, -(-(int(max_id) + 1) // (int(max_pid) + 1)))
    segs = build_segments(
        renumbered,
        num_partitions,
        # build_segments derives ceil(n_docs/num_partitions) == dpp exactly
        n_docs=dpp * num_partitions,
        tokenizer=tokenizer,
        positions=bool(stats0.get("positions", False)),
    )
    segs.write.mode("overwrite").partitionBy("partition_id").parquet(
        f"{seg_root}/batch={bid}"
    )
    docmap_direct(renumbered, tokenizer).write.mode("overwrite").parquet(
        f"{index_path}/docmap/batch={bid}"
    )

    id_map: list[tuple[int, int]] = []
    n_updated = 0
    if has_old:
        pairs = (
            updates.select(F.col("doc_id").alias("old_id"), "repo", "path", "commit")
            .filter(F.col("old_id").isNotNull())
            # replacements must name a doc that actually exists
            .join(live_ids, F.col("old_id") == F.col("doc_id"), "left_semi")
            .join(
                renumbered.select(
                    F.col("doc_id").alias("new_id"), "repo", "path", "commit"
                ),
                ["repo", "path", "commit"],
            )
            .select("old_id", "new_id")
            .collect()
        )
        id_map = [(int(r.old_id), int(r.new_id)) for r in pairs]
        old_ids = [o for o, _ in id_map]
        if old_ids:
            # tombstone AFTER the new batch lands: a crash in between
            # leaves both versions live (a duplicate), never a lost doc
            delete_docs(index_path, old_ids)
            n_updated = len(old_ids)

    stats = finalize_streamed_index(
        spark,
        index_path,
        num_partitions=num_partitions,
        codec=int(stats0.get("codec")) if stats0.get("codec") else None,
        snapshots=snapshots,
    )
    return {
        "n_updated": n_updated,
        "n_inserted": n_new - n_updated,
        "batch": bid,
        "id_map": id_map,
        "stats": stats,
    }


# ------------------------------------------------------- stream analytics --

def dedup_event_stream(
    events_stream: DataFrame, watermark: str = "3650 days"
) -> DataFrame:
    """Streaming exactly-once dedup of an at-least-once event feed:
    ``withWatermark + dropDuplicates(event_id)`` keeps one state entry per
    id and emits only first arrivals — replayed copies landing in LATER
    micro-batches hit the persisted state and vanish, which is the whole
    point (a per-batch distinct cannot do this). The dedup key INCLUDES the
    watermarked event-time column — Structured Streaming only evicts
    dropDuplicates state when it does (that rule is why
    dropDuplicatesWithinWatermark exists); with ``ts`` in the key, entries
    older than the watermark age out and state is O(events within the
    horizon), not O(stream history). Replayed copies carry the original
    event's ``ts``, so (event_id, ts) dedups them exactly. The default
    horizon is effectively unbounded for the finite test feeds; production
    picks the replay window (e.g. '2 days' for a Kafka retention of 1)."""
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return events_stream.withWatermark("ts", watermark).dropDuplicates(
        ["event_id", "ts"]
    )


def attributed_clicks(
    clicks_stream: DataFrame,
    views_stream: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join (the attribution primitive): each click
    joins every view by the SAME user within ``within`` BEFORE it —
    'which impression led to this click'. Both sides are event streams, so
    neither can be a static broadcast; this is Structured Streaming's
    symmetric-hash stream-stream join, and the interval condition plus the
    two watermarks are what BOUND the join state: a buffered view can only
    match clicks up to ``within`` later, so once the click watermark passes
    that horizon the view's state row is evicted. Without the time bound
    the state would grow with the whole stream — the canonical
    stream-stream join trap.

    Inner join, append mode; output is one row per (click, view) pair with
    exact ids, so the result is value-oracle-able against the batch SQL
    twin on the same events.
    """
    c = clicks_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    v = views_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    c = c.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    v = v.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    joined = c.join(
        v,
        F.expr(
            f"c_user = v_user AND view_ts <= click_ts "
            f"AND view_ts >= click_ts - INTERVAL {within}"
        ),
    )
    return joined.select(
        "click_id", "view_id", F.col("c_user").alias("user_id")
    )


def windowed_event_counts(
    events_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a watermark
    for late data (state is evicted once the watermark passes)."""
    # parquet timestamps arrive as TIMESTAMP_NTZ; watermarks require
    # session-zoned TIMESTAMP (session TZ is pinned to UTC)
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def percolate_stream(
    docs_stream: DataFrame, queries: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Streaming percolation — ES percolate as an ALERTING stream: every
    arriving document is matched against the registered query set and
    (doc_id, query_id) alerts are emitted in append mode.

    Each micro-batch matches STATELESSLY: the registered queries (small by
    design — alerting is thousands of queries against an unbounded doc
    stream) broadcast onto the batch, and the match predicate is pure
    codegen array algebra over the doc's distinct token set —
    ``array_intersect`` full-coverage for conjunctive, ``arrays_overlap``
    for disjunctive, a negated overlap for NOT. So the plan is a
    stream-static broadcast join + filter: no watermark, no state store,
    per-batch cost O(|batch| x |queries|), and the semantics are
    pinned to the batch percolator (plans/percolate.py) which expresses
    the same predicate as explode + join + agg — the streaming side avoids
    that agg because aggregation over an unbounded doc stream would need
    state, while the array form decides every (doc, query) pair inside
    its own row."""
    toks = F.array_distinct(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    )
    q = queries.select(
        "query_id",
        "mode",
        F.array_distinct("terms").alias("q_terms"),
        F.coalesce(
            F.col("exclude"), F.array().cast("array<string>")
        ).alias("q_excl"),
    )
    joined = docs_stream.withColumn("__toks", toks).crossJoin(F.broadcast(q))
    hit = F.when(
        F.col("mode") == "conjunctive",
        F.size(F.array_intersect("__toks", "q_terms")) == F.size("q_terms"),
    ).otherwise(F.arrays_overlap("__toks", "q_terms"))
    ok = (
        (F.size("q_terms") > 0)  # empty-terms queries match nothing (batch twin)
        & hit
        & ~F.arrays_overlap("__toks", "q_excl")
    )
    return joined.filter(ok).select("doc_id", "query_id")


def sessionized_user_activity(
    events_stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 days"
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge
    into one session (``session_window`` — the dynamic-window streaming op)."""
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_STATE_SCHEMA = "n_docs long, n_chars long"
_OUT_SCHEMA = "source string, n_docs long, n_chars long"


def _update_source_stats(key, pdfs, state: GroupState):
    (source,) = key
    n_docs, n_chars = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_docs += len(pdf)
        n_chars += int(pdf["n_chars"].sum())
    state.update((n_docs, n_chars))
    yield pd.DataFrame(
        {"source": [source], "n_docs": [n_docs], "n_chars": [n_chars]}
    )


def running_source_stats(docs_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-source counters that persist
    across micro-batches via applyInPandasWithState."""
    return docs_stream.groupBy("source").applyInPandasWithState(
        _update_source_stats,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
