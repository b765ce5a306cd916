"""Driver registry entries for the streaming surfaces.

``stream_incremental_bm25`` streams the corpus in micro-batches, finalizes
the incremental index, and serves a BM25 search from it — checked against
the SAME ANSI-SQL oracle as the batch paths (the strongest possible claim
for a streamed index: rank-identical to batch AND to SQL). The windowed and
stateful queries run availableNow to a memory sink and return its table
(rows-only checks)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.plans.relational import bm25_oracle_sql

_STREAM_IDX: dict[str, str] = {}


def _streamed_index(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _STREAM_IDX:
        return _STREAM_IDX[sf_dir]
    from miru_spark.schema import read_corpus
    from miru_spark.streaming.incremental import (
        finalize_streamed_index,
        incremental_index_stream,
        stream_corpus,
    )

    base = tempfile.mkdtemp(prefix=f"miru_stream_{os.getpid()}_")
    drops = f"{base}/drops"
    idx = f"{base}/idx"
    corpus = read_corpus(spark, sf_dir)
    n = corpus.count()
    half = n // 2
    corpus.filter(F.col("doc_id") < half).coalesce(1).write.mode("append").parquet(drops)
    corpus.filter(F.col("doc_id") >= half).coalesce(1).write.mode("append").parquet(drops)
    q = incremental_index_stream(
        stream_corpus(spark, drops), idx, docs_per_part=max(1, -(-n // 8)),
        num_partitions=8,
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    finalize_streamed_index(spark, idx, num_partitions=8)
    _STREAM_IDX[sf_dir] = idx
    return idx


def q_stream_incremental_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.index.reader import IndexReader
    from miru_spark.plans.search import search_topk

    idx = _streamed_index(spark, sf_dir)
    rows = [
        (int(d), round(float(s), 6))
        for d, s in search_topk(
            IndexReader(spark, idx), ["join", "hash"], mode="conjunctive", k=10
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, score double")


_UPSERT_IDX: dict[str, str] = {}
_UPSERT_TEXT = "zzznew join hash zzznew"
# the oracle's corpus twin of update_documents: documents plus the updated
# versions under fresh ids (max+dense-rank over the engine's natural key
# (repo=source, path=printf(doc_id), commit const) — same order, same ids),
# with the replaced ids tombstoned out of the RESULT but still counted in
# every stat (Lucene pre-merge drift, exactly what the engine serves)
_UPSERT_TOK_SQL = f"""
SELECT doc_id, unnest(string_split(text,' ')) AS term FROM (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT (SELECT MAX(doc_id) FROM documents)
         + ROW_NUMBER() OVER (ORDER BY source, printf('doc_%05d.txt', doc_id))
         AS doc_id,
         '{_UPSERT_TEXT}' AS text
  FROM documents WHERE doc_id IN (7, 11)
)
""".strip()


def _upserted_index(spark: SparkSession, sf_dir: str) -> str:
    """A second streamed index with docs 7 and 11 replaced via
    update_documents (tombstone + delta batch + delta-merge)."""
    if sf_dir in _UPSERT_IDX:
        return _UPSERT_IDX[sf_dir]
    from miru_spark.schema import read_corpus
    from miru_spark.streaming.incremental import (
        finalize_streamed_index,
        incremental_index_stream,
        stream_corpus,
        update_documents,
    )

    base = tempfile.mkdtemp(prefix=f"miru_upsert_{os.getpid()}_")
    drops = f"{base}/drops"
    idx = f"{base}/idx"
    corpus = read_corpus(spark, sf_dir)
    n = corpus.count()
    half = n // 2
    corpus.filter(F.col("doc_id") < half).coalesce(1).write.mode("append").parquet(drops)
    corpus.filter(F.col("doc_id") >= half).coalesce(1).write.mode("append").parquet(drops)
    q = incremental_index_stream(
        stream_corpus(spark, drops), idx, docs_per_part=max(1, -(-n // 8)),
        num_partitions=8,
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    finalize_streamed_index(spark, idx, num_partitions=8)
    upd = (
        corpus.filter(F.col("doc_id").isin([7, 11]))
        .select("doc_id", "repo", "path", "commit", "lang")
        .withColumn("content", F.lit(_UPSERT_TEXT))
    )
    update_documents(spark, idx, upd, num_partitions=8)
    _UPSERT_IDX[sf_dir] = idx
    return idx


def q_stream_upsert_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.index.reader import IndexReader
    from miru_spark.plans.search import search_topk

    idx = _upserted_index(spark, sf_dir)
    rows = [
        (int(d), round(float(s), 6))
        for d, s in search_topk(
            IndexReader(spark, idx), ["join", "hash"], mode="conjunctive", k=10
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, score double")


def q_stream_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from miru_spark.streaming.incremental import windowed_event_counts

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = tempfile.mkdtemp(prefix="miru_evstream_")
    events.coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    name = f"win_{os.getpid()}"
    # complete mode, not append: on a FINITE availableNow run, append emits
    # only windows already past the watermark when the stream ends, silently
    # dropping the last ~watermark of events; complete flushes every window
    q = (
        windowed_event_counts(stream, window="1 day", watermark="2 days")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    # the per-window rows themselves, oracle-checkable: Spark's 1-day
    # tumbling windows are epoch-aligned (UTC session tz), so window_start
    # == date_trunc('day', ts). total_value stays out of the driver entry
    # (double summation order is engine-dependent); n is exact.
    return spark.sql(
        f"SELECT window_start, event_type, n FROM {name} "
        "ORDER BY window_start, event_type"
    )


STREAM_WINDOWED_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup under at-least-once replay: the events table is
    dropped TWICE into the source dir and streamed one file per trigger,
    so every event's duplicate arrives in a LATER micro-batch — only
    persisted dropDuplicates state can kill it. The oracle is simply the
    distinct (= original) events: a value check that exactly one copy of
    every event survived."""
    from miru_spark.streaming.incremental import dedup_event_stream

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = tempfile.mkdtemp(prefix="miru_dedupstream_")
    events.coalesce(1).write.mode("append").parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"dedup_{os.getpid()}"
    q = (
        dedup_event_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    return spark.sql(
        f"SELECT event_id, user_id, event_type FROM {name} ORDER BY event_id"
    )


STREAM_DEDUP_SQL = """
SELECT event_id, user_id, event_type FROM events ORDER BY event_id
""".strip()


def attribution_stream_sources(spark, events, c_src: str, v_src: str):
    """Write clicks and views as two time-ordered files per source, split
    AT a real attributed pair (its view in file 1, its click in file 2) so
    the pair provably meets in persisted join state ACROSS micro-batches —
    a single-file split would let one batch see both sides and never
    exercise the symmetric-hash state. Time-ordered halves keep every row
    ahead of both watermarks (nothing is dropped as late), so the streamed
    result must equal the batch join exactly. Returns the chosen
    (click_id, view_id) crossing pair."""
    c = events.filter("event_type = 'click'").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    v = events.filter("event_type = 'view'").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts")
    )
    pairs = (
        c.join(v, "user_id")
        .filter("vts <= cts AND vts >= cts - INTERVAL 1 HOUR")
        .orderBy(F.desc(F.col("cts") - F.col("vts")), "cid", "vid")
        .limit(1)
        .collect()
    )
    if not pairs:
        raise ValueError(
            "events contain no attributable (click, view) pair within the "
            "1-hour interval — the cross-batch split has nothing to anchor "
            "on (use a denser events table)"
        )
    pair = pairs[0]
    clicks = events.filter("event_type = 'click'")
    views = events.filter("event_type = 'view'")
    # per-source time-ordered halves; the boundary pair's view is in the
    # first view file, its click in the second click file
    views.filter(F.col("ts") <= pair.vts).coalesce(1).write.mode(
        "append"
    ).parquet(v_src)
    views.filter(F.col("ts") > pair.vts).coalesce(1).write.mode(
        "append"
    ).parquet(v_src)
    clicks.filter(F.col("ts") < pair.cts).coalesce(1).write.mode(
        "append"
    ).parquet(c_src)
    clicks.filter(F.col("ts") >= pair.cts).coalesce(1).write.mode(
        "append"
    ).parquet(c_src)
    return pair.cid, pair.vid


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks and views arrive as two
    INDEPENDENT file streams (two time-ordered files each, one file per
    trigger, split at a known attributed pair so at least one match
    provably spans micro-batches and sits in join state until the other
    side arrives); each click attributes to same-user views within the
    hour before it."""
    from miru_spark.streaming.incremental import attributed_clicks

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    c_src = tempfile.mkdtemp(prefix="miru_clickstream_")
    v_src = tempfile.mkdtemp(prefix="miru_viewstream_")
    attribution_stream_sources(spark, events, c_src, v_src)
    clicks = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(c_src)
    )
    views = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(v_src)
    )
    name = f"attr_{os.getpid()}"
    q = (
        attributed_clicks(clicks, views, within="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    return spark.sql(
        f"SELECT click_id, view_id, user_id FROM {name} ORDER BY click_id, view_id"
    )


STREAM_JOIN_SQL = """
SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id
FROM events c JOIN events v
  ON c.user_id = v.user_id
 AND c.event_type = 'click' AND v.event_type = 'view'
 AND v.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts
ORDER BY click_id, view_id
""".strip()


def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState custom stateful operator in the driver record:
    per-source counters carried across micro-batches; the LAST update per
    source must equal the batch totals — which is exactly what the oracle
    recomputes, so state persistence is value-checked, not just rows-only."""
    from miru_spark.streaming.incremental import running_source_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    src = tempfile.mkdtemp(prefix="miru_statestream_")
    docs.filter(F.col("doc_id") < n // 2).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") >= n // 2).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"state_{os.getpid()}"
    q = (
        running_source_stats(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    return spark.sql(
        f"""SELECT source, n_docs, n_chars FROM (
              SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_docs DESC) rk
              FROM {name}) WHERE rk = 1 ORDER BY source"""
    )


# CAST(SUM(..) AS BIGINT): DuckDB's SUM over an integer column returns
# HUGEINT, Spark emits BIGINT — the driver's type-aware value hash differs
# even when every value matches (same artifact rel_b24 hit in round 1).
STREAM_STATEFUL_SQL = """
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM documents GROUP BY source ORDER BY source
""".strip()


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session_window operator under BATCH semantics (same operator the
    stream uses; no watermark truncation, so every session is emitted and
    the gaps-and-islands SQL oracle checks the merge semantics exactly).
    Streaming-specific behavior (append-mode closing) stays in pytest."""
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        events.groupBy(F.session_window("ts", "31 minutes").alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# gaps-and-islands: a new session starts when the gap to the previous event
# of the same user is >= the session gap; session_end = last event + gap
# (Spark's session_window semantics: the window is [first, last + gap))
SESSION_WINDOWS_SQL = """
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '31 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM e)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '31 minutes' AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
""".strip()


def q_stream_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming percolation: the corpus is split into two files streamed
    one per trigger, so alerts for later docs are emitted by later
    micro-batches — and the union over the finite run must equal the
    batch percolator on the same corpus + registered queries."""
    from miru_spark.plans.index_suite import _PERC_QUERIES
    from miru_spark.streaming.incremental import percolate_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = tempfile.mkdtemp(prefix="miru_percstream_")
    docs.coalesce(2).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    qdf = spark.createDataFrame(
        _PERC_QUERIES,
        "query_id long, terms array<string>, mode string, exclude array<string>",
    )
    name = f"perc_{os.getpid()}"
    q = (
        percolate_stream(stream, qdf)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    return spark.sql(
        f"SELECT doc_id, query_id FROM {name} ORDER BY doc_id, query_id"
    )


def _stream_percolate_oracle() -> str:
    from miru_spark.plans.index_suite import _PERC_QUERIES
    from miru_spark.plans.percolate import percolate_oracle_sql

    return percolate_oracle_sql(_PERC_QUERIES)


def register_all(register) -> None:
    from miru_spark.plans.composite import register_composite

    DS = ("doc_id", "score")
    register_composite(register, "stream_incremental_bm25", [
        ("incremental", q_stream_incremental_bm25,
         bm25_oracle_sql(["join", "hash"], "conjunctive"), DS),
        # upsert (Lucene updateDocument): same query over the index after
        # update_documents replaced docs 7 and 11
        ("upsert", q_stream_upsert_bm25,
         bm25_oracle_sql(["join", "hash"], "conjunctive",
                         tok_sql=_UPSERT_TOK_SQL,
                         raw_where="doc_id NOT IN (7, 11)"), DS),
    ])
    register_composite(register, "stream_windowed_events", [
        ("windowed", q_stream_windowed_events, STREAM_WINDOWED_SQL,
         ("window_start", "event_type", "n")),
        # streaming dedup: replayed copies arrive in later micro-batches
        # and must die against persisted dropDuplicates state
        ("dedup", q_stream_dedup, STREAM_DEDUP_SQL,
         ("event_id", "user_id", "event_type")),
        # stream-stream interval join (attribution): two independent file
        # streams, symmetric-hash join state bounded by the time interval
        # + watermarks
        ("stream_join", q_stream_join, STREAM_JOIN_SQL,
         ("click_id", "view_id", "user_id")),
        # streaming percolation (alerting): docs arrive across micro-batches
        # and match the registered query set statelessly — stream-static
        # broadcast join, append mode, no state store; oracle = the batch
        # percolator's SQL twin over the full corpus
        ("stream_percolate", q_stream_percolate, _stream_percolate_oracle(),
         ("doc_id", "query_id")),
    ])
    register("stream_stateful_source_stats", q_stream_stateful, STREAM_STATEFUL_SQL)
    register("stream_session_windows", q_session_windows, SESSION_WINDOWS_SQL)
