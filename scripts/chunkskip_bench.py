#!/usr/bin/env python
"""Before/after measurement for distributed block-max chunk skipping.

Builds a 500k-doc index (driver sf0.1 ``documents`` replicated 100x with
shifted doc_ids, same recipe as scaling_bench.py), then times
``search_distributed`` disjunctive queries with the theta prune ON
(default) vs OFF (gate forced closed), reporting walls plus chunk
decode counts. Results land in BENCH/BASELINE.md §2d.

Usage: python scripts/chunkskip_bench.py [--replicas 100] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--pad",
        action="store_true",
        help="pad the text of the upper half of replicas with a filler "
        "token (~4x doc_len, query-term tfs unchanged): contiguous doc-id "
        "ranges of low-scoring docs, the realistic variance shape. Plain "
        "replication is frontier-homogeneous, so NO sound algorithm can "
        "skip chunks on it — that case is reported separately.",
    )
    ap.add_argument("--target-chunk", type=int, default=None)
    ap.add_argument(
        "--pad-tokens",
        type=int,
        default=160,
        help="filler tokens appended per padded doc (with --pad). 160 "
        "(~4x doc_len) keeps padded per-term scores at ~60%% of unpadded "
        "via tf saturation — the sum of TWO padded UBs still beats a "
        "single-term theta, so the equal-strength control stays "
        "unprunable; ~1600 (~30x) pushes padded scores under half and "
        "lets the windowed bound prune the control too.",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import corpus_from_documents, read_documents
    from miru_spark.session import get_spark, warm_python_workers
    from miru_spark.plans import search as S

    shm = tempfile.mkdtemp(prefix="miru_chunkskip_", dir="/dev/shm")
    spark = get_spark(
        "chunkskip-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=64,
        extra_conf={"spark.local.dir": f"{shm}/local"},
    )
    warm_python_workers(spark)

    docs = read_documents(spark, args.sf_dir)
    n_base = docs.count()
    reps = spark.range(0, args.replicas, 1, numPartitions=64).select(
        F.col("id").alias("rep")
    )
    text = (
        F.when(
            F.col("rep") >= args.replicas // 2,
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.concat_ws(" ", F.array_repeat(F.lit("pad"), args.pad_tokens)),
            ),
        ).otherwise(F.col("text"))
        if args.pad
        else F.col("text")
    )
    scaled = reps.join(F.broadcast(docs)).select(
        (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    src = f"{shm}/corpus"
    scaled.write.mode("overwrite").parquet(src)
    corpus = corpus_from_documents(spark.read.parquet(src))

    idx = f"{shm}/idx"
    t0 = time.time()
    build_kw = {"num_partitions": 128}
    if args.target_chunk:
        build_kw["target_chunk"] = args.target_chunk
    build_index(spark, corpus, idx, **build_kw)
    build_s = round(time.time() - t0, 2)
    reader = IndexReader(spark, idx)

    # the disjunctive shapes: single hot term (prunable), dominant rare
    # term + weak hot term (dominant term's chunks prunable), equal-
    # strength hot terms (the control: on a real-tf-variance corpus the
    # max-tf doc in every padded chunk is tf-SATURATED, so padding barely
    # dents the chunk FRONTIER — ~0.8x — and two frontiers still beat a
    # one-term theta; the windowed bound prunes this shape only when the
    # padded region is uniformly weak, pinned by the skew-corpus pytest),
    # and — with --pad — the regional-coverage shape ('pad' exists ONLY
    # in the padded half): the windowed bound's unique win, where the
    # un-padded half's window UB is a single weak term and the global
    # sum-UB rule could never prune because UB('pad') is large somewhere
    queries = [["the"], ["dup", "the"], ["the", "a"]]
    if args.pad:
        queries.append(["pad", "a"])
    out: dict = {
        "n_docs": int(reader.n_docs),
        "build_s": build_s,
        "queries": {},
    }
    gate_default = S._PRUNE_MIN_POSTINGS
    for terms in queries:
        key = "+".join(terms)
        chunks_total = reader.postings_df(terms).count()
        rec: dict = {"chunks_total": chunks_total}
        for label, gate in (("pruned", gate_default), ("unpruned", 1 << 62)):
            S._PRUNE_MIN_POSTINGS = gate
            walls = []
            for _ in range(3):
                t0 = time.time()
                S.search_distributed(
                    reader, terms, mode="disjunctive", k=10
                ).collect()
                walls.append(time.time() - t0)
            rec[label + "_s"] = round(min(walls), 3)
            if label == "pruned" and S.LAST_PRUNE_STATS.get("pruned"):
                # count chunks surviving the filter (metadata-only job)
                n_docsf = float(reader.n_docs)
                avgdl = float(reader.avgdl)
                ch = reader.postings_df(terms)
                tdf = ch.groupBy("term").agg(F.sum("df_chunk").alias("df_global"))
                ch = ch.join(F.broadcast(tdf), "term")
                kept_df, _ = S._blockmax_prune(ch, 10, n_docsf, avgdl, {}, 6)
                rec["chunks_kept"] = kept_df.count()
            elif label == "pruned":
                rec["chunks_kept"] = chunks_total
        S._PRUNE_MIN_POSTINGS = gate_default
        out["queries"][key] = rec
        print(key, rec, flush=True)

    print(json.dumps(out))
    with open(f"{REPO}/BENCH/chunkskip.json", "w") as f:
        json.dump(out, f, indent=2)
    shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
