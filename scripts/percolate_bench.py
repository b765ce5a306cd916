#!/usr/bin/env python
"""Percolation at alerting scale: 1k registered queries x 500k docs.

Compares the anchor-pruned plan (plans/percolate.py) against the naive
all-terms join (the pre-round-4 plan, inlined here as the control) on a
realistic registered-query mix: most alerts carry a distinctive rare term
('dup', 5%% df) or a term absent from the batch entirely — the shape that
makes candidate pruning pay. Reference point: the round-3 all-match worst
case measured 72.9 s for 100 queries (BENCH/BASELINE.md §2c), i.e. a
~729 s linear extrapolation to 1k queries.

Usage: python scripts/percolate_bench.py [--replicas 100] [--n-queries 1000]
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

HOT = ["the", "a", "filter", "fast", "join", "sort", "part", "line", "query", "batch"]


def make_queries(n: int):
    rows = []
    for i in range(n):
        h1, h2 = HOT[i % len(HOT)], HOT[(i + 3) % len(HOT)]
        if i % 10 < 7:  # distinctive-term alert (the common alerting shape)
            rows.append((i, ["dup", h1, h2], "conjunctive", None))
        elif i % 10 < 9:  # term absent from the batch: zero candidates
            rows.append((i, [f"zzzalert{i % 50}", h1], "conjunctive", None))
        elif i % 10 == 9 and i % 20 == 9:  # all-hot worst case
            rows.append((i, [h1, h2], "conjunctive", None))
        else:  # disjunctive
            rows.append((i, [h1, h2], "disjunctive", None))
    return rows


def naive_percolate(corpus, queries, F, text_col="content"):
    """The pre-round-4 plan: every doc term joined to every query term."""
    from miru_spark.functions.tokenize import tokens_col

    q = queries.select(
        "query_id", "mode", F.size("terms").alias("n_terms"),
        F.explode("terms").alias("term"),
    )
    vocab = q.select("term").distinct()
    doc_terms = (
        corpus.select("doc_id", F.explode(tokens_col(text_col, "whitespace")).alias("term"))
        .join(F.broadcast(vocab), "term", "left_semi")
        .distinct()
    )
    return (
        doc_terms.join(q, "term")
        .groupBy("doc_id", "query_id", "mode", "n_terms")
        .agg(F.count_distinct("term").alias("n_matched"))
        .filter(
            ((F.col("mode") == "conjunctive") & (F.col("n_matched") == F.col("n_terms")))
            | ((F.col("mode") == "disjunctive") & (F.col("n_matched") >= 1))
        )
        .select("doc_id", "query_id")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--n-queries", type=int, default=1000)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--skip-naive", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from miru_spark.plans.percolate import percolate
    from miru_spark.schema import corpus_from_documents, read_documents
    from miru_spark.session import get_spark, warm_python_workers

    shm = tempfile.mkdtemp(prefix="miru_perc_", dir="/dev/shm")
    spark = get_spark(
        "percolate-bench",
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
    scaled = reps.join(F.broadcast(docs)).select(
        (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    src = f"{shm}/corpus"
    scaled.write.mode("overwrite").parquet(src)
    corpus = corpus_from_documents(spark.read.parquet(src))
    n_docs = corpus.count()

    qschema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("mode", T.StringType()),
        T.StructField("exclude", T.ArrayType(T.StringType())),
    ])
    qdf = spark.createDataFrame(make_queries(args.n_queries), qschema)

    out = {"n_docs": int(n_docs), "n_queries": args.n_queries}
    t0 = time.time()
    out["anchored_matches"] = percolate(corpus, qdf).count()
    out["anchored_s"] = round(time.time() - t0, 2)
    print("anchored", out, flush=True)
    if not args.skip_naive:
        t0 = time.time()
        out["naive_matches"] = naive_percolate(corpus, qdf, F).count()
        out["naive_s"] = round(time.time() - t0, 2)
        assert out["naive_matches"] == out["anchored_matches"], out
    print(json.dumps(out))
    with open(f"{REPO}/BENCH/percolate_1k.json", "w") as f:
        json.dump(out, f, indent=2)
    shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
