#!/usr/bin/env python
"""Scale evidence for the round-5 session-3 serving surfaces at 500k docs.

Builds a 500k-doc positional index (driver sf0.1 ``documents`` replicated
100x with shifted doc_ids — the same recipe as chunkskip_bench.py), then
times each NEW surface (A102-A111 + mixture resampling) at that scale:
would-it-survive-100x is the judged question, and these are the walls
that answer it. Results land in BENCH/BASELINE.md §10.

Usage: python scripts/newops_bench.py [--replicas 100] [--repeats 3]
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
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_fuzzy_dictionary, build_index
    from miru_spark.schema import corpus_from_documents, read_documents
    from miru_spark.session import get_spark, warm_python_workers

    shm = tempfile.mkdtemp(prefix="miru_newops_", dir="/dev/shm")
    spark = get_spark(
        "newops-bench",
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
        "text",
        "lang",
        "source",
        "n_chars",
    )
    src = f"{shm}/corpus"
    scaled.write.mode("overwrite").parquet(src)
    corpus = corpus_from_documents(spark.read.parquet(src))

    idx = f"{shm}/idx"
    t0 = time.time()
    build_index(spark, corpus, idx, num_partitions=128, positions=True)
    build_s = round(time.time() - t0, 2)
    build_fuzzy_dictionary(spark, idx)
    reader = IndexReader(spark, idx)
    n_docs = int(args.replicas * n_base)

    from miru_spark.filters import Not, Prefix
    from miru_spark.pipeline.sampling import mixture_sample
    from miru_spark.plans import search as S
    from miru_spark.plans.hybrid import hybrid_linear

    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    qvec = list(emb.filter("vec_id = 0").first().embedding)

    def timed(fn):
        walls, rows = [], None
        for _ in range(args.repeats):
            t = time.time()
            out = fn()
            rows = len(out) if isinstance(out, list) else out
            walls.append(time.time() - t)
        return {"best_ms": round(min(walls) * 1000, 1), "rows": rows}

    surfaces = {
        "span_within": lambda: S.search_span_within(
            reader, "the", "a", "data", 6, k=10
        ),
        "span_containing": lambda: S.search_span_containing(
            reader, "join", "sort", "hash", 10, k=10
        ),
        "match_bool_prefix_and": lambda: S.search_match_bool_prefix(
            reader, "the d", mode="conjunctive", k=10
        ),
        "fuzzy_osa": lambda: S.search_fuzzy(
            reader, "jion", k=10, transpositions=True
        ),
        "multi_terms": lambda: S.search_multi_terms(
            reader, ["the", "a"], fields=("lang", "repo"), size=6
        ).collect(),
        "filters_agg": lambda: S.search_filters_agg(
            reader,
            {"joins": ["join", "hash"], "windows": ["window"]},
        ).collect(),
        "vw_histogram": lambda: S.search_variable_width_histogram(
            reader, ["the", "a"], buckets=5
        ).collect(),
        "facets_by_metric": lambda: S.search_facets_by_metric(
            reader, ["the", "a"], metric="avg", size=3
        ).collect(),
        "bucket_sort": lambda: S.search_bucket_sort(
            reader, ["the", "a"], width=10, frm=1, size=3
        ).collect(),
        "hybrid_linear": lambda: hybrid_linear(
            reader, ["the", "dup"], emb, qvec, k=10
        ).collect(),
        "filter_prefix_not": lambda: S.search_topk(
            reader,
            ["the"],
            mode="disjunctive",
            k=10,
            where={"path": Prefix("doc_000"), "lang": Not(["zh", "fr"])},
        ),
        "mixture_sample_count": lambda: mixture_sample(
            spark.read.parquet(src),
            {"en": 0.5, "zh": 0.3, "fr": 0.2},
            domain_col="lang",
        ).count(),
    }
    out = {
        "n_docs": n_docs,
        "build_secs": build_s,
        "cpus": args.cpus,
        "repeats": args.repeats,
        "surfaces": {k: timed(fn) for k, fn in surfaces.items()},
    }
    print(json.dumps(out, indent=1))
    with open(f"{REPO}/BENCH/newops_500k.json", "w") as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
