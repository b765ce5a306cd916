#!/usr/bin/env python
"""spark-submit job: build the index and serve one search — the deployment
shape the north_rule pins (``spark-submit --py-files miru_spark.zip``).

    python scripts/make_pyfiles_zip.py          # -> dist/miru_spark.zip
    spark-submit --master local[8] \
        --py-files dist/miru_spark.zip \
        scripts/submit_build.py \
        --sf-dir /root/testdata/sf0.001 --index-path /tmp/idx \
        --query "join hash" --mode conjunctive

On a real cluster the same command takes ``--master yarn``/k8s and the
executors import miru_spark from the shipped zip.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--index-path", required=True)
    ap.add_argument(
        "--query", default="join hash",
        help="full query language: 'a AND b NOT c', 'a OR b', 'foo*', "
             "'foo~', '\"exact phrase\"' (phrase needs --positions)",
    )
    ap.add_argument(
        "--mode", default="auto",
        help="auto = parse operators from --query; or force "
             "conjunctive/disjunctive over the bare terms",
    )
    ap.add_argument("--positions", action="store_true",
                    help="build positional postings (phrase queries)")
    ap.add_argument("--num-partitions", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    # Under spark-submit the session already exists; builder.getOrCreate
    # attaches. miru_spark resolves from --py-files on driver AND executors.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("miru-submit-build").getOrCreate()

    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.plans.search import search, search_topk
    from miru_spark.schema import read_corpus

    t0 = time.time()
    manifest = build_index(
        spark,
        read_corpus(spark, args.sf_dir),
        args.index_path,
        num_partitions=args.num_partitions,
        positions=args.positions,
    )
    reader = IndexReader(spark, args.index_path)
    if args.mode == "auto":
        hits = search(reader, args.query, k=args.k)
    else:
        hits = search_topk(reader, args.query.split(), mode=args.mode, k=args.k)
    print(
        "MIRU_RESULT "
        + json.dumps(
            {
                "n_docs": manifest["n_docs"],
                "build_secs": manifest["metrics"]["build_secs"],
                "total_secs": round(time.time() - t0, 3),
                "query": args.query,
                "mode": args.mode,
                "topk": [[int(d), round(float(s), 6)] for d, s in hits],
            }
        )
    )


if __name__ == "__main__":
    main()
