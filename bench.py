#!/usr/bin/env python
"""Benchmark harness — one JSON line for the driver (BENCH_r{N}.json).

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32):

  * index-build wall time -> files/sec (the north-star build metric),
  * the pinned 45-query reference set (tests/queries_sf.json) served by the
    binary index (WAND / galloping intersection) -> per-query latency, p50,
  * the distributed DataFrame scorer on two representative queries.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ..., "extra": {...}}

Scaling-efficiency evidence (N vs 4N) is produced by scripts/scaling_bench.py
which runs THIS file at two parallelism levels and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.plans.search import search_distributed, search_many, search_topk
    from miru_spark.schema import read_corpus
    from miru_spark.session import get_spark

    spark = get_spark(
        "miru-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )

    queries_path = os.path.join(os.path.dirname(__file__), "tests/queries_sf.json")
    with open(queries_path) as f:
        query_set = json.load(f)

    t_total = time.time()
    results: dict[str, float] = {}

    # ---- index build ------------------------------------------------------
    idx_path = tempfile.mkdtemp(prefix="miru_bench_idx_")
    corpus = read_corpus(spark, sf_dir)
    n_docs = corpus.count()
    t0 = time.time()
    manifest = build_index(
        spark, corpus, idx_path, num_partitions=max(cpus, 8), tokenizer="whitespace"
    )
    build_secs = time.time() - t0
    results["build_index"] = round(build_secs, 3)
    files_per_sec = n_docs / build_secs

    # ---- query serving (driver fast path) ---------------------------------
    reader = IndexReader(spark, idx_path)
    # warm-up: touch postings/stats once
    search_topk(reader, ["the", "dup"], mode="disjunctive", k=10)
    latencies = []
    t_q = time.time()
    for i, q in enumerate(query_set):
        t1 = time.time()
        search_topk(reader, q["terms"], mode=q["mode"], k=q["k"])
        latencies.append(time.time() - t1)
    results["query_set_45"] = round(time.time() - t_q, 3)
    p50_ms = statistics.median(latencies) * 1000
    p95_ms = sorted(latencies)[int(len(latencies) * 0.95)] * 1000

    # batched serving: one pruned fetch for the union of all query terms
    t_b = time.time()
    search_many(reader, [(q["terms"], q["mode"]) for q in query_set], k=10)
    batch_secs = time.time() - t_b

    # ---- distributed scorer ----------------------------------------------
    t2 = time.time()
    search_distributed(reader, ["the", "a"], mode="disjunctive", k=10).collect()
    search_distributed(reader, ["join", "hash"], mode="conjunctive", k=10).collect()
    results["distributed_2q"] = round(time.time() - t2, 3)

    total = time.time() - t_total
    out = {
        "metric": "index-build files/sec + query p50 latency (binary index, BMW)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": results,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extra": {
            "n_docs": n_docs,
            "cpus": cpus,
            "build_files_per_sec": round(files_per_sec, 2),
            "query_p50_ms": round(p50_ms, 2),
            "query_p95_ms": round(p95_ms, 2),
            "batch_45q_ms": round(batch_secs * 1000, 2),
            "batch_ms_per_query": round(batch_secs * 1000 / len(query_set), 2),
            "n_queries": len(query_set),
            "build_metrics": manifest["metrics"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
