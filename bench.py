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


def _timed(fn, *args, **kwargs) -> float:
    t0 = time.time()
    fn(*args, **kwargs)
    return time.time() - t0


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

    # The sandbox shows 2-3x CPU-steal variance between identical runs
    # (BENCH/BASELINE.md header; BENCH_r02 recorded a 2x-noise artifact), so
    # every stage is measured multiple times inside ONE bench invocation:
    # best-of-2 for the build, median-of-3 for the query sweeps, best-of-2
    # for the distributed scorer. A single steal window can then dent at
    # most one trial, not the recorded number. Total budget stays < 90 s.

    # ---- index build (best of 2) ------------------------------------------
    corpus = read_corpus(spark, sf_dir)
    n_docs = corpus.count()
    build_trials = []
    for trial in range(2):
        path_t = tempfile.mkdtemp(prefix=f"miru_bench_idx{trial}_")
        t0 = time.time()
        manifest_t = build_index(
            spark, corpus, path_t, num_partitions=max(cpus, 8),
            tokenizer="whitespace",
        )
        build_trials.append((time.time() - t0, path_t, manifest_t))
    build_secs, idx_path, manifest = min(build_trials, key=lambda t: t[0])
    results["build_index"] = round(build_secs, 3)
    files_per_sec = n_docs / build_secs

    # ---- query serving (driver fast path; median of 3 sweeps) -------------
    reader = IndexReader(spark, idx_path)
    # warm-up: touch postings/stats once
    search_topk(reader, ["the", "dup"], mode="disjunctive", k=10)
    sweep_secs, sweep_lat = [], []
    for _ in range(3):
        latencies = []
        t_q = time.time()
        for q in query_set:
            t1 = time.time()
            search_topk(reader, q["terms"], mode=q["mode"], k=q["k"])
            latencies.append(time.time() - t1)
        sweep_secs.append(time.time() - t_q)
        sweep_lat.append(latencies)
    results["query_set_45"] = round(statistics.median(sweep_secs), 3)
    # per-query median across sweeps, then p50/p95 over queries
    med_lat = [statistics.median(ls) for ls in zip(*sweep_lat)]
    p50_ms = statistics.median(med_lat) * 1000
    p95_ms = sorted(med_lat)[int(len(med_lat) * 0.95)] * 1000

    # batched serving: one pruned fetch for the union of all query terms
    batch_secs = min(
        _timed(search_many, reader, [(q["terms"], q["mode"]) for q in query_set], k=10)
        for _ in range(3)
    )

    # ---- distributed scorer (best of 2) ------------------------------------
    def dist_2q() -> None:
        search_distributed(reader, ["the", "a"], mode="disjunctive", k=10).collect()
        search_distributed(reader, ["join", "hash"], mode="conjunctive", k=10).collect()

    results["distributed_2q"] = round(min(_timed(dist_2q) for _ in range(2)), 3)

    # batched distributed serving (round-4): 3 queries, ONE scan/decode/
    # shuffle — reported in extras, NOT in the end-to-end total (keeps the
    # headline comparable across rounds)
    from miru_spark.plans.search import search_many_distributed

    def dist_batched() -> None:
        search_many_distributed(
            reader,
            [
                (["the", "a"], "disjunctive"),
                (["join", "hash"], "conjunctive"),
                (["dup"], "disjunctive"),
            ],
            k=10,
        ).collect()

    dist_batched_secs = round(min(_timed(dist_batched) for _ in range(2)), 3)

    # "value" = end-to-end estimate from the recorded (noise-filtered) stage
    # times — NOT the harness wall clock, which now includes the duplicate
    # noise-control trials and would read ~2x the real pipeline cost.
    total = build_secs + statistics.median(sweep_secs) + batch_secs + results[
        "distributed_2q"
    ]
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
            "distributed_batched_3q_secs": dist_batched_secs,
            "n_queries": len(query_set),
            "harness_wall_secs": round(time.time() - t_total, 3),
            "noise_protocol": "build best-of-2, sweeps median-of-3, dist best-of-2",
            "build_metrics": manifest["metrics"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
