"""Bench harness (driver contract + BASELINE.md targets).

Prints ONE JSON line:
  {"metric": ..., "value": <total headline-query sec>, "unit": "sec",
   "queries": {name: sec}, "sf": <sf>,
   "build": {"turns", "turns_per_sec_localN", "turns_per_sec_local4N",
             "scaling_efficiency", ...},
   "bm25_latency_ms": {"p50": ..., "p99": ..., "n": ...}}

Sections:
1. headline operator queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]
   (executed with the noop sink so the full plan runs, nothing collects);
2. index-build throughput on the deterministic synthetic transcript
   corpus at TWO parallelism levels (local[N] vs local[4N] cores — the
   sandbox substitution for N vs 4N executors per the north rule), plus
   scaling efficiency = thr(4N) / (4 * thr(N));
3. BM25 top-10 latency (block-max WAND over the built index), p50/p99
   over the reference query set.

Corpus generation is cached to /tmp (one-time, outside the timed
region); both builds read the same parquet input.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from snowplow_elasticsearch_loader_spark.config import EngineConfig, IndexConfig  # noqa: E402
from snowplow_elasticsearch_loader_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# N vs 4N cores for the scaling pair. Default 2 vs 8 (not 8 vs 32):
# this host punishes >8-way concurrency (shared page-fault path), so
# 8/32 measures sandbox contention, not the engine's scalability.
N_SMALL = int(os.environ.get("BENCH_SMALL", "2"))
N_BIG = int(os.environ.get("BENCH_BIG", str(4 * N_SMALL)))
BENCH_CONVS = int(os.environ.get("BENCH_CONVS", "16000"))
BENCH_SEED = 42

#: headline operator queries run at the SF dir (subset of the contract
#: registry: index layer, both BM25 paths, dedup, ANN, relational)
HEADLINE = [
    "q_postings_tf",
    "q_bm25_topk",
    "q_bm25_topk_wand",
    "q_minhash_lsh_pairs",
    "q_ngram_jaccard_pairs",
    "q_ann_cosine_topk",
    "q_text_quality",
    "q_lineitem_pricing",
    "q_top_customers",
]

# fewer output partition dirs (16 buckets x ~26 ranges) cuts the serial
# file-commit overhead that dominates small-corpus scaling on this host
BUILD_CFG = EngineConfig(
    index=IndexConfig(block_size=128, docs_per_range=1 << 15, term_buckets=16)
)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def corpus_path() -> str:
    path = os.path.join(
        tempfile.gettempdir(), f"engine_bench_corpus_c{BENCH_CONVS}_s{BENCH_SEED}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from snowplow_elasticsearch_loader_spark.sources.transcripts import (
            synth_transcripts_pdf,
        )

        log(f"generating bench corpus ({BENCH_CONVS} convs) ...")
        pdf = synth_transcripts_pdf(
            n_convs=BENCH_CONVS, seed=BENCH_SEED, fast=True, with_anomalies=False
        )
        spark = get_spark(f"local[{CPUS}]", app_name="bench-gen")
        spark.sparkContext.setLogLevel("ERROR")
        from snowplow_elasticsearch_loader_spark.sources.transcripts import (
            TRANSCRIPT_SCHEMA,
        )

        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).repartition(
            64
        ).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def timed_build(master: str, corpus: str) -> tuple[float, int, str]:
    """Returns (build seconds, n turns, index dir)."""
    from snowplow_elasticsearch_loader_spark.index_store import build_index

    out = tempfile.mkdtemp(prefix=f"engine-bench-idx-{master.replace('[','').replace(']','')}-")
    spark = get_spark(master, app_name=f"bench-build-{master}")
    spark.sparkContext.setLogLevel("ERROR")
    tr = spark.read.parquet(corpus)
    t0 = time.time()
    idx = build_index(spark, tr, out, BUILD_CFG)
    dt = time.time() - t0
    n = idx.documents.count()
    spark.stop()
    return dt, n, out


def bm25_latency(index_dir: str) -> dict:
    from snowplow_elasticsearch_loader_spark.index_store import InvertedIndex
    from snowplow_elasticsearch_loader_spark.operators.query_engine import QueryEngine
    from snowplow_elasticsearch_loader_spark.queryset import REFERENCE_QUERIES

    spark = get_spark(f"local[{CPUS}]", app_name="bench-query")
    spark.sparkContext.setLogLevel("ERROR")
    idx = InvertedIndex(spark, index_dir, BUILD_CFG)
    engine = QueryEngine(idx, BUILD_CFG, warm=True)  # ES-style warm process
    engine.search(REFERENCE_QUERIES[:1], k=10).collect()  # JIT/codegen warmup
    lat = []
    for rep in range(3):
        for qid, qtext in REFERENCE_QUERIES:
            t0 = time.time()
            engine.search([(qid, qtext)], k=10).collect()
            lat.append((time.time() - t0) * 1000.0)
    # batched path: all queries in one call, amortized per query
    t0 = time.time()
    engine.search(REFERENCE_QUERIES, k=10).collect()
    batched_ms = (time.time() - t0) * 1000.0 / len(REFERENCE_QUERIES)
    spark.stop()
    lat.sort()
    return {
        "p50": round(statistics.median(lat), 1),
        "p99": round(lat[max(0, int(len(lat) * 0.99) - 1)], 1),
        "batched_per_query": round(batched_ms, 1),
        "n": len(lat),
    }


def main() -> None:
    t_all = time.time()
    results: dict = {"queries": {}}

    # ---- 1. headline operator queries at SF dir ----
    from snowplow_elasticsearch_loader_spark import contract

    spark = get_spark(f"local[{CPUS}]", app_name="bench-queries")
    spark.sparkContext.setLogLevel("ERROR")
    total = 0.0
    for name in HEADLINE:
        fn = contract.SPARK_QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results["queries"][name] = round(dt, 3)
        total += dt
        log(f"query {name}: {dt:.2f}s")
    spark.stop()

    # ---- 2. index-build scaling (N vs 4N cores) ----
    # The sandbox host is noisily shared: single measurements swing 3x.
    # Alternate the two levels and take the best of REPS runs each —
    # min wall time is the least-contended estimate of true cost.
    corpus = corpus_path()
    small, big = f"local[{N_SMALL}]", f"local[{N_BIG}]"
    reps = int(os.environ.get("BENCH_BUILD_REPS", "3"))
    dts_small, dts_big = [], []
    n_turns = 0
    dir_small = dir_big = None
    for rep in range(reps):
        dt_s, n_turns, d_s = timed_build(small, corpus)
        dts_small.append(dt_s)
        if dir_small:
            shutil.rmtree(d_s, ignore_errors=True)
        else:
            dir_small = d_s
        dt_b, _, d_b = timed_build(big, corpus)
        dts_big.append(dt_b)
        if dir_big:
            shutil.rmtree(d_b, ignore_errors=True)
        else:
            dir_big = d_b
        log(f"build rep {rep}: {small} {dt_s:.1f}s | {big} {dt_b:.1f}s")
    dt_small, dt_big = min(dts_small), min(dts_big)
    thr_small = n_turns / dt_small
    thr_big = n_turns / dt_big
    eff = thr_big / ((N_BIG / N_SMALL) * thr_small)
    results["build"] = {
        "turns": n_turns,
        "cores_small": N_SMALL,
        "cores_big": N_BIG,
        f"turns_per_sec_local{N_SMALL}": round(thr_small, 1),
        f"turns_per_sec_local{N_BIG}": round(thr_big, 1),
        "build_sec_small": round(dt_small, 1),
        "build_sec_big": round(dt_big, 1),
        "build_sec_small_runs": [round(x, 1) for x in dts_small],
        "build_sec_big_runs": [round(x, 1) for x in dts_big],
        "scaling_efficiency": round(eff, 3),
    }
    log(f"build: {n_turns} turns | {small} {dt_small:.1f}s ({thr_small:.0f}/s) | "
        f"{big} {dt_big:.1f}s ({thr_big:.0f}/s) | eff {eff:.2f}")

    # ---- 3. BM25 query latency over the built index ----
    results["bm25_latency_ms"] = bm25_latency(dir_big)
    log(f"bm25 latency: {results['bm25_latency_ms']}")

    shutil.rmtree(dir_small, ignore_errors=True)
    shutil.rmtree(dir_big, ignore_errors=True)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": results["queries"],
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
        "build": results["build"],
        "bm25_latency_ms": results["bm25_latency_ms"],
        "bench_wall_sec": round(time.time() - t_all, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
