"""Spark-free isolation of the SPIMI block-build stage's scaling.

Runs the EXACT per-range builder (operators.index_build.make_range_builder)
over the bench corpus through plain multiprocessing at N pinned CPUs —
no JVM, no Arrow IPC, no parquet write. If this anti-scales like the
in-Spark blocks_write stage, the fault is in the Python/allocator/kernel
layer; if it scales ~N, the regression lives in the Spark exchange/write
path.

Usage: python scripts/mp_blocks.py [2 8 2 8]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

CORPUS = os.environ.get("MP_CORPUS", "/dev/shm/engine_bench_corpus_c40000_s42")
DOCS_PER_RANGE = 1 << 15
CPU_BASE = int(os.environ.get("BENCH_CPU_BASE", str(max(0, (os.cpu_count() or 8) - 8))))

_groups = None  # loaded once in the parent, COW-shared into workers


def _load_groups():
    import pyarrow.dataset as ds

    t = ds.dataset(CORPUS).to_table(columns=["text"])
    texts = t.column("text").combine_chunks()
    n = len(texts)
    groups = []
    for lo in range(0, n, DOCS_PER_RANGE):
        hi = min(lo + DOCS_PER_RANGE, n)
        groups.append((lo, hi))
    return texts, groups


def _worker_init():
    from snowplow_elasticsearch_loader_spark.session import apply_malloc_tuning

    apply_malloc_tuning()


def _run_group(args):
    import numpy as np
    import pandas as pd

    from snowplow_elasticsearch_loader_spark.config import EngineConfig, IndexConfig
    from snowplow_elasticsearch_loader_spark.operators.index_build import (
        make_range_builder,
    )

    gi, lo, hi = args
    cfg = EngineConfig(
        index=IndexConfig(block_size=128, docs_per_range=DOCS_PER_RANGE, term_buckets=8)
    )
    t0 = time.time()
    global _texts
    txt = _texts.slice(lo, hi - lo).to_pandas()
    pdf = pd.DataFrame(
        {"doc_id": np.arange(lo, hi, dtype=np.int64), "text": txt}
    )
    builder = make_range_builder(cfg, 50.0)
    out = builder((lo // DOCS_PER_RANGE,), pdf)
    nbytes = int(sum(len(x) for x in out["docs_varint"]))
    return gi, time.time() - t0, len(out), nbytes, os.getpid()


def _pool_globals(texts):
    global _texts
    _texts = texts


def run_level(n_procs: int, texts, groups) -> dict:
    import multiprocessing as mp

    os.sched_setaffinity(0, set(range(CPU_BASE, CPU_BASE + n_procs)))
    _pool_globals(texts)
    ctx = mp.get_context("fork")
    t0 = time.time()
    with ctx.Pool(n_procs, initializer=_worker_init) as pool:
        res = pool.map(
            _run_group, [(i, lo, hi) for i, (lo, hi) in enumerate(groups)], chunksize=1
        )
    wall = time.time() - t0
    per = sorted(r[1] for r in res)
    return {
        "procs": n_procs,
        "wall": round(wall, 2),
        "groups": len(groups),
        "group_p50": round(per[len(per) // 2], 2),
        "group_max": round(per[-1], 2),
        "group_min": round(per[0], 2),
        "sum_group_sec": round(sum(per), 2),
        "n_workers": len({r[4] for r in res}),
    }


def main():
    levels = [int(x) for x in sys.argv[1:]] or [2, 8, 2, 8]
    texts, groups = _load_groups()
    print(f"corpus {CORPUS}: {len(groups)} groups", file=sys.stderr, flush=True)
    out = []
    for lv in levels:
        r = run_level(lv, texts, groups)
        out.append(r)
        print(json.dumps(r), flush=True)
    walls = {}
    for r in out:
        walls.setdefault(r["procs"], []).append(r["wall"])
    if len(walls) == 2:
        (a, wa), (b, wb) = sorted(walls.items())
        eff = min(wa) / ((b / a) * min(wb))
        print(json.dumps({"eff_min_ratio": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
