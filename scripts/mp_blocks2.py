"""Phase-level attribution for the concurrent block-build slowdown.

Same harness as mp_blocks.py but each group reports per-phase wall time
plus the worker's utime/stime delta (user vs KERNEL — page faults and
allocator syscalls show up as stime). A pure-compute numpy control phase
(preallocated buffers, no allocation) separates CPU delivery from
allocation behavior.

Usage: python scripts/mp_blocks2.py [2 8]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

CORPUS = os.environ.get("MP_CORPUS", "/dev/shm/engine_bench_corpus_c40000_s42")
DOCS_PER_RANGE = 1 << 15
CPU_BASE = int(os.environ.get("BENCH_CPU_BASE", str(max(0, (os.cpu_count() or 8) - 8))))
PREFAULT_MB = int(os.environ.get("MP_PREFAULT_MB", "0"))

_texts = None
_ctl_a = None
_ctl_b = None


def _load():
    import pyarrow.dataset as ds

    return ds.dataset(CORPUS).to_table(columns=["text"]).column("text").combine_chunks()


def _worker_init():
    import numpy as np

    from snowplow_elasticsearch_loader_spark.session import apply_malloc_tuning

    apply_malloc_tuning()
    if os.environ.get("MP_MMAP_MAX0") == "1":
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-4, 0)  # M_MMAP_MAX=0: malloc never uses mmap
    try:  # keep BLAS single-threaded: the matmul control must measure
        import ctypes  # CPU delivery, not thread oversubscription

        for lib in ("libopenblas.so.0", "libopenblasp-r0.so.0"):
            try:
                ctypes.CDLL(lib).openblas_set_num_threads(1)
                break
            except Exception:
                pass
    except Exception:
        pass
    global _ctl_a, _ctl_b
    _ctl_a = np.random.default_rng(1).random((400, 400))
    _ctl_b = np.random.default_rng(2).random((400, 400))
    if PREFAULT_MB:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.malloc.restype = ctypes.c_void_p
        libc.malloc.argtypes = [ctypes.c_size_t]
        libc.free.argtypes = [ctypes.c_void_p]
        chunk = 32 * 1024 * 1024
        ptrs = []
        for _ in range(max(1, (PREFAULT_MB * 1024 * 1024) // chunk)):
            p = libc.malloc(chunk)
            if not p:
                break
            ctypes.memset(p, 0, chunk)
            ptrs.append(p)
        for p in ptrs:
            libc.free(p)


def _cpu_times():
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime, r.ru_stime, r.ru_minflt, r.ru_majflt


def _run_group(args):
    import numpy as np
    import pandas as pd

    from snowplow_elasticsearch_loader_spark.config import EngineConfig, IndexConfig
    from snowplow_elasticsearch_loader_spark.functions.analyze import tokenize_arrow
    from snowplow_elasticsearch_loader_spark.operators import index_build as IB

    gi, lo, hi = args
    cfg = EngineConfig(
        index=IndexConfig(block_size=128, docs_per_range=DOCS_PER_RANGE, term_buckets=8)
    )
    ph = {}
    st = {}
    u0, s0, mf0, Mf0 = _cpu_times()
    t = time.time()
    _s_last = [s0]

    def _mark(name, t0):
        _, s_now, _, _ = _cpu_times()
        ph[name] = time.time() - t0
        st[name] = s_now - _s_last[0]
        _s_last[0] = s_now

    # control: pure FLOPs on preallocated buffers (no allocation)
    x = _ctl_a
    for _ in range(40):
        x = x @ _ctl_b
        x *= 1e-3
    _mark("ctl_matmul", t)
    t = time.time()

    txt = _texts.slice(lo, hi - lo)
    pdf_txt = txt.to_pandas()
    _mark("to_pandas", t)
    t = time.time()

    row_of, tokens = tokenize_arrow(pdf_txt)
    _mark("tokenize", t)
    t = time.time()

    lens = np.bincount(row_of, minlength=hi - lo).astype(np.int64)
    doc = np.arange(lo, hi, dtype=np.int64)[row_of]
    dl = lens[row_of]
    row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(row_of.size, dtype=np.int64) - row_starts[row_of]
    enc = tokens.dictionary_encode()
    codes_raw = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pandas(), dtype=object)
    order_u = np.argsort(vocab)
    rank = np.empty(order_u.size, dtype=np.int64)
    rank[order_u] = np.arange(order_u.size)
    code_in = rank[codes_raw]
    uniq_terms = vocab[order_u]
    _mark("codes", t)
    t = time.time()

    merged = IB._merge_runs(
        IB._sort_runs(
            code_in, doc, np.ones(doc.size, dtype=np.int64), dl,
            cfg.index.max_run_postings, extra={"pos": pos},
        )
    )
    _mark("sort", t)
    t = time.time()

    bucket_by_code = IB._crc_buckets(uniq_terms, cfg.index.term_buckets)
    out = IB._emit_blocks(
        merged["code"], merged["doc_id"], merged["tf"], merged["doclen"],
        uniq_terms, bucket_by_code, 0, cfg, 50.0, pos_full=merged.get("pos"),
    )
    _mark("emit", t)

    u1, s1, mf1, Mf1 = _cpu_times()
    return gi, {k: round(v, 3) for k, v in ph.items()}, round(u1 - u0, 3), round(
        s1 - s0, 3
    ), mf1 - mf0, Mf1 - Mf0, len(out), os.getpid(), {k: round(v, 3) for k, v in st.items()}


def run_level(n_procs: int, texts) -> dict:
    import multiprocessing as mp
    import statistics

    global _texts
    _texts = texts
    os.sched_setaffinity(0, set(range(CPU_BASE, CPU_BASE + n_procs)))
    n = len(texts)
    groups = [
        (i, lo, min(lo + DOCS_PER_RANGE, n))
        for i, lo in enumerate(range(0, n, DOCS_PER_RANGE))
    ]
    ctx = mp.get_context("fork")
    t0 = time.time()
    with ctx.Pool(n_procs, initializer=_worker_init) as pool:
        res = pool.map(_run_group, groups, chunksize=1)
    wall = time.time() - t0
    phases = {}
    for k in res[0][1]:
        vals = sorted(r[1][k] for r in res)
        svals = [r[8][k] for r in res]
        phases[k] = {"p50": vals[len(vals) // 2], "max": vals[-1], "sum": round(sum(vals), 1), "stime_sum": round(sum(svals), 1)}
    med = statistics.median
    return {
        "procs": n_procs,
        "wall": round(wall, 2),
        "phases": phases,
        "utime_p50": med(sorted(r[2] for r in res)),
        "stime_p50": med(sorted(r[3] for r in res)),
        "stime_sum": round(sum(r[3] for r in res), 1),
        "utime_sum": round(sum(r[2] for r in res), 1),
        "minflt_sum": sum(r[4] for r in res),
        "majflt_sum": sum(r[5] for r in res),
    }


def main():
    levels = [int(x) for x in sys.argv[1:]] or [2, 8]
    texts = _load()
    for lv in levels:
        print(json.dumps(run_level(lv, texts)), flush=True)


if __name__ == "__main__":
    main()
