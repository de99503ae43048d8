"""Python-worker daemon with scientific-stack preload.

Spark forks one Python worker per concurrently-running task from a
single long-lived daemon process (``spark.python.daemon.module``).
Importing the heavy libraries HERE — before any fork — shares their
mapped pages copy-on-write with every worker, so no worker ever pays
the import again.

Why this exists: per-worker cold start measured ~19.5 s with 8 workers
importing numpy/pandas/pyarrow concurrently on 8 pinned cores (each
worker's FIRST pandas-UDF group), versus ~1 s for every later group.
On an N->4N scaling run that fixed per-worker cost is paid by 4x as
many workers and dominates the smaller per-worker share of real work —
one of the two causes of the r02 build anti-scaling (the other was
pyarrow's default jemalloc pool, see session._WORKER_ALLOC_ENV).

The reference has no analog (single JVM process, no per-worker runtime
bootstrap); this is Spark-deployment plumbing, enabled via
``spark.python.daemon.module`` in session.get_spark.
"""

from __future__ import annotations

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.compute",
    "pyarrow.parquet",
    "pyspark.sql.pandas.serializers",
):
    try:
        __import__(_mod)
    except Exception:  # preload is best-effort; workers import lazily anyway
        pass

# engine hot modules (SPIMI builder, codecs, tokenizer) — also COW-shared
try:
    from .functions import analyze as _a  # noqa: F401
    from .functions import codec as _c  # noqa: F401
    from .operators import index_build as _ib  # noqa: F401
except Exception:
    try:
        from snowplow_elasticsearch_loader_spark.functions import analyze as _a  # noqa
        from snowplow_elasticsearch_loader_spark.functions import codec as _c  # noqa
        from snowplow_elasticsearch_loader_spark.operators import index_build as _ib  # noqa
    except Exception:
        pass

import pyspark.daemon as _pyspark_daemon

# glibc tuning for every worker: mallopt in the DAEMON process is
# inherited by forked workers (fork preserves allocator state). This
# must NOT travel as MALLOC_*_ env vars — the JVM would inherit those
# and its native allocation pattern degrades 20-30x under them
# (session.py has the measurements).
from .session import apply_malloc_tuning as _amt

_amt()


def _prefault_arena() -> None:
    """Fault the worker's glibc heap in ONE sequential pass.

    Without this, the first pandas-UDF group grows the heap
    incrementally (thousands of brk/fault cycles) which costs 25-40 s
    of pure kernel time per worker on this sandbox kernel at 8-way
    concurrency — measured: first SPIMI group 28 s cold vs 0.9 s after
    a 0.4 s prefault. One big malloc+memset+free warms the same pages
    at sequential-zeroing speed; MALLOC_TRIM_THRESHOLD_ (set by
    session._WORKER_ALLOC_ENV) keeps them in the arena for reuse.
    Chunks stay under MALLOC_MMAP_THRESHOLD_ so they extend the sbrk
    heap rather than being mmap'd and returned on free."""
    import ctypes
    import os

    mb = int(os.environ.get("SPARK_GRAFT_WORKER_PREFAULT_MB", "512"))
    if mb <= 0:
        return
    import time as _t

    _t0 = _t.time()
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.malloc.restype = ctypes.c_void_p
        libc.malloc.argtypes = [ctypes.c_size_t]
        libc.free.argtypes = [ctypes.c_void_p]
        chunk = 32 * 1024 * 1024
        ptrs = []
        for _ in range(max(1, (mb * 1024 * 1024) // chunk)):
            p = libc.malloc(chunk)
            if not p:
                break
            ctypes.memset(p, 0, chunk)
            ptrs.append(p)
        for p in ptrs:
            libc.free(p)
    except Exception:
        pass
    if os.environ.get("SPARK_GRAFT_PREFAULT_LOG"):
        try:
            with open(os.environ["SPARK_GRAFT_PREFAULT_LOG"], "a") as fh:
                fh.write(f"{os.getpid()} {_t.time() - _t0:.2f}\n")
        except Exception:
            pass


_orig_worker_main = _pyspark_daemon.worker_main


def _worker_main(*args, **kwargs):  # runs in the FORKED worker child
    _prefault_arena()
    return _orig_worker_main(*args, **kwargs)


_pyspark_daemon.worker_main = _worker_main

if __name__ == "__main__":
    _pyspark_daemon.manager()
