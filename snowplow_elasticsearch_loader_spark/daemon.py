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

import os

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


# NOTE (r04): the arena prefault used to run HERE, on every fork. But
# Spark forks ephemeral helper workers per task/connection besides the
# reused task workers (measured: 52 forks for 8 working pids in one
# bench child), so fork-time prefaulting memset 26 GB per child for
# nothing — serialized fault-path cost in degraded host windows. The
# prefault is now LAZY: session.ensure_worker_arena() runs once per
# worker process at its first real pandas-UDF group
# (operators/index_build.py builders), so only workers that do real
# work pay it, exactly when their allocations need the pages.
if os.environ.get("SPARK_GRAFT_PREFAULT_LOG"):
    _orig_worker_main = _pyspark_daemon.worker_main

    def _worker_main(*args, **kwargs):  # fork diagnostics only
        try:
            with open(os.environ["SPARK_GRAFT_PREFAULT_LOG"], "a") as fh:
                fh.write(f"{os.getpid()} fork\n")
        except Exception:
            pass
        return _orig_worker_main(*args, **kwargs)

    _pyspark_daemon.worker_main = _worker_main

if __name__ == "__main__":
    _pyspark_daemon.manager()
