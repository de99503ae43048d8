"""Cheap host-window probe: is the box currently delivering clean
N->4N scaling on BOTH the CPU and the python-worker/fault paths?

Runs a ~20 s fixed workload (numpy alloc+sort, multiprocessing, no
Spark) pinned at 2 and at 8 CPUs and prints the pair ratio. Used to
gate expensive scaling re-measurements into clean host windows instead
of burning 20-minute bench attempts during degraded phases.

Calibration note (2026-08-20): the original 32-task variant timed a
~0.8 s region at 8 cores, where fork-pool startup is ~30% of the
measurement — it read 0.54 in a window where the bench's internal
warm probe read 0.88+. Fixed two ways: the pool is created and warmed
(one task per worker) BEFORE the timer starts, and TASKS is sized so
the timed region is >=3 s even at 8 cores. The probe measures the
host, not multiprocessing startup.

Usage: python scripts/host_probe.py  -> prints {"probe_eff": r}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

CPU_BASE = int(os.environ.get("BENCH_CPU_BASE", str(max(0, (os.cpu_count() or 8) - 8))))
TASKS = int(os.environ.get("PROBE_TASKS", "128"))


def _work(i: int) -> int:
    import numpy as np

    x = np.random.default_rng(i).integers(0, 1 << 40, size=4_000_000)
    x.sort()
    return int(x[0])


def level(n: int) -> float:
    os.sched_setaffinity(0, set(range(CPU_BASE, CPU_BASE + n)))
    ctx = mp.get_context("fork")
    with ctx.Pool(n) as pool:
        # warm: fault each worker's pages + import path before timing
        pool.map(_work, range(n), chunksize=1)
        t0 = time.time()
        pool.map(_work, range(TASKS), chunksize=1)
        return time.time() - t0


def main() -> None:
    t2 = level(2)
    t8 = level(8)
    eff = t2 / (4.0 * t8)
    print(json.dumps({"probe_eff": round(eff, 3), "t2": round(t2, 1), "t8": round(t8, 1)}))
    sys.exit(0 if eff >= float(os.environ.get("PROBE_GOOD", "0.8")) else 1)


if __name__ == "__main__":
    main()
