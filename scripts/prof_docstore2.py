"""Docstore-stage scaling profiler with JVM GC/CPU attribution (round 4b).

Answers WHY docstore_write scales at ~0.6 from 2->8 cores: per phase it
prints wall seconds, JVM GC time delta, GC count delta, and JVM process
CPU seconds delta. If CPU_total stays ~constant across core counts but
wall scales <1, the stage is stall-bound (memory/page faults); if CPU
inflates at 8 cores, the JVM is doing extra work (GC pressure,
contention). A/B knobs via env:

    PROF_HEAP=16g           -> SPARK_DRIVER_MEMORY
    PROF_SHUFFLE_CODEC=zstd -> spark.io.compression.codec
    PROF_GC="-XX:+UseParallelGC" -> spark.driver.extraJavaOptions
    PROF_CORPUS=/dev/shm/engine_bench_corpus_c160000_s42

Run pinned, away from the bench's CPUs (bench uses the TOP 8):

    taskset -c 8-9   python scripts/prof_docstore2.py local[2]
    taskset -c 8-15  python scripts/prof_docstore2.py local[8]
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from snowplow_elasticsearch_loader_spark.config import DEFAULT_CONFIG  # noqa: E402
from snowplow_elasticsearch_loader_spark.operators.docs import (  # noqa: E402
    assign_doc_ids,
    stage_validated,
)
from snowplow_elasticsearch_loader_spark.session import get_spark  # noqa: E402

BENCH_TMP = "/dev/shm"
CORPUS = os.environ.get(
    "PROF_CORPUS", os.path.join(BENCH_TMP, "engine_bench_corpus_c160000_s42")
)


def jvm_stats(spark):
    """(gc_ms_total, gc_count_total, process_cpu_sec) from the driver
    JVM (== the only executor in local mode)."""
    mf = spark._jvm.java.lang.management.ManagementFactory
    gc_ms = gc_n = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += b.getCollectionTime()
        gc_n += b.getCollectionCount()
    cpu = -1.0
    try:
        # utime+stime of the gateway JVM from /proc (the MXBean route
        # is blocked by the JDK module system under py4j reflection)
        jpid = int(
            spark._jvm.java.lang.ProcessHandle.current().pid()
        )
        with open(f"/proc/{jpid}/stat") as fh:
            parts = fh.read().rsplit(") ", 1)[1].split()
        cpu = (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except Exception:
        pass
    return gc_ms, gc_n, cpu


def main(master: str) -> None:
    cfg = DEFAULT_CONFIG
    if os.environ.get("PROF_HEAP"):
        os.environ["SPARK_DRIVER_MEMORY"] = os.environ["PROF_HEAP"]
    extra = {"spark.local.dir": os.path.join(BENCH_TMP, "spark-local-prof")}
    if os.environ.get("PROF_SHUFFLE_CODEC"):
        extra["spark.io.compression.codec"] = os.environ["PROF_SHUFFLE_CODEC"]
    if os.environ.get("PROF_GC"):
        extra["spark.driver.extraJavaOptions"] = os.environ["PROF_GC"]
    if os.environ.get("PROF_SHUFFLE_PARTS"):
        extra["spark.sql.shuffle.partitions"] = os.environ["PROF_SHUFFLE_PARTS"]
    spark = get_spark(master, app_name=f"prof-docstore2-{master}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "master": master,
        "heap": os.environ.get("PROF_HEAP", "8g"),
        "shuffle_codec": os.environ.get("PROF_SHUFFLE_CODEC", "lz4"),
        "gc_opt": os.environ.get("PROF_GC", ""),
    }
    work = tempfile.mkdtemp(prefix="prof-docstore2-", dir=BENCH_TMP)
    staging = os.path.join(work, "staging")
    tr = spark.read.parquet(CORPUS)

    # warmup: small full pipeline (JIT + python-worker fork)
    warm = stage_validated(tr.limit(40000), cfg)
    warm.write.mode("overwrite").parquet(os.path.join(work, "warm"))
    wst = spark.read.parquet(os.path.join(work, "warm"))
    assign_doc_ids(
        wst.filter(F.col("_error").isNull()).drop("_error"), dedup=True, n_rows=40000
    ).write.format("noop").mode("overwrite").save()

    def phase(name, fn):
        g0, n0, c0 = jvm_stats(spark)
        t0 = time.time()
        fn()
        wall = time.time() - t0
        g1, n1, c1 = jvm_stats(spark)
        out[name] = {
            "wall": round(wall, 2),
            "gc_sec": round((g1 - g0) / 1000.0, 2),
            "gc_n": n1 - n0,
            "cpu_sec": round(c1 - c0, 1) if c0 >= 0 else None,
        }

    phase("stage_w", lambda: stage_validated(tr, cfg).write.mode("overwrite").parquet(staging))
    st = spark.read.parquet(staging)
    n_staged = st.count()
    good = st.filter(F.col("_error").isNull()).drop("_error")

    holder = {}

    def run_ids():
        holder["with_ids"] = assign_doc_ids(good, dedup=True, n_rows=n_staged)

    phase("ids", run_ids)
    docs = holder["with_ids"].select(
        "doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "doclen",
        F.to_date(F.date_format("ts", cfg.shard_date_format)).alias("shard_date"),
    )
    for rep in ("full1", "full2"):
        phase(
            rep,
            lambda: docs.write.mode("overwrite").partitionBy("shard_date").parquet(
                os.path.join(work, "docs_full")
            ),
        )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "local[8]")
