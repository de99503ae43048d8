"""Focused scaling profiler for the two guilty build stages
(blocks_write anti-scaling, docstore_write flat — BENCH r02/r03).

Runs ONE stage in a fresh pinned JVM with the Spark event log on, then
parses the log for per-stage task counts, durations, spill and GC —
the evidence VERDICT r02 task #1 asks for.

Usage:
  python scripts/prof_blocks.py fixture          # build docs fixture once
  python scripts/prof_blocks.py child <cores> <shufpart> <stage>
  python scripts/prof_blocks.py matrix           # run the full matrix
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHM = "/dev/shm"
FIXTURE = os.path.join(SHM, "prof_docs_idx")
CORPUS = os.path.join(SHM, "engine_bench_corpus_c40000_s42")
CPU_BASE = 24

from snowplow_elasticsearch_loader_spark.config import EngineConfig, IndexConfig  # noqa: E402

CFG = EngineConfig(index=IndexConfig(block_size=128, docs_per_range=1 << 15, term_buckets=8))


def get_spark(cores, shufpart, tag):
    from snowplow_elasticsearch_loader_spark.session import get_spark as gs

    evdir = os.path.join(SHM, f"evlog-{tag}")
    os.makedirs(evdir, exist_ok=True)
    return gs(
        f"local[{cores}]",
        app_name=f"prof-{tag}",
        shuffle_partitions=shufpart,
        extra_conf={
            "spark.local.dir": os.path.join(SHM, "spark-local"),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            **json.loads(os.environ.get("PROF_EXTRA_CONF", "{}")),
        },
    ), evdir


def build_fixture():
    from snowplow_elasticsearch_loader_spark.index_store import build_index
    from snowplow_elasticsearch_loader_spark.session import get_spark as gs

    if os.path.exists(os.path.join(FIXTURE, "corpus")):
        print("fixture exists")
        return
    spark = gs("local[16]", app_name="prof-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    tr = spark.read.parquet(CORPUS)
    build_index(spark, tr, FIXTURE, CFG)
    spark.stop()
    print("fixture built")


def run_child(cores: int, shufpart: int, stage: str):
    import shutil

    from pyspark.sql import functions as F

    from snowplow_elasticsearch_loader_spark.index_store import InvertedIndex
    from snowplow_elasticsearch_loader_spark.operators import index_build
    from snowplow_elasticsearch_loader_spark.operators.docs import assign_doc_ids, stage_validated

    tag = f"{stage}-c{cores}-p{shufpart}"
    spark, evdir = get_spark(cores, shufpart, tag)
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix=f"prof-out-", dir=SHM)
    idx = InvertedIndex(spark, FIXTURE, CFG)
    # small warmup of the same code path (JIT)
    n_docs, avgdl = idx.corpus()
    warm = idx.documents.limit(20000)
    index_build.build_blocks_df(warm, avgdl, CFG).write.mode("overwrite").parquet(out + "/warm")
    t0 = time.time()
    if stage == "blocks":
        index_build.build_blocks_df(idx.documents, avgdl, CFG).write.mode(
            "overwrite"
        ).partitionBy("term_bucket", "range_id").parquet(out + "/blocks")
    elif stage == "blocksflat":  # no partitionBy: isolates commit/sort cost
        index_build.build_blocks_df(idx.documents, avgdl, CFG).write.mode(
            "overwrite"
        ).parquet(out + "/blocksflat")
    elif stage == "docstore":
        from snowplow_elasticsearch_loader_spark.config import DEFAULT_CONFIG

        st = spark.read.parquet(CORPUS)
        sv = stage_validated(st, CFG)
        good = sv.filter(F.col("_error").isNull()).drop("_error")
        with_ids = assign_doc_ids(good, dedup=True, n_rows=1438459)
        docs = with_ids.select(
            "doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "doclen",
            F.to_date(F.date_format("ts", CFG.shard_date_format)).alias("shard_date"),
        )
        docs.write.mode("overwrite").partitionBy("shard_date").parquet(out + "/documents")
    elif stage == "docstoreflat":  # no partitionBy
        st = spark.read.parquet(CORPUS)
        sv = stage_validated(st, CFG)
        good = sv.filter(F.col("_error").isNull()).drop("_error")
        with_ids = assign_doc_ids(good, dedup=True, n_rows=1438459)
        docs = with_ids.select(
            "doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "doclen",
        )
        docs.write.mode("overwrite").parquet(out + "/documents")
    dt = time.time() - t0
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"sec": round(dt, 1), "evdir": evdir}))


def parse_evlog(evdir: str) -> list[dict]:
    """Aggregate per-Spark-stage: tasks, total/max task time, spill, gc."""
    stages: dict[tuple, dict] = {}
    for f in glob.glob(os.path.join(evdir, "*")):
        if os.path.isdir(f):
            continue
        for line in open(f, errors="replace"):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                s = stages.setdefault(sid, {"tasks": 0, "task_sec": 0.0, "max_task_sec": 0.0,
                                            "gc_sec": 0.0, "spill_mb": 0.0, "shuffle_read_mb": 0.0,
                                            "shuffle_write_mb": 0.0, "input_mb": 0.0})
                rt = (m.get("Executor Run Time") or 0) / 1e3
                s["tasks"] += 1
                s["task_sec"] += rt
                s["max_task_sec"] = max(s["max_task_sec"], rt)
                s["gc_sec"] += (m.get("JVM GC Time") or 0) / 1e3
                s["spill_mb"] += ((m.get("Memory Bytes Spilled") or 0) + 0.0) / 1e6
                sr = m.get("Shuffle Read Metrics") or {}
                s["shuffle_read_mb"] += ((sr.get("Local Bytes Read") or 0) + (sr.get("Remote Bytes Read") or 0)) / 1e6
                sw = m.get("Shuffle Write Metrics") or {}
                s["shuffle_write_mb"] += (sw.get("Shuffle Bytes Written") or 0) / 1e6
                im = m.get("Input Metrics") or {}
                s["input_mb"] += (im.get("Bytes Read") or 0) / 1e6
            elif ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages.setdefault(si["Stage ID"], {}).update(
                    {"name": si.get("Stage Name", "")[:40],
                     "wall_sec": round(((si.get("Completion Time") or 0) - (si.get("Submission Time") or 0)) / 1e3, 1)}
                )
    out = []
    for sid in sorted(stages):
        s = stages[sid]
        if s.get("tasks", 0) == 0:
            continue
        out.append({"stage": sid, "name": s.get("name", ""), "wall": s.get("wall_sec", 0),
                    "tasks": s["tasks"], "sum_task": round(s["task_sec"], 1),
                    "max_task": round(s["max_task_sec"], 1), "gc": round(s["gc_sec"], 1),
                    "spill_mb": round(s["spill_mb"]), "shuf_r_mb": round(s["shuffle_read_mb"]),
                    "shuf_w_mb": round(s["shuffle_write_mb"]), "in_mb": round(s["input_mb"])})
    return out


def pinned(cores: int, shufpart: int, stage: str) -> dict:
    import shutil

    tag = f"{stage}-c{cores}-p{shufpart}"
    evdir = os.path.join(SHM, f"evlog-{tag}")
    shutil.rmtree(evdir, ignore_errors=True)
    cpus = f"{CPU_BASE}-{CPU_BASE + cores - 1}"
    cmd = ["taskset", "-c", cpus, sys.executable, os.path.abspath(__file__),
           "child", str(cores), str(shufpart), stage]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    d["cores"], d["shufpart"], d["stage"] = cores, shufpart, stage
    d["spark_stages"] = parse_evlog(evdir)
    return d


def matrix():
    runs = []
    for stage, shufpart, cores in [
        ("blocks", 8, 2), ("blocks", 8, 8),
        ("blocks", 64, 2), ("blocks", 64, 8),
        ("docstore", 8, 2), ("docstore", 8, 8),
    ]:
        d = pinned(cores, shufpart, stage)
        runs.append(d)
        print(f"== {stage} cores={cores} shufpart={shufpart}: {d['sec']}s", flush=True)
        for s in d["spark_stages"]:
            print("   ", json.dumps(s), flush=True)
    with open(os.path.join(REPO, "scripts", "prof_matrix.json"), "w") as fh:
        json.dump(runs, fh, indent=1)


if __name__ == "__main__":
    if sys.argv[1] == "fixture":
        build_fixture()
    elif sys.argv[1] == "child":
        run_child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    elif sys.argv[1] == "matrix":
        matrix()
