"""Docstore-stage sub-phase profiler (round 4).

Isolates where docstore_write loses scaling: compute (bucket+shuffle+
sort+window) vs parquet write vs partitioned-commit, at one pinned
core count. Run via:

    taskset -c 24-25 python scripts/prof_docstore.py local[2]
    taskset -c 24-31 python scripts/prof_docstore.py local[8]

Phases (each over the same staged corpus on tmpfs):
  stage_w   tokenize+validate -> staging parquet write
  ids       bucket counts job (the id_offsets analog)
  compute   full assign-ids pipeline -> noop sink (no parquet write)
  full      full assign-ids pipeline -> partitioned parquet write
  rawcopy   staging -> partitioned parquet write, NO sort/window
Write cost ~= full - compute; sort cost ~= compute - (scan cost);
commit/fanout cost ~= rawcopy - plain columnar copy.
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
    "PROF_CORPUS", os.path.join(BENCH_TMP, "engine_bench_corpus_c40000_s42")
)


def main(master: str) -> None:
    cfg = DEFAULT_CONFIG
    spark = get_spark(
        master,
        app_name=f"prof-docstore-{master}",
        extra_conf={"spark.local.dir": os.path.join(BENCH_TMP, "spark-local")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {"master": master}
    work = tempfile.mkdtemp(prefix="prof-docstore-", dir=BENCH_TMP)
    staging = os.path.join(work, "staging")
    tr = spark.read.parquet(CORPUS)

    # warmup: small pass to fault in python workers / JIT
    stage_validated(tr.limit(20000), cfg).write.mode("overwrite").parquet(
        os.path.join(work, "warm")
    )

    t0 = time.time()
    stage_validated(tr, cfg).write.mode("overwrite").parquet(staging)
    out["stage_w"] = round(time.time() - t0, 2)

    st = spark.read.parquet(staging)
    good = st.filter(F.col("_error").isNull()).drop("_error")

    t0 = time.time()
    with_ids = assign_doc_ids(good, dedup=True, n_rows=st.count())
    out["ids"] = round(time.time() - t0, 2)

    docs = with_ids.select(
        "doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "doclen",
        F.to_date(F.date_format("ts", cfg.shard_date_format)).alias("shard_date"),
    )
    t0 = time.time()
    docs.write.format("noop").mode("overwrite").save()
    out["compute"] = round(time.time() - t0, 2)

    t0 = time.time()
    docs.write.mode("overwrite").partitionBy("shard_date").parquet(
        os.path.join(work, "docs_full")
    )
    out["full"] = round(time.time() - t0, 2)

    raw = st.withColumn(
        "shard_date", F.to_date(F.date_format("ts", cfg.shard_date_format))
    )
    t0 = time.time()
    raw.write.mode("overwrite").partitionBy("shard_date").parquet(
        os.path.join(work, "docs_raw")
    )
    out["rawcopy"] = round(time.time() - t0, 2)

    t0 = time.time()
    st.write.mode("overwrite").parquet(os.path.join(work, "docs_plain"))
    out["plaincopy"] = round(time.time() - t0, 2)

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "local[8]")
