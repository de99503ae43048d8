"""Decompose the assign-ids `compute` phase (scan -> bucket -> shuffle
-> sort -> window) at one pinned core count.

    taskset -c 24-25 python scripts/prof_idwindow.py local[2]
    taskset -c 24-31 python scripts/prof_idwindow.py local[8]

Phases over the same staged corpus (all -> noop sink):
  scan      staged parquet scan + _key + _bucket + _steer map only
  shuffle   + repartition(nb, _steer)
  sorted    + sortWithinPartitions(_key, ts, text)  (no window funcs)
  window    + the real lag/sum dedup-rank window (production shape)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from snowplow_elasticsearch_loader_spark.config import DEFAULT_CONFIG  # noqa: E402
from snowplow_elasticsearch_loader_spark.operators import docs as D  # noqa: E402
from snowplow_elasticsearch_loader_spark.session import get_spark  # noqa: E402

BENCH_TMP = "/dev/shm"
STAGING = os.environ.get("PROF_STAGING", "/dev/shm/prof-idwindow-staging")


def main(master: str) -> None:
    cfg = DEFAULT_CONFIG
    extra = {"spark.local.dir": os.path.join(BENCH_TMP, "spark-local")}
    jvm_opts = os.environ.get("PROF_JVM_OPTS")
    if jvm_opts:
        extra["spark.driver.extraJavaOptions"] = jvm_opts
    spark = get_spark(master, app_name=f"prof-idwindow-{master}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"master": master}

    if not os.path.exists(os.path.join(STAGING, "_SUCCESS")):
        corpus = os.environ.get(
            "PROF_CORPUS", "/dev/shm/engine_bench_corpus_c80000_s42"
        )
        tr = spark.read.parquet(corpus)
        D.stage_validated(tr, cfg).write.mode("overwrite").parquet(STAGING)

    st = spark.read.parquet(STAGING)
    good = st.filter(F.col("_error").isNull()).drop("_error")

    # warmup scan
    good.limit(50000).write.format("noop").mode("overwrite").save()

    df = good.withColumn("_key", D._rank_key_col())
    num_ranges = max(4 * spark.sparkContext.defaultParallelism, 32)
    cuts = D._footer_cuts(good, num_ranges)
    if cuts is None:
        raise SystemExit("no cuts (unexpected for staged corpus)")
    out["nb"] = len(cuts) + 1
    blit = F.array(*[F.lit(c) for c in cuts])
    bucketed = df.withColumn(
        "_bucket", F.size(F.filter(blit, lambda b: b <= F.col("_key")))
    )
    nb = len(cuts) + 1
    steer = D._steer_tokens(spark, nb)
    smap = F.create_map(
        *[x for b, t in enumerate(steer) for x in (F.lit(b), F.lit(t))]
    )
    mapped = bucketed.withColumn("_steer", smap[F.col("_bucket")])

    t0 = time.time()
    mapped.write.format("noop").mode("overwrite").save()
    out["scan"] = round(time.time() - t0, 2)

    shuffled = mapped.repartition(nb, F.col("_steer"))
    t0 = time.time()
    shuffled.write.format("noop").mode("overwrite").save()
    out["shuffle"] = round(time.time() - t0, 2)

    order = [F.asc("_key"), F.asc_nulls_last("ts"), F.asc_nulls_last("text")]
    t0 = time.time()
    shuffled.sortWithinPartitions(*order).write.format("noop").mode(
        "overwrite"
    ).save()
    out["sorted"] = round(time.time() - t0, 2)

    w = Window.partitionBy("_steer").orderBy(*order)
    first = F.lag("_key").over(w).isNull() | (F.lag("_key").over(w) != F.col("_key"))
    ranked = (
        shuffled.withColumn("_firsti", first.cast("int"))
        .withColumn(
            "_dr",
            F.sum("_firsti").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("_firsti") == 1)
    )
    t0 = time.time()
    ranked.write.format("noop").mode("overwrite").save()
    out["window"] = round(time.time() - t0, 2)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "local[8]")
