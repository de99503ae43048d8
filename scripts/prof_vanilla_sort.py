"""Vanilla-Spark sort scaling experiment (no engine code anywhere).

Generates a synthetic corpus-shaped table IN the JVM (range + md5
strings — ~the doc-store row mix), then times:
  hashagg   explode-free groupBy-count (the current control's shape)
  sort      repartition(32, key) + sortWithinPartitions + noop
  window    the same + a lag/sum window (the doc-store shape)

    taskset -c 24-25 python scripts/prof_vanilla_sort.py local[2]
    taskset -c 24-31 python scripts/prof_vanilla_sort.py local[8]

If `sort`/`window` anti-scale here too, the effect is the host's JVM
sort/memory path, not the engine — and the bench control must include
a sort phase to calibrate the ceiling honestly.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from snowplow_elasticsearch_loader_spark.session import get_spark  # noqa: E402

N = int(os.environ.get("PROF_N", "3000000"))


def main(master: str) -> None:
    spark = get_spark(
        master,
        app_name=f"prof-vanilla-{master}",
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"master": master, "n": N}

    df = (
        spark.range(0, N, 1, 64)
        .withColumn("key", F.md5(F.col("id").cast("string")))
        .withColumn(
            "text",
            F.concat(*[F.md5((F.col("id") + i).cast("string")) for i in range(8)]),
        )
    ).persist()
    df.count()  # materialize once, outside every timer

    t0 = time.time()
    df.groupBy("key").count().write.format("noop").mode("overwrite").save()
    out["hashagg"] = round(time.time() - t0, 2)

    shuffled = df.repartition(32, F.col("key"))
    t0 = time.time()
    shuffled.sortWithinPartitions("key").write.format("noop").mode("overwrite").save()
    out["sort"] = round(time.time() - t0, 2)

    w = Window.partitionBy(F.pmod(F.hash("key"), F.lit(32))).orderBy("key")
    t0 = time.time()
    (
        df.withColumn("_r", F.sum(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(F.col("_r") % 2 == 0)
        .write.format("noop").mode("overwrite").save()
    )
    out["window"] = round(time.time() - t0, 2)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "local[8]")
