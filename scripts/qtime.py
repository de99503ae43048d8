import sys, time
sys.path.insert(0, "/root/repo")
from snowplow_elasticsearch_loader_spark.session import get_spark
from snowplow_elasticsearch_loader_spark import contract as C
spark = get_spark("local[32]", app_name="qtime")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
names = sys.argv[1:] or ["q_bm25_topk"]
# warmup pass
for nm in names:
    C.SPARK_QUERIES[nm](spark, sf).write.format("noop").mode("overwrite").save()
for nm in names:
    t0 = time.time()
    C.SPARK_QUERIES[nm](spark, sf).write.format("noop").mode("overwrite").save()
    print(f"{nm}: {time.time()-t0:.2f}s")
spark.stop()
