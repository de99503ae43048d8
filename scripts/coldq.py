import sys, time
sys.path.insert(0, "/root/repo")
from snowplow_elasticsearch_loader_spark.session import get_spark
from snowplow_elasticsearch_loader_spark import contract
spark = get_spark("local[32]", app_name="coldq")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
t0=time.time(); contract._physical_index(spark, sf); print(f"prebuild: {time.time()-t0:.1f}s", flush=True)
for nm in ["q_postings_tf", "q_bm25_topk"]:
    t0 = time.time()
    contract.SPARK_QUERIES[nm](spark, sf).write.format("noop").mode("overwrite").save()
    print(f"{nm}: {time.time()-t0:.2f}s", flush=True)
spark.stop()
