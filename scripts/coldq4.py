import sys, time, os
sys.path.insert(0, "/root/repo")
from snowplow_elasticsearch_loader_spark.session import get_spark
from snowplow_elasticsearch_loader_spark import contract
from snowplow_elasticsearch_loader_spark.operators import postings as P, bm25
from snowplow_elasticsearch_loader_spark.queryset import REFERENCE_QUERIES
from pyspark.sql import functions as F
import shutil
evdir = "/dev/shm/evlog-coldq"; shutil.rmtree(evdir, ignore_errors=True); os.makedirs(evdir)
spark = get_spark("local[32]", app_name="coldq4", extra_conf={
    "spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir})
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
docs = contract._docs(spark, sf)
posts = P.build_postings(docs)
ds = P.doc_stats(docs)
ts = P.term_stats(posts)
row = ds.agg(F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("s")).collect()[0]
tdf = bm25.collect_query_term_stats(ts, REFERENCE_QUERIES)
n_docs, avgdl = int(row["n"]), float(row["s"])/int(row["n"])
qterms = bm25.query_term_weights(spark, REFERENCE_QUERIES, tdf, n_docs)
t0=time.time()
out = bm25.topk(bm25.score_candidates(posts, ds, qterms, avgdl, contract.CFG), 10)
print(out._jdf.queryExecution().executedPlan().toString()[:200])
out.write.format("noop").mode("overwrite").save()
print(f"main job: {time.time()-t0:.1f}s", flush=True)
spark.stop()
