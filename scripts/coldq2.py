import sys, time
sys.path.insert(0, "/root/repo")
from snowplow_elasticsearch_loader_spark.session import get_spark
from snowplow_elasticsearch_loader_spark import contract
from snowplow_elasticsearch_loader_spark.operators import postings as P, bm25
from snowplow_elasticsearch_loader_spark.queryset import REFERENCE_QUERIES
from pyspark.sql import functions as F
spark = get_spark("local[32]", app_name="coldq2")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
docs = contract._docs(spark, sf)
posts = P.build_postings(docs)
ds = P.doc_stats(docs)
ts = P.term_stats(posts)
t0=time.time()
row = ds.agg(F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("s")).collect()[0]
print(f"corpus agg: {time.time()-t0:.1f}s", flush=True)
t0=time.time()
tdf = bm25.collect_query_term_stats(ts, REFERENCE_QUERIES)
print(f"term stats collect: {time.time()-t0:.1f}s", flush=True)
n_docs, avgdl = int(row["n"]), float(row["s"])/int(row["n"])
qterms = bm25.query_term_weights(spark, REFERENCE_QUERIES, tdf, n_docs)
qterm_list = sorted({t for _, t, _ in bm25.analyze_queries(REFERENCE_QUERIES)})
posts_q = posts.filter(F.col("term").isin(qterm_list))
t0=time.time()
scored = bm25.score_candidates(posts_q, ds, qterms, avgdl, contract.CFG)
out = bm25.topk(scored, 10)
out.write.format("noop").mode("overwrite").save()
print(f"main job: {time.time()-t0:.1f}s", flush=True)
spark.stop()
