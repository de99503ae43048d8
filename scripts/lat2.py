import sys, time, statistics
sys.path.insert(0, "/root/repo")
from snowplow_elasticsearch_loader_spark.session import get_spark
from snowplow_elasticsearch_loader_spark.index_store import InvertedIndex
from snowplow_elasticsearch_loader_spark.operators.query_engine import QueryEngine
from snowplow_elasticsearch_loader_spark.operators.bm25 import analyze_queries
from snowplow_elasticsearch_loader_spark.queryset import REFERENCE_QUERIES
from snowplow_elasticsearch_loader_spark.config import EngineConfig, IndexConfig
from pyspark.sql import functions as F
CFG = EngineConfig(index=IndexConfig(block_size=128, docs_per_range=1 << 15, term_buckets=8))
spark = get_spark("local[32]", app_name="lat2")
spark.sparkContext.setLogLevel("ERROR")
idx = InvertedIndex(spark, "/dev/shm/prof_docs_idx", CFG)
engine = QueryEngine(idx, CFG, warm=True, cache_blocks=True)
engine.search(REFERENCE_QUERIES[:1], k=10).collect()
q = REFERENCE_QUERIES[3]
terms = sorted({t for _, t, _ in analyze_queries([q])})
tmap = engine._lookup(terms)
buckets = sorted({tmap[t][1] for t in terms if t in tmap})
sc = engine.blocks.filter(F.col("term_bucket").isin(buckets)).filter(F.col("term").isin(terms))
for tag, fn in [
    ("scan+filter count", lambda: sc.count()),
    ("scan+filter collect few cols", lambda: sc.select("term","range_id","doc_count").collect()),
    ("full search", lambda: engine.search([q], k=10).collect()),
]:
    ts = []
    for _ in range(5):
        t0=time.time(); fn(); ts.append((time.time()-t0)*1000)
    print(f"{tag}: med={statistics.median(ts):.0f}ms {sorted(round(x) for x in ts)}")
print("n cand blocks:", sc.count(), "terms:", terms)
spark.stop()
