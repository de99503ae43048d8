import sys, time, statistics
sys.path.insert(0, "/root/repo")
from snowplow_elasticsearch_loader_spark.session import get_spark
from snowplow_elasticsearch_loader_spark.index_store import InvertedIndex
from snowplow_elasticsearch_loader_spark.operators.query_engine import QueryEngine
from snowplow_elasticsearch_loader_spark.queryset import REFERENCE_QUERIES
from snowplow_elasticsearch_loader_spark.config import EngineConfig, IndexConfig
CFG = EngineConfig(index=IndexConfig(block_size=128, docs_per_range=1 << 15, term_buckets=8))
spark = get_spark("local[32]", app_name="lat")
spark.sparkContext.setLogLevel("ERROR")
if len(sys.argv) > 1 and sys.argv[1] == "p1":
    pass  # engine sets it; we patch below
idx = InvertedIndex(spark, "/dev/shm/prof_docs_idx", CFG)
engine = QueryEngine(idx, CFG, warm=True, cache_blocks=True)
if len(sys.argv) > 1 and sys.argv[1] == "p1":
    spark.conf.set("spark.sql.shuffle.partitions", "1")
engine.search(REFERENCE_QUERIES[:1], k=10).collect()
lat = []
for rep in range(3):
    for q in REFERENCE_QUERIES:
        t0 = time.time(); engine.search([q], k=10).collect(); lat.append((time.time()-t0)*1000)
lat.sort()
print(f"p50={statistics.median(lat):.0f}ms p99={lat[int(len(lat)*0.99)-1]:.0f}ms n={len(lat)}")
spark.stop()
