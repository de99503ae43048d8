"""spark-submit entrypoint: queries over a built index.

    python jobs/query.py --index /path/to/index --query "error in tool call" \
        [--k 10] [--path naive|wand|phrase|match_all] [--master local[32]]

Paths mirror the delegated ES query surface (it/TestHelpers.scala:157-201):
``wand`` = block-max WAND top-k BM25 (warm engine), ``naive`` = the
relational twin, ``phrase`` = match_phrase over positional postings,
``match_all`` = match-all with a size cap (doc-id order).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snowplow_elasticsearch_loader_spark.config import DEFAULT_CONFIG
from snowplow_elasticsearch_loader_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True, action="append")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--path", choices=["naive", "wand", "phrase", "match_all"], default="wand"
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(args.master, app_name="bm25-query")
    spark.sparkContext.setLogLevel("WARN")
    from snowplow_elasticsearch_loader_spark.index_store import InvertedIndex
    from snowplow_elasticsearch_loader_spark.operators import bm25

    idx = InvertedIndex(spark, args.index, DEFAULT_CONFIG)
    queries = [(f"q{i}", q) for i, q in enumerate(args.query)]
    t0 = time.time()
    if args.path == "wand":
        from snowplow_elasticsearch_loader_spark.operators.query_engine import QueryEngine

        res = QueryEngine(idx, warm=True).search(queries, k=args.k)
    elif args.path == "phrase":
        from snowplow_elasticsearch_loader_spark.operators.query_engine import QueryEngine

        res = QueryEngine(idx, warm=True).search_phrase(queries, k=args.k)
    elif args.path == "match_all":
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        w = Window.orderBy(F.asc("doc_id"))
        res = (
            idx.documents.select("doc_id")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= args.k)
            .select(F.lit("match_all").alias("query_id"), "rank", "doc_id",
                    F.lit(1.0).alias("score"))
        )
    else:
        posts = idx.postings().select("term", "doc_id", "tf")
        from snowplow_elasticsearch_loader_spark.operators.postings import term_stats

        res = bm25.bm25_topk_naive(posts, idx.docstats, term_stats(posts), queries, k=args.k)
    rows = res.collect()
    dt = time.time() - t0
    out = [
        {"query_id": r["query_id"], "rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"]}
        for r in rows
    ]
    print(json.dumps({"latency_sec": round(dt, 3), "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
