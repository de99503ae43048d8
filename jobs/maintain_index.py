"""spark-submit entrypoint: index maintenance (the ES _delete_by_query
/ _update_by_query / _forcemerge surface).

    spark-submit --py-files <engine.zip> jobs/maintain_index.py \
        --index /path/to/index delete --terms dup slow
    spark-submit ... jobs/maintain_index.py \
        --index /path/to/index update --terms dup --append-text " upd"
    spark-submit ... jobs/maintain_index.py \
        --index /path/to/index compact [--gc-grace-sec 300]

Or plain ``python jobs/maintain_index.py ...`` (self-ships via
addPyFile). ``update`` requires a streamed index (batch_seg layout);
``compact`` is the merge that expunges tombstones — run it before
re-opening a serving QueryEngine.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snowplow_elasticsearch_loader_spark.config import DEFAULT_CONFIG, EngineConfig
from snowplow_elasticsearch_loader_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--config")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="op", required=True)
    d = sub.add_parser("delete")
    d.add_argument("--terms", nargs="+", required=True)
    u = sub.add_parser("update")
    u.add_argument("--terms", nargs="+", required=True)
    u.add_argument(
        "--append-text",
        required=True,
        help="suffix appended to each matching doc's text (the script analog)",
    )
    c = sub.add_parser("compact")
    c.add_argument("--gc-grace-sec", type=float, default=300.0)
    args = ap.parse_args()

    cfg = EngineConfig.from_json(args.config) if args.config else DEFAULT_CONFIG
    spark = get_spark(args.master, app_name=f"maintain-index-{args.op}")
    spark.sparkContext.setLogLevel("WARN")
    from snowplow_elasticsearch_loader_spark.index_store import (
        InvertedIndex,
        compact_index,
        delete_by_query,
    )

    idx = InvertedIndex(spark, args.index, cfg)
    t0 = time.time()
    if args.op == "delete":
        n = delete_by_query(idx, args.terms)
        out = {"op": "delete_by_query", "docs_deleted": n}
    elif args.op == "update":
        from pyspark.sql import functions as F

        from snowplow_elasticsearch_loader_spark.streaming.stream_build import (
            update_by_query,
        )

        n = update_by_query(
            spark,
            args.index,
            args.terms,
            lambda col: F.concat(col, F.lit(args.append_text)),
            cfg,
        )
        out = {"op": "update_by_query", "docs_updated": n}
    else:
        idx2 = compact_index(idx, gc_grace_sec=args.gc_grace_sec)
        n_docs, avgdl = idx2.corpus()
        out = {"op": "compact", "n_docs": n_docs, "avgdl": round(avgdl, 3)}
    out["sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
