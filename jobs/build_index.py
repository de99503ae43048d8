"""spark-submit entrypoint: build the inverted index.

    spark-submit --py-files <engine.zip> jobs/build_index.py \
        --input /path/to/transcripts_parquet --output /path/to/index \
        [--config cfg.json] [--ranges-per-batch N] [--master local[32]]

Or plain ``python jobs/build_index.py ...`` (the engine self-ships via
addPyFile). ``--synth N`` substitutes a deterministic synthetic corpus
of N conversations for --input (sandbox benches; no external data).
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
    ap.add_argument("--input")
    ap.add_argument("--synth", type=int, help="synthesize N conversations instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--config")
    ap.add_argument("--ranges-per-batch", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if not args.input and not args.synth:
        ap.error("one of --input / --synth is required")

    cfg = EngineConfig.from_json(args.config) if args.config else DEFAULT_CONFIG
    spark = get_spark(args.master, app_name="build-index")
    spark.sparkContext.setLogLevel("WARN")

    from snowplow_elasticsearch_loader_spark.index_store import (
        build_blocks_only,
        build_index,
    )
    from snowplow_elasticsearch_loader_spark.sources.transcripts import synth_transcripts

    if args.synth:
        tr = synth_transcripts(spark, n_convs=args.synth, fast=args.synth > 2000)
    else:
        tr = spark.read.parquet(args.input)

    t0 = time.time()
    # Route on input shape: the full pipeline (keying, dedup, badrows,
    # checkpoints) is for transcript tables; a table that already
    # carries (doc_id, text) — e.g. a prepared documents corpus — goes
    # through the doc-store-native build.
    if "conv_id" in tr.columns and "turn_idx" in tr.columns:
        idx = build_index(spark, tr, args.output, cfg, ranges_per_batch=args.ranges_per_batch)
    elif "doc_id" in tr.columns and "text" in tr.columns:
        idx = build_blocks_only(spark, tr, args.output, cfg)
    else:
        raise SystemExit(
            "input must be a transcripts table (conv_id, turn_idx, text, ...) "
            f"or a documents table (doc_id, text, ...); got columns {tr.columns}"
        )
    dt = time.time() - t0
    n = idx.documents.count()
    print(json.dumps({"turns": n, "build_sec": round(dt, 1), "turns_per_sec": round(n / dt, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
