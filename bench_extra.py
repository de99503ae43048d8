"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§7.2).

NOT the driver's frozen bench.py — this is the round-6 optimization
instrument: times each headline query with the noop sink (median of N
reps), and writes ``.explain("formatted")`` for each query to
``plans/r06/<query>_<tag>.txt``.

Usage:
  python bench_extra.py [--tag before|after] [--reps 3] [--queries q1,q2]
  python bench_extra.py --plans-only --tag before
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q_postings_tf",
    "q_bm25_topk",
    "q_bm25_topk_wand",
    "q_minhash_lsh_pairs",
    "q_ngram_jaccard_pairs",
    "q_ann_cosine_topk",
    "q_text_quality",
    "q_lineitem_pricing",
    "q_top_customers",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    from snowplow_elasticsearch_loader_spark import contract
    from snowplow_elasticsearch_loader_spark.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name=f"bench-extra-{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")
    print("pre-building physical index (untimed) ...", file=sys.stderr)
    contract._physical_index(spark, SF_DIR)

    plan_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        fn = contract.SPARK_QUERIES[name]
        if not args.no_plans:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        if args.plans_only:
            continue
        runs = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            runs.append(round(dt, 3))
            print(f"{name} rep{rep + 1}/{args.reps}: {dt:.2f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
        results[name] = {"runs": runs, "median": round(statistics.median(runs), 3)}
    spark.stop()
    if not args.plans_only:
        total = round(sum(v["median"] for v in results.values()), 3)
        out = {"tag": args.tag, "sf_dir": SF_DIR, "total_median_sec": total, "queries": results}
        print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
