"""Warm query sessions: amortize per-query driver work.

The reference's query surface is a stateless HTTP ``_search`` against
an always-warm ES process; a cold Spark query pays per-job scheduling
instead. ``QueryEngine`` recovers most of that gap for repeated
queries:

- the term dictionary is collected ONCE into a driver-side dict
  (term -> (df, bucket)); term lookup becomes a hash probe instead of
  a Spark job. For dictionaries too large to collect (true web scale),
  ``warm=False`` keeps the per-query filtered lookup job;
- the blocks scan stays lazy/pruned per query (partition + predicate
  pushdown), so only ONE Spark job runs per query;
- many queries in one call share everything (the batch path the bench
  reports separately).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import DEFAULT_CONFIG, EngineConfig
from ..index_store import InvertedIndex
from .bm25 import analyze_queries, idf as idf_fn
from .wand import RESULT_SCHEMA, WAND_INPUT_COLS, make_wand_evaluator


class QueryEngine:
    def __init__(
        self,
        idx: InvertedIndex,
        cfg: EngineConfig | None = None,
        warm: bool = True,
        cache_blocks: bool = False,
    ):
        """``cache_blocks=True`` pins the posting blocks in executor
        memory (deserialized) — the analog of ES keeping hot segments
        in page cache. Right for a serving deployment whose index fits
        the cluster's storage memory; leave off for one-shot batch
        queries or when blocks >> memory (the scan is partition-pruned
        either way)."""
        self.idx = idx
        self.cfg = cfg or idx.cfg or DEFAULT_CONFIG
        self.n_docs, self.avgdl = idx.corpus()
        self.blocks = idx.blocks
        if cache_blocks:
            # serving mode: point-query latency is driver-round-trip
            # bound, so skip AQE's per-shuffle replan and keep the tiny
            # per-query shuffles narrow (session-level; a serving
            # session exists to run these queries)
            spark = idx.spark
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            self.blocks = self.blocks.cache()
        self._term_cache: dict[str, tuple[int, int]] | None = None
        if warm:
            rows = idx.termdict.select("term", "df", "term_bucket").collect()
            self._term_cache = {r["term"]: (int(r["df"]), int(r["term_bucket"])) for r in rows}
            if cache_blocks:
                self.blocks.count()  # materialize the cache up front

    def _lookup(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        if self._term_cache is not None:
            return {t: self._term_cache[t] for t in terms if t in self._term_cache}
        rows = (
            self.idx.termdict.filter(F.col("term").isin(terms))
            .select("term", "df", "term_bucket")
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["term_bucket"])) for r in rows}

    def search(self, queries: list[tuple[str, str]], k: int = 10) -> DataFrame:
        """(query_id, rank, doc_id, score) — block-max WAND, one Spark
        job per call regardless of query count.

        Query weights are inlined as a LITERAL term -> entries map
        rather than a broadcast-joined table: weights are driver-known
        (warm term cache), so a point query pays no createDataFrame
        round-trip and no broadcast-exchange stage — the latency path.
        The batch path (wand.wand_topk) keeps the broadcast join, which
        is the right shape when the query SET itself is large."""
        spark = self.idx.spark
        qrows = analyze_queries(queries)
        terms = sorted({t for _, t, _ in qrows})
        tmap = self._lookup(terms)
        qterm_rows = [
            (qid, t, float(qtf) * idf_fn(self.n_docs, tmap[t][0]))
            for qid, t, qtf in qrows
            if t in tmap
        ]
        buckets = sorted({tmap[t][1] for _, t, _ in qrows if t in tmap})
        if not qterm_rows:
            return spark.createDataFrame([], schema=RESULT_SCHEMA).select(
                "query_id", F.lit(1).alias("rank"), "doc_id", "score"
            ).limit(0)
        by_term: dict[str, list[tuple[str, float]]] = {}
        for qid, t, w in qterm_rows:
            by_term.setdefault(t, []).append((qid, w))
        map_args = []
        for t, entries in sorted(by_term.items()):
            map_args.append(F.lit(t))
            map_args.append(
                F.array(
                    *[
                        F.struct(F.lit(qid).alias("query_id"), F.lit(w).alias("w"))
                        for qid, w in entries
                    ]
                )
            )
        qmap = F.create_map(*map_args)
        cand = (
            self.blocks.filter(F.col("term_bucket").isin(buckets))
            .filter(F.col("term").isin(sorted(by_term)))
            .select(*WAND_INPUT_COLS)
            .withColumn("_q", F.explode(qmap[F.col("term")]))
            .select(
                *WAND_INPUT_COLS,
                F.col("_q.query_id").alias("query_id"),
                F.col("_q.w").alias("w"),
            )
        )
        per_range = cand.groupBy("query_id", "range_id").applyInPandas(
            make_wand_evaluator(
                k, self.cfg.bm25.k1, self.cfg.bm25.b, self.avgdl,
                quantize=self.cfg.bm25.quantize_doclen,
            ),
            schema=RESULT_SCHEMA,
        )
        scored = per_range.select(
            "query_id", "doc_id", F.round(F.col("score"), 6).alias("score")
        )
        ranked = scored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
            ),
        )
        return ranked.filter(F.col("rank") <= k).select("query_id", "rank", "doc_id", "score")

    def search_phrase(self, queries: list[tuple[str, str]], k: int = 10) -> DataFrame:
        """match_phrase over the positional index (same warm-session
        amortization; one Spark job per call)."""
        from .phrase import phrase_topk

        return phrase_topk(
            self.blocks, self.idx.termdict, (self.n_docs, self.avgdl), queries, k, self.cfg
        )
