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
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..config import DEFAULT_CONFIG, EngineConfig
from ..index_store import InvertedIndex
from .bm25 import analyze_queries, idf as idf_fn
from .wand import RESULT_SCHEMA, WAND_INPUT_COLS, make_wand_evaluator


class QueryEngine:
    def __init__(self, idx: InvertedIndex, cfg: EngineConfig | None = None, warm: bool = True):
        self.idx = idx
        self.cfg = cfg or idx.cfg or DEFAULT_CONFIG
        self.n_docs, self.avgdl = idx.corpus()
        self.blocks = idx.blocks
        self._term_cache: dict[str, tuple[int, int]] | None = None
        if warm:
            rows = idx.termdict.select("term", "df", "term_bucket").collect()
            self._term_cache = {r["term"]: (int(r["df"]), int(r["term_bucket"])) for r in rows}

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
        job per call regardless of query count."""
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
        qterms = spark.createDataFrame(
            qterm_rows,
            schema=T.StructType(
                [
                    T.StructField("query_id", T.StringType()),
                    T.StructField("term", T.StringType()),
                    T.StructField("w", T.DoubleType()),
                ]
            ),
        )
        cand = (
            self.blocks.filter(F.col("term_bucket").isin(buckets))
            .filter(F.col("term").isin(sorted(tmap)))
            .select(*WAND_INPUT_COLS)
            .join(F.broadcast(qterms), "term")
        )
        per_range = cand.groupBy("query_id", "range_id").applyInPandas(
            make_wand_evaluator(
                k, self.cfg.bm25.k1, self.cfg.bm25.b, self.avgdl,
                quantize=self.cfg.bm25.quantize_doclen,
            ),
            schema=RESULT_SCHEMA,
        )
        ranked = per_range.select(
            "query_id", "doc_id", F.round(F.col("score"), 6).alias("score")
        ).withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
            ),
        )
        return ranked.filter(F.col("rank") <= k).select("query_id", "rank", "doc_id", "score")
