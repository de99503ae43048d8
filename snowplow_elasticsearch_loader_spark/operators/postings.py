"""Inverted-index logical layer: postings + corpus statistics (SURVEY E2/E8).

The reference delegates inverted-index construction to Elasticsearch's
bulk endpoint (core/ElasticsearchSink.scala:90-97). Here it is a pure
relational plan, so Catalyst handles partial/final aggregation, AQE
coalescing, and column pruning:

    tokenize (JVM regexp)  ->  posexplode  ->  groupBy(term, doc_id)

Everything in this module is SQL-expressible and has a DuckDB oracle
twin in ``__spark_entry__.py``; the compressed physical index
(index_build.py) must decode back to exactly these postings — that is
the M2 invariant test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyze import tokens_col


def tokenized(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, tokens array, doclen). Stays inside whole-stage codegen."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(text_col).alias("tokens"),
    ).withColumn("doclen", F.size("tokens"))


def build_postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf) — term frequency postings.

    Map-side partial aggregation makes the shuffle carry (term, doc_id)
    partial counts, not raw token instances; hot-term skew at this
    stage is bounded because doc_id is part of the grouping key (a term
    occurring in 50% of docs still spreads over all doc_id hash
    partitions).
    """
    tok = tokenized(docs, id_col, text_col)
    return (
        tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, doclen) — BM25 length normalization input."""
    return tokenized(docs, id_col, text_col).select("doc_id", "doclen")


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df) — document frequency. Exact (not approx): df feeds the
    IDF that the rank-identity contract depends on."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(docstats: DataFrame) -> DataFrame:
    """Singleton (n_docs, avgdl)."""
    return docstats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
