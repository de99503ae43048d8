"""Physical inverted-index construction: SPIMI build into delta-gap +
varint posting blocks with per-block max-score metadata (SURVEY M2,
north_star).

Reference parity map:
- the ES bulk-index write path (core/ElasticsearchSink.scala:72-107)
  becomes ``applyInPandas`` groups emitting compressed block rows, then
  a partitioned parquet/Iceberg write;
- the 10MB/1s batch-up flush (core/Processing.scala:80,274-298) becomes
  the SPIMI run cap ``max_run_postings`` — a group's postings are
  sorted in memory-bounded runs, then k-way merged;
- date-sharded index routing (core/Processing.scala:162-171) becomes
  the on-disk partition columns ``(term_bucket, range_id)`` that the
  query side prunes on.

Skew strategy (north_rule: "partitioning / shuffle / skew handled
explicitly"): every posting gets ``range_id = doc_id // docs_per_range``
— a Lucene-segment-style doc-range split. The build group key is
``(term_bucket, range_id)``, so a hot term occurring in 50% of all
docs contributes at most ``docs_per_range`` postings to any one group:
group size is bounded by construction, independently of term skew, and
— because the key derives from doc_id, not from partition placement —
the produced blocks are byte-identical at any parallelism level
(local[8] vs local[32] index-equality test).

A term's global posting order is recovered without any further shuffle:
ranges are disjoint, ordered doc-id intervals, so
``block_id = range_id * max_blocks_per_range + local_block`` is
monotone in doc_id across the whole term.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import codec
from ..functions.analyze import tokens_col

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("term_bucket", T.IntegerType()),
        T.StructField("range_id", T.LongType()),
        T.StructField("block_id", T.LongType()),
        T.StructField("doc_count", T.IntegerType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("last_doc", T.LongType()),
        T.StructField("max_score_partial", T.DoubleType()),
        # avgdl-independent block-max stats: the query-time upper bound
        # is computed from (max_tf, min_dl) with the CURRENT corpus
        # avgdl, so streamed/merged blocks never carry a stale bound
        # (partial score is increasing in tf, decreasing in dl, hence
        # partial(max_tf, min_dl) >= max over the block for any avgdl).
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("min_dl", T.IntegerType()),
        T.StructField("docs_varint", T.BinaryType()),
        T.StructField("tfs_varint", T.BinaryType()),
        T.StructField("dls_varint", T.BinaryType()),
    ]
)


def term_bucket_col(term, buckets: int):
    """Deterministic on-disk bucket for a term (query-side pruning)."""
    c = F.col(term) if isinstance(term, str) else term
    return F.pmod(F.crc32(c.cast("binary")), F.lit(buckets)).cast("int")


def postings_with_doclen(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf, doclen) in ONE shuffle: doclen rides along the
    explode so no big-big join against docstats is needed. A stored
    doclen column (from the staged doc store) is reused instead of
    re-counting tokens."""
    if "doclen" in docs.columns:
        tok = docs.select("doc_id", "doclen", tokens_col("text").alias("tokens"))
    else:
        tok = docs.select(
            "doc_id", tokens_col("text").alias("tokens")
        ).withColumn("doclen", F.size("tokens"))
    return (
        tok.select("doc_id", "doclen", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"), F.first("doclen").alias("doclen"))
    )


def _sort_runs(pdf: pd.DataFrame, cap: int) -> list[dict[str, np.ndarray]]:
    """SPIMI phase 1: memory-capped sorted runs (flush analog of the
    reference's maxBytes batch-up, core/Processing.scala:274-298)."""
    runs = []
    for start in range(0, len(pdf), cap):
        chunk = pdf.iloc[start : start + cap]
        order = np.lexsort((chunk["doc_id"].to_numpy(), chunk["term"].to_numpy()))
        runs.append(
            {
                "term": chunk["term"].to_numpy()[order],
                "doc_id": chunk["doc_id"].to_numpy(np.int64)[order],
                "tf": chunk["tf"].to_numpy(np.int64)[order],
                "doclen": chunk["doclen"].to_numpy(np.int64)[order],
            }
        )
    return runs


def _merge_runs(runs: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    """SPIMI phase 2: k-way merge of sorted runs (vectorized: the merge
    of k sorted runs is realized as one lexsort over their
    concatenation — same output order as a heap merge, no per-row
    Python)."""
    if len(runs) == 1:
        return runs[0]
    cat = {k: np.concatenate([r[k] for r in runs]) for k in runs[0]}
    order = np.lexsort((cat["doc_id"], cat["term"]))
    return {k: v[order] for k, v in cat.items()}


def make_block_builder(cfg: EngineConfig, avgdl: float):
    k1, b = cfg.bm25.k1, cfg.bm25.b
    block_size = cfg.index.block_size
    max_blocks_per_range = cfg.index.docs_per_range  # safe upper bound

    def build_blocks(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term_bucket, range_id = int(key[0]), int(key[1])
        if len(pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in BLOCKS_SCHEMA.fields])
        if "tf" not in pdf.columns:
            # raw token instances (one row per occurrence): tf is
            # aggregated here after the merge sort, saving the upstream
            # (term, doc_id) pre-aggregation exchange entirely
            pdf = pdf.assign(tf=np.ones(len(pdf), dtype=np.int64))
        merged = _merge_runs(_sort_runs(pdf, cfg.index.max_run_postings))
        terms = merged["term"]
        doc = merged["doc_id"].astype(np.uint64)
        tf = merged["tf"].astype(np.uint64)
        dl = merged["doclen"].astype(np.uint64)
        n = len(terms)
        # collapse duplicate (term, doc) runs -> summed tf
        if n > 1:
            same = (terms[1:] == terms[:-1]) & (doc[1:] == doc[:-1])
            if same.any():
                starts = np.flatnonzero(np.concatenate(([True], ~same)))
                tf = np.add.reduceat(tf, starts)
                terms, doc, dl = terms[starts], doc[starts], dl[starts]
                n = len(terms)

        # per-term segmentation (sorted, so boundaries are != shifts)
        new_term = np.concatenate(([True], terms[1:] != terms[:-1]))
        term_start = np.flatnonzero(new_term)
        seg_len = np.diff(np.concatenate((term_start, [n])))
        rank_in_term = np.arange(n) - np.repeat(term_start, seg_len)
        local_block = rank_in_term // block_size
        is_block_start = new_term | (rank_in_term % block_size == 0)
        bstart = np.flatnonzero(is_block_start)
        bend = np.concatenate((bstart[1:], [n]))

        # delta-gap with per-block restart, whole-column varint encode,
        # then slice the byte stream at block boundaries (vectorized)
        gaps = doc.copy()
        gaps[1:] -= doc[:-1]
        gaps[bstart] = doc[bstart]
        doc_bytes, doc_lens = codec.varint_encode(gaps), _varint_lens(gaps)
        tf_bytes, tf_lens = codec.varint_encode(tf), _varint_lens(tf)
        dl_bytes, dl_lens = codec.varint_encode(dl), _varint_lens(dl)
        doc_off = np.concatenate(([0], np.cumsum(doc_lens)))
        tf_off = np.concatenate(([0], np.cumsum(tf_lens)))
        dl_off = np.concatenate(([0], np.cumsum(dl_lens)))

        # per-block max partial score (tf*(k1+1))/(tf + k1*(1-b+b*dl/avgdl))
        tfd = tf.astype(np.float64)
        partial = (tfd * (k1 + 1.0)) / (
            tfd + k1 * ((1.0 - b) + b * dl.astype(np.float64) / avgdl)
        )
        max_partial = np.maximum.reduceat(partial, bstart)
        max_tf_b = np.maximum.reduceat(tf, bstart).astype(np.int64)
        min_dl_b = np.minimum.reduceat(dl, bstart).astype(np.int64)

        out = pd.DataFrame(
            {
                "term": terms[bstart],
                "term_bucket": np.full(bstart.size, term_bucket, dtype=np.int32),
                "range_id": np.full(bstart.size, range_id, dtype=np.int64),
                "block_id": range_id * max_blocks_per_range
                + local_block[bstart].astype(np.int64),
                "doc_count": (bend - bstart).astype(np.int32),
                "first_doc": doc[bstart].astype(np.int64),
                "last_doc": doc[bend - 1].astype(np.int64),
                "max_score_partial": max_partial,
                "max_tf": max_tf_b.astype(np.int32),
                "min_dl": min_dl_b.astype(np.int32),
                "docs_varint": [
                    doc_bytes[doc_off[s] : doc_off[e]] for s, e in zip(bstart, bend)
                ],
                "tfs_varint": [
                    tf_bytes[tf_off[s] : tf_off[e]] for s, e in zip(bstart, bend)
                ],
                "dls_varint": [
                    dl_bytes[dl_off[s] : dl_off[e]] for s, e in zip(bstart, bend)
                ],
            }
        )
        return out

    return build_blocks


def _varint_lens(v: np.ndarray) -> np.ndarray:
    lens = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        lens += tmp > 0
        tmp >>= np.uint64(7)
    return lens


def build_blocks_df(
    docs: DataFrame, avgdl: float, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """docs (with doc_id, text) -> compressed posting blocks DataFrame.

    ONE shuffle: raw token instances go straight to their
    (term_bucket, range_id) group (keys derive from term/doc_id, so
    the grouping is deterministic); tf aggregation happens inside the
    block builder after the SPIMI merge sort. A relational
    groupBy(term, doc_id) pre-agg would add a full exchange to save
    only ~10% of shuffle rows (avg tf is close to 1 in natural text).
    """
    if "doclen" in docs.columns:
        tok = docs.select("doc_id", "doclen", tokens_col("text").alias("tokens"))
    else:
        tok = docs.select("doc_id", tokens_col("text").alias("tokens")).withColumn(
            "doclen", F.size("tokens")
        )
    exploded = tok.select("doc_id", "doclen", F.explode("tokens").alias("term"))
    keyed = exploded.withColumn(
        "term_bucket", term_bucket_col("term", cfg.index.term_buckets)
    ).withColumn(
        "range_id", (F.col("doc_id") / F.lit(cfg.index.docs_per_range)).cast("long")
    )
    return keyed.groupBy("term_bucket", "range_id").applyInPandas(
        make_block_builder(cfg, avgdl), schema=BLOCKS_SCHEMA
    )


def rebuild_blocks_from_postings(
    postings: DataFrame, avgdl: float, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(term, doc_id, tf, doclen) -> compressed blocks under cfg's
    layout. Used by segment compaction: decoded postings of many small
    doc ranges (streamed micro-batch segments) are re-grouped under a
    larger ``docs_per_range`` and k-way merged back into full blocks —
    the Lucene segment-merge analog."""
    keyed = postings.withColumn(
        "term_bucket", term_bucket_col("term", cfg.index.term_buckets)
    ).withColumn(
        "range_id", (F.col("doc_id") / F.lit(cfg.index.docs_per_range)).cast("long")
    )
    return keyed.groupBy("term_bucket", "range_id").applyInPandas(
        make_block_builder(cfg, avgdl), schema=BLOCKS_SCHEMA
    )


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Inverse mapping: blocks -> (term, doc_id, tf, doclen) postings.
    The M2 invariant: this must equal the M1 relational postings."""
    out_schema = T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("tf", T.IntegerType()),
            T.StructField("doclen", T.IntegerType()),
        ]
    )

    def decode(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            terms, ids, tfs, dls = [], [], [], []
            for term, db, tb, lb in zip(
                pdf["term"], pdf["docs_varint"], pdf["tfs_varint"], pdf["dls_varint"]
            ):
                d, t, l = codec.decode_block(bytes(db), bytes(tb), bytes(lb))
                ids.append(d)
                tfs.append(t)
                dls.append(l)
                terms.append(np.repeat(term, d.size))
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(ids).astype(np.int64),
                    "tf": np.concatenate(tfs).astype(np.int32),
                    "doclen": np.concatenate(dls).astype(np.int32),
                }
            )

    return blocks.mapInPandas(decode, schema=out_schema)


def termdict_from_blocks(blocks: DataFrame) -> DataFrame:
    """(term, term_bucket, df, block_count, max_block_score_partial)."""
    return blocks.groupBy("term").agg(
        F.first("term_bucket").alias("term_bucket"),
        F.sum("doc_count").alias("df"),
        F.count(F.lit(1)).alias("block_count"),
        F.max("max_score_partial").alias("max_score_partial"),
    )
