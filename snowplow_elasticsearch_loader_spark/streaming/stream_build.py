"""Structured Streaming surface: incremental index maintenance.

The reference is a streaming sink (Kinesis -> ES,
core/Processing.scala:42-49) with NoWindowing and checkpoint-after-
durable-write acks. Our batch build already owns those semantics at the
partition level; this module is the streaming analog for incremental
refresh:

- ``incremental_index_build``: ``readStream`` over a transcripts
  directory, ``foreachBatch`` appends per-micro-batch posting blocks
  (doc ids continue from the persisted corpus state — the ack/token
  role is played by the streaming checkpoint + the _checkpoints rows),
  then a finalize pass rebuilds termdict/corpus. With
  ``Trigger.AvailableNow`` this is an incremental catch-up job; with a
  continuous trigger it is a live index maintainer.
- ``streaming_rollup``: watermarked windowed aggregation over event
  time (the loader's latency metrics analog, core/Metrics.scala:40-45).

Micro-batch appends reuse the SAME block builder as the batch path, so
streamed and batch-built indexes decode to identical postings when fed
identical doc-id assignments (asserted in tests).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..index_store import (
    CHECKPOINT_SCHEMA,
    METRICS_SCHEMA,
    InvertedIndex,
    _append,
    _done_partitions,
)
from ..operators import index_build
from ..operators.docs import assign_doc_ids, split_good_bad
from ..operators.postings import doc_stats
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def _next_doc_id(spark: SparkSession, path: str) -> int:
    try:
        row = (
            spark.read.parquet(os.path.join(path, "docstats"))
            .agg(F.max("doc_id").alias("m"))
            .collect()[0]
        )
        return int(row["m"]) + 1 if row["m"] is not None else 0
    except Exception:
        return 0


def incremental_index_build(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    available_now: bool = True,
):
    """Stream transcripts parquet dir -> incremental posting blocks.

    Doc ids are assigned per micro-batch, offset by the persisted max.
    ``foreachBatch`` is at-least-once, so every write in a batch must be
    replay-idempotent:

    - batch_ids already recorded ``done`` in ``_checkpoints`` are skipped
      outright (exactly-once effect for fully-committed batches);
    - every table this sink appends to (documents, _badrows, docstats)
      carries a ``batch_seg`` partition column and is written with
      dynamic partition OVERWRITE — a replay of a crashed-mid-batch
      attempt rewrites exactly its own partitions, never duplicating
      rows or colliding doc_ids (assign_doc_ids is deterministic, so the
      replay assigns the same ids);
    - posting blocks land in (term_bucket, range_id) partitions that are
      exclusive to the batch by construction (each batch starts at a
      fresh doc-range boundary), so dynamic overwrite is idempotent
      there too;
    - the ``_checkpoints`` row is appended LAST (checkpoint-after-
      durable-write, the reference's ack ordering,
      core/Processing.scala:80-84).

    Block max-score stats (max_tf, min_dl) are avgdl-independent, so
    blocks built while the corpus was still growing stay exact pruning
    bounds under the final avgdl — finalize only refreshes corpus stats
    and the term dictionary.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in _done_partitions(spark, index_dir, "stream_batch"):
            return  # replayed fully-committed batch: exactly-once effect
        good, bad = split_good_bad(batch_df, cfg)
        # each micro-batch starts at a fresh doc-range boundary so its
        # blocks land in exclusive (term_bucket, range_id) partitions —
        # no block_id collisions across batches (the streaming analog of
        # one ES index segment per flush)
        nxt = _next_doc_id(spark, index_dir)
        dpr = cfg.index.docs_per_range
        offset = ((nxt + dpr - 1) // dpr) * dpr if nxt else 0
        with_ids = assign_doc_ids(good, dedup=True)
        docs = with_ids.withColumn("doc_id", F.col("doc_id") + F.lit(offset))
        t0 = time.time()
        seg = F.lit(int(batch_id)).alias("batch_seg")
        docs_out = docs.select(
            "doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts",
            F.to_date(F.date_format("ts", cfg.shard_date_format)).alias("shard_date"),
            seg,
        )
        docs_out.write.mode("overwrite").partitionBy("batch_seg", "shard_date").parquet(
            os.path.join(index_dir, "documents")
        )
        bad.select("*", seg).write.mode("overwrite").partitionBy("batch_seg").parquet(
            os.path.join(index_dir, "_badrows")
        )
        docs_w = spark.read.parquet(os.path.join(index_dir, "documents")).filter(
            F.col("batch_seg") == int(batch_id)
        )
        doc_stats(docs_w).select("*", seg).write.mode("overwrite").partitionBy(
            "batch_seg"
        ).parquet(os.path.join(index_dir, "docstats"))
        ds = spark.read.parquet(os.path.join(index_dir, "docstats"))
        row = ds.agg(F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("s")).collect()[0]
        avgdl = float(row["s"]) / float(row["n"]) if row["n"] else 1.0
        index_build.build_blocks_df(docs_w, avgdl, cfg).write.mode("overwrite").partitionBy(
            "term_bucket", "range_id"
        ).parquet(os.path.join(index_dir, "blocks"))
        _append(
            spark,
            os.path.join(index_dir, "_checkpoints"),
            [("stream_batch", int(batch_id), "done", int(row["n"]), 0, 0, 0, t0, time.time(), "stream")],
            CHECKPOINT_SCHEMA,
        )
        # telemetry heartbeat (S22): liveness + progress side-stream,
        # one row per micro-batch (the reference's periodic heartbeat
        # analog — core/Telemetry-style side channel)
        _append(
            spark,
            os.path.join(index_dir, "_metrics"),
            [("heartbeat", int(batch_id), "stream", time.time())],
            METRICS_SCHEMA,
        )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        finalize_streamed_index(spark, index_dir, cfg)
        return q
    return writer.start()


def finalize_streamed_index(
    spark: SparkSession, index_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> InvertedIndex:
    """Exact corpus stats + termdict refresh.

    No block-metadata rebuild is needed: the pruning stats stored per
    block (max_tf, min_dl) are avgdl-INDEPENDENT, and the WAND evaluator
    derives its upper bound from them with the query-time avgdl — so
    blocks appended while the corpus (and its running avgdl) was growing
    remain exact-safe bounds under the final avgdl computed here.
    """
    ds = spark.read.parquet(os.path.join(index_dir, "docstats"))
    row = ds.agg(F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("s")).collect()[0]
    from ..index_store import _write_corpus

    _write_corpus(
        spark, index_dir, int(row["n"]), float(row["s"]) / float(row["n"]) if row["n"] else 0.0
    )
    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    index_build.termdict_from_blocks(blocks).write.mode("overwrite").parquet(
        os.path.join(index_dir, "termdict")
    )
    return InvertedIndex(spark, index_dir, cfg)


def streaming_rollup(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked windowed counts by role over event time; returns a
    streaming DataFrame ready for writeStream (tests run it with
    availableNow into a memory sink)."""
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("role"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "role", "n_turns")
    )
