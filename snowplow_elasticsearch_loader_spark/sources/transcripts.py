"""Deterministic synthetic multi-turn transcript corpus.

Authoritative input shape from BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)``. Generation follows FIXTURES.md §1:
seeded (seed=42 convention), Zipfian ~vocab with deliberately hot
terms present in ≥50% of turns (skew/salting tests), unicode
(umlauts/CJK/emoji — mirrors the reference's unicode round-trip,
it/EnrichedSpec.scala:36), empty and very long turns, punctuation and
casing variety. Timestamps span ≥3 UTC dates for date-shard routing
tests (analog of it/ShardingSpec.scala:31-56).

The generator is pure numpy (vectorized) and returns a pandas frame;
``synth_transcripts`` wraps it into a Spark DataFrame. The same bytes
come out for any parallelism level — required for the index-equality
test at local[8] vs local[32].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

#: hot terms appear in >=50% of turns (FIXTURES.md: skew tests)
HOT_TERMS = ["the", "tool", "call"]

_BASE_VOCAB = [
    "error", "retry", "timeout", "agent", "plan", "search", "index",
    "query", "token", "stream", "batch", "merge", "sort", "join",
    "shuffle", "partition", "spark", "kinesis", "loader", "elastic",
    "üöä", "naïve", "你好", "世界", "🙂",
    "HTTP", "JSON", "Config", "e-mail", "v2",
]


def synth_transcripts_pdf(
    n_convs: int = 100,
    seed: int = 42,
    vocab_size: int = 2000,
    with_anomalies: bool = True,
    fast: bool = False,
) -> pd.DataFrame:
    """Deterministic transcripts as pandas (driver-side fixture builder).

    ``fast=True`` (bench-scale corpora): vectorized text assembly with a
    uniform space separator and no casing tricks — same schema, same
    Zipf+hot-term distribution, ~100x faster to generate. Both modes
    are fully determined by (n_convs, seed, vocab_size).
    """
    rng = np.random.RandomState(seed)
    vocab = np.array(
        _BASE_VOCAB + [f"term{i:05d}" for i in range(max(0, vocab_size - len(_BASE_VOCAB)))]
    )
    # Zipfian weights over the vocab
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf_p = (1.0 / ranks) / np.sum(1.0 / ranks)

    n_turns_per_conv = rng.randint(8, 65, size=n_convs)
    total = int(n_turns_per_conv.sum())
    conv_ids = np.repeat([f"conv-{i:08d}" for i in range(n_convs)], n_turns_per_conv)
    turn_idx = np.concatenate([np.arange(n) for n in n_turns_per_conv]).astype(np.int32)

    roles = rng.choice(["user", "assistant", "system", "tool"], p=[0.4, 0.4, 0.05, 0.15], size=total)
    tools = np.where(
        roles == "tool", rng.choice(["bash", "search", "read_file"], size=total), None
    )

    # texts: 5..60 zipfian tokens + hot terms on ~55% of turns
    lens = rng.randint(5, 61, size=total)
    hot_mask = rng.rand(total) < 0.55
    if fast:
        # byte-buffer assembly: draw token CODES (searchsorted over the
        # zipf cdf), scatter hot-term prefixes, join once into a single
        # bytes buffer, slice per row — no per-token Python strings.
        ext_vocab = list(vocab) + [t for t in HOT_TERMS if t not in set(vocab)]
        hot_codes = np.array([ext_vocab.index(t) for t in HOT_TERMS])
        cdf = np.cumsum(zipf_p)
        codes = np.searchsorted(cdf, rng.rand(int(lens.sum()))).clip(0, len(vocab) - 1)
        extra = np.where(hot_mask, 2, 0)
        lens2 = lens + extra
        off2 = np.concatenate(([0], np.cumsum(lens2)))
        n_slots = int(off2[-1])
        row_of = np.repeat(np.arange(total), lens2)
        idx_in_row = np.arange(n_slots) - off2[row_of]
        is_extra = idx_in_row < extra[row_of]
        slot_codes = np.empty(n_slots, dtype=np.int64)
        slot_codes[~is_extra] = codes
        ex_rows = row_of[is_extra]
        ex_idx = idx_in_row[is_extra]
        slot_codes[is_extra] = np.where(
            ex_idx == 0, hot_codes[ex_rows % len(HOT_TERMS)], hot_codes[0]
        )
        tok_b = np.array([(w + " ").encode("utf-8") for w in ext_vocab], dtype=object)
        blens = np.array([len(x) for x in tok_b], dtype=np.int64)
        buf = b"".join(tok_b[slot_codes].tolist())
        row_bytes = np.add.reduceat(blens[slot_codes], off2[:-1])
        row_end = np.cumsum(row_bytes)
        row_start = row_end - row_bytes
        texts = np.array(
            [buf[s : e - 1].decode("utf-8") for s, e in zip(row_start, row_end)],
            dtype=object,
        )
        flat = None
    else:
        flat = rng.choice(vocab, p=zipf_p, size=int(lens.sum()))
        offs = np.concatenate([[0], np.cumsum(lens)])
        punct = np.array([".", ",", "!", "?", ";", " -", ":"])
        texts = []
        for i in range(total):
            words = list(flat[offs[i] : offs[i + 1]])
            if hot_mask[i]:
                words = [HOT_TERMS[i % len(HOT_TERMS)], HOT_TERMS[0]] + words
            # casing + punctuation variety (analyzer tests)
            if i % 7 == 0 and words:
                words[0] = words[0].upper()
            sep = punct[i % len(punct)] + " " if i % 5 == 0 else " "
            texts.append(sep.join(words))
        texts = np.array(texts, dtype=object)

    if with_anomalies and total > 20:
        texts[3] = ""  # empty text
        texts[7] = "x " * 12000  # very long turn (>10k tokens)
        texts[11] = None  # null text -> bad row

    # monotone timestamps within conversation, spanning >= 3 UTC dates
    day = rng.randint(0, 5, size=n_convs)  # conv start day
    base = np.datetime64("2026-03-09T00:00:00")
    start = base + np.repeat(day, n_turns_per_conv).astype("timedelta64[D]")
    within = np.concatenate(
        [np.cumsum(rng.randint(1, 600, size=n)) for n in n_turns_per_conv]
    ).astype("timedelta64[s]")
    ts = start + within

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts),
        }
    )


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    seed: int = 42,
    vocab_size: int = 2000,
    with_anomalies: bool = True,
    partitions: int | None = None,
    fast: bool = False,
) -> DataFrame:
    pdf = synth_transcripts_pdf(n_convs, seed, vocab_size, with_anomalies, fast)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    return df.repartition(partitions) if partitions else df
