"""Custom stateful streaming operator: per-conversation session state.

The reference tracks per-stream state only via checkpoints (ack tokens,
core/Processing.scala:269-272); a transcript engine additionally wants
live per-conversation rollups (turns seen, role mix, last activity) as
conversations stream in across micro-batches. That is not expressible
with plain windowed aggregation when state must persist and update
per key across triggers -> ``applyInPandasWithState``.

State is a single compact row per conv_id; the handler is vectorized
over each batch's group (pandas ops, no per-row Python beyond the
state read/write)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..sources.transcripts import TRANSCRIPT_SCHEMA

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turns_seen", T.LongType()),
        T.StructField("tool_turns", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("turns_seen", T.LongType()),
        T.StructField("tool_turns", T.LongType()),
        T.StructField("first_ts", T.LongType()),  # epoch micros
        T.StructField("last_ts", T.LongType()),
    ]
)


def _track(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    conv_id = key[0]
    turns, tools, first_us, last_us = (
        state.get if state.exists else (0, 0, None, None)
    )
    for pdf in pdfs:
        turns += len(pdf)
        tools += int((pdf["role"] == "tool").sum())
        ts_us = pdf["ts"].astype("int64") // 1000
        if len(ts_us):
            mn, mx = int(ts_us.min()), int(ts_us.max())
            first_us = mn if first_us is None else min(first_us, mn)
            last_us = mx if last_us is None else max(last_us, mx)
    state.update((turns, tools, first_us, last_us))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "turns_seen": [turns],
            "tool_turns": [tools],
            "first_ts": [pd.Timestamp(first_us * 1000) if first_us is not None else None],
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else None],
        }
    )


def conversation_sessions(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming DataFrame of per-conversation session rollups; state
    persists across micro-batches (update output mode)."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    return stream.groupBy("conv_id").applyInPandasWithState(
        _track,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
