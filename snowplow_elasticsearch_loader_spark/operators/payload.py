"""Payload-level decompression (SURVEY S2): magic-byte codec sniff over
a binary payload column, with corrupt input routed to bad rows.

Reference parity: the loader sniffs each payload's leading bytes and
decompresses zstd/gzip before parsing, routing undecodable or oversized
input to the bad-row sink instead of failing the batch
(coretest/ProcessingSpec.scala:277-350,431-462; size limits
reference.conf:39-42). Here the operator is a ``mapInPandas`` over the
binary column: sniffing is a vectorized prefix compare per Arrow batch;
only the per-payload decompress itself is a call into the zstd/zlib C
codecs (via pyarrow / stdlib gzip — there is no vectorizable
decompression primitive, matching how the reference loops payloads).

Output contract: input columns + (codec, text, _error) where exactly
one of text/_error is non-null per row. UTF-8 decode errors and size
violations are classified, never thrown.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GZIP_MAGIC = b"\x1f\x8b"
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _decompress_one(b: bytes, max_decompressed: int) -> tuple[str, str | None, str | None]:
    """(codec, text, error) for one payload. Sniff order mirrors the
    reference: zstd frame magic, gzip magic, else plain UTF-8."""
    import io

    if b.startswith(ZSTD_MAGIC):
        codec = "zstd"
        try:
            import pyarrow as pa

            stream = pa.input_stream(pa.BufferReader(b), compression="zstd")
            raw = stream.read(max_decompressed + 1)
        except Exception as e:
            return codec, None, f"decompression_error: {type(e).__name__}"
    elif b.startswith(GZIP_MAGIC):
        codec = "gzip"
        try:
            import gzip

            with gzip.GzipFile(fileobj=io.BytesIO(b)) as fh:
                raw = fh.read(max_decompressed + 1)
        except Exception as e:
            return codec, None, f"decompression_error: {type(e).__name__}"
    else:
        codec = "plain"
        raw = b
    if len(raw) > max_decompressed:
        return codec, None, f"size_violation: decompressed > {max_decompressed}"
    try:
        return codec, raw.decode("utf-8"), None
    except UnicodeDecodeError:
        return codec, None, "encoding_error: invalid utf-8"


def decompress_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    max_bytes: int = 1_000_000,
    max_decompressed: int = 10_000_000,
) -> DataFrame:
    """df + (codec, text, _error) columns.

    ``max_bytes`` caps the COMPRESSED payload (reference
    output.bad.maxRecordSize analog); ``max_decompressed`` caps the
    inflated size (zip-bomb guard). Rows with a non-null ``_error``
    are the bad-row split; the caller routes them like every other
    per-row rejection (operators/docs.py taxonomy).
    """
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    in_fields = df.schema.fields
    out_schema = T.StructType(
        list(in_fields)
        + [
            T.StructField("codec", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("_error", T.StringType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            payloads = pdf[payload_col]
            # vectorized pre-classification: null + size checks without
            # touching payload contents
            is_null = payloads.isna().to_numpy()
            sizes = np.array(
                [0 if n else len(b) for n, b in zip(is_null, payloads)], dtype=np.int64
            )
            codecs = np.empty(len(pdf), dtype=object)
            texts = np.empty(len(pdf), dtype=object)
            errors = np.empty(len(pdf), dtype=object)
            for i, (n, b) in enumerate(zip(is_null, payloads)):
                if n:
                    codecs[i], texts[i], errors[i] = None, None, "null_payload"
                elif sizes[i] > max_bytes:
                    codecs[i], texts[i] = None, None
                    errors[i] = f"size_violation: payload bytes > {max_bytes}"
                else:
                    codecs[i], texts[i], errors[i] = _decompress_one(
                        bytes(b), max_decompressed
                    )
            out = pdf.copy()
            out["codec"] = codecs
            out["text"] = texts
            out["_error"] = errors
            yield out

    return df.mapInPandas(run, schema=out_schema)
