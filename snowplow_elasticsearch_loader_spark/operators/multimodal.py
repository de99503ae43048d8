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
import struct  # noqa: F401 — fake_payload still packs headers with it
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
        # badrow-style quarantine (framework contract, ADVICE r3):
        # malformed payloads yield error != null with null header
        # fields instead of failing the whole job
        T.StructField("error", T.StringType()),
    ]
)


def _concat_payloads(payloads) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 buffer, row offsets) for a batch of binary payloads —
    the numpy-offset-slicing base every vectorized parse works from."""
    sizes = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=len(payloads))
    offs = np.concatenate(([0], np.cumsum(sizes)))
    buf = np.frombuffer(b"".join(bytes(b) for b in payloads), dtype=np.uint8)
    return buf, offs


def _u32le(hdr: np.ndarray, at: int) -> np.ndarray:
    """(n, >=at+4) uint8 matrix -> little-endian u32 column at byte `at`."""
    h = hdr[:, at : at + 4].astype(np.int64)
    return h[:, 0] | (h[:, 1] << 8) | (h[:, 2] << 16) | (h[:, 3] << 24)


def extract_metadata(assets: DataFrame) -> DataFrame:
    """mapInPandas over the binary column: header parse + byte-level
    features, vectorized with numpy offset slicing over the batch's
    concatenated payload buffer — no per-row Python in the parse
    (input_hint invariant): magic check, u32 header fields, and
    byte-mean/std all come from gathers and segment reduces."""

    from ..shipping import ensure_shipped

    ensure_shipped(assets.sparkSession)

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            buf, offs = _concat_payloads(pdf["payload"])
            n = len(pdf)
            starts = offs[:-1]
            sizes = offs[1:] - starts
            # per-row quarantine (ADVICE r3): rows too short for the
            # container header are MASKED OUT of the vectorized gather
            # (a blind gather would read the next row's bytes — or walk
            # off the buffer on the last row) and emitted with error !=
            # null, badrow-style, instead of aborting the whole job
            valid = sizes >= 19
            w = np.zeros(n, dtype=np.int64)
            h = np.zeros(n, dtype=np.int64)
            fr = np.zeros(n, dtype=np.int64)
            magic_ok = valid.copy()
            if valid.any():
                vstarts = starts[valid]
                hdr = buf[vstarts[:, None] + np.arange(19)]
                mok = (hdr[:, :4] == np.frombuffer(b"FAKE", np.uint8)).all(axis=1)
                magic_ok[valid] = mok
                w[valid] = _u32le(hdr, 7)
                h[valid] = _u32le(hdr, 11)
                fr[valid] = _u32le(hdr, 15)
            ok = magic_ok  # magic_ok implies valid
            err = np.full(n, None, dtype=object)
            err[~valid] = "short_payload: smaller than 19-byte container header"
            err[valid & ~magic_ok] = "unknown_container: bad magic"
            # body stats via segment reduces over the flat buffer
            body_starts = np.minimum(starts + 19, offs[1:])
            body_len = offs[1:] - body_starts
            x = buf.astype(np.float64)
            cum = np.concatenate(([0.0], np.cumsum(x)))
            cum2 = np.concatenate(([0.0], np.cumsum(x * x)))
            s1 = cum[offs[1:]] - cum[body_starts]
            s2 = cum2[offs[1:]] - cum2[body_starts]
            safe = np.maximum(body_len, 1).astype(np.float64)
            mean = np.where(body_len > 0, s1 / safe, 0.0)
            var = np.maximum(s2 / safe - mean * mean, 0.0)
            std = np.where(body_len > 0, np.sqrt(var), 0.0)
            mask = ~ok
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(np.int64),
                    "kind": pdf["kind"].to_numpy(),
                    "width": pd.arrays.IntegerArray(w.astype(np.int32), mask=mask),
                    "height": pd.arrays.IntegerArray(h.astype(np.int32), mask=mask),
                    "n_frames": pd.arrays.IntegerArray(fr.astype(np.int32), mask=mask),
                    "payload_bytes": (offs[1:] - starts).astype(np.int32),
                    "byte_mean": np.where(ok, mean, np.nan),
                    "byte_std": np.where(ok, std, np.nan),
                    "error": err,
                }
            )

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
    slice (deterministic fake-codec layout: frames stripe the body).
    All geometry (frame counts, strides, slice bounds) is computed
    vectorized over the batch buffer; the only per-OUTPUT-row step is
    materializing each frame's bytes object."""

    from ..shipping import ensure_shipped

    ensure_shipped(assets.sparkSession)

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vid = pdf[pdf["kind"] == "video"]
            if len(vid) == 0:
                yield pd.DataFrame(
                    {"asset_id": pd.Series(dtype="int64"),
                     "frame_idx": pd.Series(dtype="int32"),
                     "frame_bytes": pd.Series(dtype=object)}
                )
                continue
            buf, offs = _concat_payloads(vid["payload"])
            starts = offs[:-1]
            sizes = offs[1:] - starts
            # per-row quarantine BEFORE the gather: a <19-byte payload
            # would otherwise read header bytes from the NEXT row's
            # slice of the concatenated buffer (or IndexError on the
            # last row). Malformed rows emit no frames (badrow-style —
            # extract_metadata carries their error) instead of failing
            # the whole job (ADVICE r3).
            valid = sizes >= 19
            if not valid.all():
                vid = vid[valid]
                if len(vid) == 0:
                    continue
                buf, offs = _concat_payloads(vid["payload"])
                starts = offs[:-1]
                sizes = offs[1:] - starts
            hdr = buf[starts[:, None] + np.arange(19)]
            fr = _u32le(hdr, 15)
            body_len = sizes - 19
            stride = np.maximum(body_len // np.maximum(fr, 1), 1)
            # range(0, fr, every) semantics: a zero-frame video emits no
            # frames (n_out == 0 drops the row from the repeat)
            n_out = (fr + every - 1) // every  # sampled frames per row
            row_of = np.repeat(np.arange(len(vid)), n_out)
            out_starts = np.concatenate(([0], np.cumsum(n_out)[:-1]))
            fi = (np.arange(row_of.size) - out_starts[row_of]) * every
            lo = starts[row_of] + 19 + fi * stride[row_of]
            hi = np.minimum(lo + stride[row_of], offs[1:][row_of])
            mv = memoryview(buf)
            yield pd.DataFrame(
                {
                    "asset_id": vid["asset_id"].to_numpy(np.int64)[row_of],
                    "frame_idx": fi.astype(np.int32),
                    "frame_bytes": [bytes(mv[a:b]) for a, b in zip(lo, hi)],
                }
            )

    return assets.mapInPandas(sample, schema=_FRAME_SCHEMA)
