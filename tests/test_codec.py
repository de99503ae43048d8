"""Codec unit tier (SURVEY §5.4: 'varint/delta codec roundtrip ... add
property-style randomized arrays')."""

from __future__ import annotations

import numpy as np
import pytest

from snowplow_elasticsearch_loader_spark.functions import codec


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0],
        [127],
        [128],
        [1, 2, 3],
        [2**32 - 1, 2**32, 2**63 - 1, 2**64 - 1],
        list(range(1000)),
    ],
)
def test_varint_roundtrip_cases(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


def test_varint_roundtrip_random():
    rng = np.random.RandomState(42)
    for _ in range(25):
        n = rng.randint(0, 5000)
        # mixed magnitudes to cross byte-length boundaries
        arr = (rng.randint(0, 2**62, size=n).astype(np.uint64)) >> rng.randint(
            0, 60, size=n
        ).astype(np.uint64)
        assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


def test_delta_roundtrip_random():
    rng = np.random.RandomState(7)
    for _ in range(20):
        n = rng.randint(1, 3000)
        ids = np.unique(rng.randint(0, 2**40, size=n).astype(np.uint64))
        assert np.array_equal(codec.delta_decode(codec.delta_encode(ids)), ids)


def test_block_roundtrip():
    rng = np.random.RandomState(1)
    ids = np.unique(rng.randint(0, 10**9, size=500).astype(np.uint64))
    tfs = rng.randint(1, 50, size=ids.size).astype(np.uint64)
    dls = rng.randint(1, 2000, size=ids.size).astype(np.uint64)
    blocks = codec.encode_block(ids, tfs, dls)
    d_ids, d_tfs, d_dls = codec.decode_block(*blocks)
    assert np.array_equal(d_ids, ids)
    assert np.array_equal(d_tfs, tfs)
    assert np.array_equal(d_dls, dls)


def test_compression_actually_compresses():
    ids = np.arange(10_000, dtype=np.uint64) * 3 + 5
    enc = codec.varint_encode(codec.delta_encode(ids))
    assert len(enc) < ids.nbytes / 4  # gaps of 3 -> 1 byte each
