"""Posting-block codecs: delta-gap + LEB128 varint, pure numpy.

The reference has no columnar/compressed layer (it ships JSON strings
to ES and lets Lucene encode postings); this module owns that delegated
capability (SURVEY E2, north_star: "delta-gap + varint-compressed
posting blocks"). Everything is vectorized — the per-row invariant from
BASELINE.json input_hint ("no per-row Python") applies inside UDFs too:
encode/decode touch numpy arrays, never Python ints in a loop.
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_MASK = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint array (vectorized scatter, no per-value loop:
    the only Python loop is over the <=10 byte positions)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    lens = np.ones(v.size, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        lens += tmp > 0
        tmp >>= _U7
    out = np.zeros(int(lens.sum()), dtype=np.uint8)
    idx = np.concatenate(([0], np.cumsum(lens)[:-1]))
    cur = v.copy()
    remaining = lens.copy()
    while True:
        mask = remaining > 0
        if not mask.any():
            break
        byte = (cur[mask] & _MASK).astype(np.uint8)
        more = (remaining[mask] > 1).astype(np.uint8) << 7
        out[idx[mask]] = byte | more
        cur[mask] >>= _U7
        idx[mask] += 1
        remaining[mask] -= 1
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of varint_encode -> uint64 array (segment-reduce, no loop
    over values)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & _CONT) == 0
    # value start positions: 0 and every position after a terminating byte
    starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    pos_in_value = np.arange(b.size, dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), np.diff(np.concatenate((starts, [b.size])))
    )
    parts = (b & _MASK).astype(np.uint64) << (pos_in_value * _U7)
    return np.add.reduceat(parts, starts)


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing uint array -> first value + gaps."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray):
    """One posting block -> (docs_bytes, tfs_bytes, dls_bytes).

    doc_ids must be sorted ascending & unique. Doc lengths ride along so
    query-time scoring needs no docstats join (the analog of Lucene
    norms living next to postings)."""
    return (
        varint_encode(delta_encode(doc_ids)),
        varint_encode(tfs),
        varint_encode(doclens),
    )


def decode_block(docs_bytes: bytes, tfs_bytes: bytes, dls_bytes: bytes):
    """Inverse of encode_block -> (doc_ids, tfs, doclens) uint64 arrays."""
    return (
        delta_decode(varint_decode(docs_bytes)),
        varint_decode(tfs_bytes),
        varint_decode(dls_bytes),
    )
