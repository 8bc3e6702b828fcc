"""Posting-list compression kernels: delta + varbyte over numpy arrays.

Lucene stores postings as docID-sorted, delta-encoded, block-compressed
integers (the behavior behind the reference's index — configured via
schema.xml, executed by Lucene). We use classic VByte: little-endian
7-bit groups, high bit = continuation. All kernels are vectorized numpy
(no per-value Python in the encode hot path beyond the final pack) and
run inside Arrow batches via applyInPandas (see operators/postings.py).
"""

from __future__ import annotations

import numpy as np


def varbyte_encode_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array to VByte; returns (uint8 buffer, per-value
    byte widths). Vectorized: one pass per byte position, O(10) passes.
    The widths let callers slice per-segment byte ranges out of one big
    encode (operators/postings.py encodes a whole (tbucket, bucket)
    group's terms in three calls total, not three per term)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # byte width = number of 7-bit groups (>=1); loop is O(max width)=O(10)
    widths = np.ones(v.shape, dtype=np.int64)
    tmp = v.copy()
    tmp >>= np.uint64(7)
    while tmp.any():
        widths += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(widths.sum())
    out = np.empty(total, dtype=np.uint8)
    # offsets of each value's first byte
    ends = np.cumsum(widths)
    starts = ends - widths
    rem = v.copy()
    pos = starts.copy()
    alive = np.ones(v.shape, dtype=bool)
    while alive.any():
        byte = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem = rem >> np.uint64(7)
        more = rem > 0
        byte[more] |= 0x80
        out[pos[alive]] = byte[alive]
        pos += 1
        alive &= more
    return out, widths


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to VByte (single-buffer convenience)."""
    out, _ = varbyte_encode_arr(values)
    return out.tobytes()


def varbyte_decode(buf: bytes, n: int | None = None) -> np.ndarray:
    """Decode VByte buffer to uint64 array (vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    # value boundaries: positions where is_last is True end a value
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    payload = (raw & 0x7F).astype(np.uint64)
    # shift amount = position within each value's group
    idx = np.arange(raw.size, dtype=np.int64)
    group_start = np.repeat(starts, ends - starts + 1)
    shifts = ((idx - group_start) * 7).astype(np.uint64)
    contrib = payload << shifts
    out = np.add.reduceat(contrib, starts)
    if n is not None:
        assert out.size == n, f"decoded {out.size}, expected {n}"
    return out.astype(np.uint64)


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    v = np.asarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> tuple[bytes, bytes, bytes]:
    """(docID-sorted) posting triple -> (delta+vbyte ids, vbyte tfs, vbyte dls)."""
    order = np.argsort(doc_ids, kind="stable")
    ids = np.asarray(doc_ids, dtype=np.uint64)[order]
    return (
        varbyte_encode(delta_encode(ids)),
        varbyte_encode(np.asarray(tfs, dtype=np.uint64)[order]),
        varbyte_encode(np.asarray(dls, dtype=np.uint64)[order]),
    )


def decode_postings(ids_buf: bytes, tfs_buf: bytes, dls_buf: bytes, n: int | None = None):
    ids = delta_decode(varbyte_decode(ids_buf, n))
    return ids, varbyte_decode(tfs_buf, n), varbyte_decode(dls_buf, n)
