"""Vectorized delta + varint posting-list codec (pure numpy, no per-row
Python loops — north rule: "no per-row Python anywhere").

Wire format: LEB128-style unsigned varint (7 payload bits per byte,
continuation bit 0x80), values delta-encoded against the previous value for
docID streams (first value absolute).  This is the same family of encoding
Lucene uses for postings blocks; implemented from scratch against the public
format description.

Encoding builds an (n, 10) byte matrix column-wise and compacts it with a
boolean mask; decoding segments the byte stream by continuation bits and
reduces each group with np.add.reduceat.  Both are O(total bytes) with numpy
kernels only.

CODEC_VERSION is recorded in segment manifests; resume refuses to mix codec
versions (FIXTURES.md §2 collection_meta).
"""

from __future__ import annotations

import numpy as np

CODEC_VERSION = "delta-varint-v1"
_MAX_BYTES = 10  # 64 bits / 7


def varint_encode(values: np.ndarray) -> bytes:
    """uint64 array -> varint byte stream."""
    buf, _ = varint_encode_all(values)
    return buf


def varint_encode_all(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Like varint_encode, but also returns the encoded byte length of each
    value, so callers can slice the stream into sub-ranges (per posting
    block) without re-encoding. One vectorized pass for ALL values of a
    partition — the bulk-encode hot path."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    n = v.size
    # adapt the work-matrix width to the largest value present — posting
    # deltas/tfs need 1-3 bytes, so this cuts temp memory traffic ~5x vs a
    # fixed 10-byte matrix (the encode stage is memory-bandwidth-bound)
    mx = int(v.max())
    width = max(1, (mx.bit_length() + 6) // 7)
    shifts = (np.arange(width, dtype=np.uint64) * np.uint64(7))[None, :]
    chunks = (v[:, None] >> shifts) & np.uint64(0x7F)
    remaining = v[:, None] >> (shifts + np.uint64(7))
    needed = remaining != 0
    used = np.ones((n, width), dtype=bool)
    if width > 1:
        used[:, 1:] = needed[:, :-1]
        used = np.logical_and.accumulate(used, axis=1)
    out = chunks.astype(np.uint8)
    out[needed & used] |= 0x80
    return out[used].tobytes(), used.sum(axis=1).astype(np.int64)


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """varint byte stream -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # group id of each byte = number of completed values before it
    gid = np.zeros(b.size, dtype=np.int64)
    gid[1:] = np.cumsum(is_last[:-1])
    starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[gid]
    payload = (b & np.uint8(0x7F)).astype(np.uint64) << (pos.astype(np.uint64) * np.uint64(7))
    vals = np.add.reduceat(payload, starts)
    if count is not None and vals.size != count:
        raise ValueError(f"varint_decode: expected {count} values, got {vals.size}")
    return vals


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """strictly-increasing uint64 -> deltas (first absolute)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    out[1:] = v[1:] - v[:-1]
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(deltas, dtype=np.uint64), dtype=np.uint64)


def encode_docids(docids: np.ndarray) -> bytes:
    return varint_encode(delta_encode(docids))


def decode_docids(buf: bytes, count: int | None = None) -> np.ndarray:
    return delta_decode(varint_decode(buf, count))


def decode_blocks_batch(
    docid_bufs: list[bytes], tf_bufs: list[bytes], dl_bufs: list[bytes], ns: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY posting blocks in one vectorized pass (query-time hot
    path — one varint_decode over the concatenated buffers instead of a
    Python loop per block).

    Per-block delta streams start with an absolute first value, so a global
    cumsum over the concatenated deltas restores each block's docIDs after
    subtracting the running total accumulated before that block's start.

    Returns (block_idx, docids, tfs, dls) — flat, aligned arrays; block_idx
    maps each posting back to its source row for term/weight lookup.
    """
    ns = np.ascontiguousarray(ns, dtype=np.int64)
    total = int(ns.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, np.zeros(0, np.uint64), np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    deltas = varint_decode(b"".join(docid_bufs), total)
    tfs = varint_decode(b"".join(tf_bufs), total)
    dls = varint_decode(b"".join(dl_bufs), total)
    csum = np.cumsum(deltas, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
    base = np.zeros(len(ns), dtype=np.uint64)
    base[1:] = csum[starts[1:] - 1]
    block_idx = np.repeat(np.arange(len(ns), dtype=np.int64), ns)
    docids = csum - base[block_idx]
    return block_idx, docids, tfs, dls
