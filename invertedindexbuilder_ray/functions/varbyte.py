"""Vectorized VarByte codec, bit-compatible with the reference encoding.

Reference format (verified by hexdump, SURVEY.md §9.1; /root/reference/src/var_bytes.c:5-40):
little-endian base-128 digits, with the terminator bit ``0x80`` set on the
LAST (most significant) byte — the *inverse* of standard VByte continuation
bits.  The value 0 encodes as the single byte ``0x80``.

All functions are numpy-vectorized: one call encodes/decodes an entire
array, so the per-value Python overhead is amortized.  These run inside
``map_batches`` / ``map_groups`` workers on the hot path of index build
and query, so they must not loop per value in Python.
"""

from __future__ import annotations

import numpy as np

_MASK = np.uint64(0x7F)


def encoded_sizes(values: np.ndarray) -> np.ndarray:
    """Number of bytes each non-negative value occupies when VarByte-encoded."""
    v = np.asarray(values, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("VarByte cannot encode negative values")
    sizes = np.ones(len(v), dtype=np.int64)
    rest = v >> 7
    while rest.any():
        sizes += rest > 0
        rest = rest >> 7
    return sizes


def encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode an int array -> (uint8 buffer, per-value byte sizes).

    The returned buffer is the concatenation of each value's encoding in
    order; ``sizes`` lets callers slice out sub-ranges (e.g. per posting
    block) without re-encoding.
    """
    v = np.asarray(values, dtype=np.int64)
    sizes = encoded_sizes(v)
    ends = np.cumsum(sizes)
    starts = ends - sizes
    out = np.zeros(int(ends[-1]) if len(v) else 0, dtype=np.uint8)
    max_size = int(sizes.max()) if len(v) else 0
    for j in range(max_size):
        sel = sizes > j
        out[starts[sel] + j] = (v[sel] >> (7 * j)) & 0x7F
    if len(v):
        out[ends - 1] |= 0x80
    return out, sizes


def encode_single(value: int) -> bytes:
    buf, _ = encode(np.array([value], dtype=np.int64))
    return buf.tobytes()


def decode(buf: np.ndarray, count: int | None = None) -> tuple[np.ndarray, int]:
    """Decode up to ``count`` values (all if None) -> (int64 values, bytes consumed).

    ``buf`` is a uint8 array positioned at the first value.
    """
    buf = np.asarray(buf, dtype=np.uint8)
    term_idx = np.flatnonzero(buf & 0x80)
    if count is not None:
        if len(term_idx) < count:
            raise ValueError(f"buffer holds {len(term_idx)} values, need {count}")
        term_idx = term_idx[:count]
    n = len(term_idx)
    if n == 0:
        return np.empty(0, dtype=np.int64), 0
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term_idx[:-1] + 1
    lens = term_idx - starts + 1
    vals = np.zeros(n, dtype=np.int64)
    for j in range(int(lens.max())):
        sel = lens > j
        vals[sel] |= (buf[starts[sel] + j] & 0x7F).astype(np.int64) << (7 * j)
    return vals, int(term_idx[-1]) + 1
