"""Stable, process-independent hashes for partitioning and dedup.

Python's builtin ``hash`` is salted per process, so it can never be used
for cross-task partitioning.  Terms are <= 15 bytes (tokenizer cap), so
we hash their zero-padded 16-byte form with a vectorized FNV-1a variant
(uint64 wraparound == mod 2^64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def pack16(terms: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Zero-padded (n, 16) uint8 matrix of term bytes (terms must be <= 16 bytes)."""
    from .tokenize import _string_buffers

    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    data, offsets = _string_buffers(terms)
    n = len(offsets) - 1
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    if len(lens) and lens.max() > 16:
        raise ValueError("pack16 requires strings <= 16 bytes")
    idx = starts[:, None] + np.arange(16, dtype=np.int64)[None, :]
    np.clip(idx, 0, max(len(data) - 1, 0), out=idx)
    gathered = data[idx] if len(data) else np.zeros((n, 16), dtype=np.uint8)
    mask = np.arange(16, dtype=np.int64)[None, :] < lens[:, None]
    return np.where(mask, gathered, 0).astype(np.uint8, copy=False)


def term_hash(terms: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic uint64 hash per term (vectorized FNV-1a over 16 bytes)."""
    packed = pack16(terms)
    with np.errstate(over="ignore"):
        h = np.full(len(packed), _FNV_OFFSET, dtype=np.uint64)
        for j in range(16):
            h = (h ^ packed[:, j].astype(np.uint64)) * _FNV_PRIME
    return h


def term_partition(terms: pa.Array | pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    """Shuffle partition id per term: ``fnv(term) % P`` (int32)."""
    return (term_hash(terms) % np.uint64(num_partitions)).astype(np.int32)
