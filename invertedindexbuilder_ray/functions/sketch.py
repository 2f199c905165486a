"""Vectorized document sketches: MinHash, SimHash, rolling fingerprints.

All kernels operate on a whole Arrow batch of texts at once (token spans
come from the zero-copy tokenizer) — per-doc Python loops are limited to
O(n_docs) bookkeeping, never per token.  Sketches are mergeable /
deterministic (fixed seeds), so they can be computed per batch and
combined across a 100 TB corpus without coordination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import _FNV_OFFSET, _FNV_PRIME
from .tokenize import token_spans

# shingle-fold mixer (see shingle_hashes): odd, < 2^62 for HUGEINT SQL
_SHINGLE_MIX_MULT = np.uint64(2685821657736338717)

_MERSENNE61 = np.uint64((1 << 61) - 1)


def _mod_m61(y: np.ndarray) -> np.ndarray:
    """``y % (2^61-1)`` for uint64 via the Mersenne identity
    ``2^61 ≡ 1 (mod M61)``: fold the high bits down and subtract once.
    Bit-identical to ``%`` (any uint64 input) at ~5x the throughput —
    integer division is the single hottest op in the minhash kernel."""
    m = (y & _MERSENNE61) + (y >> np.uint64(61))
    m[m >= _MERSENNE61] -= _MERSENNE61
    return m


def _token_hashes(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 hash per token, doc row index per token) — clean tokenization."""
    from .tokenize import _span_hashes

    mapped, starts, lens, row_idx = token_spans(texts, drop_trailing=False)
    h, _h2 = _span_hashes(mapped, starts, lens)
    return h, row_idx


def _doc_boundaries(row_idx: np.ndarray, n_rows: int) -> np.ndarray:
    """Start offset of each row's token run within the flat token arrays."""
    counts = np.bincount(row_idx, minlength=n_rows)
    bounds = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    return bounds


def shingle_hashes(
    texts: pa.Array | pa.ChunkedArray, k: int = 3
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """k-token shingle hashes per doc.

    Returns ``(hashes, row_idx, bounds)``: uint64 hash per shingle, its
    doc row, and per-doc offsets into the flat arrays.  Docs with fewer
    than k tokens produce no shingles.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = len(texts)
    th, row_idx = _token_hashes(texts)
    if len(th) == 0:
        return (
            np.empty(0, np.uint64),
            np.empty(0, np.int64),
            np.zeros(n_rows + 1, np.int64),
        )
    with np.errstate(over="ignore"):
        # xor-shift mix BEFORE the polynomial fold.  The raw FNV token
        # hashes differ by exact multiples of FNV-prime powers for
        # near-miss tokens (low-byte xor deltas), and a fold in the SAME
        # prime cancels those deltas: ('w10','w1','w0') and
        # ('w11','w2','w0') collided DETERMINISTICALLY (found by the
        # prefix-filter recall fuzz, round 4).  The mix breaks the
        # additive structure; constant < 2^62 so the DuckDB HUGEINT
        # replication (sketch_sql) cannot overflow int128.
        mh = (th ^ (th >> np.uint64(31))) * _SHINGLE_MIX_MULT
        sh = np.zeros(max(len(th) - k + 1, 0), dtype=np.uint64)
        for j in range(k):
            sh = sh * np.uint64(1099511628211) + mh[j : len(th) - k + 1 + j]
    # a shingle is valid only if all k tokens belong to the same doc
    valid = row_idx[: len(sh)] == row_idx[k - 1 :]
    sh = sh[valid]
    srow = row_idx[: len(valid)][valid]
    bounds = _doc_boundaries(srow, n_rows)
    return sh, srow.astype(np.int64), bounds


def minhash_signatures(
    texts: pa.Array | pa.ChunkedArray, *, num_perm: int = 128, k: int = 3, seed: int = 7
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures over k-token shingles.

    Permutation family: ``((a*x mod 2^64) + b) mod 2^61-1`` with seeded
    coefficients — the multiply wraps in 64 bits BEFORE the Mersenne mod,
    so this is a fixed deterministic mixing hash, not the textbook
    universal family (its collision bound does not formally apply; the
    estimator is still deterministic, symmetric, and empirically
    well-distributed).  Docs with no shingles get all-max signatures
    (match nothing).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = len(texts)
    sh, _srow, bounds = shingle_hashes(texts, k=k)
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    sigs = np.full((n_rows, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sigs
    x = _mod_m61(sh.astype(np.uint64, copy=True))
    starts = bounds[:-1]
    nonempty = bounds[1:] > bounds[:-1]
    red_starts = starts[nonempty]
    # permutations in column chunks: the full (n_shingles, num_perm)
    # intermediate would be hundreds of MB per task, and this VM faults
    # fresh pages lazily (~15x cold penalty) — small reused temporaries
    # keep the kernel warm (see BASELINE.md memory note)
    chunk = 8
    with np.errstate(over="ignore"):
        for c0 in range(0, num_perm, chunk):
            pm = _mod_m61(
                x[:, None] * a[None, c0 : c0 + chunk] + b[None, c0 : c0 + chunk]
            )
            sigs[nonempty, c0 : c0 + chunk] = np.minimum.reduceat(
                pm, red_starts, axis=0
            )
    return sigs


def lsh_bands(sigs: np.ndarray, *, bands: int = 32) -> np.ndarray:
    """(n_docs, bands) uint64 band hashes (rows = num_perm / bands)."""
    n_docs, num_perm = sigs.shape
    r = num_perm // bands
    with np.errstate(over="ignore"):
        out = np.zeros((n_docs, bands), dtype=np.uint64)
        # FNV fold over each band's rows
        for bidx in range(bands):
            h = np.full(n_docs, _FNV_OFFSET, dtype=np.uint64)
            for j in range(r):
                h = (h ^ sigs[:, bidx * r + j]) * _FNV_PRIME
            out[:, bidx] = h
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def simhash64(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit SimHash per doc from token hashes (occurrence-weighted)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = len(texts)
    th, row_idx = _token_hashes(texts)
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(th) == 0:
        return out
    bounds = _doc_boundaries(row_idx, n_rows)
    # (n_tokens, 64) bit matrix via unpackbits (little-endian uint64 ->
    # bit 0..63 per row) — ~8x less memory traffic than a 64-wide uint64
    # shift broadcast; value-identical
    bits = np.unpackbits(
        th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)
    starts = bounds[:-1]
    nonempty = bounds[1:] > bounds[:-1]
    ones = np.add.reduceat(bits, starts[nonempty], axis=0)
    # contrib sum = 2*ones - n_tokens_in_doc; bit set iff sum > 0
    n_tok = np.diff(bounds)[nonempty][:, None].astype(np.int32)
    sig_bits = (2 * ones - n_tok > 0).astype(np.uint64)
    vals = (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = vals
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.atleast_1d((a ^ b).astype(np.uint64))
    view = x.view(np.uint8).reshape(-1, 8)
    return np.unpackbits(view, axis=1).sum(axis=1).astype(np.int64)


def rolling_fingerprint(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Order-sensitive polynomial rolling hash of the token-hash stream
    (mod 2^61-1) per doc — a whole-document fingerprint that, unlike a
    content hash, ignores whitespace/punctuation variations."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = len(texts)
    th, row_idx = _token_hashes(texts)
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(th) == 0:
        return out
    # Horner's scheme per doc; vectorized over docs via per-position loop
    # bounded by the longest doc in the batch (max tokens/doc ~ few thousand)
    bounds = _doc_boundaries(row_idx, n_rows)
    lens = np.diff(bounds)
    max_len = int(lens.max())
    base = np.uint64(1_000_003)
    acc = np.zeros(n_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(max_len):
            sel = lens > j
            pos = bounds[:-1][sel] + j
            acc[sel] = _mod_m61(acc[sel] * base + _mod_m61(th[pos]))
    out[:] = acc
    return out
