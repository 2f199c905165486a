"""Approximate distinct counting (HyperLogLog) with an EXACT integer oracle.

A 100-TB corpus can't count distinct tokens/urls with a groupby — the
key set itself is the problem (the exact path, ``term_stats``, shuffles
every distinct key once).  HLL keeps a fixed 2^p-register sketch per
block instead: one streaming ``map_batches`` pass computes per-block
registers (vectorized ``np.maximum.at``), a 64-group sharded max merges
them (register ids are the only key space that moves — bounded at m =
2^p rows), and only the final m-row register table reaches the driver.
Register merge is elementwise max, so the sketch is associative and
order-independent — exactly what a Ray streaming reduction needs.

Everything up to the registers is PURE INTEGER math on the engine's
FNV-1a token hashes (functions/hashing.py, the same stream the minhash
sketch uses), so the register table is replicated bit-for-bit in DuckDB
(``sketch_sql.sql_hll_registers``): bucket = h // 2^(64-p), rank =
leading zeros of the low bits + 1 via ``length(bin(w))`` — no float in
sight.  The float ESTIMATE is a deterministic function of the registers
computed on the driver (with the standard small-range linear-counting
correction) and is tested for accuracy separately; the driver hash gate
compares the registers, not the float.

Reference: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007) — public algorithm.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

HLL_P = 12
HLL_M = 1 << HLL_P
W_BITS = 64 - HLL_P  # 52: fits BIGINT and float64-exact frexp
_W_MASK = np.uint64((1 << W_BITS) - 1)


def _batch_registers(h: np.ndarray) -> pa.Table:
    """Non-zero HLL registers for one batch of uint64 hashes."""
    reg = np.zeros(HLL_M, np.int64)
    if len(h):
        bucket = (h >> np.uint64(W_BITS)).astype(np.int64)
        w = h & _W_MASK
        # exact floor(log2 w)+1 via frexp (w < 2^52 < 2^53); frexp(0) -> 0
        bitlen = np.frexp(w.astype(np.float64))[1].astype(np.int64)
        rank = (W_BITS + 1) - bitlen  # w==0 -> 53, matches the SQL CASE
        np.maximum.at(reg, bucket, rank)
    nz = np.flatnonzero(reg)
    return pa.table(
        {
            "bucket": pa.array(nz, pa.int64()),
            "maxrank": pa.array(reg[nz], pa.int64()),
        }
    )


def hll_token_registers(
    docs: rd.Dataset, *, text_col: str = "text"
) -> rd.Dataset:
    """(bucket, maxrank) HLL registers over the clean-tokenization FNV
    token-hash stream of ``docs[text_col]`` (the minhash sketch's
    stream, sketch.py::_token_hashes).  One streaming pass; the merge
    key space is bounded at 2^p rows."""
    from ..functions.sketch import _token_hashes
    from .dedup import _sharded_groupby

    def partial(batch: pa.Table) -> pa.Table:
        h, _row = _token_hashes(batch[text_col])
        return _batch_registers(h)

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def agg(g):
        return g.groupby("bucket", as_index=False)["maxrank"].max()

    schema = pa.schema([("bucket", pa.int64()), ("maxrank", pa.int64())])
    return _sharded_groupby(partials, ["bucket"], agg, empty_schema=schema)


def hll_token_registers_by(
    docs: rd.Dataset, *, group_col: str = "lang", text_col: str = "text"
) -> rd.Dataset:
    """Per-group HLL registers: ``(group, bucket, maxrank)`` over the same
    FNV token-hash stream — the mergeable grouped-cardinality sketch (one
    sketch per group, registers merged by elementwise max).

    Shape: the per-batch pass scatters ranks into an (L x m) flat register
    block where L = distinct groups IN THE BATCH (languages are few), so
    the exchange key space is bounded at L_total * m rows; sharding by
    ``bucket`` co-locates every group's copy of a register without ever
    hashing the group string."""
    from .dedup import _sharded_groupby

    def partial(batch: pa.Table) -> pa.Table:
        from ..functions.sketch import _token_hashes

        h, row = _token_hashes(batch[text_col])
        groups = batch[group_col].to_pandas()
        empty = pa.table(
            {
                group_col: pa.array([], pa.string()),
                "bucket": pa.array([], pa.int64()),
                "maxrank": pa.array([], pa.int64()),
            }
        )
        if not len(h):
            return empty
        import pandas as pd

        codes, uniq = pd.factorize(groups, sort=False)
        gcode = codes[row].astype(np.int64)
        bucket = (h >> np.uint64(W_BITS)).astype(np.int64)
        w = h & _W_MASK
        bitlen = np.frexp(w.astype(np.float64))[1].astype(np.int64)
        rank = (W_BITS + 1) - bitlen
        flat = np.zeros(len(uniq) * HLL_M, np.int64)
        np.maximum.at(flat, gcode * HLL_M + bucket, rank)
        nz = np.flatnonzero(flat)
        return pa.table(
            {
                group_col: pa.array(
                    np.asarray(uniq, dtype=object)[nz // HLL_M], pa.string()
                ),
                "bucket": pa.array(nz % HLL_M, pa.int64()),
                "maxrank": pa.array(flat[nz], pa.int64()),
            }
        )

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def agg(g):
        return g.groupby([group_col, "bucket"], as_index=False)["maxrank"].max()

    schema = pa.schema(
        [(group_col, pa.string()), ("bucket", pa.int64()), ("maxrank", pa.int64())]
    )
    return _sharded_groupby(partials, ["bucket"], agg, empty_schema=schema)


def hll_estimate(registers) -> float:
    """Cardinality estimate from a (bucket, maxrank) register table
    (Dataset / pyarrow Table / pandas DataFrame; absent buckets = 0).

    Integer harmonic sum: sum of 2^(W_BITS+1 - M_j) as a PYTHON int
    (exact — a float accumulation of 2^-M terms is reduction-order-
    dependent once exponents span > the 53-bit mantissa), then one
    float division.  Standard small-range linear-counting correction."""
    if isinstance(registers, rd.Dataset):
        registers = registers.to_pandas()
    elif isinstance(registers, pa.Table):
        registers = registers.to_pandas()
    m = HLL_M
    reg = np.zeros(m, np.int64)
    if len(registers):
        reg[registers["bucket"].to_numpy()] = registers["maxrank"].to_numpy()
    scale = W_BITS + 1  # 2^scale == harmonic term of an empty register
    s_scaled = sum(1 << (scale - int(r)) for r in reg)  # exact int
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m * float(1 << scale) / float(s_scaled)
    if est <= 2.5 * m:
        v = int((reg == 0).sum())
        if v:
            est = m * math.log(m / v)
    return est
