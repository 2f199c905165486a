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
import pyarrow.compute as pc
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


# ---------------------------------------------------------------- KMV

KMV_K = 256
_U32 = 1 << 32


def _md5_u64(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """First 8 md5 digest bytes as little-endian uint64 per string —
    the engine twin of DuckDB ``md5_number_upper(text)`` (verified
    equal byte-for-byte on this build).  Same hashlib-off-the-Arrow-
    buffer walk as dedup_exact (catalog.py): md5 is kept because the
    SQL oracle can only reproduce md5."""
    import hashlib

    from ..functions.tokenize import _string_buffers

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    data, offsets = _string_buffers(texts)
    mv = memoryview(data)
    out = np.empty(len(texts), np.uint64)
    for i in range(len(texts)):
        d = hashlib.md5(mv[offsets[i]: offsets[i + 1]]).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return out


def kmv_minima(
    docs: rd.Dataset, *, text_col: str = "text", k: int = KMV_K
):
    """K-minimum-values distinct sketch over ``md5(text)`` hashes.

    The KMV synopsis (Bar-Yossef et al., RANDOM 2002; Beyer et al.,
    SIGMOD 2007 — public algorithms) keeps the k smallest DISTINCT
    hash values; the cardinality estimate is ``(k-1) * 2^64 // h_(k)``
    (pure integer, so the driver hash gate covers it), or the exact
    count when fewer than k distinct hashes exist.  Unlike HLL the
    synopsis also supports set operations (union = merge-min, and a
    Jaccard estimator over the combined minima).

    Shape: one streaming pass emits <= k candidate minima per block
    (already unique within the block), the driver merges
    ``k x n_blocks`` int rows — the data never shuffles.  Hashes split
    into (hi, lo) int32-range columns so both engines emit BIGINTs.

    Returns a pandas frame: rank (1-based by hash), h_hi, h_lo, est.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        h = np.unique(_md5_u64(batch[text_col]))[:k]
        return pa.table({
            "h_hi": pa.array((h >> np.uint64(32)).astype(np.int64)),
            "h_lo": pa.array((h & np.uint64(_U32 - 1)).astype(np.int64)),
        })

    parts = docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if len(parts):
        merged = np.unique(
            parts["h_hi"].to_numpy(np.int64).astype(np.uint64)
            * np.uint64(_U32)
            + parts["h_lo"].to_numpy(np.int64).astype(np.uint64)
        )[:k]
    else:
        merged = np.empty(0, np.uint64)
    m = len(merged)
    if m < k:
        est = m
    else:
        est = (k - 1) * (1 << 64) // int(merged[-1])
    return pd.DataFrame({
        "rank": pd.Series(np.arange(1, m + 1), dtype="int64"),
        "h_hi": pd.Series((merged >> np.uint64(32)).astype(np.int64),
                          dtype="int64"),
        "h_lo": pd.Series((merged & np.uint64(_U32 - 1)).astype(np.int64),
                          dtype="int64"),
        "est": pd.Series(np.full(m, est), dtype="int64"),
    })


def sql_kmv_minima(*, k: int = KMV_K, table: str = "documents") -> str:
    """DuckDB twin of kmv_minima: md5_number_upper == the engine's
    little-endian first-8-bytes md5 word; all arithmetic HUGEINT."""
    return f"""
WITH h AS (
    SELECT DISTINCT md5_number_upper(text)::HUGEINT AS h FROM {table}
),
mins AS (
    SELECT h, row_number() OVER (ORDER BY h) AS rank
    FROM h ORDER BY h LIMIT {k}
),
s AS (
    SELECT count(*) AS m, max(h) AS hk FROM mins
)
SELECT rank::BIGINT AS rank,
       (h // {_U32})::BIGINT AS h_hi,
       (h % {_U32})::BIGINT AS h_lo,
       (CASE WHEN s.m < {k} THEN s.m
             ELSE ({k - 1}::HUGEINT * {1 << 64}) // s.hk END)::BIGINT AS est
FROM mins CROSS JOIN s
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# AMS F2 (second frequency moment) sketch — Alon, Matias & Szegedy 1996
# (public algorithm, Gödel-prize streaming classic).  F2 = sum_v c_v^2
# measures stream skew/self-join size WITHOUT the per-key shuffle: each
# of R estimators keeps one signed counter S_r = sum_events sign_r(v) =
# sum_v c_v * sign_r(v), E[S_r^2] = F2.  The counter is ADDITIVE, so
# per-block partials merge by sum — no key space moves at all (the
# lightest sketch in the family: R plain integers).
#
# sign_r(v) = bit 63 of the multiply-shift hash (v * A_r + B_r) mod
# 2^64, with odd A_r < 2^61 so the DuckDB HUGEINT replication never
# overflows int128.  The exact F2 travels alongside via the sharded
# per-key count (the one honest shuffle, for the oracle comparison).

F2_R = 16
# deterministic odd multipliers < 2^61 and offsets < 2^62, derived from
# the public splitmix64 constants — inlined as literals in the SQL
F2_A = tuple(
    ((0x9E3779B97F4A7C15 * (r + 1)) % (1 << 61)) | 1 for r in range(F2_R)
)
F2_B = tuple((0xBF58476D1CE4E5B9 * (r + 1)) % (1 << 62) for r in range(F2_R))


def f2_sketch(events: rd.Dataset, *, key: str = "user_id") -> "pd.DataFrame":
    """R-row AMS F2 sketch of the ``key`` stream plus the exact F2:
    columns ``(r, s, est, f2)`` where ``est = s^2`` and ``f2`` is the
    exact second moment (identical on every row).

    Shape (100 TB): the sketch is one streaming pass emitting R ints
    per block; only the exact-F2 oracle column costs a (sharded,
    per-key-count) exchange."""
    import pandas as pd

    from .dedup import _sharded_groupby

    a = np.array(F2_A, np.uint64)[:, None]
    b = np.array(F2_B, np.uint64)[:, None]

    def partial(batch: pa.Table) -> pa.Table:
        u = pc.cast(batch[key], pa.int64()).to_numpy(zero_copy_only=False)
        u = u.astype(np.uint64)[None, :]
        with np.errstate(over="ignore"):
            h = u * a + b
        signs = np.where((h >> np.uint64(63)).astype(bool), -1, 1)
        return pa.table(
            {
                "r": pa.array(np.arange(F2_R, dtype=np.int64)),
                "s": pa.array(signs.sum(axis=1).astype(np.int64)),
            }
        )

    parts = events.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    s = (
        parts.groupby("r", as_index=False)["s"].sum()
        if len(parts)
        else pd.DataFrame({"r": range(F2_R), "s": [0] * F2_R})
    )
    s["s"] = s["s"].astype("int64")
    s = s.sort_values("r").reset_index(drop=True)

    def shard_f2(g: "pd.DataFrame") -> "pd.DataFrame":
        c = g.groupby(key).size().to_numpy(np.int64).astype(object)
        return pd.DataFrame({"f2p": [int((c * c).sum())]})

    f2parts = _sharded_groupby(
        events, [key], shard_f2,
        empty_schema=pa.schema([("f2p", pa.int64())]),
    ).to_pandas()
    f2 = int(f2parts["f2p"].sum()) if len(f2parts) else 0
    out = pd.DataFrame(
        {
            "r": s["r"],
            "s": s["s"],
            "est": (s["s"].astype(object) * s["s"].astype(object)).astype(
                "int64"
            ),
            "f2": np.int64(f2),
        }
    )
    return out.astype({"r": "int64", "s": "int64", "est": "int64",
                       "f2": "int64"})


def sql_f2_sketch(key: str = "user_id", table: str = "events") -> str:
    m64 = 1 << 64
    rows = ", ".join(
        f"({r}, {F2_A[r]}::HUGEINT, {F2_B[r]}::HUGEINT)" for r in range(F2_R)
    )
    return f"""
WITH params(r, a, b) AS (VALUES {rows}),
s AS (
    SELECT p.r,
           coalesce(sum(CASE WHEN (({key}::HUGEINT * p.a + p.b) % {m64})
                                  >= {1 << 63} THEN -1 ELSE 1 END), 0)::BIGINT
               AS s
    FROM params p LEFT JOIN {table} ON TRUE
    GROUP BY p.r
),
f2 AS (
    SELECT coalesce(sum(c * c), 0)::BIGINT AS f2
    FROM (SELECT count(*)::HUGEINT AS c FROM {table} GROUP BY {key})
)
SELECT s.r::BIGINT AS r, s.s, (s.s::HUGEINT * s.s)::BIGINT AS est, f2.f2
FROM s CROSS JOIN f2
ORDER BY r
"""
