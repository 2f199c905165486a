"""Temporal joins: as-of join and range-join aggregate.

Ray Data has no native as-of / range join, and the naive SQL shapes
(``row_number() OVER`` on the exploded match set, or a θ-join) explode
row counts.  Both operators here reuse the engine's one portable
exchange shape (``joins.partitioned_hash_join``): tag the two sides,
hash-bucket by the join key, union, ONE ``groupby("__bucket")``, and a
fully vectorized numpy kernel inside each bucket — no per-key groupby,
no sort network, no row explosion.

Inside a bucket the right side is lexsorted once by
``(key, ts, tie)`` and every left row resolves with O(log n)
``np.searchsorted`` probes over a rank-composed uint64 key::

    combined = (key_rank << 32) | ts_rank

which is lexicographically ordered, so "latest right row with the same
key and ts <= t" is one binary search.  Range aggregates (count / min /
max over ``[t+lo, t+hi)``) come from the window ``[j_lo, j_hi)`` in the
same sorted array: count is the width, min/max are two overlapping
power-of-two blocks of a sparse table (O(n log n) build, O(1)/query).
min/max/count are ORDER-INDEPENDENT, so results compare exactly against
a SQL oracle — unlike a float sum, whose value depends on reduction
order.

Partitioning assumption (document per the scale contract): a bucket
holds every row of the keys hashed to it, so ``num_partitions`` must
keep buckets to ~``JOIN_ROWS_PER_PARTITION`` rows (callers scale it
with input size via ``_partitions_for``).  A single pathologically hot
key (one user with 10M events) still lands in one bucket; the kernel
stays vectorized O(n log n) there, but that key's bucket is the
straggler — salt such keys upstream if they exist.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .joins import _bucket_hash

JOIN_ROWS_PER_PARTITION = 200_000


def _partitions_for(n_rows: int) -> int:
    return int(min(1024, max(8, -(-n_rows // JOIN_ROWS_PER_PARTITION))))


def _ts_int64(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """timestamp[us] (or any int-like) -> int64 view, order-preserving."""
    return col.cast(pa.int64())


# --------------------------------------------------------------------------
# vectorized in-bucket kernels


def _combined_keys(
    lk: np.ndarray, lt: np.ndarray, rk: np.ndarray, rt: np.ndarray, tie: np.ndarray
):
    """Shared setup: factorize keys over BOTH sides, rank right ts, and
    lexsort the right side by (key, ts, tie).  Returns
    (order, combined_sorted, kid_l, U) where ``combined_sorted`` is the
    sorted uint64 (key_rank << 32 | ts_rank) array and ``U`` the sorted
    unique right-ts values (for rank lookups of left-side probes)."""
    uniq = np.unique(np.concatenate([lk, rk]))
    if len(uniq) >= (1 << 31):  # pragma: no cover - 2B distinct keys/bucket
        raise ValueError("bucket has >=2^31 distinct keys; raise num_partitions")
    kid_l = np.searchsorted(uniq, lk).astype(np.uint64)
    kid_r = np.searchsorted(uniq, rk).astype(np.uint64)
    U = np.unique(rt)
    if len(U) >= (1 << 32):  # pragma: no cover
        raise ValueError("bucket has >=2^32 distinct timestamps; raise num_partitions")
    tr_rank = np.searchsorted(U, rt).astype(np.uint64)
    order = np.lexsort((tie, tr_rank, kid_r))
    combined = (kid_r << np.uint64(32)) | tr_rank
    return order, combined[order], kid_l, U


def asof_indices(
    lk: np.ndarray,
    lt: np.ndarray,
    rk: np.ndarray,
    rt: np.ndarray,
    tie: np.ndarray,
    *,
    direction: str = "backward",
    strict: bool = False,
) -> np.ndarray:
    """For each left row i, the index into the RIGHT arrays of its as-of
    match, or -1.  backward: last right row with rk==lk[i] and
    rt <= lt[i] (< if strict), ties broken to the LARGEST ``tie``.
    forward: first right row with rt >= lt[i] (>), ties to the SMALLEST
    ``tie``."""
    if len(rk) == 0:
        return np.full(len(lk), -1, np.int64)
    order, comb, kid_l, U = _combined_keys(lk, lt, rk, rt, tie)
    kid_sorted = comb >> np.uint64(32)
    if direction == "backward":
        side = "left" if strict else "right"
        rank = np.searchsorted(U, lt, side=side).astype(np.uint64)
        j = np.searchsorted(comb, (kid_l << np.uint64(32)) | rank, side="left") - 1
        valid = j >= 0
        jj = np.maximum(j, 0)
        valid &= kid_sorted[jj] == kid_l
    elif direction == "forward":
        side = "right" if strict else "left"
        rank = np.searchsorted(U, lt, side=side).astype(np.uint64)
        j = np.searchsorted(comb, (kid_l << np.uint64(32)) | rank, side="left")
        valid = j < len(comb)
        jj = np.minimum(j, len(comb) - 1)
        valid &= kid_sorted[jj] == kid_l
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    return np.where(valid, order[jj], -1).astype(np.int64)


def range_windows(
    lk: np.ndarray,
    lt: np.ndarray,
    rk: np.ndarray,
    rt: np.ndarray,
    lower: int,
    upper: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Half-open windows: for each left row, the slice [j_lo, j_hi) of
    the (key, ts)-sorted right side whose rows satisfy rk==lk and
    lt+lower <= rt < lt+upper.  Returns (order, j_lo, j_hi)."""
    if len(rk) == 0:
        z = np.zeros(len(lk), np.int64)
        return np.empty(0, np.int64), z, z.copy()
    tie = np.zeros(len(rk), np.int64)
    order, comb, kid_l, U = _combined_keys(lk, lt, rk, rt, tie)
    hi_bits = kid_l << np.uint64(32)
    rank_lo = np.searchsorted(U, lt + lower, side="left").astype(np.uint64)
    rank_hi = np.searchsorted(U, lt + upper, side="left").astype(np.uint64)
    j_lo = np.searchsorted(comb, hi_bits | rank_lo, side="left")
    j_hi = np.searchsorted(comb, hi_bits | rank_hi, side="left")
    j_hi = np.maximum(j_hi, j_lo)
    return order, j_lo.astype(np.int64), j_hi.astype(np.int64)


def range_max(vals_sorted: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """max over half-open windows [lo, hi) of ``vals_sorted`` via a
    sparse table (two overlapping power-of-two blocks per window); NaN
    where the window is empty.  Exact integer floor-log2 via frexp (a
    float np.log2 can round 2^k down to k-eps and break coverage)."""
    m = len(lo)
    out = np.full(m, np.nan)
    w = hi - lo
    nz = w > 0
    if len(vals_sorted) == 0 or not nz.any():
        return out
    k = np.zeros(m, np.int64)
    k[nz] = np.frexp(w[nz].astype(np.float64))[1] - 1  # exact floor(log2 w)
    kmax = int(k[nz].max())
    sp = [vals_sorted.astype(np.float64, copy=False)]
    for lev in range(1, kmax + 1):
        half = 1 << (lev - 1)
        prev = sp[-1]
        sp.append(np.maximum(prev[:-half], prev[half:]))
    for lev in np.unique(k[nz]):
        sel = nz & (k == lev)
        blk = 1 << int(lev)
        t = sp[int(lev)]
        out[sel] = np.maximum(t[lo[sel]], t[hi[sel] - blk])
    return out


def range_min(vals_sorted: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return -range_max(-vals_sorted, lo, hi)


# --------------------------------------------------------------------------
# Dataset operators


def _restore_null_types(g: pa.Table, expected: dict[str, pa.DataType]) -> pa.Table:
    # Ray's shuffle can strip the type from an ALL-NULL column (same
    # defect joins.partitioned_hash_join works around)
    for idx, name in enumerate(g.column_names):
        want = expected.get(name)
        if want is not None and pa.types.is_null(g.column(idx).type):
            g = g.set_column(idx, name, pa.nulls(g.num_rows, want))
    return g


def _np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str | tuple[str, str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    direction: str = "backward",
    strict: bool = False,
    tie_on: str | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """As-of join (DuckDB ``ASOF JOIN`` semantics, made deterministic).

    For each left row, attach the payload of the single right row with
    the same key whose ``right_ts`` is the latest <= ``left_ts``
    (``direction="backward"``; ``"forward"`` = earliest >=; ``strict``
    excludes equality).  Unmatched left rows keep NULL payloads (as-of
    is LEFT by construction).  When several right rows share the
    match timestamp, the row with the largest (backward) / smallest
    (forward) ``tie_on`` wins — DuckDB's ASOF leaves that choice
    unspecified, so pass ``tie_on`` whenever (key, ts) can repeat.

    ``payload`` maps right column -> output name; key/ts columns are
    int64 or timestamp[us].
    """
    lkey, rkey = (on, on) if isinstance(on, str) else on
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = list(lschema.names)
    ltypes = {c: lschema.field(c).type for c in lcols}
    ptypes = {out: rschema.field(src).type for src, out in payload.items()}
    clash = set(ptypes) & set(lcols)
    if clash:
        raise ValueError(f"payload output names collide with left columns: {clash}")
    if num_partitions is None:
        num_partitions = _partitions_for(max(left.count(), right.count()))

    def pad_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: b[c] for c in lcols}
        cols["__k"] = b[lkey].cast(pa.int64())
        cols["__t"] = _ts_int64(b[left_ts])
        cols["__tie"] = pa.nulls(n, pa.int64())
        for out in payload.values():
            cols[out] = pa.nulls(n, ptypes[out])
        cols["__bucket"] = pa.array(_bucket_hash(cols["__k"], num_partitions))
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def pad_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: pa.nulls(n, ltypes[c]) for c in lcols}
        cols["__k"] = b[rkey].cast(pa.int64())
        cols["__t"] = _ts_int64(b[right_ts])
        cols["__tie"] = (
            b[tie_on].cast(pa.int64()) if tie_on else pa.array(np.zeros(n, np.int64))
        )
        for src, out in payload.items():
            cols[out] = b[src]
        cols["__bucket"] = pa.array(_bucket_hash(cols["__k"], num_partitions))
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    out_cols = lcols + list(payload.values())
    expected = {
        **ltypes,
        **ptypes,
        "__k": pa.int64(),
        "__t": pa.int64(),
        "__tie": pa.int64(),
    }

    def merge_group(g: pa.Table) -> pa.Table:
        g = _restore_null_types(g, expected)
        mask_l = pc.equal(g["__side"], 0)
        lg = g.filter(mask_l)
        if lg.num_rows == 0:
            return pa.table({c: pa.array([], expected[c]) for c in out_cols})
        rg = g.filter(pc.invert(mask_l))
        idx = asof_indices(
            _np(lg["__k"]), _np(lg["__t"]),
            _np(rg["__k"]), _np(rg["__t"]), _np(rg["__tie"]),
            direction=direction, strict=strict,
        )
        take = pa.array(np.maximum(idx, 0), pa.int64(), mask=idx < 0)
        cols = {c: lg[c] for c in lcols}
        for out in payload.values():
            cols[out] = rg[out].combine_chunks().take(take)
        return pa.table(cols)

    lt = left.map_batches(pad_left, batch_format="pyarrow")
    rt = right.map_batches(pad_right, batch_format="pyarrow")
    out = lt.union(rt).groupby("__bucket").map_groups(
        merge_group, batch_format="pyarrow"
    )
    empty = pa.table({c: pa.array([], expected[c]) for c in out_cols})
    return out.map_batches(lambda t: t, batch_format="pyarrow").union(
        rd.from_arrow(empty)
    )


def range_join_agg(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str | tuple[str, str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    value_col: str,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Range join + aggregate, without materializing the match set.

    For each left row: over right rows with the same key and
    ``left_ts + lower_us <= right_ts < left_ts + upper_us`` (half-open),
    emit ``n_match`` (int64, 0 when none), ``min_value`` / ``max_value``
    (float64, NULL when none).  count/min/max are order-independent, so
    the result compares EXACTLY against a SQL oracle; a float sum would
    not (reduction-order ulps).
    """
    lkey, rkey = (on, on) if isinstance(on, str) else on
    lschema = left.schema().base_schema
    lcols = list(lschema.names)
    ltypes = {c: lschema.field(c).type for c in lcols}
    if num_partitions is None:
        num_partitions = _partitions_for(max(left.count(), right.count()))

    def pad_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: b[c] for c in lcols}
        cols["__k"] = b[lkey].cast(pa.int64())
        cols["__t"] = _ts_int64(b[left_ts])
        cols["__v"] = pa.nulls(n, pa.float64())
        cols["__bucket"] = pa.array(_bucket_hash(cols["__k"], num_partitions))
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def pad_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: pa.nulls(n, ltypes[c]) for c in lcols}
        cols["__k"] = b[rkey].cast(pa.int64())
        cols["__t"] = _ts_int64(b[right_ts])
        cols["__v"] = b[value_col].cast(pa.float64())
        cols["__bucket"] = pa.array(_bucket_hash(cols["__k"], num_partitions))
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    out_extra = {"n_match": pa.int64(), "min_value": pa.float64(),
                 "max_value": pa.float64()}
    out_cols = lcols + list(out_extra)
    expected = {**ltypes, "__k": pa.int64(), "__t": pa.int64(), "__v": pa.float64()}

    def merge_group(g: pa.Table) -> pa.Table:
        g = _restore_null_types(g, expected)
        mask_l = pc.equal(g["__side"], 0)
        lg = g.filter(mask_l)
        if lg.num_rows == 0:
            return pa.table(
                {c: pa.array([], (expected | out_extra)[c]) for c in out_cols}
            )
        rg = g.filter(pc.invert(mask_l))
        order, j_lo, j_hi = range_windows(
            _np(lg["__k"]), _np(lg["__t"]), _np(rg["__k"]), _np(rg["__t"]),
            int(lower_us), int(upper_us),
        )
        vals = _np(rg["__v"])[order] if len(order) else np.empty(0)
        n = j_hi - j_lo
        mn = range_min(vals, j_lo, j_hi)
        mx = range_max(vals, j_lo, j_hi)
        cols = {c: lg[c] for c in lcols}
        cols["n_match"] = pa.array(n, pa.int64())
        cols["min_value"] = pa.array(mn, pa.float64(), mask=np.isnan(mn))
        cols["max_value"] = pa.array(mx, pa.float64(), mask=np.isnan(mx))
        return pa.table(cols)

    lt = left.map_batches(pad_left, batch_format="pyarrow")
    rt = right.map_batches(pad_right, batch_format="pyarrow")
    out = lt.union(rt).groupby("__bucket").map_groups(
        merge_group, batch_format="pyarrow"
    )
    empty = pa.table({c: pa.array([], (expected | out_extra)[c]) for c in out_cols})
    return out.map_batches(lambda t: t, batch_format="pyarrow").union(
        rd.from_arrow(empty)
    )


def band_join_pairs(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str | tuple[str, str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    left_id: str,
    right_id: str,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Stream-stream band join MATERIALIZING the matched pairs: for each
    left row, every right row with the same key and ``left_ts + lower_us
    <= right_ts < left_ts + upper_us`` (half-open).  Columns:
    ``left_id, right_id, key, gap_us`` with ``gap_us = left_ts -
    right_ts`` (integer microseconds — exact on both sides).

    Same bucketed exchange as :func:`range_join_agg`; the per-bucket
    kernel explodes windows with ONE vectorized gather (the repeat/
    cumsum index trick — no Python loop over matches).  Row explosion
    is the declared semantics of a pair join: output size is the true
    match count, bounded per task by the bucket row cap times the
    window selectivity; use :func:`range_join_agg` when an aggregate
    suffices.
    """
    lkey, rkey = (on, on) if isinstance(on, str) else on
    if num_partitions is None:
        num_partitions = _partitions_for(max(left.count(), right.count()))

    def pad(b: pa.Table, *, side: int) -> pa.Table:
        n = b.num_rows
        key_col = lkey if side == 0 else rkey
        ts_col = left_ts if side == 0 else right_ts
        id_col = left_id if side == 0 else right_id
        k = b[key_col].cast(pa.int64())
        return pa.table(
            {
                "__id": b[id_col].cast(pa.int64()),
                "__k": k,
                "__t": _ts_int64(b[ts_col]),
                "__bucket": pa.array(_bucket_hash(k, num_partitions)),
                "__side": pa.array(np.full(n, side, np.int8)),
            }
        )

    out_types = {
        "left_id": pa.int64(),
        "right_id": pa.int64(),
        "key": pa.int64(),
        "gap_us": pa.int64(),
    }

    def merge_group(g: pa.Table) -> pa.Table:
        expected = {"__id": pa.int64(), "__k": pa.int64(), "__t": pa.int64()}
        g = _restore_null_types(g, expected)
        mask_l = pc.equal(g["__side"], 0)
        lg = g.filter(mask_l)
        rg = g.filter(pc.invert(mask_l))
        empty = pa.table({c: pa.array([], t) for c, t in out_types.items()})
        if lg.num_rows == 0 or rg.num_rows == 0:
            return empty
        lk, lt = _np(lg["__k"]), _np(lg["__t"])
        order, j_lo, j_hi = range_windows(
            lk, lt, _np(rg["__k"]), _np(rg["__t"]), int(lower_us), int(upper_us)
        )
        n = j_hi - j_lo
        total = int(n.sum())
        if total == 0:
            return empty
        rid_sorted = _np(rg["__id"])[order]
        rt_sorted = _np(rg["__t"])[order]
        # vectorized window explode: pair p belongs to left row
        # rep[p] and right sorted position j_lo[rep[p]] + offset
        rep = np.repeat(np.arange(len(n), dtype=np.int64), n)
        outs = np.cumsum(n) - n
        ridx = np.arange(total, dtype=np.int64) - np.repeat(outs, n) + np.repeat(j_lo, n)
        return pa.table(
            {
                "left_id": pa.array(_np(lg["__id"])[rep], pa.int64()),
                "right_id": pa.array(rid_sorted[ridx], pa.int64()),
                "key": pa.array(lk[rep], pa.int64()),
                "gap_us": pa.array(lt[rep] - rt_sorted[ridx], pa.int64()),
            }
        )

    lt_ds = left.map_batches(lambda b: pad(b, side=0), batch_format="pyarrow")
    rt_ds = right.map_batches(lambda b: pad(b, side=1), batch_format="pyarrow")
    out = lt_ds.union(rt_ds).groupby("__bucket").map_groups(
        merge_group, batch_format="pyarrow"
    )
    empty = pa.table({c: pa.array([], t) for c, t in out_types.items()})
    return out.map_batches(lambda t: t, batch_format="pyarrow").union(
        rd.from_arrow(empty)
    )


def rolling_row_agg(
    ds: rd.Dataset,
    *,
    key: str,
    ts: str,
    tie: str,
    value_col: str,
    preceding: int,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Row-frame window aggregate: for each row, ``count`` and ``max`` of
    ``value_col`` over the frame ``ROWS BETWEEN {preceding} PRECEDING AND
    CURRENT ROW`` within its key, ordered by ``(ts, tie)`` — the SQL
    row-frame window family (distinct from the TIME-range windows of
    :func:`range_join_agg`).  Output: ``(tie, n_frame, max_value)``.

    ``tie`` must be a unique int64 column (total order => deterministic
    frames on both sides).  One bucketed exchange; inside a bucket one
    lexsort by (key, ts, tie), per-key run starts via a boundary diff,
    frame maxima from the sparse range-max table — O(n log n), zero
    Python loops.  max/count are order-independent: exact vs SQL.
    """
    if num_partitions is None:
        num_partitions = _partitions_for(ds.count())

    def pad(b: pa.Table) -> pa.Table:
        k = b[key].cast(pa.int64())
        return pa.table(
            {
                "__k": k,
                "__t": _ts_int64(b[ts]),
                "__tie": b[tie].cast(pa.int64()),
                "__v": b[value_col].cast(pa.float64()),
                "__bucket": pa.array(_bucket_hash(k, num_partitions)),
            }
        )

    out_types = {"tie": pa.int64(), "n_frame": pa.int64(),
                 "max_value": pa.float64()}

    def kernel(g: pa.Table) -> pa.Table:
        expected = {"__k": pa.int64(), "__t": pa.int64(),
                    "__tie": pa.int64(), "__v": pa.float64()}
        g = _restore_null_types(g, expected)
        if g.num_rows == 0:
            return pa.table({c: pa.array([], t) for c, t in out_types.items()})
        k, t, ti, v = (_np(g[c]) for c in ("__k", "__t", "__tie", "__v"))
        order = np.lexsort((ti, t, k))
        k, t, ti, v = k[order], t[order], ti[order], v[order]
        n = len(k)
        idx = np.arange(n, dtype=np.int64)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        run_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        lo = np.maximum(idx - preceding, run_start)
        hi = idx + 1
        mx = range_max(v, lo, hi)
        return pa.table(
            {
                "tie": pa.array(ti, pa.int64()),
                "n_frame": pa.array(hi - lo, pa.int64()),
                "max_value": pa.array(mx, pa.float64()),
            }
        )

    out = ds.map_batches(pad, batch_format="pyarrow").groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow"
    )
    empty = pa.table({c: pa.array([], t) for c, t in out_types.items()})
    return out.map_batches(lambda x: x, batch_format="pyarrow").union(
        rd.from_arrow(empty)
    )


def running_sum(
    ds: rd.Dataset,
    *,
    key: str,
    order_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-key cumulative sum ordered by ``order_col``: SQL's
    ``sum(v) OVER (PARTITION BY key ORDER BY ord)`` with the SQL default
    RANGE frame — ties on ``ord`` are PEERS and share one total (the sf
    lineitem has duplicate (orderkey, linenumber) pairs, so this is
    load-bearing).  Output: ``(key, ord, running)``.

    EXACTNESS CONTRACT: ``value_col`` must be integer-valued (the sf
    l_quantity case) so the float64 cumsum is exact and order-
    independent; true-float running sums are reduction-order-dependent
    and can't be SQL-hash-paired.  One bucketed exchange, per-bucket
    lexsort + one ``np.cumsum`` rebased at key-run starts and broadcast
    forward to each peer group's END — zero Python loops.
    """
    if num_partitions is None:
        num_partitions = _partitions_for(ds.count())

    def pad(b: pa.Table) -> pa.Table:
        k = b[key].cast(pa.int64())
        return pa.table(
            {
                "__k": k,
                "__o": b[order_col].cast(pa.int64()),
                "__v": b[value_col].cast(pa.float64()),
                "__bucket": pa.array(_bucket_hash(k, num_partitions)),
            }
        )

    out_types = {"key": pa.int64(), "ord": pa.int64(), "running": pa.float64()}

    def kernel(g: pa.Table) -> pa.Table:
        expected = {"__k": pa.int64(), "__o": pa.int64(), "__v": pa.float64()}
        g = _restore_null_types(g, expected)
        if g.num_rows == 0:
            return pa.table({c: pa.array([], t) for c, t in out_types.items()})
        k, o, v = _np(g["__k"]), _np(g["__o"]), _np(g["__v"])
        if not np.all(v == np.floor(v)):
            raise ValueError(
                "running_sum requires an integer-valued value column: the "
                "bucket-wide float cumsum is only order-independent-exact "
                "for integers (see the EXACTNESS CONTRACT in the docstring)"
            )
        order = np.lexsort((o, k))
        k, o, v = k[order], o[order], v[order]
        c = np.cumsum(v)
        n = len(k)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        # prefix BEFORE each key run, broadcast down the run
        base = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        prefix = (c - v)[base]
        # RANGE frame: peers (same key AND ord) share the cumsum at the
        # peer group's LAST row — backward min-accumulate of last-row idx
        idx = np.arange(n, dtype=np.int64)
        is_last = np.empty(n, bool)
        is_last[-1] = True
        is_last[:-1] = (k[1:] != k[:-1]) | (o[1:] != o[:-1])
        end_idx = np.minimum.accumulate(
            np.where(is_last, idx, n - 1)[::-1]
        )[::-1]
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "ord": pa.array(o, pa.int64()),
                "running": pa.array(c[end_idx] - prefix, pa.float64()),
            }
        )

    out = ds.map_batches(pad, batch_format="pyarrow").groupby("__bucket").map_groups(
        kernel, batch_format="pyarrow"
    )
    empty = pa.table({c: pa.array([], t) for c, t in out_types.items()})
    return out.map_batches(lambda x: x, batch_format="pyarrow").union(
        rd.from_arrow(empty)
    )


def funnel_stages(
    events: rd.Dataset,
    *,
    key: str,
    ts: str,
    type_col: str,
    stages: list[str],
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Funnel analysis (sequential pattern match): per key, how far
    through the ordered ``stages`` list its events progress, where stage
    i+1 must occur STRICTLY AFTER the chosen (earliest-completing)
    stage-i event.  Output: ``(key, stage, t1_us..tk_us)`` — ``stage``
    is the count of stages reached, ``ti_us`` the completion timestamps
    (epoch microseconds, NULL when not reached; values < 2^53 so the
    float64 the driver compares through is exact).

    Greedy-earliest is optimal here: taking the earliest valid event at
    each stage can only enlarge the set of valid continuations, so the
    reached-stage count equals the maximum over all orderings.

    One bucketed exchange on the key; inside a bucket the kernel loops
    over the (constant, small) stage list, never over rows: per stage,
    one user-index gather + mask + ``np.minimum.at`` computes each
    key's earliest qualifying event.
    """
    if num_partitions is None:
        num_partitions = _partitions_for(events.count())
    n_stages = len(stages)

    def pad(b: pa.Table) -> pa.Table:
        # stage index; non-stage event types are dropped at the map side
        # but every key must still appear (stage-0 users) -> keep one
        # marker row per input row with y = -1 for non-stage types
        y = np.full(b.num_rows, -1, np.int64)
        tv = b[type_col]
        for i, s in enumerate(stages):
            # fill_null: a NULL event_type is "not this stage" (SQL's
            # `event_type = s` semantics), not an object-dtype mask crash
            eq = pc.fill_null(pc.equal(tv, s), False)
            y[eq.to_numpy(zero_copy_only=False)] = i
        k = b[key].cast(pa.int64())
        return pa.table(
            {
                "__k": k,
                "__t": _ts_int64(b[ts]),
                "__y": pa.array(y, pa.int64()),
                "__bucket": pa.array(_bucket_hash(k, num_partitions)),
            }
        )

    out_types = {"key": pa.int64(), "stage": pa.int64()}
    for i in range(n_stages):
        out_types[f"t{i + 1}_us"] = pa.int64()

    SENTINEL = np.int64(2**62)

    def kernel(g: pa.Table) -> pa.Table:
        expected = {"__k": pa.int64(), "__t": pa.int64(), "__y": pa.int64()}
        g = _restore_null_types(g, expected)
        if g.num_rows == 0:
            return pa.table({c: pa.array([], t) for c, t in out_types.items()})
        k, t, y = _np(g["__k"]), _np(g["__t"]), _np(g["__y"])
        uk = np.unique(k)
        uidx = np.searchsorted(uk, k)
        cur = np.full(len(uk), -SENTINEL, np.int64)  # "before everything"
        cols = {"key": pa.array(uk, pa.int64())}
        stage_count = np.zeros(len(uk), np.int64)
        ts_cols = []
        for i in range(n_stages):
            sel = y == i
            best = np.full(len(uk), SENTINEL, np.int64)
            if sel.any():
                ui = uidx[sel]
                tv = t[sel]
                ok = tv > cur[ui]
                np.minimum.at(best, ui[ok], tv[ok])
            reached = best < SENTINEL
            stage_count += reached.astype(np.int64)
            ts_cols.append((best, reached))
            # unreached keys get +SENTINEL so no later stage can qualify
            cur = np.where(reached, best, SENTINEL)
        cols["stage"] = pa.array(stage_count, pa.int64())
        for i, (best, reached) in enumerate(ts_cols):
            cols[f"t{i + 1}_us"] = pa.array(best, pa.int64(), mask=~reached)
        return pa.table(cols)

    out = events.map_batches(pad, batch_format="pyarrow").groupby(
        "__bucket"
    ).map_groups(kernel, batch_format="pyarrow")
    empty = pa.table({c: pa.array([], t) for c, t in out_types.items()})
    return out.map_batches(lambda x: x, batch_format="pyarrow").union(
        rd.from_arrow(empty)
    )


# --------------------------------------------------------------------------
# event-sequence transition counts (Markov chain over per-user streams)


def event_transitions(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    tie: str = "event_id",
) -> "pd.DataFrame":
    """Adjacent-pair transition counts over per-key event sequences:
    for each key, order events by ``(ts, tie)`` (the tie column makes
    the order total — the synthetic events table has duplicate
    timestamps on a grid) and count (from_type -> to_type) pairs
    globally, with ``prob = round(n / total_from, 6)`` as a rounded
    payload of exact int64 counts.

    Matches ``lead(type) OVER (PARTITION BY key ORDER BY ts, tie)``: a
    pair is dropped when its successor type is NULL — whether that NULL
    is end-of-partition or a genuinely NULL event type (SQL cannot
    distinguish them either).  NULL from_types form real groups.

    Shape (100 TB): keys are hash-sharded (``dedup._sharded_groupby``),
    a shard sorts once and shifts — every key's sequence lives in
    exactly one shard, so adjacency never crosses tasks; each shard
    emits at most |type alphabet|^2 partial counts, and only those tiny
    partials reach the driver.
    """
    import pandas as pd

    from .dedup import _sharded_groupby

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, tie], kind="mergesort")
        same = g[key].to_numpy()[1:] == g[key].to_numpy()[:-1]
        frm = g[type_col].to_numpy()[:-1][same]
        to = g[type_col].to_numpy()[1:][same]
        pairs = pd.DataFrame({"from_type": frm, "to_type": to})
        pairs = pairs[pd.notna(pairs["to_type"])]
        out = pairs.groupby(["from_type", "to_type"], as_index=False,
                            dropna=False).size()
        out = out.rename(columns={"size": "n"})
        # an all-NULL shard would otherwise infer Arrow `null`, which
        # clashes with utf8 blocks from other shards at union time
        out["from_type"] = out["from_type"].astype("string")
        out["to_type"] = out["to_type"].astype("string")
        out["n"] = out["n"].astype("int64")
        return out

    pschema = pa.schema(
        [("from_type", pa.utf8()), ("to_type", pa.utf8()), ("n", pa.int64())]
    )
    parts = _sharded_groupby(
        ds, [key], shard_pairs, empty_schema=pschema
    ).to_pandas()
    cols = ["from_type", "to_type", "n", "total_from", "prob"]
    if not len(parts):
        return pd.DataFrame(columns=cols)
    agg = parts.groupby(["from_type", "to_type"], as_index=False,
                        dropna=False)["n"].sum()
    agg["n"] = agg["n"].astype("int64")
    tot = agg.groupby("from_type", dropna=False)["n"].transform("sum")
    agg["total_from"] = tot.astype("int64")
    from ..functions.rounding import round_half_away

    agg["prob"] = round_half_away(
        agg["n"].to_numpy().astype(np.float64)
        / agg["total_from"].to_numpy().astype(np.float64),
        6,
    )
    for c in ("from_type", "to_type"):
        col = agg[c].astype(object)
        agg[c] = col.where(col.notna(), None)
    return agg[cols]


# ---------------------------------------------------------------------------
# CUSUM changepoint / burst onset detection over hourly event counts.
# All-integer recurrence (counts scaled by n_hours so the mean needs no
# division): S_t = max(0, S_{t-1} + (n*c_t - T)) over OBSERVED hours in
# ascending order; the peak S marks the end of the strongest upward
# deviation run.  The hour series is bounded (one row per hour), so the
# distributed part is the count aggregation; the recurrence itself is a
# driver loop here and a recursive CTE in the oracle.

CUSUM_MAX_HOURS = 200_000  # driver-loop + recursive-CTE bound, ~23 years


def cusum_hourly(events: rd.Dataset, *, ts: str = "ts") -> "pd.DataFrame":
    """One row: ``n_hours, total, max_cusum, peak_hour`` (peak_hour =
    epoch-hour index of the FIRST maximum; all zeros/NULL-free when the
    table is empty except n_hours/total = 0)."""
    import pandas as pd

    def per_batch(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"h": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        h = us // 3_600_000_000
        uh, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {"h": pa.array(uh, pa.int64()),
             "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = events.map_batches(per_batch, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    cols = ["n_hours", "total", "max_cusum", "peak_hour"]
    if not len(parts):
        return pd.DataFrame(
            [{"n_hours": 0, "total": 0, "max_cusum": 0, "peak_hour": -1}]
        ).astype({c: "int64" for c in cols})[cols]
    agg = parts.groupby("h", as_index=False)["c"].sum().sort_values("h")
    n = len(agg)
    if n > CUSUM_MAX_HOURS:
        raise ValueError(
            f"cusum_hourly: {n} observed hours exceeds the declared "
            f"recurrence bound {CUSUM_MAX_HOURS}"
        )
    c = agg["c"].to_numpy(np.int64)
    h = agg["h"].to_numpy(np.int64)
    total = int(c.sum())
    s = 0
    best = 0
    best_h = int(h[0])
    for i in range(n):
        s = max(0, s + int(n) * int(c[i]) - total)
        if s > best:
            best = s
            best_h = int(h[i])
    return pd.DataFrame(
        [{"n_hours": n, "total": total, "max_cusum": best,
          "peak_hour": best_h if best > 0 else -1}]
    ).astype({c_: "int64" for c_ in cols})[cols]


# ---------------------------------------------------------------------------
# per-user robust outliers: median/MAD per user computed exactly IN-SHARD
# (a user's rows co-locate under the user-sharded exchange, so the
# quantile_disc order stat is a vectorized in-shard sort — no global
# order-stat machinery and no per-user Ray groupby).  Values quantized to
# cents (round(value*100), exact double scaling region for |v| < 2^43).

OUTLIER_K = 3  # |v - med| > K * mad


def user_value_outliers_df(events: rd.Dataset) -> pd.DataFrame:
    """(user_id, n, med_cents, mad_cents, n_outliers): quantile_disc
    medians (element at ceil(N/2)-1 of the ascending sort — DuckDB
    quantile_disc(0.5) semantics), MAD the same order stat over
    |v - med|, outliers = count of |v - med| > OUTLIER_K * mad (0 when
    mad = 0 — ties collapse, matching the SQL)."""
    import pandas as pd

    from ..functions.rounding import round_half_away
    from .dedup import _sharded_groupby

    def quant(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()),
             "v": pa.array([], pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        vc = round_half_away(v * 100.0, 0).astype(np.int64)
        return pa.table(
            {"user_id": pc.cast(b["user_id"], pa.int64()),
             "v": pa.array(vc, pa.int64())}
        )

    rows = events.map_batches(quant, batch_format="pyarrow",
                              zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized over ALL users in the shard (no Python loop
        # over groups): one lexsort by (user, value) gives every user's
        # order stat as a gather at offset + ceil(n/2)-1
        u = g["user_id"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)

        def grouped_disc_median(keys, vals):
            order = np.lexsort((vals, keys))
            ks, vs = keys[order], vals[order]
            uk, starts = np.unique(ks, return_index=True)
            n = np.diff(np.append(starts, len(ks))).astype(np.int64)
            idx = starts + (-(-n // 2) - 1)  # ceil(n/2)-1 within group
            return uk, n, vs[idx]

        uk, n, med = grouped_disc_median(u, v)
        av = np.abs(v - med[np.searchsorted(uk, u)])
        uk2, _n2, mad = grouped_disc_median(u, av)
        mad_of = np.zeros(len(uk), np.int64)
        mad_of[np.searchsorted(uk, uk2)] = mad
        madv = mad_of[np.searchsorted(uk, u)]
        outl = (av > OUTLIER_K * madv) & (madv > 0)
        n_out = np.bincount(
            np.searchsorted(uk, u[outl]), minlength=len(uk)
        ).astype(np.int64)
        return pd.DataFrame(
            {"user_id": uk, "n": n, "med_cents": med,
             "mad_cents": mad_of, "n_outliers": n_out}
        ).astype({c: "int64" for c in
                  ("user_id", "n", "med_cents", "mad_cents",
                   "n_outliers")})

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("n", pa.int64()),
         ("med_cents", pa.int64()), ("mad_cents", pa.int64()),
         ("n_outliers", pa.int64())]
    )
    res = _sharded_groupby(rows, ["user_id"], per_shard,
                           empty_schema=part_schema).to_pandas()
    cols = ["user_id", "n", "med_cents", "mad_cents", "n_outliers"]
    if not len(res):
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    return res.astype({c: "int64" for c in cols})[cols]


# ---------------------------------------------------------------------------
# SAX symbolization of the global event-value series: tumbling windows of
# SAX_W events under the (ts, event_id) total order, PAA = truncating
# integer mean of cents-quantized values, alphabet of 4 symbols cut at
# the EXACT global quartiles (quantile_disc elements — integers, so the
# cuts are engine-independent).  Global window ids come from a two-level
# scan (per-hour counts -> driver exclusive prefix sums -> in-shard
# ranks), not a global sort: the hour map is bounded (CUSUM_MAX_HOURS).

SAX_W = 16


def value_sax_ds(events: rd.Dataset) -> rd.Dataset:
    """(win, n, paa_cents, symbol) per tumbling ``SAX_W``-event window."""
    import pandas as pd

    from ..functions.rounding import round_half_away
    from .dedup import _sharded_groupby
    from .quantiles import exact_quantiles_disc

    def quant(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"h": pa.array([], pa.int64()), "us": pa.array([], pa.int64()),
             "event_id": pa.array([], pa.int64()),
             "v": pa.array([], pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        vc = round_half_away(v * 100.0, 0).astype(np.int64)
        return pa.table(
            {"h": pa.array(us // 3_600_000_000, pa.int64()),
             "us": pa.array(us, pa.int64()),
             "event_id": pc.cast(b["event_id"], pa.int64()),
             "v": pa.array(vc, pa.int64())}
        )

    rows = events.map_batches(quant, batch_format="pyarrow",
                              zero_copy_batch=True)

    # pass A: per-hour counts -> driver exclusive prefix offsets
    def hour_counts(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy(zero_copy_only=False)
        uh, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {"h": pa.array(uh, pa.int64()),
             "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    hc = rows.map_batches(hour_counts, batch_format="pyarrow").to_pandas()
    out_schema = pa.schema(
        [("win", pa.int64()), ("n", pa.int64()),
         ("paa_cents", pa.int64()), ("symbol", pa.int64())]
    )
    if not len(hc):
        return rd.from_arrow(out_schema.empty_table())
    agg = hc.groupby("h", as_index=False)["c"].sum().sort_values("h")
    if len(agg) > CUSUM_MAX_HOURS:
        raise ValueError(
            f"value_sax: {len(agg)} observed hours exceeds the declared "
            f"driver-map bound {CUSUM_MAX_HOURS}"
        )
    csum = np.concatenate(
        ([0], np.cumsum(agg["c"].to_numpy(np.int64))[:-1]))
    off = dict(zip(agg["h"].astype("int64").tolist(),
                   (int(x) for x in csum)))

    # exact quartile breakpoints (quantile_disc elements are ints)
    def vonly(b: pa.Table) -> pa.Table:
        return pa.table(
            {"d": pc.cast(b["v"], pa.float64())}
        )

    bdf = exact_quantiles_disc(
        rows.map_batches(vonly, batch_format="pyarrow"), "d",
        [0.25, 0.5, 0.75])
    b1, b2, b3 = (int(x) for x in bdf["value"].tolist())

    # pass B: in-shard ranks (an hour's rows co-locate) -> window partials
    def per_hour(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for h, grp in g.groupby("h"):
            order = np.lexsort(
                (grp["event_id"].to_numpy(np.int64),
                 grp["us"].to_numpy(np.int64)))
            v = grp["v"].to_numpy(np.int64)[order]
            rank = off[int(h)] + np.arange(len(v), dtype=np.int64)
            win = rank // SAX_W
            f = pd.DataFrame({"win": win, "v": v})
            parts.append(f.groupby("win", as_index=False).agg(
                n=("v", "size"), s=("v", "sum")))
        out = pd.concat(parts, ignore_index=True)
        return out.astype({"win": "int64", "n": "int64", "s": "int64"})

    part_schema = pa.schema(
        [("win", pa.int64()), ("n", pa.int64()), ("s", pa.int64())]
    )
    parts = _sharded_groupby(rows, ["h"], per_hour)

    # pass C: combine window partials (a window may span hours/shards)
    def per_win(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby("win", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"))
        s = w["s"].to_numpy(np.int64)
        n = w["n"].to_numpy(np.int64)
        paa = np.sign(s) * (np.abs(s) // n)  # truncating, matches //
        sym = np.where(paa <= b1, 0,
                       np.where(paa <= b2, 1, np.where(paa <= b3, 2, 3)))
        return pd.DataFrame(
            {"win": w["win"], "n": n, "paa_cents": paa,
             "symbol": sym.astype(np.int64)}
        ).astype({"win": "int64", "n": "int64", "paa_cents": "int64",
                  "symbol": "int64"})

    return _sharded_groupby(parts, ["win"], per_win,
                            empty_schema=out_schema)


# ---------------------------------------------------------------------------
# hourly-series analytics: autocorrelation + EWMA smoothing.  Both reuse the
# cusum shape — the DISTRIBUTED part is the hourly count aggregation (one
# streaming pass, partial (h, c) rows per block), the bounded per-hour series
# is then analyzed on the driver behind the loud CUSUM_MAX_HOURS cap, with a
# self-join (ACF) / recursive-CTE (EWMA) DuckDB oracle.

ACF_LAGS = (1, 2, 3, 4, 5, 6)
EWMA_ALPHA_PCT = 20  # s_t = (20*x_t + 80*s_{t-1}) / 100
EWMA_SCALE = 1000  # fixed-point milli-units


def _hourly_counts(
    events: rd.Dataset, *, ts: str = "ts"
) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (hour, count) over the event stream: per-block partial
    np.unique counts, pandas combine on the driver, loud bound."""
    def per_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        uh, cnt = np.unique(us // 3_600_000_000, return_counts=True)
        return pa.table(
            {"h": pa.array(uh, pa.int64()),
             "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = events.map_batches(per_batch, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    if not len(parts):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    agg = parts.groupby("h", as_index=False)["c"].sum().sort_values("h")
    if len(agg) > CUSUM_MAX_HOURS:
        raise ValueError(
            f"_hourly_counts: {len(agg)} observed hours exceeds the "
            f"declared series bound {CUSUM_MAX_HOURS}"
        )
    return agg["h"].to_numpy(np.int64), agg["c"].to_numpy(np.int64)


def acf_hourly(events: rd.Dataset, *, ts: str = "ts") -> "pd.DataFrame":
    """Autocorrelation of the hourly event-count series at ACF_LAGS.

    Pairs are (c_h, c_{h+lag}) for hours where BOTH exist (gap hours
    pair with nothing — identical to the SQL self-join on h + lag).
    The five moments accumulate as exact Python ints (object-dtype
    sums, HUGEINT in SQL), so ``acf`` is one float expression over
    identical integers — bit-identical on both engines (the
    qty_discount_corr pattern).  Rows with no pairs keep zero moments
    and a NULL acf."""
    import pandas as pd

    from ..functions.rounding import round_half_away

    h, c = _hourly_counts(events, ts=ts)
    rows = []
    for lag in ACF_LAGS:
        idx = np.searchsorted(h, h + lag)
        valid = (idx < len(h))
        valid[valid] &= h[idx[valid]] == (h + lag)[valid]
        x = c[valid].astype(object)
        y = c[idx[valid]].astype(object)
        n = int(valid.sum())
        sx, sy = int(x.sum()), int(y.sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        sxy = int((x * y).sum())
        a = float(n * sxy - sx * sy)
        vb = float(n * sxx - sx * sx)
        vc = float(n * syy - sy * sy)
        acf = (
            float(round_half_away(np.array([a / np.sqrt(vb * vc)]), 9)[0])
            if vb * vc > 0 else None
        )
        rows.append((lag, n, sx, sy, sxx, syy, sxy, acf))
    out = pd.DataFrame(
        rows,
        columns=["lag", "n_pairs", "sx", "sy", "sxx", "syy", "sxy", "acf"],
    )
    for col in ("lag", "n_pairs", "sx", "sy", "sxx", "syy", "sxy"):
        out[col] = out[col].astype("int64")
    out["acf"] = out["acf"].astype("float64")
    return out


SQL_ACF_HOURLY = f"""
WITH hc AS (
    SELECT epoch_us(ts) // 3600000000 AS h, count(*)::HUGEINT AS c
    FROM events GROUP BY 1
),
lags(lag) AS (VALUES {", ".join(f"({lag})" for lag in ACF_LAGS)}),
p AS (
    SELECT l.lag, a.c AS x, b.c AS y
    FROM lags l
    JOIN hc a ON TRUE
    JOIN hc b ON b.h = a.h + l.lag
),
m AS (
    SELECT lag, count(*)::HUGEINT AS n,
           sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
           sum(x*x)::HUGEINT AS sxx, sum(y*y)::HUGEINT AS syy,
           sum(x*y)::HUGEINT AS sxy
    FROM p GROUP BY lag
)
SELECT l.lag::BIGINT AS lag,
       coalesce(m.n, 0)::BIGINT AS n_pairs,
       coalesce(m.sx, 0)::BIGINT AS sx, coalesce(m.sy, 0)::BIGINT AS sy,
       coalesce(m.sxx, 0)::BIGINT AS sxx, coalesce(m.syy, 0)::BIGINT AS syy,
       coalesce(m.sxy, 0)::BIGINT AS sxy,
       CASE WHEN (m.n*m.sxx - m.sx*m.sx)::DOUBLE
                 * (m.n*m.syy - m.sy*m.sy)::DOUBLE > 0
            THEN round((m.n*m.sxy - m.sx*m.sy)::DOUBLE
                       / sqrt((m.n*m.sxx - m.sx*m.sx)::DOUBLE
                              * (m.n*m.syy - m.sy*m.sy)::DOUBLE), 9)
       END AS acf
FROM lags l LEFT JOIN m USING (lag)
ORDER BY lag
"""


def ewma_hourly(events: rd.Dataset, *, ts: str = "ts") -> "pd.DataFrame":
    """Fixed-point EWMA over the hourly count series: s_1 = x_1*SCALE,
    s_t = (ALPHA*x_t*SCALE + (100-ALPHA)*s_{t-1}) // 100 — all-integer
    recurrence (non-negative terms, so truncating and flooring division
    agree), unrolled by a recursive CTE in the oracle.  Gap hours are
    SKIPPED, not zero-filled (the series is the observed hours, exactly
    as in cusum_hourly)."""
    import pandas as pd

    h, c = _hourly_counts(events, ts=ts)
    s = 0
    ew = np.empty(len(h), np.int64)
    for i in range(len(h)):
        if i == 0:
            s = int(c[0]) * EWMA_SCALE
        else:
            s = (EWMA_ALPHA_PCT * int(c[i]) * EWMA_SCALE
                 + (100 - EWMA_ALPHA_PCT) * s) // 100
        ew[i] = s
    return pd.DataFrame({
        "hour": pd.Series(h, dtype="int64"),
        "n_events": pd.Series(c, dtype="int64"),
        "ewma_milli": pd.Series(ew, dtype="int64"),
    })


SQL_EWMA_HOURLY = f"""
WITH RECURSIVE hc AS (
    SELECT epoch_us(ts) // 3600000000 AS h, count(*)::BIGINT AS c
    FROM events GROUP BY 1
),
o AS (SELECT h, c, row_number() OVER (ORDER BY h) AS rn FROM hc),
rec AS (
    SELECT rn, h, c, (c::HUGEINT * {EWMA_SCALE}) AS s
    FROM o WHERE rn = 1
    UNION ALL
    SELECT o.rn, o.h, o.c,
           ({EWMA_ALPHA_PCT} * o.c::HUGEINT * {EWMA_SCALE}
            + {100 - EWMA_ALPHA_PCT} * rec.s) // 100
    FROM rec JOIN o ON o.rn = rec.rn + 1
)
SELECT h::BIGINT AS hour, c::BIGINT AS n_events, s::BIGINT AS ewma_milli
FROM rec ORDER BY hour
"""


def seasonality_hod(events: rd.Dataset, *, ts: str = "ts") -> "pd.DataFrame":
    """Hour-of-day seasonality profile of the event stream: for each
    hod 0..23, the number of observed hours, total events, and the
    exact integer mean (milli-events/hour, total*1000 // n_hours).
    All 24 rows always emit (zeros when a slot never occurs)."""
    import pandas as pd

    h, c = _hourly_counts(events, ts=ts)
    hod = (h % 24).astype(np.int64)
    n_hours = np.zeros(24, np.int64)
    total = np.zeros(24, np.int64)
    for i in range(len(h)):
        n_hours[hod[i]] += 1
        total[hod[i]] += int(c[i])
    mean_milli = [
        int(total[i]) * 1000 // int(n_hours[i]) if n_hours[i] else 0
        for i in range(24)
    ]
    return pd.DataFrame({
        "hod": pd.Series(np.arange(24), dtype="int64"),
        "n_hours": pd.Series(n_hours, dtype="int64"),
        "total": pd.Series(total, dtype="int64"),
        "mean_milli": pd.Series(mean_milli, dtype="int64"),
    })


SQL_SEASONALITY_HOD = """
WITH hc AS (
    SELECT epoch_us(ts) // 3600000000 AS h, count(*)::BIGINT AS c
    FROM events GROUP BY 1
),
m AS (
    SELECT (h % 24)::BIGINT AS hod, count(*)::BIGINT AS n_hours,
           sum(c)::HUGEINT AS total
    FROM hc GROUP BY 1
),
slots AS (SELECT unnest(range(24)) AS hod)
SELECT s.hod::BIGINT AS hod,
       coalesce(m.n_hours, 0)::BIGINT AS n_hours,
       coalesce(m.total, 0)::BIGINT AS total,
       (CASE WHEN coalesce(m.n_hours, 0) > 0
             THEN m.total * 1000 // m.n_hours ELSE 0 END)::BIGINT
           AS mean_milli
FROM slots s LEFT JOIN m USING (hod)
ORDER BY s.hod
"""


MK_MAX_HOURS = 5_000  # O(n^2) sign-pair bound for the trend test


def mann_kendall_hourly(events: rd.Dataset, *, ts: str = "ts") -> "pd.DataFrame":
    """Mann-Kendall monotonic-trend test on the hourly count series
    (Mann 1945 / Kendall 1975 — public method).  S = Σ_{i<j}
    sign(c_j − c_i) and the tie-adjusted variance numerator
    n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) are exact integers; the
    continuity-corrected z is one float expression over them.  The
    pair scan is O(n²) on the bounded driver series (loud cap — at
    100 TB the series is still one row per hour)."""
    import pandas as pd

    h, c = _hourly_counts(events, ts=ts)
    n = len(h)
    if n > MK_MAX_HOURS:
        raise ValueError(
            f"mann_kendall_hourly: {n} hours exceeds the declared "
            f"O(n^2) bound {MK_MAX_HOURS}"
        )
    s = 0
    for j in range(1, n):  # bounded; ~12M sign ops at the cap
        s += int(np.sign(c[j] - c[:j]).sum())
    _, tcnt = np.unique(c, return_counts=True) if n else (None, np.empty(0))
    tie_term = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in tcnt)
    var_num = n * (n - 1) * (2 * n + 5) - tie_term
    from ..functions.rounding import round_half_away

    if var_num > 0:
        cc = 1 if s > 0 else (-1 if s < 0 else 0)
        z = float(round_half_away(
            np.array([(s - cc) / np.sqrt(var_num / 18.0)]), 9)[0])
    else:
        z = None
    out = pd.DataFrame([{
        "n_hours": n, "s_stat": s, "tie_term": tie_term,
        "var_num": var_num, "z": z,
    }])
    for col in ("n_hours", "s_stat", "tie_term", "var_num"):
        out[col] = out[col].astype("int64")
    out["z"] = out["z"].astype("float64")
    return out


SQL_MANN_KENDALL = """
WITH hc AS (
    SELECT epoch_us(ts) // 3600000000 AS h, count(*)::BIGINT AS c
    FROM events GROUP BY 1
),
p AS (
    SELECT CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sg
    FROM hc a JOIN hc b ON b.h > a.h
),
t AS (
    SELECT coalesce(sum(tt * (tt-1) * (2*tt+5)), 0)::HUGEINT AS tie_term
    FROM (SELECT count(*)::HUGEINT AS tt FROM hc GROUP BY c)
),
m AS (
    SELECT (SELECT count(*)::HUGEINT FROM hc) AS n,
           coalesce((SELECT sum(sg) FROM p), 0)::HUGEINT AS s,
           (SELECT tie_term FROM t) AS tie_term
)
SELECT n::BIGINT AS n_hours, s::BIGINT AS s_stat,
       tie_term::BIGINT AS tie_term,
       (n*(n-1)*(2*n+5) - tie_term)::BIGINT AS var_num,
       CASE WHEN n*(n-1)*(2*n+5) - tie_term > 0
            THEN round((s - CASE WHEN s > 0 THEN 1
                                 WHEN s < 0 THEN -1 ELSE 0 END)::DOUBLE
                       / sqrt((n*(n-1)*(2*n+5) - tie_term)::DOUBLE / 18.0),
                       9)
       END AS z
FROM m
"""


# ---------------------------------------------------------------------------
# Cross-correlation between two event-type hourly series.  Extends the
# ACF shape (acf_hourly above) to TWO series on a DENSE hour grid: the
# grid spans [min_h, max_h] of the union of both types' events, missing
# hours count 0 (the natural semantics for co-movement of sparse series;
# the ACF's observed-hours-only pairing would silently skip zero hours
# of one series whenever the other fired).  Five moments accumulate as
# exact Python ints (HUGEINT in SQL), so the Pearson r at each lag is
# one float expression over identical integers — bit-identical.

XCORR_LAGS = (-3, -2, -1, 0, 1, 2, 3)


def xcorr_hourly(
    events: rd.Dataset,
    *,
    type_a: str = "click",
    type_b: str = "purchase",
    ts: str = "ts",
    type_col: str = "event_type",
) -> "pd.DataFrame":
    """Lagged Pearson cross-correlation of ``type_a``'s hourly counts
    against ``type_b``'s at ``XCORR_LAGS`` (positive lag = b trails a).

    Shape (100 TB): ONE streaming filter+count pass per type (the
    ``_hourly_counts`` partial-unique combine); only (hour, count)
    partials reach the driver, bounded by ``CUSUM_MAX_HOURS``."""
    import pandas as pd

    from ..functions.rounding import round_half_away

    def only(t: str):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b[type_col], t))

        return f

    h_a, c_a = _hourly_counts(
        events.map_batches(only(type_a), batch_format="pyarrow"), ts=ts
    )
    h_b, c_b = _hourly_counts(
        events.map_batches(only(type_b), batch_format="pyarrow"), ts=ts
    )
    rows = []
    if len(h_a) or len(h_b):
        mn = int(min([x[0] for x in (h_a, h_b) if len(x)]))
        mx = int(max([x[-1] for x in (h_a, h_b) if len(x)]))
        t_len = mx - mn + 1
        if t_len > CUSUM_MAX_HOURS:
            raise ValueError(
                f"xcorr_hourly: {t_len} grid hours exceeds {CUSUM_MAX_HOURS}"
            )
        a = np.zeros(t_len, object)
        b = np.zeros(t_len, object)
        a[h_a - mn] = c_a
        b[h_b - mn] = c_b
        for lag in XCORR_LAGS:
            if lag >= 0:
                x, y = a[: t_len - lag], b[lag:]
            else:
                x, y = a[-lag:], b[: t_len + lag]
            n = len(x)
            if n == 0:
                rows.append((lag, 0, 0, 0, 0, 0, 0, None))
                continue
            sx, sy = int(x.sum()), int(y.sum())
            sxx, syy = int((x * x).sum()), int((y * y).sum())
            sxy = int((x * y).sum())
            vb = float(n * sxx - sx * sx)
            vc = float(n * syy - sy * sy)
            r = (
                float(round_half_away(
                    np.array([float(n * sxy - sx * sy) / np.sqrt(vb * vc)]), 9
                )[0])
                if vb * vc > 0 else None
            )
            rows.append((lag, n, sx, sy, sxx, syy, sxy, r))
    else:
        rows = [(lag, 0, 0, 0, 0, 0, 0, None) for lag in XCORR_LAGS]
    out = pd.DataFrame(
        rows,
        columns=["lag", "n_pairs", "sx", "sy", "sxx", "syy", "sxy", "xcorr"],
    )
    for col in ("lag", "n_pairs", "sx", "sy", "sxx", "syy", "sxy"):
        out[col] = out[col].astype("int64")
    out["xcorr"] = out["xcorr"].astype("float64")
    return out


def sql_xcorr_hourly(type_a: str = "click", type_b: str = "purchase") -> str:
    lags = ", ".join(f"({lag})" for lag in XCORR_LAGS)
    return f"""
WITH ab AS (
    SELECT epoch_us(ts) // 3600000000 AS h, event_type
    FROM events WHERE event_type IN ('{type_a}', '{type_b}')
),
bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM ab),
grid AS (
    SELECT unnest(range(mn, mx + 1)) AS h FROM bounds WHERE mn IS NOT NULL
),
ca AS (SELECT h, count(*)::HUGEINT AS c FROM ab
       WHERE event_type = '{type_a}' GROUP BY 1),
cb AS (SELECT h, count(*)::HUGEINT AS c FROM ab
       WHERE event_type = '{type_b}' GROUP BY 1),
a AS (SELECT g.h, coalesce(ca.c, 0) AS c FROM grid g LEFT JOIN ca USING (h)),
b AS (SELECT g.h, coalesce(cb.c, 0) AS c FROM grid g LEFT JOIN cb USING (h)),
lags(lag) AS (VALUES {lags}),
p AS (
    SELECT l.lag, a.c AS x, b.c AS y
    FROM lags l JOIN a ON TRUE JOIN b ON b.h = a.h + l.lag
),
m AS (
    SELECT lag, count(*)::HUGEINT AS n,
           sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
           sum(x*x)::HUGEINT AS sxx, sum(y*y)::HUGEINT AS syy,
           sum(x*y)::HUGEINT AS sxy
    FROM p GROUP BY lag
)
SELECT l.lag::BIGINT AS lag,
       coalesce(m.n, 0)::BIGINT AS n_pairs,
       coalesce(m.sx, 0)::BIGINT AS sx, coalesce(m.sy, 0)::BIGINT AS sy,
       coalesce(m.sxx, 0)::BIGINT AS sxx, coalesce(m.syy, 0)::BIGINT AS syy,
       coalesce(m.sxy, 0)::BIGINT AS sxy,
       CASE WHEN (m.n*m.sxx - m.sx*m.sx)::DOUBLE
                 * (m.n*m.syy - m.sy*m.sy)::DOUBLE > 0
            THEN round((m.n*m.sxy - m.sx*m.sy)::DOUBLE
                       / sqrt((m.n*m.sxx - m.sx*m.sx)::DOUBLE
                              * (m.n*m.syy - m.sy*m.sy)::DOUBLE), 9)
       END AS xcorr
FROM lags l LEFT JOIN m USING (lag)
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# Single best-split changepoint over the dense hourly count series:
# binary-segmentation step 1.  Between-segment "explained variance"
# score(k) = floor(sl^2 * SCALE / nl) + floor(sr^2 * SCALE / nr) is a
# DEFINED all-integer semantic (positive operands, so DuckDB's
# truncating // equals numpy/Python floor) — maximizing it over k is
# exactly maximizing sl^2/nl + sr^2/nr up to the quantization, and the
# rank key is pure int (score desc, split_hour asc).

CHANGEPOINT_SCALE = 10**6
CHANGEPOINT_TOP_K = 5


def changepoint_hourly(events: rd.Dataset, *, ts: str = "ts") -> "pd.DataFrame":
    """Top-``CHANGEPOINT_TOP_K`` mean-shift split points of the hourly
    event-count series (dense grid, missing hours = 0).  ``split_hour``
    is the first epoch-hour of the RIGHT segment.

    Shape (100 TB): the distributed part is the hourly count
    aggregation; the score scan is a driver loop over the bounded
    series (CUSUM_MAX_HOURS), exact Python-int arithmetic."""
    import pandas as pd

    cols = ["split_hour", "n_left", "n_right", "sum_left", "sum_right",
            "score"]
    h, c = _hourly_counts(events, ts=ts)
    if len(h) == 0:
        out = pd.DataFrame(columns=cols)
        return out.astype({k: "int64" for k in cols})
    mn = int(h[0])
    t_len = int(h[-1]) - mn + 1
    grid = np.zeros(t_len, object)
    grid[h - mn] = c
    total = int(grid.sum())
    cum = np.cumsum(grid)
    rows = []
    for k in range(1, t_len):
        sl = int(cum[k - 1])
        sr = total - sl
        score = (sl * sl * CHANGEPOINT_SCALE) // k + (
            sr * sr * CHANGEPOINT_SCALE
        ) // (t_len - k)
        rows.append((mn + k, k, t_len - k, sl, sr, score))
    rows.sort(key=lambda r: (-r[5], r[0]))
    rows = rows[:CHANGEPOINT_TOP_K]
    if rows and rows[0][5] >= 2**63:
        raise ValueError("changepoint_hourly: score exceeds int64")
    out = pd.DataFrame(rows, columns=cols)
    return out.astype({k: "int64" for k in cols})


SQL_CHANGEPOINT = f"""
WITH e AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM e),
grid AS (
    SELECT unnest(range(mn, mx + 1)) AS h FROM bounds WHERE mn IS NOT NULL
),
cnt AS (SELECT h, count(*)::HUGEINT AS c FROM e GROUP BY 1),
hc AS (SELECT g.h, coalesce(cnt.c, 0) AS c FROM grid g LEFT JOIN cnt USING (h)),
idx AS (SELECT h, c, row_number() OVER (ORDER BY h)::HUGEINT AS rn FROM hc),
tot AS (SELECT sum(c)::HUGEINT AS s, count(*)::HUGEINT AS t FROM hc),
pre AS (SELECT rn, h, sum(c) OVER (ORDER BY rn)::HUGEINT AS sl FROM idx),
sc AS (
    SELECT p.h + 1 AS split_hour, p.rn AS nl, tot.t - p.rn AS nr,
           p.sl, tot.s - p.sl AS sr
    FROM pre p, tot WHERE p.rn < tot.t
)
SELECT split_hour::BIGINT AS split_hour,
       nl::BIGINT AS n_left, nr::BIGINT AS n_right,
       sl::BIGINT AS sum_left, sr::BIGINT AS sum_right,
       ((sl*sl*{CHANGEPOINT_SCALE}) // nl
        + (sr*sr*{CHANGEPOINT_SCALE}) // nr)::BIGINT AS score
FROM sc
ORDER BY score DESC, split_hour ASC
LIMIT {CHANGEPOINT_TOP_K}
"""


# ---------------------------------------------------------------------------
# Unnormalized Haar wavelet energy spectrum of the hourly count series:
# pad the dense grid (anchored at min hour) to a FIXED 1024 slots, then
# 10 levels of pairwise (sum, difference); energy_k = sum(d^2) over the
# level's detail coefficients.  All-integer (differences of counts), so
# bit-exact; the level recursion unrolls to 10 chained GROUP BY CTEs in
# SQL with per-level distinct index names (DuckDB alias-vs-source
# binding in GROUP BY is ambiguous otherwise).

HAAR_LEN = 1024
HAAR_LEVELS = 10


def haar_hourly(events: rd.Dataset, *, ts: str = "ts") -> "pd.DataFrame":
    """Per-level Haar detail energy of the hourly count series: rows
    ``(level, n_coeffs, energy)`` for level 1 (finest, 2-hour pairs)
    through 10 (coarsest).  Raises if the observed span exceeds
    ``HAAR_LEN`` hours — the declared bound of the fixed transform."""
    import pandas as pd

    h, c = _hourly_counts(events, ts=ts)
    mn = int(h[0]) if len(h) else 0
    if len(h) and int(h[-1]) - mn + 1 > HAAR_LEN:
        raise ValueError(
            f"haar_hourly: span {int(h[-1]) - mn + 1} exceeds {HAAR_LEN}"
        )
    v = np.zeros(HAAR_LEN, object)
    if len(h):
        v[h - mn] = c
    rows = []
    for level in range(1, HAAR_LEVELS + 1):
        d = v[0::2] - v[1::2]
        v = v[0::2] + v[1::2]
        energy = int((d * d).sum())
        rows.append((level, len(d), energy))
    out = pd.DataFrame(rows, columns=["level", "n_coeffs", "energy"])
    return out.astype({"level": "int64", "n_coeffs": "int64",
                       "energy": "int64"})


def sql_haar_hourly() -> str:
    parts = [f"""
WITH e AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
bounds AS (SELECT coalesce(min(h), 0) AS mn FROM e),
cnt AS (SELECT h, count(*)::HUGEINT AS c FROM e GROUP BY 1),
l0 AS (
    SELECT g.i0, coalesce(cnt.c, 0) AS v
    FROM (SELECT unnest(range(0, {HAAR_LEN})) AS i0,
                 unnest(range(0, {HAAR_LEN})) + mn AS h
          FROM bounds) g
    LEFT JOIN cnt USING (h)
)"""]
    for k in range(1, HAAR_LEVELS + 1):
        parts.append(f""",
l{k} AS (
    SELECT i{k - 1} // 2 AS i{k},
           sum(v)::HUGEINT AS v,
           sum(CASE WHEN i{k - 1} % 2 = 0 THEN v ELSE -v END)::HUGEINT AS d
    FROM l{k - 1} GROUP BY i{k - 1} // 2
)"""
        )
    sels = [
        f"SELECT {k}::BIGINT AS level, count(*)::BIGINT AS n_coeffs,"
        f" coalesce(sum(d*d), 0)::BIGINT AS energy FROM l{k}"
        for k in range(1, HAAR_LEVELS + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(sels) + "\nORDER BY level"


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator over user lifetimes (time-to-churn):
# duration = whole days between a user's first and last event; a user
# still active within KM_CENSOR_DAYS of the stream's end is CENSORED
# (they may still be alive).  S(t) multiplies (n_risk - d)/n_risk over
# event times <= t; the product is evaluated as a SEQUENTIAL fixed-point
# integer recurrence (floor at every step, ascending t), so both
# engines produce the identical int64 curve — a recursive CTE in SQL,
# the same loop over the bounded distinct-duration table on the driver.

KM_CENSOR_US = 7 * 86_400_000_000  # active within 7 days of max ts
KM_DAY_US = 86_400_000_000
KM_SCALE = 10**9


def kaplan_meier(events: rd.Dataset, *, key: str = "user_id",
                 ts: str = "ts") -> "pd.DataFrame":
    """KM survival curve: one row per distinct duration with
    ``(duration_days, n_risk, n_events, n_censored, s_fp)``.

    Shape (100 TB): one streaming max pass (censor horizon), then a
    hash-sharded per-user min/max aggregate whose shard outputs are
    per-duration (d, c) partials — only the bounded distinct-duration
    table reaches the driver."""
    import pandas as pd

    from .dedup import _sharded_groupby

    def max_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([int(us.max())], pa.int64())})

    mx = events.map_batches(max_partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    cols = ["duration_days", "n_risk", "n_events", "n_censored", "s_fp"]
    if not len(mx):
        return pd.DataFrame(columns=cols).astype(
            {c: "int64" for c in cols})
    horizon = int(mx["m"].max())

    def shard_km(g: "pd.DataFrame") -> "pd.DataFrame":
        us = g[ts].astype("int64")
        per = us.groupby(g[key]).agg(["min", "max"])
        t = ((per["max"] - per["min"]) // KM_DAY_US).to_numpy(np.int64)
        cens = ((horizon - per["max"].to_numpy(np.int64)) < KM_CENSOR_US)
        out = pd.DataFrame({"t": t, "cens": cens.astype(np.int64)})
        agg = out.groupby("t", as_index=False).agg(
            d=("cens", lambda s: int((1 - s).sum())),
            c=("cens", "sum"),
        )
        return agg.astype({"t": "int64", "d": "int64", "c": "int64"})

    parts = _sharded_groupby(
        events, [key], shard_km,
        empty_schema=pa.schema(
            [("t", pa.int64()), ("d", pa.int64()), ("c", pa.int64())]
        ),
    ).to_pandas()
    agg = parts.groupby("t", as_index=False)[["d", "c"]].sum()
    agg = agg.sort_values("t").reset_index(drop=True)
    tot = (agg["d"] + agg["c"]).to_numpy(np.int64)
    n_risk = np.cumsum(tot[::-1])[::-1]
    s = KM_SCALE
    rows = []
    for i in range(len(agg)):
        nr, d = int(n_risk[i]), int(agg["d"][i])
        s = (s * (nr - d)) // nr
        rows.append((int(agg["t"][i]), nr, d, int(agg["c"][i]), s))
    return pd.DataFrame(rows, columns=cols).astype(
        {c: "int64" for c in cols})


SQL_KAPLAN_MEIER = f"""
WITH RECURSIVE mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
u AS (
    SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
    FROM events GROUP BY 1
),
d AS (
    SELECT (u.l - u.f) // {KM_DAY_US} AS t,
           CASE WHEN (mx.m - u.l) < {KM_CENSOR_US} THEN 1 ELSE 0 END
               AS cens
    FROM u, mx
),
agg AS (
    SELECT t, sum(1 - cens)::HUGEINT AS d, sum(cens)::HUGEINT AS c
    FROM d GROUP BY t
),
r AS (
    SELECT t, d, c,
           sum(d + c) OVER (ORDER BY t DESC)::HUGEINT AS n_risk
    FROM agg
),
ord AS (
    SELECT row_number() OVER (ORDER BY t) AS rn, t, d, c, n_risk FROM r
),
rec AS (
    SELECT rn, t, d, c, n_risk,
           ({KM_SCALE}::HUGEINT * (n_risk - d)) // n_risk AS s
    FROM ord WHERE rn = 1
    UNION ALL
    SELECT o.rn, o.t, o.d, o.c, o.n_risk,
           (rec.s * (o.n_risk - o.d)) // o.n_risk
    FROM ord o JOIN rec ON o.rn = rec.rn + 1
)
SELECT t::BIGINT AS duration_days, n_risk::BIGINT AS n_risk,
       d::BIGINT AS n_events, c::BIGINT AS n_censored, s::BIGINT AS s_fp
FROM rec ORDER BY t
"""


# ---------------------------------------------------------------------------
# Conditional next-event entropy H(next | current) per from_type — the
# information-theoretic summary of the transition table (how predictable
# is a user's next action given the current one).  Pure integers: with
# Lx the deterministic fixed-point log2 (textpipe._log2_fp_ext),
# h_num = sum_b n_ab * (Lx(n_a) - Lx(n_ab)) is an exact int64 and
# h_fp = h_num // n_a its per-transition average (DuckDB truncating //
# == floor on the nonnegative operands).


def markov_entropy(ds: rd.Dataset) -> "pd.DataFrame":
    """Rows ``(from_type, n_total, h_num, h_fp)`` over per-user adjacent
    event pairs (the event_transitions stream).  h_fp ~ entropy in bits
    * 1e9."""
    from .textpipe import _log2_fp_ext

    tr = event_transitions(ds)
    if not len(tr):
        import pandas as pd

        return pd.DataFrame(
            columns=["from_type", "n_total", "h_num", "h_fp"]
        ).astype({"n_total": "int64", "h_num": "int64", "h_fp": "int64"})
    n = tr["n"].to_numpy(np.int64)
    tot = tr["total_from"].to_numpy(np.int64)
    term = n.astype(object) * (_log2_fp_ext(tot) - _log2_fp_ext(n)).astype(
        object
    )
    tr = tr.assign(term=term)
    agg = tr.groupby("from_type", as_index=False, dropna=False).agg(
        n_total=("total_from", "first"), h_num=("term", "sum")
    )
    agg["h_num"] = agg["h_num"].astype("int64")
    agg["n_total"] = agg["n_total"].astype("int64")
    agg["h_fp"] = (
        agg["h_num"].astype(object) // agg["n_total"].astype(object)
    ).astype("int64")
    return agg.sort_values("from_type").reset_index(drop=True)[
        ["from_type", "n_total", "h_num", "h_fp"]
    ]


def _sql_lx(col: str) -> str:
    """DuckDB replication of textpipe._log2_fp_ext for k >= 1."""
    s = f"greatest(length(bin({col}))::BIGINT - 16, 0)"
    return (
        f"(CAST(round(log2(({col}) >> {s}) * 1000000000) AS BIGINT)"
        f" + {s} * 1000000000)"
    )


SQL_MARKOV_ENTROPY = f"""
WITH seq AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS to_type
    FROM events
),
p AS (
    SELECT from_type, to_type, count(*)::BIGINT AS n
    FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT from_type, sum(n)::BIGINT AS total_from FROM p GROUP BY 1),
terms AS (
    SELECT p.from_type, t.total_from,
           p.n * ({_sql_lx("t.total_from")} - {_sql_lx("p.n")}) AS term
    FROM p JOIN t ON p.from_type IS NOT DISTINCT FROM t.from_type
)
SELECT from_type, total_from::BIGINT AS n_total,
       sum(term)::BIGINT AS h_num,
       (sum(term) // total_from)::BIGINT AS h_fp
FROM terms GROUP BY from_type, total_from
ORDER BY from_type
"""


# ---------------------------------------------------------------------------
# Isotonic (monotone non-decreasing) regression of hour-of-day event
# counts via the minimax formula fit(t) = max_{i<=t} min_{j>=t}
# avg(c_i..c_j) (Robertson/Wright/Dykstra's closed form for PAVA —
# public textbook result).  Averages are quantized FIRST to
# floor(sum * 1e6 / len) so the max/min lattice runs over plain
# integers (nonnegative counts: DuckDB truncating // == floor), making
# the fit engine-independent; the minimax of any values is monotone in
# t regardless of quantization.  O(24^2) pairs — trivial both sides.

ISO_SCALE = 10**6
ISO_HOURS = 24


def isotonic_hourly(events: rd.Dataset, *, ts: str = "ts") -> "pd.DataFrame":
    """Rows ``(hod, c, fit_fp)``: observed hour-of-day counts and their
    quantized isotonic fit.  The distributed part is the count
    aggregation; the 24-point lattice is driver arithmetic."""
    import pandas as pd

    def per_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        uh, cnt = np.unique((us // 3_600_000_000) % ISO_HOURS,
                            return_counts=True)
        return pa.table(
            {"h": pa.array(uh.astype(np.int64)),
             "c": pa.array(cnt.astype(np.int64))}
        )

    parts = events.map_batches(per_batch, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    c = np.zeros(ISO_HOURS, object)
    if len(parts):
        agg = parts.groupby("h")["c"].sum()
        c[agg.index.to_numpy(np.int64)] = agg.to_numpy()
    cum = np.cumsum(c)
    a = np.full((ISO_HOURS, ISO_HOURS), None, object)  # a[i][j], i<=j
    for i in range(ISO_HOURS):
        for j in range(i, ISO_HOURS):
            s = int(cum[j]) - (int(cum[i - 1]) if i else 0)
            a[i][j] = s * ISO_SCALE // (j - i + 1)
    fit = []
    for t in range(ISO_HOURS):
        best = None
        for i in range(t + 1):
            m = min(a[i][j] for j in range(t, ISO_HOURS))
            best = m if best is None or m > best else best
        fit.append(best)
    out = pd.DataFrame(
        {"hod": np.arange(ISO_HOURS, dtype=np.int64),
         "c": [int(x) for x in c], "fit_fp": fit}
    )
    return out.astype({"hod": "int64", "c": "int64", "fit_fp": "int64"})


SQL_ISOTONIC = f"""
WITH e AS (SELECT (epoch_us(ts) // 3600000000) % {ISO_HOURS} AS h
           FROM events),
grid AS (SELECT unnest(range(0, {ISO_HOURS})) AS h),
cnt AS (SELECT h, count(*)::BIGINT AS c FROM e GROUP BY 1),
c AS (
    SELECT g.h, coalesce(cnt.c, 0)::HUGEINT AS c
    FROM grid g LEFT JOIN cnt USING (h)
),
cum AS (SELECT h, c, sum(c) OVER (ORDER BY h)::HUGEINT AS s FROM c),
pairs AS (
    SELECT i.h AS i, j.h AS j,
           ((j.s - i.s + i.c) * {ISO_SCALE} // (j.h - i.h + 1)) AS afp
    FROM cum i JOIN cum j ON j.h >= i.h
),
minj AS (
    SELECT t.h AS t, p.i, min(p.afp) AS m
    FROM grid t JOIN pairs p ON p.i <= t.h AND p.j >= t.h
    GROUP BY 1, 2
),
fit AS (SELECT t, max(m) AS fit_fp FROM minj GROUP BY t)
SELECT c.h::BIGINT AS hod, c.c::BIGINT AS c, fit.fit_fp::BIGINT AS fit_fp
FROM c JOIN fit ON fit.t = c.h
ORDER BY hod
"""


# ---------------------------------------------------------------------------
# Holt linear-trend (double exponential) smoothing over the hourly
# count series.  alpha = beta = 1/4 as power-of-two shifts: DuckDB `>>`
# FLOORS like numpy even on negatives (the embed_pca_power invariant),
# and the TREND accumulator genuinely goes negative, so `// 100`-style
# division (which truncates in DuckDB) would diverge — shifts are the
# only safe fixed-point divide here.

HOLT_SCALE = 1000  # milli fixed point
HOLT_SHIFT = 2     # alpha = beta = 1/4


def holt_hourly(events: rd.Dataset, *, ts: str = "ts") -> "pd.DataFrame":
    """Fixed-point Holt smoothing of the hourly event-count series.

    Recurrence (all int64; >> floors on both engines):
      t=1: f = l = x_1*S, b = 0
      t>1: f   = l' + b'                       (one-step-ahead forecast)
           l   = (x_t*S + 3*f) >> 2
           b   = ((l - l') + 3*b') >> 2
    Gap hours are skipped, not zero-filled (the cusum/ewma convention).
    Columns: ``hour, n_events, level_milli, trend_milli,
    forecast_milli`` — forecast is the value predicted BEFORE seeing
    x_t, so (n_events*S - forecast) is the holdout residual.

    Shape (100 TB): identical to ewma_hourly — per-block partial
    (hour, count) uniques, a bounded (CUSUM_MAX_HOURS) driver combine,
    then an O(hours) scalar recurrence that the SQL oracle unrolls as a
    recursive CTE."""
    import pandas as pd

    h, c = _hourly_counts(events, ts=ts)
    n = len(h)
    lvl = np.empty(n, np.int64)
    trd = np.empty(n, np.int64)
    fct = np.empty(n, np.int64)
    l = b = 0
    for i in range(n):
        if i == 0:
            l = int(c[0]) * HOLT_SCALE
            b = 0
            f = l
        else:
            f = l + b
            l_prev = l
            l = (int(c[i]) * HOLT_SCALE + 3 * f) >> HOLT_SHIFT
            b = ((l - l_prev) + 3 * b) >> HOLT_SHIFT
        lvl[i], trd[i], fct[i] = l, b, f
    return pd.DataFrame({
        "hour": pd.Series(h, dtype="int64"),
        "n_events": pd.Series(c, dtype="int64"),
        "level_milli": pd.Series(lvl, dtype="int64"),
        "trend_milli": pd.Series(trd, dtype="int64"),
        "forecast_milli": pd.Series(fct, dtype="int64"),
    })


SQL_HOLT_HOURLY = f"""
WITH RECURSIVE hc AS (
    SELECT epoch_us(ts) // 3600000000 AS h, count(*)::BIGINT AS c
    FROM events GROUP BY 1
),
o AS (SELECT h, c, row_number() OVER (ORDER BY h) AS rn FROM hc),
rec AS (
    SELECT rn, h, c,
           (c * {HOLT_SCALE})::BIGINT AS l,
           0::BIGINT AS b,
           (c * {HOLT_SCALE})::BIGINT AS f
    FROM o WHERE rn = 1
    UNION ALL
    SELECT o.rn, o.h, o.c,
           ((o.c * {HOLT_SCALE} + 3 * (rec.l + rec.b)) >> {HOLT_SHIFT}),
           ((((o.c * {HOLT_SCALE} + 3 * (rec.l + rec.b)) >> {HOLT_SHIFT})
             - rec.l + 3 * rec.b) >> {HOLT_SHIFT}),
           (rec.l + rec.b)
    FROM rec JOIN o ON o.rn = rec.rn + 1
)
SELECT h::BIGINT AS hour, c::BIGINT AS n_events,
       l::BIGINT AS level_milli, b::BIGINT AS trend_milli,
       f::BIGINT AS forecast_milli
FROM rec ORDER BY hour
"""


# ---------------------------------------------------------------- multi-touch
# conversion attribution: first / last / linear credit over the touches in a
# fixed window before each conversion

ATTR_CONV_TYPE = "purchase"
ATTR_TOUCH_TYPES = ("click", "view")
ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # 24 h
ATTR_PPM = 1_000_000


def conversion_attribution(events: rd.Dataset) -> "pd.DataFrame":
    """Multi-touch attribution: for every conversion (``ATTR_CONV_TYPE``
    event), credit the touch events (``ATTR_TOUCH_TYPES``) of the same
    user in ``[conv_ts - window, conv_ts)``.  Three models per touch
    type: first-touch (earliest ts, event_id asc tiebreak), last-touch
    (latest ts, event_id desc tiebreak), and linear credit as the exact
    integer ``count_type * 1e6 // n_touches`` ppm per conversion —
    floor == trunc since both sides are positive, so DuckDB ``//``
    reproduces it.

    Shape: one user-sharded exchange (conversions and touches carry a
    side flag into the same shard); in-shard the window slices come
    from the shared rank-composed-key machinery (``_combined_keys``
    with event_id as the right-side tie) and per-type counts are two
    prefix-sum lookups — no per-conversion loop.  Partials are <=
    |touch types| rows per shard, combined on the driver."""
    import pandas as pd

    from .dedup import _sharded_groupby

    type_map = {ATTR_CONV_TYPE: -1}
    for i, t in enumerate(ATTR_TOUCH_TYPES):
        type_map[t] = i

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"],
            value_set=pa.array(list(type_map), pa.string()),
        )
        t = t.filter(keep)
        codes = np.array(
            [type_map[s] for s in t["event_type"].to_pylist()], np.int64
        )
        return pa.table({
            "user_id": pa.array(_np(t["user_id"]).astype(np.int64)),
            "ts": pa.array(
                _np(_ts_int64(t["ts"].combine_chunks())).astype(np.int64)
            ),
            "event_id": pa.array(_np(t["event_id"]).astype(np.int64)),
            "code": pa.array(codes, pa.int64()),
        })

    flat = events.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True)
    ntypes = len(ATTR_TOUCH_TYPES)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        conv = g[g["code"] == -1]
        touch = g[g["code"] >= 0]
        ft = np.zeros(ntypes, np.int64)
        lt = np.zeros(ntypes, np.int64)
        lin = np.zeros(ntypes, np.int64)
        if len(conv) and len(touch):
            ck = conv["user_id"].to_numpy(np.int64)
            cts = conv["ts"].to_numpy(np.int64)
            tk = touch["user_id"].to_numpy(np.int64)
            tts = touch["ts"].to_numpy(np.int64)
            teid = touch["event_id"].to_numpy(np.int64)
            tcode = touch["code"].to_numpy(np.int64)
            order, comb, kid_l, U = _combined_keys(ck, cts, tk, tts, teid)
            hi_bits = kid_l << np.uint64(32)
            rank_lo = np.searchsorted(
                U, cts - ATTR_WINDOW_US, side="left").astype(np.uint64)
            rank_hi = np.searchsorted(U, cts, side="left").astype(np.uint64)
            lo = np.searchsorted(comb, hi_bits | rank_lo, side="left")
            hi = np.maximum(
                np.searchsorted(comb, hi_bits | rank_hi, side="left"), lo
            )
            code_sorted = tcode[order]
            has = hi > lo
            first_c = code_sorted[np.minimum(lo, len(order) - 1)]
            last_c = code_sorted[np.maximum(hi - 1, 0)]
            ft += np.bincount(first_c[has], minlength=ntypes).astype(np.int64)
            lt += np.bincount(last_c[has], minlength=ntypes).astype(np.int64)
            n_t = (hi - lo).astype(np.int64)
            for ci in range(ntypes):
                cum = np.concatenate(
                    [[0], np.cumsum(code_sorted == ci)]
                ).astype(np.int64)
                cnt = cum[hi] - cum[lo]
                lin[ci] += int(
                    (cnt[has] * ATTR_PPM // n_t[has]).sum()
                )
        return pd.DataFrame({
            "event_type": list(ATTR_TOUCH_TYPES),
            "first_touch": ft, "last_touch": lt, "linear_ppm": lin,
        })

    schema = pa.schema([
        ("event_type", pa.string()), ("first_touch", pa.int64()),
        ("last_touch", pa.int64()), ("linear_ppm", pa.int64()),
    ])
    parts = _sharded_groupby(flat, ["user_id"], per_shard,
                             empty_schema=schema).take_all()
    acc = {t: [0, 0, 0] for t in ATTR_TOUCH_TYPES}
    for r in parts:
        e = acc[r["event_type"]]
        e[0] += int(r["first_touch"])
        e[1] += int(r["last_touch"])
        e[2] += int(r["linear_ppm"])
    return pd.DataFrame({
        "event_type": list(ATTR_TOUCH_TYPES),
        "first_touch": pd.Series(
            [acc[t][0] for t in ATTR_TOUCH_TYPES], dtype="int64"),
        "last_touch": pd.Series(
            [acc[t][1] for t in ATTR_TOUCH_TYPES], dtype="int64"),
        "linear_ppm": pd.Series(
            [acc[t][2] for t in ATTR_TOUCH_TYPES], dtype="int64"),
    })


SQL_CONVERSION_ATTRIBUTION = f"""
WITH conv AS (
    SELECT user_id, ts, event_id AS cid FROM events
    WHERE event_type = '{ATTR_CONV_TYPE}'
),
touch AS (
    SELECT user_id, ts, event_id, event_type FROM events
    WHERE event_type IN ('{ATTR_TOUCH_TYPES[0]}', '{ATTR_TOUCH_TYPES[1]}')
),
j AS (
    SELECT c.cid, t.event_type, t.ts, t.event_id
    FROM conv c JOIN touch t
      ON t.user_id = c.user_id AND t.ts < c.ts
     AND t.ts >= c.ts - INTERVAL 24 HOUR
),
r AS (
    SELECT cid, event_type,
           row_number() OVER (PARTITION BY cid ORDER BY ts, event_id)
               AS rn_first,
           row_number() OVER (PARTITION BY cid ORDER BY ts DESC,
                              event_id DESC) AS rn_last
    FROM j
),
fl AS (
    SELECT event_type,
           sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END)::BIGINT AS ft,
           sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END)::BIGINT AS lt
    FROM r GROUP BY 1
),
per AS (SELECT cid, event_type, count(*)::BIGINT AS ct FROM j GROUP BY 1, 2),
tot AS (SELECT cid, sum(ct)::BIGINT AS nt FROM per GROUP BY 1),
lin AS (
    SELECT event_type,
           sum(ct * {ATTR_PPM} // nt)::BIGINT AS linear_ppm
    FROM per JOIN tot USING (cid) GROUP BY 1
)
SELECT t.event_type,
       coalesce(fl.ft, 0)::BIGINT AS first_touch,
       coalesce(fl.lt, 0)::BIGINT AS last_touch,
       coalesce(lin.linear_ppm, 0)::BIGINT AS linear_ppm
FROM (VALUES ('{ATTR_TOUCH_TYPES[0]}'), ('{ATTR_TOUCH_TYPES[1]}'))
     AS t(event_type)
LEFT JOIN fl USING (event_type)
LEFT JOIN lin USING (event_type)
"""
