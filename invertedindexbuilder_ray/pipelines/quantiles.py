"""Exact distributed quantiles for ANY value distribution.

``catalog.q_lineitem_quantiles`` is exact via value counts, which is
scale-safe only when the value domain is small (l_quantity: 50 values).
This module handles continuous / high-cardinality doubles (distinct ~ N)
with the classic iterative histogram-refinement selection:

1. doubles map to ORDER-PRESERVING uint64 keys (sign-magnitude bit
   trick), so every bisection step is integer-exact — no float-boundary
   ambiguity about which bin a value falls in;
2. one scan computes N and the global key range; each refinement round
   is one scan emitting a per-batch histogram of the active range(s)
   (n_bins counts per target, summed on the driver — only tiny count
   vectors ever leave the workers), narrowing each target rank's range
   by a factor of ``n_bins``;
3. once a target's range holds <= ``collect_limit`` values (guaranteed
   within ceil(64 / log2(n_bins)) rounds, and immediately when the
   range collapses to one key), a final scan collects just those values
   and picks the rank directly.

Semantics match DuckDB ``quantile_disc``: sorted[max(ceil(q*N)-1, 0)],
NULLs ignored, NULL result for an empty input.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_BIAS = 1 << 63
# all NaN bit patterns (positive- AND negative-sign) collapse onto ONE
# deterministic key ordered after +inf — the raw bit trick would have
# scattered negative-NaN patterns below -inf (round-3 advice).  The key is
# bits(+inf) + 1, which views back as a (quiet) NaN in key_to_double.
# NOTE: quantile extraction additionally DROPS NaNs before keying
# (``exact_quantiles_disc.keys_of``): measured DuckDB behavior is that
# quantile_disc ignores NaN like NULL ([1,2,3,NaN] @ q=1.0 -> 3.0,
# all-NaN -> NULL), even though ORDER BY sorts NaN last.
NAN_KEY = np.uint64(0x7FF0000000000001 + _BIAS)


def doubles_to_keys(v: np.ndarray) -> np.ndarray:
    """float64 -> uint64, strictly order-preserving (-0.0 and 0.0 collide,
    which is correct: they compare equal; every NaN maps to NAN_KEY,
    ordered after +inf to match DuckDB)."""
    v = np.ascontiguousarray(v, np.float64)
    b = v.view(np.int64)
    # negatives: value order is the REVERSE of bit order; -2^63 - b maps
    # (-0.0 .. -max) onto (0 .. -2^63+1) keeping value order ascending
    with np.errstate(over="ignore"):
        k = np.where(b >= 0, b, np.int64(-(1 << 63)) - b)
        keys = (k.astype(np.int64).view(np.uint64) + np.uint64(_BIAS)).astype(
            np.uint64
        )
    nan = np.isnan(v)
    if nan.any():
        keys[nan] = NAN_KEY
    return keys


def key_to_double(k: int) -> float:
    ik = int(k) - _BIAS
    if ik < 0:
        ik = -(1 << 63) - ik
    return float(np.int64(ik).view(np.float64))


def disc_rank(q: float, n: int) -> int:
    """DuckDB quantile_disc rank: max(ceil(q*N)-1, 0) (0-based)."""
    return max(int(math.ceil(q * n)) - 1, 0)


def exact_quantiles_disc(
    ds: rd.Dataset,
    col: str,
    qs: list[float],
    *,
    n_bins: int = 4096,
    collect_limit: int = 65536,
) -> pd.DataFrame:
    """(q, value) rows, quantile_disc-exact, for a float64 column of any
    cardinality.  Each scan streams; only histograms / <=collect_limit
    key arrays reach the driver."""
    n, vals = exact_order_stats(
        ds,
        col,
        lambda n_total: [disc_rank(q, n_total) for q in qs],
        n_bins=n_bins,
        collect_limit=collect_limit,
    )
    if n == 0:
        return pd.DataFrame([{"q": q, "value": float("nan")} for q in qs])
    return pd.DataFrame([{"q": q, "value": v} for q, v in zip(qs, vals)])


def exact_order_stats(
    ds: rd.Dataset,
    col: str,
    rank_fn,
    *,
    n_bins: int = 4096,
    collect_limit: int = 65536,
) -> tuple[int, list[float]]:
    """Exact 0-based order statistics of a float64 column after dropping
    NULL/NaN (DuckDB quantile semantics): ``rank_fn(n_nonnull)`` returns
    the rank list once the count is known (so callers can ask for e.g.
    the two middle elements of an even-sized column).  Returns
    ``(n_nonnull, values)``; ``values`` is empty when n is 0.  Same
    histogram-refinement machinery as :func:`exact_quantiles_disc`."""

    def keys_of(batch: pa.Table) -> np.ndarray:
        arr = batch[col].combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()  # quantile ignores NULLs (DuckDB semantics)
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        v = v[~np.isnan(v)]  # ...and NaNs too (measured: see NAN_KEY note)
        return doubles_to_keys(v)

    # ---- pass 1: N + global key range (per-batch partials, tiny rows)
    def minmax(batch: pa.Table) -> pa.Table:
        k = keys_of(batch)
        empty = len(k) == 0
        return pa.table(
            {
                "n": pa.array([len(k)], pa.int64()),
                "lo": pa.array([0 if empty else int(k.min())], pa.uint64()),
                "hi": pa.array([0 if empty else int(k.max())], pa.uint64()),
                "valid": pa.array([not empty]),
            }
        )

    parts = ds.map_batches(minmax, batch_format="pyarrow").take_all()
    n_total = sum(r["n"] for r in parts)
    if n_total == 0:
        return 0, []
    lo = min(r["lo"] for r in parts if r["valid"])
    hi = max(r["hi"] for r in parts if r["valid"])

    # per-target state: (rank within [a, b], a, b, count_in_range)
    targets = [
        {"rank": int(r), "a": lo, "b": hi, "count": n_total, "value": None}
        for r in rank_fn(n_total)
    ]
    for t in targets:
        if not 0 <= t["rank"] < n_total:
            raise ValueError(f"rank {t['rank']} out of range for n={n_total}")

    def active(t) -> bool:
        return t["value"] is None and t["count"] > collect_limit

    # ---- refinement rounds: histogram the active ranges, narrow by n_bins
    while any(active(t) for t in targets):
        plan = [
            (i, t["a"], t["b"], -(-(t["b"] - t["a"] + 1) // n_bins))
            for i, t in enumerate(targets)
            if active(t)
        ]

        def hist(batch: pa.Table, plan=plan) -> pa.Table:
            k = keys_of(batch)
            tis, blobs = [], []
            for ti, a, b, w in plan:
                m = k[(k >= a) & (k <= b)]
                c = np.bincount(
                    ((m - np.uint64(a)) // np.uint64(w)).astype(np.int64),
                    minlength=n_bins,
                )
                tis.append(ti)
                blobs.append(c.astype(np.int64).tobytes())
            return pa.table(
                {"ti": pa.array(tis, pa.int64()),
                 "counts": pa.array(blobs, pa.binary())}
            )

        # intermediate combine: without it the driver take_all sees
        # n_blocks x n_targets blob rows (~10^6 x 32 KB at 100 TB); each
        # combine task folds ~1024 rows into n_targets rows, no shuffle
        def combine(batch: pa.Table) -> pa.Table:
            acc: dict[int, np.ndarray] = {}
            tis = batch["ti"].to_numpy(zero_copy_only=False)
            for i in range(batch.num_rows):
                c = np.frombuffer(batch["counts"][i].as_py(), np.int64)
                acc[int(tis[i])] = acc.get(int(tis[i]), 0) + c
            return pa.table(
                {
                    "ti": pa.array(list(acc), pa.int64()),
                    "counts": pa.array(
                        [a.tobytes() for a in acc.values()], pa.binary()
                    ),
                }
            )

        rows = (
            ds.map_batches(hist, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow", batch_size=1024)
            .take_all()
        )
        sums: dict[int, np.ndarray] = {}
        for r in rows:
            c = np.frombuffer(r["counts"], np.int64)
            sums[r["ti"]] = sums.get(r["ti"], 0) + c
        for ti, a, b, w in plan:
            t = targets[ti]
            cum = np.cumsum(sums[ti])
            j = int(np.searchsorted(cum, t["rank"] + 1))
            t["rank"] -= int(cum[j - 1]) if j else 0
            t["a"] = a + j * w
            t["b"] = min(b, a + (j + 1) * w - 1)
            t["count"] = int(sums[ti][j])
            if t["a"] == t["b"]:  # range collapsed to one key — resolved
                t["value"] = key_to_double(t["a"])

    # ---- final pass: collect the (small) surviving ranges, pick by rank
    plan = [
        (i, t["a"], t["b"]) for i, t in enumerate(targets) if t["value"] is None
    ]
    if plan:
        def collect(batch: pa.Table, plan=plan) -> pa.Table:
            k = keys_of(batch)
            tis, blobs = [], []
            for ti, a, b in plan:
                m = k[(k >= a) & (k <= b)]
                tis.append(ti)
                blobs.append(m.tobytes())
            return pa.table(
                {"ti": pa.array(tis, pa.int64()),
                 "vals": pa.array(blobs, pa.binary())}
            )

        rows = ds.map_batches(collect, batch_format="pyarrow").take_all()
        buckets: dict[int, list[np.ndarray]] = {}
        for r in rows:
            buckets.setdefault(r["ti"], []).append(np.frombuffer(r["vals"], np.uint64))
        for ti, _, _ in plan:
            vals = np.sort(np.concatenate(buckets[ti]))
            targets[ti]["value"] = key_to_double(vals[targets[ti]["rank"]])

    return n_total, [t["value"] for t in targets]


GROUPED_MAX_GROUPS = 32


def exact_order_stats_grouped(
    ds: rd.Dataset,
    col: str,
    group_col: str,
    rank_fn,
    *,
    n_bins: int = 4096,
    collect_limit: int = 65536,
) -> dict:
    """Grouped :func:`exact_order_stats` in the SAME number of passes as
    the global version: every (group, rank) target refines through ONE
    shared histogram pass per round (the per-batch function computes
    the group array + keys once and slices per target), so pass count
    does not scale with the group count.  Groups are discovered in the
    first pass and must be a bounded enumeration
    (<= ``GROUPED_MAX_GROUPS``); NULL group keys and NULL/NaN values
    are dropped (DuckDB quantile semantics).  Returns
    ``{group: (n_nonnull, [values...])}``."""

    def gk_of(batch: pa.Table):
        g = batch[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = (
            batch[col].combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64, copy=False)
        )
        ok = ~pd.isna(g) & ~np.isnan(v)
        return g[ok], doubles_to_keys(v[ok])

    # ---- pass 1: per-group N + key range (per-batch partials, tiny rows)
    def minmax(batch: pa.Table) -> pa.Table:
        g, k = gk_of(batch)
        if not len(k):
            return pa.table(
                {
                    "g": pa.array([], pa.utf8()),
                    "n": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.uint64()),
                    "hi": pa.array([], pa.uint64()),
                }
            )
        order = np.argsort(g, kind="stable")
        gs, starts = np.unique(g[order], return_index=True)
        ends = np.append(starts[1:], len(g))
        ks = k[order]
        rows = {
            "g": [], "n": [], "lo": [], "hi": [],
        }
        for gi, s, e in zip(gs, starts, ends):
            seg = ks[s:e]
            rows["g"].append(str(gi))
            rows["n"].append(int(e - s))
            rows["lo"].append(int(seg.min()))
            rows["hi"].append(int(seg.max()))
        return pa.table(
            {
                "g": pa.array(rows["g"], pa.utf8()),
                "n": pa.array(rows["n"], pa.int64()),
                "lo": pa.array(rows["lo"], pa.uint64()),
                "hi": pa.array(rows["hi"], pa.uint64()),
            }
        )

    # combine in exact Python ints: pandas would upcast the uint64 key
    # bounds to float64 (groupby agg), rounding ~2^62-scale keys by up to
    # hundreds of ulps and silently excluding boundary elements
    acc: dict[str, list] = {}
    for r in ds.map_batches(minmax, batch_format="pyarrow").take_all():
        e = acc.setdefault(r["g"], [0, None, None])
        e[0] += int(r["n"])
        lo_i, hi_i = int(r["lo"]), int(r["hi"])
        e[1] = lo_i if e[1] is None else min(e[1], lo_i)
        e[2] = hi_i if e[2] is None else max(e[2], hi_i)
    if not acc:
        return {}
    if len(acc) > GROUPED_MAX_GROUPS:
        raise ValueError(
            f"exact_order_stats_grouped: {len(acc)} groups exceed the "
            f"bounded-enumeration precondition ({GROUPED_MAX_GROUPS})"
        )

    targets = []  # {g, rank, a, b, count, value}
    # rank_fn(n_g) or rank_fn(group, n_g) — group-aware callers (e.g. the
    # weighted mixture's per-source cut counts) need to know which group
    # they are ranking
    import inspect

    _rank_two_arg = len(inspect.signature(rank_fn).parameters) == 2

    totals: dict[str, int] = {}
    for gname, (n_g, lo_g, hi_g) in acc.items():
        totals[gname] = n_g
        for r in (rank_fn(gname, n_g) if _rank_two_arg else rank_fn(n_g)):
            if not 0 <= int(r) < n_g:
                raise ValueError(f"rank {r} out of range for n={n_g}")
            targets.append(
                {"g": gname, "rank": int(r), "a": lo_g,
                 "b": hi_g, "count": n_g, "value": None}
            )

    def active(t) -> bool:
        return t["value"] is None and t["count"] > collect_limit

    while any(active(t) for t in targets):
        plan = [
            (i, t["g"], t["a"], t["b"], -(-(t["b"] - t["a"] + 1) // n_bins))
            for i, t in enumerate(targets)
            if active(t)
        ]

        def hist(batch: pa.Table, plan=plan) -> pa.Table:
            g, k = gk_of(batch)
            gl = g.astype(str) if len(g) else g
            tis, blobs = [], []
            for ti, gn, a, b, w in plan:
                m = k[(gl == gn) & (k >= a) & (k <= b)]
                c = np.bincount(
                    ((m - np.uint64(a)) // np.uint64(w)).astype(np.int64),
                    minlength=n_bins,
                )
                tis.append(ti)
                blobs.append(c.astype(np.int64).tobytes())
            return pa.table(
                {"ti": pa.array(tis, pa.int64()),
                 "counts": pa.array(blobs, pa.binary())}
            )

        def combine(batch: pa.Table) -> pa.Table:
            acc: dict[int, np.ndarray] = {}
            tis = batch["ti"].to_numpy(zero_copy_only=False)
            for i in range(batch.num_rows):
                c = np.frombuffer(batch["counts"][i].as_py(), np.int64)
                acc[int(tis[i])] = acc.get(int(tis[i]), 0) + c
            return pa.table(
                {
                    "ti": pa.array(list(acc), pa.int64()),
                    "counts": pa.array(
                        [a.tobytes() for a in acc.values()], pa.binary()
                    ),
                }
            )

        rows = (
            ds.map_batches(hist, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow", batch_size=1024)
            .take_all()
        )
        sums: dict[int, np.ndarray] = {}
        for r in rows:
            c = np.frombuffer(r["counts"], np.int64)
            sums[r["ti"]] = sums.get(r["ti"], 0) + c
        for ti, gn, a, b, w in plan:
            t = targets[ti]
            cum = np.cumsum(sums[ti])
            j = int(np.searchsorted(cum, t["rank"] + 1))
            t["rank"] -= int(cum[j - 1]) if j else 0
            t["a"] = a + j * w
            t["b"] = min(b, a + (j + 1) * w - 1)
            t["count"] = int(sums[ti][j])
            if t["a"] == t["b"]:
                t["value"] = key_to_double(np.uint64(t["a"]))

    plan = [
        (i, t["g"], t["a"], t["b"])
        for i, t in enumerate(targets)
        if t["value"] is None
    ]
    if plan:
        def collect(batch: pa.Table, plan=plan) -> pa.Table:
            g, k = gk_of(batch)
            gl = g.astype(str) if len(g) else g
            tis, blobs = [], []
            for ti, gn, a, b in plan:
                m = k[(gl == gn) & (k >= a) & (k <= b)]
                tis.append(ti)
                blobs.append(m.tobytes())
            return pa.table(
                {"ti": pa.array(tis, pa.int64()),
                 "vals": pa.array(blobs, pa.binary())}
            )

        rows = ds.map_batches(collect, batch_format="pyarrow").take_all()
        buckets: dict[int, list[np.ndarray]] = {}
        for r in rows:
            buckets.setdefault(r["ti"], []).append(
                np.frombuffer(r["vals"], np.uint64)
            )
        for ti, *_ in plan:
            vals = np.sort(np.concatenate(buckets[ti]))
            targets[ti]["value"] = key_to_double(vals[targets[ti]["rank"]])

    out: dict = {}
    for gname, n_g in totals.items():
        out[gname] = (n_g, [t["value"] for t in targets if t["g"] == gname])
    return out


# ---------------------------------------------------------------------------
# Fixed-k trimmed mean per group — the robust-location aggregate: drop
# the TRIM_K lowest and TRIM_K highest prices per brand (total order
# (cents, partkey) makes the trim deterministic under ties) and average
# the rest.  Fixed k (not a fraction) keeps the distributed shape
# bounded: global bottom/top-k is contained in the union of per-block
# bottom/top-k candidates, so each block ships at most 2k rows per
# group plus an (n, sum) partial.

TRIM_K = 10
TRIM_SCALE = 10**6


def trimmed_mean_by_brand(part: rd.Dataset) -> pd.DataFrame:
    """Rows ``(p_brand, n, trimmed_sum, trimmed_n, mean_fp)`` over
    brands with more than 2*TRIM_K parts (price in half-away cents)."""
    from ..functions.rounding import round_half_away

    def partial(batch: pa.Table) -> pa.Table:
        cents = round_half_away(
            batch["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        df = pd.DataFrame(
            {"brand": batch["p_brand"].to_numpy(zero_copy_only=False),
             "cents": cents,
             "pk": pc.cast(batch["p_partkey"], pa.int64()).to_numpy(
                 zero_copy_only=False)}
        )
        stats = df.groupby("brand", as_index=False).agg(
            n=("cents", "size"), s=("cents", "sum"))
        srt = df.sort_values(["brand", "cents", "pk"])
        cand = pd.concat(
            [srt.groupby("brand").head(TRIM_K),
             srt.groupby("brand").tail(TRIM_K)]
        ).drop_duplicates()
        return pa.table(
            {
                "brand": pa.array(
                    list(stats["brand"].astype(str))
                    + list(cand["brand"].astype(str))),
                "n": pa.array(
                    list(stats["n"].astype(np.int64))
                    + [0] * len(cand), type=pa.int64()),
                "s": pa.array(
                    list(stats["s"].astype(np.int64))
                    + [0] * len(cand), type=pa.int64()),
                "cents": pa.array(
                    [0] * len(stats) + list(cand["cents"]),
                    type=pa.int64()),
                "pk": pa.array(
                    [-1] * len(stats) + list(cand["pk"]),
                    type=pa.int64()),
            }
        )

    parts = part.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cols = ["p_brand", "n", "trimmed_sum", "trimmed_n", "mean_fp"]
    if not len(parts):
        return pd.DataFrame(columns=cols).astype(
            {c: "int64" for c in cols[1:]})
    stats = parts[parts["pk"] < 0].groupby("brand", as_index=False)[
        ["n", "s"]].sum()
    cand = parts[parts["pk"] >= 0]
    rows = []
    for _, st in stats.iterrows():
        brand, n, s = st["brand"], int(st["n"]), int(st["s"])
        if n <= 2 * TRIM_K:
            continue
        c = cand[cand["brand"] == brand].sort_values(["cents", "pk"])
        bot = int(c["cents"].head(TRIM_K).sum())
        top = int(c["cents"].tail(TRIM_K).sum())
        tsum, tn = s - bot - top, n - 2 * TRIM_K
        rows.append((brand, n, tsum, tn, tsum * TRIM_SCALE // tn))
    out = pd.DataFrame(rows, columns=cols).sort_values(
        "p_brand").reset_index(drop=True)
    return out.astype({c: "int64" for c in cols[1:]})


SQL_TRIMMED_MEAN = f"""
WITH p AS (
    SELECT p_brand, CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
           p_partkey
    FROM part
),
r AS (
    SELECT p_brand, cents,
           row_number() OVER (
               PARTITION BY p_brand ORDER BY cents, p_partkey
           ) AS ra,
           row_number() OVER (
               PARTITION BY p_brand ORDER BY cents DESC, p_partkey DESC
           ) AS rd
    FROM p
),
agg AS (
    SELECT p_brand, count(*)::HUGEINT AS n, sum(cents)::HUGEINT AS total,
           sum(CASE WHEN ra <= {TRIM_K} THEN cents ELSE 0 END)::HUGEINT
               AS bot,
           sum(CASE WHEN rd <= {TRIM_K} THEN cents ELSE 0 END)::HUGEINT
               AS top
    FROM r GROUP BY 1
    HAVING count(*) > {2 * TRIM_K}
)
SELECT p_brand, n::BIGINT AS n,
       (total - bot - top)::BIGINT AS trimmed_sum,
       (n - {2 * TRIM_K})::BIGINT AS trimmed_n,
       ((total - bot - top) * {TRIM_SCALE} // (n - {2 * TRIM_K}))::BIGINT
           AS mean_fp
FROM agg ORDER BY p_brand
"""
