"""Temporal joins (pipelines/temporal.py) vs brute-force oracles.

Kernel tests are pure numpy (no Ray); dataset tests use the session
fixture.  The catalog entries (events_asof_prior_click /
events_window_agg) are additionally gated against DuckDB SQL by
test_catalog_vs_duckdb.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from invertedindexbuilder_ray.pipelines.temporal import (
    asof_indices,
    asof_join,
    range_join_agg,
    range_max,
    range_min,
    range_windows,
)


def _rand_case(seed: int, n_left: int = 200, n_right: int = 300):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 12, n_left).astype(np.int64)
    lt = rng.integers(0, 50, n_left).astype(np.int64)  # many duplicate ts
    rk = rng.integers(0, 12, n_right).astype(np.int64)
    rt = rng.integers(0, 50, n_right).astype(np.int64)
    tie = rng.permutation(n_right).astype(np.int64)  # unique -> deterministic
    return lk, lt, rk, rt, tie


def _brute_asof(lk, lt, rk, rt, tie, direction, strict):
    out = np.full(len(lk), -1, np.int64)
    for i, (k, t) in enumerate(zip(lk, lt)):
        if direction == "backward":
            ok = (rk == k) & ((rt < t) if strict else (rt <= t))
        else:
            ok = (rk == k) & ((rt > t) if strict else (rt >= t))
        cand = np.flatnonzero(ok)
        if len(cand) == 0:
            continue
        if direction == "backward":
            cand = cand[rt[cand] == rt[cand].max()]
            out[i] = cand[np.argmax(tie[cand])]
        else:
            cand = cand[rt[cand] == rt[cand].min()]
            out[i] = cand[np.argmin(tie[cand])]
    return out


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_kernel_fuzz(seed, direction, strict):
    lk, lt, rk, rt, tie = _rand_case(seed)
    got = asof_indices(lk, lt, rk, rt, tie, direction=direction, strict=strict)
    want = _brute_asof(lk, lt, rk, rt, tie, direction, strict)
    np.testing.assert_array_equal(got, want)


def test_asof_kernel_empty_right():
    lk = np.array([1, 2], np.int64)
    got = asof_indices(lk, lk, np.empty(0, np.int64), np.empty(0, np.int64),
                       np.empty(0, np.int64))
    np.testing.assert_array_equal(got, [-1, -1])


@pytest.mark.parametrize("seed", range(5))
def test_range_window_kernel_fuzz(seed):
    lk, lt, rk, rt, _ = _rand_case(seed)
    rng = np.random.default_rng(seed + 1000)
    vals = np.round(rng.uniform(0, 100, len(rk)), 2)
    lower, upper = -3, 7
    order, j_lo, j_hi = range_windows(lk, lt, rk, rt, lower, upper)
    sv = vals[order]
    n = j_hi - j_lo
    mn = range_min(sv, j_lo, j_hi)
    mx = range_max(sv, j_lo, j_hi)
    for i, (k, t) in enumerate(zip(lk, lt)):
        ok = (rk == k) & (rt >= t + lower) & (rt < t + upper)
        assert n[i] == ok.sum()
        if ok.any():
            assert mn[i] == vals[ok].min()
            assert mx[i] == vals[ok].max()
        else:
            assert np.isnan(mn[i]) and np.isnan(mx[i])


def test_range_minmax_single_and_full_span():
    vals = np.array([5.0, 1.0, 9.0, 3.0])
    lo = np.array([0, 0, 2, 1])
    hi = np.array([4, 1, 3, 1])  # full span, single, single, empty
    np.testing.assert_array_equal(range_max(vals, lo, hi)[:3], [9.0, 5.0, 9.0])
    np.testing.assert_array_equal(range_min(vals, lo, hi)[:3], [1.0, 5.0, 9.0])
    assert np.isnan(range_max(vals, lo, hi)[3])


# --------------------------------------------------------------------------
# Dataset-level


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


def test_asof_join_dataset(ray_session):
    left = pa.table(
        {
            "oid": pa.array([1, 2, 3, 4], pa.int64()),
            "k": pa.array([10, 10, 20, 30], pa.int64()),
            "t": pa.array([100, 50, 100, 100], pa.int64()),
        }
    )
    right = pa.table(
        {
            "rid": pa.array([7, 8, 9, 11], pa.int64()),
            "k": pa.array([10, 10, 10, 20], pa.int64()),
            # rows 8 and 9 tie on (k=10, t=60): tie_on=rid -> 9 wins
            "t": pa.array([40, 60, 60, 200], pa.int64()),
        }
    )
    out = (
        asof_join(
            _ds(left), _ds(right), on="k", left_ts="t", right_ts="t",
            payload={"rid": "match_rid", "t": "match_t"}, tie_on="rid",
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("oid")
        .reset_index(drop=True)
    )
    assert out["match_rid"].tolist() == [9, 7, None, None] or [
        x if pd.notna(x) else None for x in out["match_rid"]
    ] == [9, 7, None, None]
    assert [x if pd.notna(x) else None for x in out["match_t"]] == [
        60, 40, None, None]


def test_range_join_agg_dataset(ray_session):
    left = pa.table(
        {"oid": pa.array([1, 2], pa.int64()),
         "k": pa.array([10, 20], pa.int64()),
         "t": pa.array([100, 100], pa.int64())}
    )
    right = pa.table(
        {"k": pa.array([10, 10, 10, 20], pa.int64()),
         "t": pa.array([100, 105, 110, 99], pa.int64()),
         "v": pa.array([5.0, 1.0, 9.0, 2.0], pa.float64())}
    )
    out = (
        range_join_agg(
            _ds(left), _ds(right), on="k", left_ts="t", right_ts="t",
            lower_us=0, upper_us=10, value_col="v", num_partitions=3,
        )
        .to_pandas()
        .sort_values("oid")
        .reset_index(drop=True)
    )
    # oid=1: rows at t=100,105 -> n=2, min=1, max=5; oid=2: none in [100,110)
    assert out["n_match"].tolist() == [2, 0]
    assert out["min_value"].tolist()[0] == 1.0
    assert out["max_value"].tolist()[0] == 5.0
    assert pd.isna(out["min_value"][1]) and pd.isna(out["max_value"][1])


def test_asof_join_schema_stable_when_empty(ray_session):
    empty = pa.table(
        {"oid": pa.array([], pa.int64()), "k": pa.array([], pa.int64()),
         "t": pa.array([], pa.int64())}
    )
    right = pa.table(
        {"rid": pa.array([1], pa.int64()), "k": pa.array([1], pa.int64()),
         "t": pa.array([1], pa.int64())}
    )
    out = asof_join(
        _ds(empty), _ds(right), on="k", left_ts="t", right_ts="t",
        payload={"rid": "match_rid"}, num_partitions=2,
    )
    assert set(out.schema().names) == {"oid", "k", "t", "match_rid"}
    assert out.count() == 0


# ---------------------------------------------------------------------------
# band_join_pairs (stream-stream pair join)


def _ev_ds(rows, blocks=1):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "k": pa.array([r[1] for r in rows], pa.int64()),
            "t": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_band_join_pairs_hand_checked(ray_session):
    from invertedindexbuilder_ray.pipelines.temporal import band_join_pairs

    left = _ev_ds([(1, 7, 100), (2, 7, 200), (3, 8, 100)])
    right = _ev_ds([(10, 7, 95), (11, 7, 100), (12, 7, 199), (13, 9, 95)])
    # window [t-10, t): half-open — right at EXACTLY left t excluded
    df = (
        band_join_pairs(
            left, right, on="k", left_ts="t", right_ts="t",
            lower_us=-10, upper_us=0, left_id="id", right_id="id",
        )
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    got = list(df[["left_id", "right_id", "gap_us"]].itertuples(index=False, name=None))
    # left 1 (k7,t100): right 95 (gap 5); right 100 excluded (rt < lt)
    # left 2 (k7,t200): right 199 (gap 1)
    # left 3 (k8): no same-key rights
    assert got == [(1, 10, 5), (2, 12, 1)]
    assert df["key"].tolist() == [7, 7]


def test_band_join_pairs_split_invariant(ray_session):
    from invertedindexbuilder_ray.pipelines.temporal import band_join_pairs

    rows_l = [(i, i % 5, i * 7 % 1000) for i in range(200)]
    rows_r = [(1000 + i, i % 5, i * 13 % 1000) for i in range(300)]
    kw = dict(on="k", left_ts="t", right_ts="t", lower_us=-50, upper_us=0,
              left_id="id", right_id="id")
    one = (
        band_join_pairs(_ev_ds(rows_l), _ev_ds(rows_r), **kw)
        .to_pandas().sort_values(["left_id", "right_id"]).reset_index(drop=True)
    )
    many = (
        band_join_pairs(_ev_ds(rows_l, 7), _ev_ds(rows_r, 9), **kw)
        .to_pandas().sort_values(["left_id", "right_id"]).reset_index(drop=True)
    )
    assert len(one) > 0 and one.equals(many)


def test_band_join_pairs_empty_sides(ray_session):
    from invertedindexbuilder_ray.pipelines.temporal import band_join_pairs

    left = _ev_ds([(1, 7, 100)])
    # right side has no matching keys -> zero pairs, typed empty result
    right = _ev_ds([(9, 99, 1)])
    df = band_join_pairs(
        left, right, on="k", left_ts="t", right_ts="t",
        lower_us=-10, upper_us=0, left_id="id", right_id="id",
    ).to_pandas()
    assert len(df) == 0


# ---------------------------------------------------------------------------
# rolling_row_agg / running_sum (window-function family)


def test_rolling_row_agg_hand_checked(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.temporal import rolling_row_agg

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "u": pa.array([7, 7, 7, 7, 7, 8], pa.int64()),
            "ts": pa.array([10, 20, 30, 40, 50, 10], pa.int64()),
            "v": pa.array([5.0, 1.0, 9.0, 2.0, 3.0, 4.0]),
        }
    )
    df = (
        rolling_row_agg(
            rd.from_arrow(t), key="u", ts="ts", tie="id", value_col="v",
            preceding=2,
        )
        .to_pandas()
        .sort_values("tie")
        .reset_index(drop=True)
    )
    # frames (2 preceding + current): [5],[5,1],[5,1,9],[1,9,2],[9,2,3],[4]
    assert df["n_frame"].tolist() == [1, 2, 3, 3, 3, 1]
    assert df["max_value"].tolist() == [5.0, 5.0, 9.0, 9.0, 9.0, 4.0]


def test_rolling_split_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.temporal import rolling_row_agg

    n = 500
    t = pa.table(
        {
            "id": pa.array(list(range(n)), pa.int64()),
            "u": pa.array([i % 9 for i in range(n)], pa.int64()),
            "ts": pa.array([(i * 37) % 211 for i in range(n)], pa.int64()),
            "v": pa.array([float((i * 13) % 50) for i in range(n)]),
        }
    )
    kw = dict(key="u", ts="ts", tie="id", value_col="v", preceding=3)
    one = (
        rolling_row_agg(rd.from_arrow(t), **kw)
        .to_pandas().sort_values("tie").reset_index(drop=True)
    )
    many = (
        rolling_row_agg(rd.from_arrow(t).repartition(11), **kw)
        .to_pandas().sort_values("tie").reset_index(drop=True)
    )
    assert one.equals(many)


def test_running_sum_range_peers(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.temporal import running_sum

    # key 7 has ord ties (peers share the total, SQL RANGE default)
    t = pa.table(
        {
            "k": pa.array([7, 7, 7, 7, 8], pa.int64()),
            "o": pa.array([1, 2, 2, 3, 1], pa.int64()),
            "v": pa.array([10.0, 5.0, 5.0, 1.0, 2.0]),
        }
    )
    df = (
        running_sum(rd.from_arrow(t), key="k", order_col="o", value_col="v")
        .to_pandas()
        .sort_values(["key", "ord", "running"])
        .reset_index(drop=True)
    )
    assert df[df["key"] == 7]["running"].tolist() == [10.0, 20.0, 20.0, 21.0]
    assert df[df["key"] == 8]["running"].tolist() == [2.0]


def test_running_sum_rejects_fractional_values(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.temporal import running_sum

    t = pa.table(
        {
            "k": pa.array([1, 1], pa.int64()),
            "o": pa.array([1, 2], pa.int64()),
            "v": pa.array([1.5, 2.0]),
        }
    )
    with pytest.raises(Exception, match="integer-valued"):
        running_sum(
            rd.from_arrow(t), key="k", order_col="o", value_col="v"
        ).materialize()


def test_funnel_hand_checked(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.temporal import funnel_stages

    rows = [
        # user 1: full funnel (view 10, click 20, purchase 30)
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: click BEFORE view -> stage stops at 1 (strictly after)
        (2, 20, "view"), (2, 10, "click"),
        # user 3: purchase first doesn't count; view 5, click 7 -> stage 2
        (3, 1, "purchase"), (3, 5, "view"), (3, 7, "click"),
        # user 4: only unrelated events -> stage 0
        (4, 1, "error"),
        # user 5: simultaneous view/click (strict >) -> stage 1
        (5, 10, "view"), (5, 10, "click"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    df = (
        funnel_stages(
            rd.from_arrow(t), key="user_id", ts="ts", type_col="event_type",
            stages=["view", "click", "purchase"],
        )
        .to_pandas()
        .set_index("key")
        .sort_index()
    )
    assert df["stage"].tolist() == [3, 1, 2, 0, 1]
    assert df.loc[1, "t3_us"] == 30
    assert df.loc[3, "t2_us"] == 7
    import pandas as pd

    assert pd.isna(df.loc[2, "t2_us"]) and pd.isna(df.loc[4, "t1_us"])


def test_funnel_split_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.temporal import funnel_stages

    n = 600
    types = ["view", "click", "purchase", "error"]
    t = pa.table(
        {
            "user_id": pa.array([i % 37 for i in range(n)], pa.int64()),
            "ts": pa.array([(i * 17) % 997 for i in range(n)], pa.int64()),
            "event_type": pa.array([types[(i * 7) % 4] for i in range(n)]),
        }
    )
    kw = dict(key="user_id", ts="ts", type_col="event_type",
              stages=["view", "click", "purchase"])
    one = (
        funnel_stages(rd.from_arrow(t), **kw)
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    many = (
        funnel_stages(rd.from_arrow(t).repartition(13), **kw)
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    assert one.equals(many)
    assert (one["stage"] >= 0).all() and (one["stage"] <= 3).all()
