"""TPC-H tier: broadcast/partitioned-join path parity + small-sf sanity.

The driver gate (test_catalog_vs_duckdb) proves the default broadcast
path hash-exact vs DuckDB at sf0.01; here we force the over-limit
partitioned-join fallback (dim_limit=0) and assert it returns the
identical frame, and that every entry stays non-empty at sf0.001.
"""

from __future__ import annotations

import pandas as pd
import pytest

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("fn_name", [
    "q3_unshipped", "q7_volume_shipping", "q8_market_share",
    "q10_returned_items", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_qty_revenue", "q19_disjunctive",
])
def test_fallback_parity(ray_session, fn_name):
    from invertedindexbuilder_ray.pipelines import tpch

    fn = getattr(tpch, fn_name)
    fast = fn(SF001)
    slow = fn(SF001, dim_limit=0)
    if fn_name == "q17_small_qty_revenue":
        # q17's per-part stats broadcast raises loudly above its bound
        with pytest.raises(RuntimeError):
            fn(SF001, stats_limit=0)
    pd.testing.assert_frame_equal(_canon(fast), _canon(slow))


def test_all_nonempty_at_sf0001(ray_session):
    from invertedindexbuilder_ray.pipelines import tpch

    for fn in (
        tpch.q3_unshipped, tpch.q6_forecast_revenue, tpch.q7_volume_shipping,
        tpch.q8_market_share, tpch.q10_returned_items,
        tpch.q14_promo_revenue, tpch.q15_top_supplier,
        tpch.q17_small_qty_revenue, tpch.q18_large_orders,
        tpch.q19_disjunctive,
    ):
        out = fn(SF001)
        assert len(out) > 0, fn.__name__
        assert not out.isna().any().any(), fn.__name__
