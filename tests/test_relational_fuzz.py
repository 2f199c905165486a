"""Fuzz the relational catalog entries on RANDOM TPC-H-ish tables.

Generated lineitem/orders/customer/nation parquet with adversarial
shapes the sf tables don't exercise: duplicate (orderkey, linenumber)
pairs, orders with no lineitems and vice versa, customers with no
nation match, empty segments.  l_quantity stays integer-valued (the
documented exactness contract for summed measures); o_totalprice is
2-decimal but only ever filtered on, never summed, in the fuzzed
entries.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

FUZZ_ENTRIES = [
    "lineitem_agg",
    "lineitem_running_sum",
    "quantity_percent_rank",
    "lineitem_quantiles",
    "semi_join",
    "anti_join",
    "qty_by_nation",
    "orders_rollup",
    "top_order_per_customer",
    "qty_discount_corr",
    "group_median_price",
    "bloom_semi_join",
    "zorder_layout",
    "customer_year_sets",
    "pareto_front",
    "customer_order_balance",
    "price_ntile",
    "custdist",
    "rich_inactive",
    "order_priority_ct",
    "tpch_q8_market_share",
    "tpch_q15_top_supplier",
    "tpch_q19_disjunctive",
    "copurchase_pairs",
    "benford_digits",
    "qty_discount_ols",
    "anova_acctbal",
    "tpch_q11_important_parts",
    "tpch_q12_latency",
    "tpch_q16_supplier_cnt",
    "tpch_q21_late_supplier",
]

_LINE = st.tuples(
    st.integers(min_value=0, max_value=30),  # l_orderkey (some dangling)
    st.integers(min_value=1, max_value=4),  # l_linenumber (dups likely)
    st.integers(min_value=1, max_value=50),  # l_quantity (integer-valued)
)
_ORDER = st.tuples(
    st.integers(min_value=0, max_value=25),  # o_orderkey
    st.integers(min_value=0, max_value=12),  # o_custkey
    st.integers(min_value=0, max_value=80_000_000),  # totalprice cents (some > the 400k filter)
)


def _write_tables(tmpdir: str, lines: list[tuple], orders: list[tuple]) -> str:
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_linenumber": pa.array([r[1] for r in lines], pa.int64()),
                "l_quantity": pa.array([float(r[2]) for r in lines], pa.float64()),
                # derived columns for the correlation entry: NULL flags
                # (NULL group must survive both engines) and a discount
                # partially correlated with quantity
                "l_returnflag": pa.array(
                    [None if r[2] % 13 == 0 else "FNR"[r[0] % 3] for r in lines],
                    pa.string(),
                ),
                "l_discount": pa.array(
                    [((r[2] + r[0]) % 11) / 100.0 for r in lines], pa.float64()
                ),
                "l_linestatus": pa.array(
                    ["OF"[r[1] % 2] for r in lines], pa.string()
                ),
                # coarse price grid: duplicate values are the median tie cases
                "l_extendedprice": pa.array(
                    [(r[2] % 7) * 100.25 for r in lines], pa.float64()
                ),
                # 2-D layout keys for the z-order entry: spread across
                # several grid cells in both dimensions
                "l_partkey": pa.array(
                    [(r[0] * 37 + r[2] * 113) % 5000 for r in lines], pa.int64()
                ),
                "l_suppkey": pa.array(
                    [(r[0] + r[1] * 7 + r[2] * 3) % 200 for r in lines], pa.int64()
                ),
                # ship dates overlapping the o_orderdate 1995-1997 spread so
                # the Q4 EXISTS predicate (l_shipdate > o_orderdate) flips
                # both ways; coarse grid -> boundary-equal dates too
                "l_shipdate": pa.array(
                    [
                        f"{1995 + (r[2] + r[0]) % 3}-0{1 + (r[0] + r[1]) % 9}-15"
                        for r in lines
                    ],
                    pa.string(),
                ).cast(pa.timestamp("us")),
            }
        ),
        os.path.join(tmpdir, "lineitem.parquet"),
    )
    # dedup orderkeys (o_orderkey must be unique for the semi-join's
    # no-row-multiplication precondition, as in TPC-H)
    seen: dict[int, tuple] = {}
    for r in orders:
        seen.setdefault(r[0], r)
    orows = list(seen.values())
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orows], pa.int64()),
                "o_totalprice": pa.array(
                    [r[2] / 100.0 for r in orows], pa.float64()
                ),
                # 1995-1997 spread: the set-ops entry needs customers in
                # year A only, B only, both, and neither
                "o_orderdate": pa.array(
                    [
                        pa.scalar(
                            f"{1995 + (r[2] % 3)}-0{1 + r[0] % 9}-15",
                            pa.string(),
                        )
                        for r in orows
                    ],
                    pa.string(),
                ).cast(pa.timestamp("us")),
                # occasional NULL grouping keys: SQL ROLLUP keeps NULL
                # groups, so the Ray side must too
                "o_orderstatus": pa.array(
                    [None if r[1] == 12 else "FO"[r[0] % 2] for r in orows],
                    pa.string(),
                ),
                "o_orderpriority": pa.array(
                    [None if r[2] % 7 == 0 else f"P{r[2] % 3}" for r in orows],
                    pa.string(),
                ),
            }
        ),
        os.path.join(tmpdir, "orders.parquet"),
    )
    # customers 0..9 only: custkeys 10-12 dangle; nations 0..3
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(list(range(10)), pa.int64()),
                "c_nationkey": pa.array([i % 4 for i in range(10)], pa.int64()),
                "c_acctbal": pa.array(
                    [i * 7.25 - 20.0 for i in range(10)], pa.float64()
                ),
                "c_mktsegment": pa.array(
                    [f"SEG{i % 3}" for i in range(10)], pa.string()
                ),
            }
        ),
        os.path.join(tmpdir, "customer.parquet"),
    )
    # NATION_{i} names + region keys so the Q8 constants (NATION_3 /
    # ASIA) resolve; region 1 ("OTHER") makes the region gate selective
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(list(range(4)), pa.int64()),
                "n_name": pa.array(
                    [f"NATION_{i}" for i in range(4)], pa.string()
                ),
                "n_regionkey": pa.array([i % 2 for i in range(4)], pa.int64()),
            }
        ),
        os.path.join(tmpdir, "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int64()),
                "r_name": pa.array(["ASIA", "OTHER"], pa.string()),
            }
        ),
        os.path.join(tmpdir, "region.parquet"),
    )
    # suppliers cover the full l_suppkey domain (FK-complete, as in
    # TPC-H) with nations spread over 0..3 so Q8's target nation hits
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(list(range(200)), pa.int64()),
                "s_name": pa.array([f"S{i}" for i in range(200)], pa.string()),
                "s_nationkey": pa.array(
                    [i % 4 for i in range(200)], pa.int64()
                ),
            }
        ),
        os.path.join(tmpdir, "supplier.parquet"),
    )
    # coarse price/size grids: duplicate points and dominance ties are the
    # skyline edge cases the sf part table never produces.  Keys cover the
    # actual l_partkey domain (FK-complete so the Q8/Q19 part joins hit)
    # plus dangling extras the lineitem side never references
    pkeys = sorted({(r[0] * 37 + r[2] * 113) % 5000 for r in lines})
    pkeys += [5000 + i for i in range(len(lines))]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(pkeys, pa.int64()),
                "p_retailprice": pa.array(
                    [(k % 5) * 10.5 for k in pkeys], pa.float64()
                ),
                "p_size": pa.array([k % 6 for k in pkeys], pa.int64()),
                # brands 1..4: Q19's three branches plus a never-matching
                # brand; types include PROMO (the Q8 slice) and others
                "p_brand": pa.array(
                    [f"Brand#{1 + k % 4}" for k in pkeys], pa.string()
                ),
                "p_type": pa.array(
                    [("PROMO", "SMALL", "LARGE")[k % 3] for k in pkeys],
                    pa.string(),
                ),
            }
        ),
        os.path.join(tmpdir, "part.parquet"),
    )
    return tmpdir


def _run_pair(name: str, sf_dir: str):
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    from test_catalog_vs_duckdb import _compare, _to_df

    fn, sql = QUERIES[name]
    got = _to_df(fn(sf_dir))
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "part",
              "region", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    want = con.execute(sql).fetchdf()
    if len(got) == 0 and len(want) == 0:
        return
    _compare(name, got, want)


@pytest.mark.parametrize("name", FUZZ_ENTRIES)
@settings(max_examples=5, deadline=None)
@given(
    lines=st.lists(_LINE, min_size=1, max_size=60),
    orders=st.lists(_ORDER, min_size=1, max_size=40),
)
def test_relational_fuzz_vs_duckdb(
    ray_session, tmp_path_factory, name, lines, orders
):
    tmpdir = str(tmp_path_factory.mktemp("fuzzrel"))
    _run_pair(name, _write_tables(tmpdir, lines, orders))
