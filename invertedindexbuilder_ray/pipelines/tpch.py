"""TPC-H-shaped relational pipelines (Q1, Q3, Q6, Q7, Q8, Q10, Q14,
Q15, Q17, Q18, Q19) over the synthetic star schema.

Exactness contract (the revenue_by_nation pattern, catalog.py): every
monetary measure is recovered to INTEGER cents / basis-points per row —
``round(x*100)`` is exact because the data contract stores 2-decimal
values — so sums are order-independent on both engines and every rank /
filter / threshold compares INTEGERS.  Floats appear only as rounded
payloads of the exact integer totals, computed with the identical
division expression on both sides.

Scale shapes:
- fact⋈fact edges (lineitem⋈orders) always go through
  ``joins.partitioned_hash_join`` with P scaled to the larger side;
- scaling dimensions (customer / supplier / part) use a bounded
  broadcast lookup (sorted-key searchsorted inside ``map_batches``)
  with an exact partitioned-join fallback above
  ``STAR_DIM_BROADCAST_LIMIT`` or on duplicate keys;
- high-cardinality aggregates (per-order, per-customer, per-part) run
  through ``dedup._sharded_groupby`` (hash-shard + vectorized pandas),
  never a per-key Ray groupby;
- top-k is per-block partial top-k on INTEGER keys, merged on the
  driver (k × num_blocks rows cross the object store, never the data).

Reference anchor: the reference engine has no relational tier; these
extend the catalog's star-join family (catalog.py::q_revenue_by_nation).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.rounding import round_half_away
from ..sources.util import read_parquet_sized

# same bound class as catalog.STAR_DIM_BROADCAST_LIMIT (import would be
# circular: catalog imports this module's entries)
DIM_BROADCAST_LIMIT = 2_000_000

Q3_CUT = "1998-06-15"
Q3_SEGMENT = "BUILDING"
Q3_TOPK = 10
Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"
Q6_PCTS = (5, 6, 7)
Q6_MAX_QTY = 24
Q7_NATIONS = ("NATION_3", "NATION_7")
Q7_LO, Q7_HI = "1996-01-01", "1998-01-01"
Q10_LO, Q10_HI = "1996-01-01", "1996-07-01"
Q10_TOPK = 20
Q14_LO, Q14_HI = "1996-09-01", "1996-10-01"
Q14_PROMO = "PROMO"
Q17_BRAND = "Brand#13"
Q18_MIN_QTY = 300


def _dir(sf_dir: str) -> str:
    return sf_dir if os.path.isdir(sf_dir) else os.path.dirname(sf_dir)


def _read(sf_dir: str, table: str, cols: list[str]) -> rd.Dataset:
    return read_parquet_sized(
        os.path.join(_dir(sf_dir), f"{table}.parquet"), columns=cols
    )


def _cents(x: np.ndarray) -> np.ndarray:
    """Exact 2-decimal recovery: round(x*100) as int64 (ties away from
    zero via rounding.round_half_away, matching DuckDB round())."""
    return round_half_away(
        np.asarray(x, np.float64) * 100.0, 0
    ).astype(np.int64)


def _rev_e4(ep: np.ndarray, dc: np.ndarray) -> np.ndarray:
    """extendedprice*(1-discount) as an exact integer scaled 1e4."""
    return _cents(ep) * (100 - _cents(dc))


def _ts(col: pa.ChunkedArray) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False)


def _i64(col: pa.ChunkedArray) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _bcast_map(
    ds: rd.Dataset, key_col: str, val_col: str | None, *,
    limit: int = DIM_BROADCAST_LIMIT,
):
    """(sorted keys, vals, object-ref) if the dim is small with unique
    keys, else None (caller falls back to a partitioned join)."""
    if ds.count() > limit:
        return None
    rows = ds.take_all()
    k = np.array([r[key_col] for r in rows], np.int64)
    order = np.argsort(k, kind="stable")
    k = k[order]
    if len(k) and (k[1:] == k[:-1]).any():
        return None  # duplicate keys: broadcast enrich would drop rows
    v = (
        np.array([rows[i][val_col] for i in order], np.int64)
        if val_col is not None
        else None
    )
    return ray.put((k, v))


def _bcast_enrich(ds: rd.Dataset, key_col: str, ref, out_col: str | None):
    """Inner semi-join (out_col=None) or enrich against a broadcast
    sorted-key map: one searchsorted per batch, zero shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        x = _i64(t[key_col])
        if not len(keys):
            t = t.slice(0, 0)
            if out_col is not None:
                t = t.append_column(out_col, pa.array([], pa.int64()))
            return t
        pos = np.minimum(np.searchsorted(keys, x), len(keys) - 1)
        hit = keys[pos] == x
        t2 = t.filter(pa.array(hit))
        if out_col is not None:
            t2 = t2.append_column(
                out_col, pa.array(vals[pos[hit]], pa.int64())
            )
        return t2

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _join_enrich(
    fact: rd.Dataset, key_col: str, dim: rd.Dataset, dim_key: str,
    val_col: str | None, out_col: str | None,
):
    """Exact partitioned fallback for _bcast_enrich (over-limit or
    duplicate-keyed dimensions)."""
    from .dedup import _join_partitions
    from .joins import partitioned_hash_join

    j = partitioned_hash_join(
        fact, dim, left_on=key_col, right_on=dim_key,
        num_partitions=_join_partitions(fact.count()), how="inner",
    )
    if val_col is not None and out_col is not None and val_col != out_col:
        names = [out_col if c == val_col else c for c in j.schema().names]
        j = j.map_batches(
            lambda t, n=tuple(names): t.rename_columns(list(n)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    return j


def _dim_semi(fact, key_col, dim, dim_key, *, limit=DIM_BROADCAST_LIMIT):
    ref = _bcast_map(dim.select_columns([dim_key]), dim_key, None, limit=limit)
    if ref is not None:
        return _bcast_enrich(fact, key_col, ref, None)
    return _join_enrich(fact, key_col, dim.select_columns([dim_key]),
                        dim_key, None, None)


def _dim_lookup(fact, key_col, dim, dim_key, val_col, out_col, *,
                limit=DIM_BROADCAST_LIMIT):
    ref = _bcast_map(dim, dim_key, val_col, limit=limit)
    if ref is not None:
        return _bcast_enrich(fact, key_col, ref, out_col)
    return _join_enrich(fact, key_col, dim, dim_key, val_col, out_col)


def _pysum(parts: list, ncols: int) -> list[int]:
    """Driver combine of per-batch int64 partials as Python ints — exact
    at any magnitude (a 100-TB revenue sum overflows int64)."""
    tot = [0] * ncols
    for row in parts:
        for i in range(ncols):
            tot[i] += int(row[i])
    return tot


# ---------------------------------------------------------------- Q3


def q3_unshipped(sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT):
    """Top-10 unshipped orders by exact integer revenue for one market
    segment (TPC-H Q3 shape: two fact filters, one dim semi-join, one
    fact⋈fact join, per-order rollup, integer top-k)."""
    from .dedup import _join_partitions, _sharded_groupby
    from .joins import partitioned_hash_join

    cut = np.datetime64(Q3_CUT)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(
            pc.equal(t["c_mktsegment"], Q3_SEGMENT)
        ).select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: t.filter(pa.array(_ts(t["o_orderdate"]) < cut)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = _dim_semi(orders, "o_custkey", cust, "c_custkey",
                       limit=dim_limit).select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def li_rev(t: pa.Table) -> pa.Table:
        keep = _ts(t["l_shipdate"]) > cut
        t = t.filter(pa.array(keep))
        rev = _rev_e4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        # per-batch partial per-order sums shrink the join's left side
        df = pd.DataFrame({"l_orderkey": _i64(t["l_orderkey"]), "rev": rev})
        g = df.groupby("l_orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_rev, batch_format="pyarrow", zero_copy_batch=True)

    j = partitioned_hash_join(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        num_partitions=_join_partitions(max(li.count(), 1)), how="inner",
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", as_index=False).agg(
            revenue_e4=("rev", "sum"),
            o_orderdate=("o_orderdate", "first"),
            o_orderpriority=("o_orderpriority", "first"),
        )

    per_order = _sharded_groupby(j, ["l_orderkey"], agg)

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_e4", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
        ).head(Q3_TOPK)

    cand = per_order.map_batches(partial_topk, batch_format="pandas")
    out = pd.DataFrame(
        cand.take_all(),
        columns=["l_orderkey", "revenue_e4", "o_orderdate", "o_orderpriority"],
    )
    out = out.sort_values(
        ["revenue_e4", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True],
    ).head(Q3_TOPK).reset_index(drop=True)
    out["revenue_e4"] = out["revenue_e4"].astype("int64")
    out["l_orderkey"] = out["l_orderkey"].astype("int64")
    out["revenue"] = round_half_away(
        out["revenue_e4"].to_numpy(np.int64).astype(np.float64) / 10000.0, 2
    )
    return out[["l_orderkey", "o_orderdate", "o_orderpriority",
                "revenue_e4", "revenue"]]


SQL_Q3 = f"""
WITH r AS (
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
               AS revenue_e4
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{Q3_CUT}'
      AND l_shipdate > TIMESTAMP '{Q3_CUT}'
    GROUP BY 1, 2, 3
)
SELECT l_orderkey, o_orderdate, o_orderpriority, revenue_e4,
       round(CAST(revenue_e4 AS DOUBLE) / 10000.0, 2) AS revenue
FROM r
ORDER BY revenue_e4 DESC, o_orderdate, l_orderkey
LIMIT {Q3_TOPK}
"""


# ---------------------------------------------------------------- Q6


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """Single-table filter + global exact sum (TPC-H Q6 shape): revenue
    change = Σ extendedprice*discount over a date / discount / quantity
    band.  One streaming pass, one int pair per batch to the driver."""
    lo, hi = np.datetime64(Q6_LO), np.datetime64(Q6_HI)
    pcts = np.array(Q6_PCTS, np.int64)

    def partial(t: pa.Table) -> pa.Table:
        sd = _ts(t["l_shipdate"])
        qty = round_half_away(
            t["l_quantity"].to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        pct = _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        keep = (sd >= lo) & (sd < hi) & np.isin(pct, pcts) & (qty < Q6_MAX_QTY)
        rev = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        ) * pct[keep]
        return pa.table({
            "rev": pa.array([int(rev.sum())], pa.int64()),
            "n": pa.array([int(keep.sum())], pa.int64()),
        })

    parts = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    rev, n = _pysum([(r["rev"], r["n"]) for r in parts.take_all()], 2)
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype="int64"),
        "revenue_e4": pd.Series([rev], dtype="int64"),
        "revenue": [float(round_half_away(
            np.array([float(rev) / 10000.0]), 2)[0])],
    })


SQL_Q6 = f"""
SELECT count(*)::BIGINT AS n_rows,
       coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)), 0)::BIGINT
           AS revenue_e4,
       round(CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                               * CAST(round(l_discount * 100) AS BIGINT)), 0)
                  AS DOUBLE) / 10000.0, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_LO}' AND l_shipdate < TIMESTAMP '{Q6_HI}'
  AND CAST(round(l_discount * 100) AS BIGINT) IN {Q6_PCTS}
  AND CAST(round(l_quantity) AS BIGINT) < {Q6_MAX_QTY}
"""


# ---------------------------------------------------------------- Q7


def q7_volume_shipping(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Bidirectional nation-pair shipping volume by year (TPC-H Q7
    shape).  Both scaling dims collapse to nation-filtered lookups; the
    only exchange is the lineitem⋈orders partitioned join; ≤ 8 output
    groups combine on the driver as Python ints."""
    from .dedup import _join_partitions
    from .joins import partitioned_hash_join

    d = _dir(sf_dir)
    nat = read_parquet_sized(
        os.path.join(d, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).take_all()
    name_by_key = {int(r["n_nationkey"]): r["n_name"] for r in nat}
    keys = np.array(
        sorted(k for k, v in name_by_key.items() if v in Q7_NATIONS),
        np.int64,
    )
    lo, hi = np.datetime64(Q7_LO), np.datetime64(Q7_HI)

    def nation_filter(key_col):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(np.isin(_i64(t[key_col]), keys)))
        return fn

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        nation_filter("s_nationkey"), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        nation_filter("c_nationkey"), batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def li_prep(t: pa.Table) -> pa.Table:
        sd = _ts(t["l_shipdate"])
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        sd = _ts(t["l_shipdate"])
        year = sd.astype("datetime64[Y]").astype(np.int64) + 1970
        rev = _rev_e4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        return pa.table({
            "l_orderkey": pa.array(_i64(t["l_orderkey"])),
            "l_suppkey": pa.array(_i64(t["l_suppkey"])),
            "l_year": pa.array(year, pa.int64()),
            "rev": pa.array(rev, pa.int64()),
        })

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
         "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)
    li = _dim_lookup(li, "l_suppkey", supp, "s_suppkey", "s_nationkey",
                     "supp_nk", limit=dim_limit)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    orders = _dim_lookup(orders, "o_custkey", cust, "c_custkey",
                         "c_nationkey", "cust_nk", limit=dim_limit
                         ).select_columns(["o_orderkey", "cust_nk"])

    j = partitioned_hash_join(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        num_partitions=_join_partitions(max(li.count(), 1)), how="inner",
    )

    def partial(t: pa.Table) -> pa.Table:
        s, c = _i64(t["supp_nk"]), _i64(t["cust_nk"])
        t = t.filter(pa.array(s != c))
        g = (
            pa.table({
                "supp_nk": t["supp_nk"], "cust_nk": t["cust_nk"],
                "l_year": t["l_year"], "rev": t["rev"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            })
            .group_by(["supp_nk", "cust_nk", "l_year"])
            .aggregate([("rev", "sum"), ("one", "sum")])
        )
        return pa.table({
            "supp_nk": g["supp_nk"], "cust_nk": g["cust_nk"],
            "l_year": g["l_year"],
            "rev": g["rev_sum"].cast(pa.int64()),
            "n": g["one_sum"].cast(pa.int64()),
        })

    rows = j.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc: dict[tuple, list[int]] = {}
    for r in rows:
        e = acc.setdefault(
            (int(r["supp_nk"]), int(r["cust_nk"]), int(r["l_year"])), [0, 0]
        )
        e[0] += int(r["rev"])
        e[1] += int(r["n"])
    out = pd.DataFrame({
        "supp_nation": [name_by_key[k[0]] for k in acc],
        "cust_nation": [name_by_key[k[1]] for k in acc],
        "l_year": pd.Series([k[2] for k in acc], dtype="int64"),
        "n_rows": pd.Series([v[1] for v in acc.values()], dtype="int64"),
        "revenue_e4": pd.Series([v[0] for v in acc.values()], dtype="int64"),
    })
    out["revenue"] = round_half_away(
        out["revenue_e4"].to_numpy(np.int64).astype(np.float64) / 10000.0, 2
    )
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)


SQL_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       count(*)::BIGINT AS n_rows,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
           AS revenue_e4,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0, 2) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_LO}' AND l_shipdate < TIMESTAMP '{Q7_HI}'
  AND n1.n_name IN ('{Q7_NATIONS[0]}', '{Q7_NATIONS[1]}')
  AND n2.n_name IN ('{Q7_NATIONS[0]}', '{Q7_NATIONS[1]}')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------- Q10


def q10_returned_items(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Top-20 customers by exact returned-item revenue in a half-year
    window (TPC-H Q10 shape).  The customer dimension is only touched
    AFTER top-k: 20 custkeys filter-scan the customer table, so the
    wide path never carries names/balances."""
    from .dedup import _join_partitions, _sharded_groupby
    from .joins import partitioned_hash_join

    lo, hi = np.datetime64(Q10_LO), np.datetime64(Q10_HI)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pa.array((_ts(t["o_orderdate"]) >= lo)
                     & (_ts(t["o_orderdate"]) < hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = _rev_e4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        df = pd.DataFrame({"l_orderkey": _i64(t["l_orderkey"]), "rev": rev})
        g = df.groupby("l_orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)

    j = partitioned_hash_join(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        num_partitions=_join_partitions(max(li.count(), 1)), how="inner",
    )
    per_cust = _sharded_groupby(
        j, ["o_custkey"],
        lambda df: df.groupby("o_custkey", as_index=False)
        .agg(revenue_e4=("rev", "sum")),
    )
    cand = per_cust.map_batches(
        lambda df: df.sort_values(
            ["revenue_e4", "o_custkey"], ascending=[False, True]
        ).head(Q10_TOPK),
        batch_format="pandas",
    )
    top = pd.DataFrame(cand.take_all(), columns=["o_custkey", "revenue_e4"])
    top = top.sort_values(
        ["revenue_e4", "o_custkey"], ascending=[False, True]
    ).head(Q10_TOPK)
    ck = np.sort(top["o_custkey"].to_numpy(np.int64))

    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(pa.array(np.isin(_i64(t["c_custkey"]), ck))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    info = {int(r["c_custkey"]): r for r in cust}
    nat = read_parquet_sized(
        os.path.join(_dir(sf_dir), "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).take_all()
    nname = {int(r["n_nationkey"]): r["n_name"] for r in nat}

    out = top.reset_index(drop=True)
    out["c_custkey"] = out["o_custkey"].astype("int64")
    out["c_name"] = [info[k]["c_name"] for k in out["c_custkey"]]
    out["c_acctbal"] = [float(info[k]["c_acctbal"]) for k in out["c_custkey"]]
    out["n_name"] = [
        nname[int(info[k]["c_nationkey"])] for k in out["c_custkey"]
    ]
    out["revenue_e4"] = out["revenue_e4"].astype("int64")
    out["revenue"] = round_half_away(
        out["revenue_e4"].to_numpy(np.int64).astype(np.float64) / 10000.0, 2
    )
    return out[["c_custkey", "c_name", "c_acctbal", "n_name",
                "revenue_e4", "revenue"]]


SQL_Q10 = f"""
WITH r AS (
    SELECT o_custkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
               AS revenue_e4
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{Q10_LO}'
      AND o_orderdate < TIMESTAMP '{Q10_HI}'
    GROUP BY 1
    ORDER BY revenue_e4 DESC, o_custkey
    LIMIT {Q10_TOPK}
)
SELECT c_custkey, c_name, c_acctbal, n_name, revenue_e4,
       round(CAST(revenue_e4 AS DOUBLE) / 10000.0, 2) AS revenue
FROM r
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
"""


# ---------------------------------------------------------------- Q14


def q14_promo_revenue(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Promotion revenue share in one month (TPC-H Q14 shape): part-type
    lookup into the filtered fact, two exact integer sums, ratio as a
    rounded payload of the identical double expression."""
    lo, hi = np.datetime64(Q14_LO), np.datetime64(Q14_HI)
    d = _dir(sf_dir)
    part = read_parquet_sized(
        os.path.join(d, "part.parquet"), columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda t: pa.table({
            "p_partkey": t["p_partkey"].cast(pa.int64()),
            "is_promo": pc.equal(t["p_type"], Q14_PROMO)
            .cast(pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def li_prep(t: pa.Table) -> pa.Table:
        sd = _ts(t["l_shipdate"])
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        rev = _rev_e4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        return pa.table({
            "l_partkey": pa.array(_i64(t["l_partkey"])),
            "rev": pa.array(rev, pa.int64()),
        })

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)
    li = _dim_lookup(li, "l_partkey", part, "p_partkey", "is_promo",
                     "is_promo", limit=dim_limit)

    def partial(t: pa.Table) -> pa.Table:
        rev = _i64(t["rev"])
        promo = _i64(t["is_promo"])
        return pa.table({
            "promo": pa.array([int((rev * promo).sum())], pa.int64()),
            "total": pa.array([int(rev.sum())], pa.int64()),
            "n": pa.array([t.num_rows], pa.int64()),
        })

    rows = li.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    promo, total, n = _pysum(
        [(r["promo"], r["total"], r["n"]) for r in rows], 3
    )
    pct = (
        float(round_half_away(
            np.array([100.0 * float(promo) / float(total)]), 4)[0])
        if total else 0.0
    )
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype="int64"),
        "promo_rev_e4": pd.Series([promo], dtype="int64"),
        "total_rev_e4": pd.Series([total], dtype="int64"),
        "promo_pct": [pct],
    })


SQL_Q14 = f"""
WITH f AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
           CASE WHEN p_type = '{Q14_PROMO}' THEN 1 ELSE 0 END AS is_promo
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '{Q14_LO}'
      AND l_shipdate < TIMESTAMP '{Q14_HI}'
)
SELECT count(*)::BIGINT AS n_rows,
       coalesce(sum(rev * is_promo), 0)::BIGINT AS promo_rev_e4,
       coalesce(sum(rev), 0)::BIGINT AS total_rev_e4,
       CASE WHEN coalesce(sum(rev), 0) = 0 THEN 0.0
            ELSE round(100.0 * CAST(sum(rev * is_promo) AS DOUBLE)
                       / CAST(sum(rev) AS DOUBLE), 4)
       END AS promo_pct
FROM f
"""


# ---------------------------------------------------------------- Q17


def q17_small_qty_revenue(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT,
    stats_limit: int = DIM_BROADCAST_LIMIT,
) -> pd.DataFrame:
    """Average-yearly revenue from small-quantity orders of one brand
    (TPC-H Q17 shape).  The correlated avg(l_quantity) subquery becomes
    integer cross-multiplication — qty < 0.2*avg ⇔ 5*qty*cnt < sum —
    so the filter is float-free.  Two passes over the brand-filtered
    fact: per-part (Σqty, n) via sharded groupby, then a broadcast of
    those per-part stats back into the row filter."""
    from .dedup import _sharded_groupby

    d = _dir(sf_dir)
    pk_rows = read_parquet_sized(
        os.path.join(d, "part.parquet"), columns=["p_partkey", "p_brand"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["p_brand"], Q17_BRAND))
        .select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )
    li = _dim_semi(li, "l_partkey", pk_rows, "p_partkey", limit=dim_limit)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": pa.array(_i64(t["l_partkey"])),
            "qty": pa.array(
                round_half_away(
                    t["l_quantity"].to_numpy(zero_copy_only=False), 0
                ).astype(np.int64)
            ),
            "cents": pa.array(
                _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
            ),
        })

    li = li.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two consumers below; brand slice is 1/|brands| of li

    stats = _sharded_groupby(
        li.select_columns(["l_partkey", "qty"]), ["l_partkey"],
        lambda df: df.groupby("l_partkey", as_index=False)
        .agg(s=("qty", "sum"), c=("qty", "size")),
    )
    srows = stats.take_all()
    if len(srows) > stats_limit:
        raise RuntimeError(
            "q17: per-part stats exceed the broadcast bound; raise "
            "dim_limit or add the partitioned-join fallback for this scale"
        )
    k = np.array([r["l_partkey"] for r in srows], np.int64)
    order = np.argsort(k)
    ref = ray.put((
        k[order],
        np.array([srows[i]["s"] for i in order], np.int64),
        np.array([srows[i]["c"] for i in order], np.int64),
    ))

    def partial(t: pa.Table) -> pa.Table:
        keys, s, c = ray.get(ref)
        pkey = _i64(t["l_partkey"])
        qty = _i64(t["qty"])
        cents = _i64(t["cents"])
        if not len(keys):
            keep = np.zeros(len(pkey), bool)
        else:
            pos = np.minimum(np.searchsorted(keys, pkey), len(keys) - 1)
            keep = (keys[pos] == pkey) & (5 * qty * c[pos] < s[pos])
        return pa.table({
            "cents": pa.array([int(cents[keep].sum())], pa.int64()),
            "n": pa.array([int(keep.sum())], pa.int64()),
        })

    rows = li.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    cents, n = _pysum([(r["cents"], r["n"]) for r in rows], 2)
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype="int64"),
        "sum_price_cents": pd.Series([cents], dtype="int64"),
        "avg_yearly": [float(round_half_away(
            np.array([float(cents) / 700.0]), 2)[0])],
    })


SQL_Q17 = f"""
WITH f AS (
    SELECT l_partkey,
           CAST(round(l_quantity) AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = '{Q17_BRAND}'
),
a AS (
    SELECT l_partkey, sum(qty)::BIGINT AS s, count(*)::BIGINT AS c
    FROM f GROUP BY 1
)
SELECT count(*)::BIGINT AS n_rows,
       coalesce(sum(f.cents), 0)::BIGINT AS sum_price_cents,
       round(CAST(coalesce(sum(f.cents), 0) AS DOUBLE) / 700.0, 2)
           AS avg_yearly
FROM f JOIN a USING (l_partkey)
WHERE 5 * f.qty * a.c < a.s
"""


# ---------------------------------------------------------------- Q18


def q18_large_orders(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Large-volume orders (TPC-H Q18 shape): per-order Σqty via sharded
    groupby, integer HAVING, then the few survivors enrich against
    orders/customer with a broadcast filter-scan (survivor count is a
    p99-tail, not a table scale)."""
    from .dedup import _sharded_groupby

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda t: pa.table({
            "l_orderkey": pa.array(_i64(t["l_orderkey"])),
            "qty": pa.array(round_half_away(
                t["l_quantity"].to_numpy(zero_copy_only=False), 0
            ).astype(np.int64)),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    per_order = _sharded_groupby(
        li, ["l_orderkey"],
        lambda df: df.groupby("l_orderkey", as_index=False)
        .agg(sum_qty=("qty", "sum")),
    ).map_batches(
        lambda df: df[df["sum_qty"] >= Q18_MIN_QTY], batch_format="pandas"
    )
    surv = pd.DataFrame(
        per_order.take_all(), columns=["l_orderkey", "sum_qty"]
    )
    if len(surv) > dim_limit:
        raise RuntimeError(
            "q18: survivor count exceeds the broadcast bound; lower the "
            "quantity threshold or add a partitioned-join path"
        )
    ok = np.sort(surv["l_orderkey"].to_numpy(np.int64))

    orows = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(
        lambda t: t.filter(pa.array(np.isin(_i64(t["o_orderkey"]), ok))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    by_ok = {int(r["o_orderkey"]): r for r in orows}
    ck = np.sort(np.unique(np.array(
        [int(r["o_custkey"]) for r in orows], np.int64
    ))) if orows else np.array([], np.int64)
    crows = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda t: t.filter(pa.array(np.isin(_i64(t["c_custkey"]), ck))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    cname = {int(r["c_custkey"]): r["c_name"] for r in crows}

    out = surv.sort_values("l_orderkey").reset_index(drop=True)
    out["o_orderkey"] = out["l_orderkey"].astype("int64")
    out["sum_qty"] = out["sum_qty"].astype("int64")
    out["c_custkey"] = pd.Series(
        [int(by_ok[k]["o_custkey"]) for k in out["o_orderkey"]], dtype="int64"
    )
    out["c_name"] = [cname[k] for k in out["c_custkey"]]
    out["o_orderdate"] = [by_ok[k]["o_orderdate"] for k in out["o_orderkey"]]
    out["price_cents"] = pd.Series(
        [int(_cents(np.array([float(by_ok[k]["o_totalprice"])]))[0])
         for k in out["o_orderkey"]],
        dtype="int64",
    )
    return out[["o_orderkey", "c_custkey", "c_name", "o_orderdate",
                "price_cents", "sum_qty"]]


SQL_Q18 = f"""
WITH s AS (
    SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT))::BIGINT
           AS sum_qty
    FROM lineitem GROUP BY 1
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) >= {Q18_MIN_QTY}
)
SELECT o_orderkey, c_custkey, c_name, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, sum_qty
FROM s
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


# ---------------------------------------------------------------- Q8

Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_NATION = "NATION_3"
Q8_LO, Q8_HI = "1995-01-01", "1997-01-01"


def q8_market_share(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """National market share by year (TPC-H Q8 shape): the widest star
    join in the tier — lineitem semi-joined to a part-type slice,
    enriched with the supplier nation, joined to region-gated orders —
    with the share emitted as an exact integer ppm ratio
    (num*1e6 // den, both engines) so the float payload is the same
    double on both sides.

    Scale: part/supplier/customer collapse to bounded broadcast lookups
    (exact partitioned fallback above ``dim_limit``); the single
    exchange is the lineitem⋈orders partitioned hash join; per-year
    partials (≤ a few rows per block) combine on the driver as Python
    ints."""
    from .dedup import _join_partitions
    from .joins import partitioned_hash_join

    lo, hi = np.datetime64(Q8_LO), np.datetime64(Q8_HI)
    d = _dir(sf_dir)
    nat = read_parquet_sized(
        os.path.join(d, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).take_all()
    reg = read_parquet_sized(
        os.path.join(d, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    ).take_all()
    asia_rk = {int(r["r_regionkey"]) for r in reg if r["r_name"] == Q8_REGION}
    asia_keys = np.array(
        sorted(int(r["n_nationkey"]) for r in nat
               if int(r["n_regionkey"]) in asia_rk),
        np.int64,
    )
    target_key = next(
        int(r["n_nationkey"]) for r in nat if r["n_name"] == Q8_NATION
    )

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: t.filter(
            pc.equal(t["p_type"], Q8_TYPE)
        ).select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(
            pa.array(np.isin(_i64(t["c_nationkey"]), asia_keys))
        ).select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def o_prep(t: pa.Table) -> pa.Table:
        od = _ts(t["o_orderdate"])
        t = t.filter(pa.array((od >= lo) & (od < hi)))
        od = _ts(t["o_orderdate"])
        year = od.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "o_orderkey": pa.array(_i64(t["o_orderkey"])),
            "o_custkey": pa.array(_i64(t["o_custkey"])),
            "o_year": pa.array(year, pa.int64()),
        })

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True)
    orders = _dim_semi(orders, "o_custkey", cust, "c_custkey",
                       limit=dim_limit).select_columns(
        ["o_orderkey", "o_year"]
    )

    def li_prep(t: pa.Table) -> pa.Table:
        rev = _rev_e4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        return pa.table({
            "l_orderkey": pa.array(_i64(t["l_orderkey"])),
            "l_partkey": pa.array(_i64(t["l_partkey"])),
            "l_suppkey": pa.array(_i64(t["l_suppkey"])),
            "rev": pa.array(rev, pa.int64()),
        })

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)
    li = _dim_semi(li, "l_partkey", part, "p_partkey", limit=dim_limit)
    li = _dim_lookup(li, "l_suppkey", supp, "s_suppkey", "s_nationkey",
                     "supp_nk", limit=dim_limit)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "o_year": pd.Series([], dtype="int64"),
            "n_rows": pd.Series([], dtype="int64"),
            "nation_rev_e4": pd.Series([], dtype="int64"),
            "total_rev_e4": pd.Series([], dtype="int64"),
            "share_ppm": pd.Series([], dtype="int64"),
            "mkt_share": pd.Series([], dtype="float64"),
        })

    n_li = li.count()
    # an inner join with an empty side is empty, and an all-empty Ray
    # dataset loses its schema (partitioned_hash_join would raise)
    if n_li == 0 or orders.count() == 0:
        return _empty()

    j = partitioned_hash_join(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        num_partitions=_join_partitions(n_li), how="inner",
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _i64(t["rev"])
        tgt = (_i64(t["supp_nk"]) == target_key).astype(np.int64)
        g = (
            pa.table({
                "o_year": t["o_year"],
                "nat": pa.array(rev * tgt, pa.int64()),
                "tot": pa.array(rev, pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            })
            .group_by(["o_year"])
            .aggregate([("nat", "sum"), ("tot", "sum"), ("one", "sum")])
        )
        return pa.table({
            "o_year": g["o_year"],
            "nat": g["nat_sum"].cast(pa.int64()),
            "tot": g["tot_sum"].cast(pa.int64()),
            "n": g["one_sum"].cast(pa.int64()),
        })

    rows = j.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc: dict[int, list[int]] = {}
    for r in rows:
        e = acc.setdefault(int(r["o_year"]), [0, 0, 0])
        e[0] += int(r["nat"])
        e[1] += int(r["tot"])
        e[2] += int(r["n"])
    years = sorted(acc)
    ppm = [acc[y][0] * 1_000_000 // acc[y][1] if acc[y][1] else 0
           for y in years]
    return pd.DataFrame({
        "o_year": pd.Series(years, dtype="int64"),
        "n_rows": pd.Series([acc[y][2] for y in years], dtype="int64"),
        "nation_rev_e4": pd.Series([acc[y][0] for y in years],
                                   dtype="int64"),
        "total_rev_e4": pd.Series([acc[y][1] for y in years],
                                  dtype="int64"),
        "share_ppm": pd.Series(ppm, dtype="int64"),
        "mkt_share": pd.Series([float(p) / 1_000_000.0 for p in ppm],
                               dtype="float64"),
    })


SQL_Q8 = f"""
WITH v AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
           CASE WHEN s_nationkey = (SELECT n_nationkey FROM nation
                                    WHERE n_name = '{Q8_NATION}')
                THEN 1 ELSE 0 END AS is_target
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
      AND o_orderdate >= TIMESTAMP '{Q8_LO}'
      AND o_orderdate < TIMESTAMP '{Q8_HI}'
),
m AS (
    SELECT o_year, count(*)::BIGINT AS n_rows,
           sum(rev * is_target)::BIGINT AS nation_rev_e4,
           sum(rev)::BIGINT AS total_rev_e4
    FROM v GROUP BY o_year
)
SELECT o_year, n_rows, nation_rev_e4, total_rev_e4, share_ppm,
       CAST(share_ppm AS DOUBLE) / 1000000.0 AS mkt_share
FROM (
    SELECT *, CASE WHEN total_rev_e4 = 0 THEN 0
                   ELSE (nation_rev_e4::HUGEINT * 1000000
                         // total_rev_e4)::BIGINT
              END AS share_ppm
    FROM m
) ORDER BY o_year
"""


# ---------------------------------------------------------------- Q15

Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"


def q15_top_supplier(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Top supplier(s) by revenue in one quarter (TPC-H Q15 shape:
    the revenue view + global max + tie-complete selection).  Per-batch
    Arrow partials shrink to one row per (batch, suppkey); the sharded
    groupby finishes the per-supplier sums; only per-block integer
    maxima and the (tiny) winner set cross to the driver."""
    from .dedup import _sharded_groupby

    lo, hi = np.datetime64(Q15_LO), np.datetime64(Q15_HI)

    def li_prep(t: pa.Table) -> pa.Table:
        sd = _ts(t["l_shipdate"])
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        rev = _rev_e4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        g = (
            pa.table({
                "l_suppkey": pa.array(_i64(t["l_suppkey"])),
                "rev": pa.array(rev, pa.int64()),
            })
            .group_by(["l_suppkey"])
            .aggregate([("rev", "sum")])
        )
        return pa.table({
            "l_suppkey": g["l_suppkey"],
            "rev": g["rev_sum"].cast(pa.int64()),
        })

    li = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_suppkey", as_index=False)["rev"].sum()

    per_supp = _sharded_groupby(li, ["l_suppkey"], agg)

    def block_max(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return df[df["rev"] == df["rev"].max()]

    cand = pd.DataFrame(
        per_supp.map_batches(block_max, batch_format="pandas").take_all(),
        columns=["l_suppkey", "rev"],
    )
    if not len(cand):
        return pd.DataFrame({
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "total_revenue_e4": pd.Series([], dtype="int64"),
            "total_revenue": pd.Series([], dtype="float64"),
        })
    best = int(cand["rev"].max())
    winners = cand[cand["rev"] == best].copy()
    keys = np.sort(winners["l_suppkey"].to_numpy(np.int64))
    names = {
        int(r["s_suppkey"]): r["s_name"]
        for r in _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(
            lambda t, k=keys: t.filter(
                pa.array(np.isin(_i64(t["s_suppkey"]), k))
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .take_all()
    }
    # inner-join semantics: a winning l_suppkey with no supplier row
    # drops (matches the SQL join; l_suppkey is an FK in real TPC-H)
    keys = np.array([k for k in keys if int(k) in names], np.int64)
    out = pd.DataFrame({
        "s_suppkey": pd.Series(keys, dtype="int64"),
        "s_name": [names[int(k)] for k in keys],
        "total_revenue_e4": pd.Series([best] * len(keys), dtype="int64"),
    })
    out["total_revenue"] = round_half_away(
        out["total_revenue_e4"].to_numpy(np.int64).astype(np.float64)
        / 10000.0, 2
    )
    return out


SQL_Q15 = f"""
WITH r AS (
    SELECT l_suppkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
               AS total_revenue_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
      AND l_shipdate < TIMESTAMP '{Q15_HI}'
    GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue_e4,
       round(CAST(total_revenue_e4 AS DOUBLE) / 10000.0, 2)
           AS total_revenue
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM r)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------- Q19

Q19_BRANCHES = (
    ("Brand#1", 15, 1, 15),
    ("Brand#2", 25, 10, 25),
    ("Brand#3", 35, 20, 35),
)


def q19_disjunctive(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Disjunctive OR-of-ANDs predicate scan (TPC-H Q19 shape): three
    brand-disjoint (brand, size-cap, quantity-band) branches evaluated
    in ONE pass.  The part attributes pack into a single int64 lookup
    value (branch*100 + size — p_size <= 50 < 100), so the dim lookup
    is one searchsorted per batch; every branch always emits a row
    (zeros when nothing matches), keeping the result non-empty at any
    scale."""
    brands = [b for b, _, _, _ in Q19_BRANCHES]

    def p_prep(t: pa.Table) -> pa.Table:
        brand = t["p_brand"].to_pandas().to_numpy(object)
        size = _i64(t["p_size"])
        branch = np.zeros(len(brand), np.int64)
        for i, b in enumerate(brands, start=1):
            branch[brand == b] = i
        keep = branch > 0
        return pa.table({
            "p_partkey": pa.array(_i64(t["p_partkey"])[keep]),
            "pval": pa.array(branch[keep] * 100 + size[keep], pa.int64()),
        })

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
                 ).map_batches(p_prep, batch_format="pyarrow",
                               zero_copy_batch=True)

    def li_prep(t: pa.Table) -> pa.Table:
        qty = round_half_away(
            t["l_quantity"].to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        rev = _rev_e4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        return pa.table({
            "l_partkey": pa.array(_i64(t["l_partkey"])),
            "qty": pa.array(qty, pa.int64()),
            "rev": pa.array(rev, pa.int64()),
        })

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)
    li = _dim_lookup(li, "l_partkey", part, "p_partkey", "pval", "pval",
                     limit=dim_limit)

    def partial(t: pa.Table) -> pa.Table:
        pval = _i64(t["pval"])
        branch = pval // 100
        size = pval % 100
        qty = _i64(t["qty"])
        rev = _i64(t["rev"])
        keep = np.zeros(len(pval), bool)
        for i, (_, max_size, qlo, qhi) in enumerate(Q19_BRANCHES, start=1):
            keep |= (branch == i) & (size <= max_size) \
                & (qty >= qlo) & (qty <= qhi)
        g = (
            pa.table({
                "branch": pa.array(branch[keep], pa.int64()),
                "rev": pa.array(rev[keep], pa.int64()),
                "one": pa.array(np.ones(int(keep.sum()), np.int64)),
            })
            .group_by(["branch"])
            .aggregate([("rev", "sum"), ("one", "sum")])
        )
        return pa.table({
            "branch": g["branch"],
            "rev": g["rev_sum"].cast(pa.int64()),
            "n": g["one_sum"].cast(pa.int64()),
        })

    rows = li.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc = {i: [0, 0] for i in range(1, len(Q19_BRANCHES) + 1)}
    for r in rows:
        e = acc[int(r["branch"])]
        e[0] += int(r["rev"])
        e[1] += int(r["n"])
    out = pd.DataFrame({
        "branch": pd.Series(sorted(acc), dtype="int64"),
        "p_brand": [Q19_BRANCHES[i - 1][0] for i in sorted(acc)],
        "n_rows": pd.Series([acc[i][1] for i in sorted(acc)],
                            dtype="int64"),
        "revenue_e4": pd.Series([acc[i][0] for i in sorted(acc)],
                                dtype="int64"),
    })
    out["revenue"] = round_half_away(
        out["revenue_e4"].to_numpy(np.int64).astype(np.float64) / 10000.0, 2
    )
    return out


def _sql_q19() -> str:
    branch_rows = ", ".join(
        f"({i}, '{b}', {s}, {qlo}, {qhi})"
        for i, (b, s, qlo, qhi) in enumerate(Q19_BRANCHES, start=1)
    )
    return f"""
WITH branches(branch, p_brand, max_size, qty_lo, qty_hi) AS (
    VALUES {branch_rows}
),
m AS (
    SELECT b.branch, count(*)::BIGINT AS n_rows,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
               AS revenue_e4
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN branches b ON part.p_brand = b.p_brand
    WHERE p_size <= b.max_size
      AND CAST(round(l_quantity) AS BIGINT) BETWEEN b.qty_lo AND b.qty_hi
    GROUP BY 1
)
SELECT b.branch::BIGINT AS branch, b.p_brand,
       coalesce(m.n_rows, 0)::BIGINT AS n_rows,
       coalesce(m.revenue_e4, 0)::BIGINT AS revenue_e4,
       round(CAST(coalesce(m.revenue_e4, 0) AS DOUBLE) / 10000.0, 2)
           AS revenue
FROM branches b LEFT JOIN m ON b.branch = m.branch
ORDER BY b.branch
"""


SQL_Q19 = _sql_q19()


# ---------------------------------------------------------------- Q1

Q1_CUT = "2000-06-30"


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 pricing summary: per (returnflag, linestatus) exact
    integer totals of quantity / base price (cents) / discounted price
    (1e4) / charge (1e6) plus count, with the float averages computed
    from the integer totals by the identical expression on both engines.
    One streaming pass; each batch emits <= 6 partial rows (the group
    domain is bounded), the driver combines them as Python ints so a
    100-TB charge sum cannot overflow."""
    cut = np.datetime64(Q1_CUT)

    def partial(t: pa.Table) -> pa.Table:
        sd = _ts(t["l_shipdate"])
        t = t.filter(pa.array(sd <= cut))
        qty = round_half_away(
            t["l_quantity"].to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        ep = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        dc = _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        tx = _cents(t["l_tax"].to_numpy(zero_copy_only=False))
        disc = ep * (100 - dc)
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "l_linestatus": t["l_linestatus"].to_pandas(),
            "sum_qty": qty,
            "sum_base_e2": ep,
            "sum_disc_e4": disc,
            "sum_charge_e6": disc * (100 + tx),
            "sum_disc_pct": dc,
            "count_order": np.ones(len(qty), np.int64),
        })
        agg = df.groupby(
            ["l_returnflag", "l_linestatus"], as_index=False
        ).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_quantity", "l_extendedprice", "l_discount",
         "l_tax", "l_returnflag", "l_linestatus"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    acc: dict[tuple[str, str], list[int]] = {}
    for r in parts.take_all():
        key = (r["l_returnflag"], r["l_linestatus"])
        cur = acc.setdefault(key, [0, 0, 0, 0, 0, 0])
        for i, c in enumerate((
            "sum_qty", "sum_base_e2", "sum_disc_e4", "sum_charge_e6",
            "sum_disc_pct", "count_order",
        )):
            cur[i] += int(r[c])  # Python ints: exact at any magnitude

    rows = []
    for (rf, ls) in sorted(acc):
        sq, sb, sd_, sc, sp, n = acc[(rf, ls)]
        rows.append({
            "l_returnflag": rf, "l_linestatus": ls,
            "sum_qty": sq, "sum_base_e2": sb, "sum_disc_e4": sd_,
            "sum_charge_e6": sc, "count_order": n,
            "sum_base_price": float(round_half_away(
                np.array([float(sb) / 100.0]), 2)[0]),
            "sum_disc_price": float(round_half_away(
                np.array([float(sd_) / 10000.0]), 2)[0]),
            "sum_charge": float(round_half_away(
                np.array([float(sc) / 1000000.0]), 2)[0]),
            "avg_qty": float(round_half_away(
                np.array([float(sq) / float(n)]), 9)[0]),
            "avg_price": float(round_half_away(
                np.array([float(sb) / 100.0 / float(n)]), 9)[0]),
            "avg_disc": float(round_half_away(
                np.array([float(sp) / 100.0 / float(n)]), 9)[0]),
        })
    out = pd.DataFrame(rows)
    for c in ("sum_qty", "sum_base_e2", "sum_disc_e4", "sum_charge_e6",
              "count_order"):
        out[c] = out[c].astype("int64")
    return out


SQL_Q1 = f"""
WITH m AS (
    SELECT l_returnflag, l_linestatus,
           sum(CAST(round(l_quantity) AS HUGEINT)) AS sq,
           sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sb,
           sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
               * (100 - CAST(round(l_discount * 100) AS HUGEINT))) AS sd,
           sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
               * (100 - CAST(round(l_discount * 100) AS HUGEINT))
               * (100 + CAST(round(l_tax * 100) AS HUGEINT))) AS sc,
           sum(CAST(round(l_discount * 100) AS HUGEINT)) AS sp,
           count(*)::HUGEINT AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUT}'
    GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus,
       sq::BIGINT AS sum_qty, sb::BIGINT AS sum_base_e2,
       sd::BIGINT AS sum_disc_e4, sc::BIGINT AS sum_charge_e6,
       n::BIGINT AS count_order,
       round(CAST(sb AS DOUBLE) / 100.0, 2) AS sum_base_price,
       round(CAST(sd AS DOUBLE) / 10000.0, 2) AS sum_disc_price,
       round(CAST(sc AS DOUBLE) / 1000000.0, 2) AS sum_charge,
       round(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE), 9) AS avg_qty,
       round(CAST(sb AS DOUBLE) / 100.0 / CAST(n AS DOUBLE), 9) AS avg_price,
       round(CAST(sp AS DOUBLE) / 100.0 / CAST(n AS DOUBLE), 9) AS avg_disc
FROM m
ORDER BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------- Q21

Q21_LATE_DAYS = 60
Q21_STATUS = "F"


def q21_late_supplier(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Suppliers who were the SOLE late shipper on a multi-supplier
    finished order (TPC-H Q21 shape; the slim schema has no
    receipt/commit dates, so "late" is l_shipdate > o_orderdate +
    60 days).  The EXISTS / NOT-EXISTS pair becomes one per-order
    aggregate — n_distinct_suppliers >= 2 AND n_distinct_LATE_suppliers
    == 1 — via sharded groupby on the order key; the only exchange is
    the lineitem ⋈ filtered-orders partitioned join.  Per-shard partial
    per-supplier counts combine on the driver (supplier is the smallest
    scaling dim; partials are <= shards x suppliers-per-shard rows)."""
    from .dedup import _join_partitions, _sharded_groupby

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"]
    ).map_batches(
        # NOTE: keep ChunkedArrays bare in pa.table() — wrapping one in
        # pa.array() re-infers the type and an EMPTY batch (e.g. no 'F'
        # orders in a block) comes out null-typed, which Acero rejects
        # as a join payload
        lambda t: (lambda f: pa.table({
            "k": f["o_orderkey"].cast(pa.int64()),
            "od": f["o_orderdate"].cast(pa.int64()),
        }))(t.filter(pc.equal(t["o_orderstatus"], Q21_STATUS))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table({
            "k": t["l_orderkey"].cast(pa.int64()),
            "sk": t["l_suppkey"].cast(pa.int64()),
            "ship": t["l_shipdate"].cast(pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from .joins import partitioned_hash_join

    j = partitioned_hash_join(
        li, orders, left_on="k", right_on="k",
        num_partitions=_join_partitions(max(li.count(), 1)), how="inner",
    )
    late_us = Q21_LATE_DAYS * 86_400_000_000

    def mark(t: pa.Table) -> pa.Table:
        late = (
            _i64(t["ship"]) > _i64(t["od"]) + np.int64(late_us)
        ).astype(np.int64)
        return pa.table({
            "k": t["k"], "sk": t["sk"], "late": pa.array(late, pa.int64())
        })

    j = j.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        ns = g.groupby("k")["sk"].nunique()
        lg = g[g["late"] == 1]
        nl = lg.groupby("k")["sk"].nunique().reindex(ns.index, fill_value=0)
        qual = ns.index[(ns >= 2) & (nl == 1)]
        rows = lg[lg["k"].isin(qual)]
        out = rows.groupby("sk", as_index=False).size()
        out.columns = ["sk", "numwait"]
        return out.astype({"sk": "int64", "numwait": "int64"})

    schema = pa.schema([("sk", pa.int64()), ("numwait", pa.int64())])
    parts = _sharded_groupby(j, ["k"], per_shard, empty_schema=schema)
    acc: dict[int, int] = {}
    for r in parts.take_all():
        acc[int(r["sk"])] = acc.get(int(r["sk"]), 0) + int(r["numwait"])

    sk_needed = np.sort(np.array(sorted(acc), np.int64))
    srows = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: t.filter(pa.array(np.isin(_i64(t["s_suppkey"]), sk_needed))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    sname = {int(r["s_suppkey"]): r["s_name"] for r in srows}
    out = pd.DataFrame({
        "s_suppkey": pd.Series(sorted(acc), dtype="int64"),
        "s_name": [sname[k] for k in sorted(acc)],
        "numwait": pd.Series([acc[k] for k in sorted(acc)], dtype="int64"),
    })
    return out


SQL_Q21 = f"""
WITH j AS (
    SELECT l_orderkey AS ok, l_suppkey AS sk,
           (l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY) AS late
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = '{Q21_STATUS}'
),
o AS (
    SELECT ok, count(DISTINCT sk) AS ns,
           count(DISTINCT CASE WHEN late THEN sk END) AS nl
    FROM j GROUP BY 1
)
SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
FROM j JOIN o USING (ok) JOIN supplier ON s_suppkey = j.sk
WHERE j.late AND o.ns >= 2 AND o.nl = 1
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- Q9

Q9_NAME_SUBSTR = "red"
Q9_COST_PCT = 50  # cost modeled as 50% of p_retailprice per unit


def q9_product_profit(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Product-type profit by supplier nation and order year (TPC-H Q9
    shape; the slim schema has no partsupp, so unit cost is modeled as
    {Q9_COST_PCT}% of p_retailprice — profit stays an exact integer at
    1e4 scale: rev_e4 - qty * retail_cents * pct).  Two dim lookups
    (name-filtered part -> retail_cents, supplier -> nationkey), one
    fact-fact partitioned join for the order year, <= nations x years
    groups combine on the driver as Python ints."""
    from .dedup import _join_partitions
    from .joins import partitioned_hash_join

    d = _dir(sf_dir)
    nat = read_parquet_sized(
        os.path.join(d, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).take_all()
    name_by_key = {int(r["n_nationkey"]): r["n_name"] for r in nat}

    parts = read_parquet_sized(
        os.path.join(d, "part.parquet"),
        columns=["p_partkey", "p_name", "p_retailprice"],
    ).map_batches(
        lambda t: pa.table({
            "p_partkey": pa.array(_i64(
                t.filter(pc.match_substring(t["p_name"], Q9_NAME_SUBSTR))
                ["p_partkey"])),
            "retail_cents": pa.array(_cents(
                t.filter(pc.match_substring(t["p_name"], Q9_NAME_SUBSTR))
                ["p_retailprice"].to_numpy(zero_copy_only=False))),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def li_prep(t: pa.Table) -> pa.Table:
        qty = round_half_away(
            t["l_quantity"].to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        rev = _rev_e4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        return pa.table({
            "l_orderkey": pa.array(_i64(t["l_orderkey"])),
            "l_partkey": pa.array(_i64(t["l_partkey"])),
            "l_suppkey": pa.array(_i64(t["l_suppkey"])),
            "qty": pa.array(qty), "rev": pa.array(rev),
        })

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)
    li = _dim_lookup(li, "l_partkey", parts, "p_partkey", "retail_cents",
                     "retail_cents", limit=dim_limit)
    li = _dim_lookup(li, "l_suppkey", supp, "s_suppkey", "s_nationkey",
                     "supp_nk", limit=dim_limit)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({
            "o_orderkey": pa.array(_i64(t["o_orderkey"])),
            "o_year": pa.array(
                _ts(t["o_orderdate"]).astype("datetime64[Y]")
                .astype(np.int64) + 1970, pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j = partitioned_hash_join(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        num_partitions=_join_partitions(max(li.count(), 1)), how="inner",
    )

    def partial(t: pa.Table) -> pa.Table:
        profit = (
            _i64(t["rev"])
            - _i64(t["qty"]) * _i64(t["retail_cents"]) * Q9_COST_PCT
        )
        g = (
            pa.table({
                "supp_nk": t["supp_nk"], "o_year": t["o_year"],
                "profit": pa.array(profit, pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            })
            .group_by(["supp_nk", "o_year"])
            .aggregate([("profit", "sum"), ("one", "sum")])
        )
        return pa.table({
            "supp_nk": g["supp_nk"], "o_year": g["o_year"],
            "profit": g["profit_sum"].cast(pa.int64()),
            "n": g["one_sum"].cast(pa.int64()),
        })

    rows = j.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc: dict[tuple, list[int]] = {}
    for r in rows:
        e = acc.setdefault((int(r["supp_nk"]), int(r["o_year"])), [0, 0])
        e[0] += int(r["profit"])
        e[1] += int(r["n"])
    keys = sorted(acc)
    out = pd.DataFrame({
        "nation": [name_by_key[k[0]] for k in keys],
        "o_year": pd.Series([k[1] for k in keys], dtype="int64"),
        "n_rows": pd.Series([acc[k][1] for k in keys], dtype="int64"),
        "sum_profit_e4": pd.Series([acc[k][0] for k in keys], dtype="int64"),
    })
    out["sum_profit"] = round_half_away(
        out["sum_profit_e4"].to_numpy(np.int64).astype(np.float64) / 1e4, 2
    )
    return out


SQL_Q9 = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       count(*)::BIGINT AS n_rows,
       sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
           * (100 - CAST(round(l_discount * 100) AS HUGEINT))
           - CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(p_retailprice * 100) AS HUGEINT)
             * {Q9_COST_PCT})::BIGINT AS sum_profit_e4,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                      * (100 - CAST(round(l_discount * 100) AS HUGEINT))
                      - CAST(round(l_quantity) AS HUGEINT)
                        * CAST(round(p_retailprice * 100) AS HUGEINT)
                        * {Q9_COST_PCT}) AS DOUBLE) / 10000.0, 2)
           AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%{Q9_NAME_SUBSTR}%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- Q12

Q12_FAST_DAYS = 30
Q12_MED_DAYS = 90
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_latency_class(sf_dir: str) -> pd.DataFrame:
    """High/low-priority line counts per shipping-latency class (TPC-H
    Q12 shape; the slim schema has no shipmode/receiptdate, so the class
    is days(l_shipdate - o_orderdate): FAST < {Q12_FAST_DAYS}, MED <=
    {Q12_MED_DAYS}, else SLOW — ship timestamps are midnight-aligned so
    the day diff is an exact integer).  One fact-fact partitioned join,
    3-group Arrow partials, driver Python-int combine."""
    from .dedup import _join_partitions
    from .joins import partitioned_hash_join

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        # bare ChunkedArrays (no pa.array re-inference: empty -> null type)
        lambda t: pa.table({
            "k": t["o_orderkey"].cast(pa.int64()),
            "od": t["o_orderdate"].cast(pa.int64()),
            "hi": pc.is_in(
                t["o_orderpriority"].combine_chunks(),
                value_set=pa.array(Q12_HIGH, pa.string()),
            ).cast(pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda t: pa.table({
            "k": t["l_orderkey"].cast(pa.int64()),
            "ship": t["l_shipdate"].cast(pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j = partitioned_hash_join(
        li, orders, left_on="k", right_on="k",
        num_partitions=_join_partitions(max(li.count(), 1)), how="inner",
    )
    day_us = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        d = (_i64(t["ship"]) - _i64(t["od"])) // day_us
        cls = np.where(
            d < Q12_FAST_DAYS, "FAST",
            np.where(d <= Q12_MED_DAYS, "MED", "SLOW"),
        )
        hi = _i64(t["hi"])
        g = (
            pa.table({
                "ship_class": pa.array(cls, pa.string()),
                "hi": pa.array(hi, pa.int64()),
                "lo": pa.array(1 - hi, pa.int64()),
                "one": pa.array(np.ones(len(hi), np.int64)),
            })
            .group_by(["ship_class"])
            .aggregate([("hi", "sum"), ("lo", "sum"), ("one", "sum")])
        )
        return pa.table({
            "ship_class": g["ship_class"],
            "hi": g["hi_sum"].cast(pa.int64()),
            "lo": g["lo_sum"].cast(pa.int64()),
            "n": g["one_sum"].cast(pa.int64()),
        })

    rows = j.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc: dict[str, list[int]] = {}
    for r in rows:
        e = acc.setdefault(r["ship_class"], [0, 0, 0])
        e[0] += int(r["hi"])
        e[1] += int(r["lo"])
        e[2] += int(r["n"])
    keys = sorted(acc)
    return pd.DataFrame({
        "ship_class": keys,
        "high_line_count": pd.Series([acc[k][0] for k in keys], dtype="int64"),
        "low_line_count": pd.Series([acc[k][1] for k in keys], dtype="int64"),
        "n_rows": pd.Series([acc[k][2] for k in keys], dtype="int64"),
    })


SQL_Q12 = f"""
SELECT CASE WHEN d < {Q12_FAST_DAYS} THEN 'FAST'
            WHEN d <= {Q12_MED_DAYS} THEN 'MED'
            ELSE 'SLOW' END AS ship_class,
       sum(hi)::BIGINT AS high_line_count,
       sum(1 - hi)::BIGINT AS low_line_count,
       count(*)::BIGINT AS n_rows
FROM (
    SELECT datediff('day', o_orderdate, l_shipdate) AS d,
           CASE WHEN o_orderpriority IN ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}')
                THEN 1 ELSE 0 END AS hi
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
)
GROUP BY 1
"""


# ---------------------------------------------------------------- Q2

Q2_SIZE = 15
Q2_TYPE = "STANDARD"
Q2_TOPK = 100


def q2_min_offer(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Minimum-offer supplier per part (TPC-H Q2 shape; the slim schema
    has no partsupp, so a supplier's offer for a part is min observed
    round(l_extendedprice*100) over their lineitems).  The part filter
    (size + type) collapses lineitem via a broadcast semi-join; ONE
    sharded groupby computes per-(part, supplier) min AND the per-part
    winner rows (both aggregates share the part-key shard); the few
    winners enrich against supplier/nation on the driver and rank under
    the Q2 total order (acctbal desc, nation, supplier, part)."""
    from .dedup import _sharded_groupby

    d = _dir(sf_dir)
    pk_rows = read_parquet_sized(
        os.path.join(d, "part.parquet"),
        columns=["p_partkey", "p_size", "p_type"],
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["p_size"], Q2_SIZE),
                pc.equal(t["p_type"], Q2_TYPE),
            )
        ).select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]
    )
    li = _dim_semi(li, "l_partkey", pk_rows, "p_partkey", limit=dim_limit)
    li = li.map_batches(
        lambda t: pa.table({
            "pk": pa.array(_i64(t["l_partkey"])),
            "sk": pa.array(_i64(t["l_suppkey"])),
            "cents": pa.array(_cents(
                t["l_extendedprice"].to_numpy(zero_copy_only=False))),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        offers = g.groupby(["pk", "sk"], as_index=False)["cents"].min()
        best = offers.groupby("pk")["cents"].transform("min")
        out = offers[offers["cents"] == best]
        out.columns = ["pk", "sk", "offer_cents"]
        return out.astype(
            {"pk": "int64", "sk": "int64", "offer_cents": "int64"}
        )

    schema = pa.schema(
        [("pk", pa.int64()), ("sk", pa.int64()), ("offer_cents", pa.int64())]
    )
    winners = pd.DataFrame(
        _sharded_groupby(li, ["pk"], per_shard, empty_schema=schema)
        .take_all(),
        columns=["pk", "sk", "offer_cents"],
    )

    sk_needed = np.sort(winners["sk"].unique().astype(np.int64))
    srows = _read(
        sf_dir, "supplier",
        ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
    ).map_batches(
        lambda t: t.filter(pa.array(np.isin(_i64(t["s_suppkey"]), sk_needed))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    sup = {
        int(r["s_suppkey"]): (
            int(_cents(np.array([float(r["s_acctbal"])]))[0]),
            r["s_name"], int(r["s_nationkey"]),
        )
        for r in srows
    }
    nat = read_parquet_sized(
        os.path.join(d, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).take_all()
    nname = {int(r["n_nationkey"]): r["n_name"] for r in nat}

    out = pd.DataFrame({
        "s_acctbal_cents": pd.Series(
            [sup[s][0] for s in winners["sk"]], dtype="int64"),
        "s_name": [sup[s][1] for s in winners["sk"]],
        "n_name": [nname[sup[s][2]] for s in winners["sk"]],
        "p_partkey": winners["pk"].astype("int64"),
        "s_suppkey": winners["sk"].astype("int64"),
        "offer_cents": winners["offer_cents"].astype("int64"),
    })
    out = out.sort_values(
        ["s_acctbal_cents", "n_name", "s_name", "p_partkey", "s_suppkey"],
        ascending=[False, True, True, True, True],
    ).head(Q2_TOPK).reset_index(drop=True)
    return out[["s_acctbal_cents", "s_name", "n_name", "p_partkey",
                "s_suppkey", "offer_cents"]]


SQL_Q2 = f"""
WITH offers AS (
    SELECT l_partkey AS pk, l_suppkey AS sk,
           min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS offer_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_size = {Q2_SIZE} AND p_type = '{Q2_TYPE}'
    GROUP BY 1, 2
),
best AS (SELECT pk, min(offer_cents) AS mo FROM offers GROUP BY 1)
SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
       s_name, n_name, pk AS p_partkey, sk AS s_suppkey, offer_cents
FROM offers
JOIN best USING (pk)
JOIN supplier ON s_suppkey = sk
JOIN nation ON n_nationkey = s_nationkey
WHERE offer_cents = mo
ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey, s_suppkey
LIMIT {Q2_TOPK}
"""

# ---------------------------------------------------------------- Q11

Q11_NATION = "NATION_3"
Q11_AVG_MULT = 2  # keep parts with value > Q11_AVG_MULT * average value


def q11_important_parts(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """High-value parts by shipped value from one nation's suppliers
    (TPC-H Q11 shape; no partsupp in the slim schema, so a part's
    "stock value" is the summed round(l_extendedprice*100) over
    lineitems shipped by that nation's suppliers).  Q11's fixed
    fraction does not survive scale (per-part share shrinks as the part
    count grows), so the HAVING is value > {Q11_AVG_MULT}x the average
    per-part value — integer cross-multiplied (val * n_parts >
    {Q11_AVG_MULT} * total), no float threshold.  One sharded per-part
    aggregate; a tiny (sum, count) partial pass sets the threshold; the
    qualifying tail is the only driver-collected set."""
    from .dedup import _sharded_groupby

    d = _dir(sf_dir)
    nat = read_parquet_sized(
        os.path.join(d, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).take_all()
    nk = [int(r["n_nationkey"]) for r in nat if r["n_name"] == Q11_NATION]
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: t.filter(
            pa.array(np.isin(_i64(t["s_nationkey"]), np.array(nk, np.int64)))
        ).select(["s_suppkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
    li = _dim_semi(li, "l_suppkey", supp, "s_suppkey", limit=dim_limit)
    li = li.map_batches(
        lambda t: pa.table({
            "pk": pa.array(_i64(t["l_partkey"])),
            "c": pa.array(_cents(
                t["l_extendedprice"].to_numpy(zero_copy_only=False))),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    per_part = _sharded_groupby(
        li, ["pk"],
        lambda df: df.groupby("pk", as_index=False).agg(val=("c", "sum")),
        empty_schema=pa.schema([("pk", pa.int64()), ("val", pa.int64())]),
    ).materialize()  # two consumers: threshold partials + tail filter

    parts = per_part.map_batches(
        lambda t: pa.table({
            "s": pa.array([int(_i64(t["val"]).sum())], pa.int64()),
            "n": pa.array([t.num_rows], pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    tot, n = _pysum([(r["s"], r["n"]) for r in parts], 2)
    if n == 0:
        return pd.DataFrame({
            "p_partkey": pd.Series([], dtype="int64"),
            "value_cents": pd.Series([], dtype="int64"),
        })
    rows = per_part.map_batches(
        lambda t: t.filter(pa.array(
            _i64(t["val"]) * n > Q11_AVG_MULT * tot
        )),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    out = pd.DataFrame({
        "p_partkey": pd.Series([int(r["pk"]) for r in rows], dtype="int64"),
        "value_cents": pd.Series([int(r["val"]) for r in rows], dtype="int64"),
    })
    return out.sort_values("p_partkey").reset_index(drop=True)


SQL_Q11 = f"""
WITH f AS (
    SELECT l_partkey AS pk,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS c
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    WHERE s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_name = '{Q11_NATION}')
),
v AS (SELECT pk, sum(c)::BIGINT AS val FROM f GROUP BY 1),
tot AS (SELECT sum(val)::HUGEINT AS t, count(*)::HUGEINT AS n FROM v)
SELECT pk AS p_partkey, val AS value_cents
FROM v, tot WHERE val::HUGEINT * n > {Q11_AVG_MULT} * t
"""


# ---------------------------------------------------------------- Q16

Q16_EXCL_BRAND = "Brand#13"
Q16_EXCL_TYPE_PREFIX = "PROMO"
Q16_SIZES = (1, 5, 9, 15, 23, 30, 41, 50)
Q16_BAD_SUPP_SUBSTR = "7"  # "complaints" proxy: s_name containing this


def q16_part_supplier_cnt(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Distinct-supplier counts per part attribute class (TPC-H Q16
    shape; lineitem stands in for partsupp, suppliers whose name
    contains '{Q16_BAD_SUPP_SUBSTR}' stand in for the complaints
    exclusion).  The filtered part dim collapses to a broadcast
    partkey -> packed-attribute-code lookup (brand/type vocabularies
    are bounded catalog domains, collected once); distinct (code,
    suppkey) pairs dedup inside ONE pair-sharded exchange — each pair
    lands in exactly one shard, so per-shard distinct counts are
    additive."""
    from .dedup import _sharded_groupby

    d = _dir(sf_dir)
    part = read_parquet_sized(
        os.path.join(d, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).map_batches(
        lambda t: t.filter(pc.and_(
            pc.and_(
                pc.invert(pc.equal(t["p_brand"], Q16_EXCL_BRAND)),
                pc.invert(pc.starts_with(t["p_type"], Q16_EXCL_TYPE_PREFIX)),
            ),
            pc.is_in(t["p_size"],
                     value_set=pa.array(Q16_SIZES, t["p_size"].type)),
        )),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()  # small filtered dim: vocab pass + code lookup

    vocab_rows = part.map_batches(
        lambda t: pa.table({
            "b": t["p_brand"], "y": t["p_type"],
        }).group_by(["b", "y"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    brands = sorted({r["b"] for r in vocab_rows})
    types = sorted({r["y"] for r in vocab_rows})
    b_idx = {b: i for i, b in enumerate(brands)}
    y_idx = {y: i for i, y in enumerate(types)}
    n_sizes = max(Q16_SIZES) + 1

    def code_of(t: pa.Table) -> pa.Table:
        b = np.array([b_idx[x] for x in t["p_brand"].to_pylist()], np.int64)
        y = np.array([y_idx[x] for x in t["p_type"].to_pylist()], np.int64)
        s = _i64(t["p_size"])
        return pa.table({
            "p_partkey": pa.array(_i64(t["p_partkey"])),
            "code": pa.array(
                (b * len(types) + y) * n_sizes + s, pa.int64()),
        })

    coded = part.map_batches(code_of, batch_format="pyarrow",
                             zero_copy_batch=True)

    bad = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: t.filter(
            pc.match_substring(t["s_name"], Q16_BAD_SUPP_SUBSTR)
        ).select(["s_suppkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    bad_sk = np.sort(np.array([int(r["s_suppkey"]) for r in bad], np.int64))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        lambda t: t.filter(pa.array(
            ~np.isin(_i64(t["l_suppkey"]), bad_sk))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _dim_lookup(li, "l_partkey", coded, "p_partkey", "code", "code",
                     limit=dim_limit)

    def pair_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "code": t["code"].cast(pa.int64()),
            "sk": t["l_suppkey"].cast(pa.int64()),
        }).group_by(["code", "sk"]).aggregate([])

    pairs = li.map_batches(pair_partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["code", "sk"])
        out = u.groupby("code", as_index=False).size()
        out.columns = ["code", "supplier_cnt"]
        return out.astype({"code": "int64", "supplier_cnt": "int64"})

    parts = _sharded_groupby(
        pairs, ["code", "sk"], per_shard,
        empty_schema=pa.schema(
            [("code", pa.int64()), ("supplier_cnt", pa.int64())]),
    ).take_all()
    acc: dict[int, int] = {}
    for r in parts:
        acc[int(r["code"])] = acc.get(int(r["code"]), 0) + int(r["supplier_cnt"])
    codes = sorted(acc)
    return pd.DataFrame({
        "p_brand": [brands[c // n_sizes // len(types)] for c in codes],
        "p_type": [types[(c // n_sizes) % len(types)] for c in codes],
        "p_size": pd.Series([c % n_sizes for c in codes], dtype="int64"),
        "supplier_cnt": pd.Series([acc[c] for c in codes], dtype="int64"),
    })


SQL_Q16 = f"""
SELECT p_brand, p_type, p_size::BIGINT AS p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type NOT LIKE '{Q16_EXCL_TYPE_PREFIX}%'
  AND p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier
      WHERE s_name LIKE '%{Q16_BAD_SUPP_SUBSTR}%')
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------- Q20

Q20_NAME_PREFIX = "red"
Q20_LO, Q20_HI = "1996-01-01", "1997-01-01"


def q20_excess_suppliers(
    sf_dir: str, *, dim_limit: int = DIM_BROADCAST_LIMIT
) -> pd.DataFrame:
    """Suppliers who shipped the majority of some '{Q20_NAME_PREFIX}%'
    part's 1996 volume (TPC-H Q20 shape; shipped lineitem quantity
    stands in for partsupp availqty, majority-of-part-volume for the
    50%-of-availqty test).  ONE part-sharded exchange computes
    per-(part, supplier) and per-part quantity together and emits the
    qualifying suppliers; the distinct survivor set is a p99 tail
    enriched against supplier/nation on the driver."""
    from .dedup import _sharded_groupby

    d = _dir(sf_dir)
    pk_rows = read_parquet_sized(
        os.path.join(d, "part.parquet"), columns=["p_partkey", "p_name"]
    ).map_batches(
        lambda t: t.filter(
            pc.starts_with(t["p_name"], Q20_NAME_PREFIX)
        ).select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    lo, hi = np.datetime64(Q20_LO), np.datetime64(Q20_HI)

    def li_prep(t: pa.Table) -> pa.Table:
        sd = _ts(t["l_shipdate"])
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        return pa.table({
            "pk": pa.array(_i64(t["l_partkey"])),
            "sk": pa.array(_i64(t["l_suppkey"])),
            "q": pa.array(round_half_away(
                t["l_quantity"].to_numpy(zero_copy_only=False), 0
            ).astype(np.int64)),
        })

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)
    li = _dim_semi(li, "pk", pk_rows, "p_partkey", limit=dim_limit)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby(["pk", "sk"], as_index=False)["q"].sum()
        tq = f.groupby("pk")["q"].transform("sum")
        out = f[2 * f["q"] > tq][["sk"]].drop_duplicates()
        return out.astype({"sk": "int64"})

    rows = _sharded_groupby(
        li, ["pk"], per_shard,
        empty_schema=pa.schema([("sk", pa.int64())]),
    ).take_all()
    sks = np.sort(np.unique(np.array(
        [int(r["sk"]) for r in rows], np.int64)))

    srows = _read(
        sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]
    ).map_batches(
        lambda t: t.filter(pa.array(np.isin(_i64(t["s_suppkey"]), sks))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    nat = read_parquet_sized(
        os.path.join(d, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).take_all()
    nname = {int(r["n_nationkey"]): r["n_name"] for r in nat}
    by_sk = {int(r["s_suppkey"]): r for r in srows}
    return pd.DataFrame({
        "s_suppkey": pd.Series(list(sks), dtype="int64"),
        "s_name": [by_sk[k]["s_name"] for k in sks],
        "n_name": [nname[int(by_sk[k]["s_nationkey"])] for k in sks],
    })


SQL_Q20 = f"""
WITH f AS (
    SELECT l_partkey AS pk, l_suppkey AS sk,
           sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS q
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
      AND l_shipdate >= TIMESTAMP '{Q20_LO}'
      AND l_shipdate < TIMESTAMP '{Q20_HI}'
    GROUP BY 1, 2
),
tot AS (SELECT pk, sum(q)::BIGINT AS tq FROM f GROUP BY 1)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM f JOIN tot USING (pk)
JOIN supplier ON s_suppkey = f.sk
JOIN nation ON n_nationkey = s_nationkey
WHERE 2 * f.q > tot.tq
"""
