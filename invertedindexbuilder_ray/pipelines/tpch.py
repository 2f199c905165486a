"""TPC-H-shaped relational pipelines (Q3, Q6, Q7, Q10, Q14, Q17, Q18)
over the synthetic star schema.

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
