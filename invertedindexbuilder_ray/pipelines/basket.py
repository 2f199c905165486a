"""Market-basket association rules over order/part baskets.

Frequent-itemset mining at warehouse scale: each order is a basket of
part brands; the engine mines directed rules ``antecedent -> consequent``
with support / confidence / lift over all baskets.  The item domain
(brands) is a bounded enumeration, so pair counts are tiny — the scale
problem is basket assembly, which needs (a) a partitioned hash join to
attach brands to line items and (b) an order-sharded exchange to
co-locate each basket.  Both reuse the engine's join/shard primitives;
nothing driver-side grows with the order count.

All rule metrics are exact integers (``conf_x1e6 = 1e6*pair // ante``,
``lift_x1e6 = 1e6*pair*n_baskets // (ante*cons)``) so the DuckDB oracle
pairs hash-exact.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.util import read_parquet_sized
from .dedup import _join_partitions, _sharded_groupby, _shards_for
from .joins import partitioned_hash_join

MIN_SUPPORT = 20


def assoc_rules_df(sf_dir: str, min_support: int = MIN_SUPPORT) -> pd.DataFrame:
    """Directed association rules between part brands co-occurring in an
    order.  Columns: ``antecedent, consequent, pair_cnt, ante_cnt,
    cons_cnt, conf_x1e6, lift_x1e6`` (rules with pair support below
    ``min_support`` are dropped)."""
    li = read_parquet_sized(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    part = read_parquet_sized(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"],
    )
    n_li = li.count()

    joined = partitioned_hash_join(
        li, part, left_on="l_partkey", right_on="p_partkey",
        num_partitions=_join_partitions(n_li),
    ).select_columns(["l_orderkey", "p_brand"])

    # order-sharded basket assembly: per shard, dedupe (order, brand),
    # count items and undirected brand pairs — output is O(#brands^2)
    # per shard regardless of basket count
    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l_orderkey", "p_brand"])
        items = d.groupby("p_brand").size()
        m = d.merge(d, on="l_orderkey")
        m = m[m["p_brand_x"] < m["p_brand_y"]]
        pairs = m.groupby(["p_brand_x", "p_brand_y"]).size()
        rows = [
            {"a": "", "b": "", "c": np.int64(d["l_orderkey"].nunique())}
        ]
        rows += [
            {"a": br, "b": "", "c": np.int64(c)} for br, c in items.items()
        ]
        rows += [
            {"a": x, "b": y, "c": np.int64(c)}
            for (x, y), c in pairs.items()
        ]
        return pd.DataFrame(rows).astype(
            {"a": "object", "b": "object", "c": "int64"}
        )

    schema = pa.schema(
        [("a", pa.utf8()), ("b", pa.utf8()), ("c", pa.int64())]
    )
    parts = _sharded_groupby(
        joined, ["l_orderkey"], per_shard,
        num_shards=_shards_for(n_li), empty_schema=schema,
    ).to_pandas()

    cols = [
        "antecedent", "consequent", "pair_cnt", "ante_cnt", "cons_cnt",
        "conf_x1e6", "lift_x1e6",
    ]
    dtypes = {
        "antecedent": "object", "consequent": "object",
        "pair_cnt": "int64", "ante_cnt": "int64", "cons_cnt": "int64",
        "conf_x1e6": "int64", "lift_x1e6": "int64",
    }
    if not len(parts):
        return pd.DataFrame(columns=cols).astype(dtypes)

    agg = parts.groupby(["a", "b"], as_index=False)["c"].sum()
    n_baskets = int(agg.loc[(agg["a"] == "") & (agg["b"] == ""), "c"].sum())
    item = {
        r["a"]: int(r["c"])
        for _, r in agg[(agg["a"] != "") & (agg["b"] == "")].iterrows()
    }
    out = []
    for _, r in agg[(agg["a"] != "") & (agg["b"] != "")].iterrows():
        c = int(r["c"])
        if c < min_support:
            continue
        for ante, cons in ((r["a"], r["b"]), (r["b"], r["a"])):
            na, nc = item[ante], item[cons]
            out.append(
                {
                    "antecedent": ante,
                    "consequent": cons,
                    "pair_cnt": c,
                    "ante_cnt": na,
                    "cons_cnt": nc,
                    "conf_x1e6": (1_000_000 * c) // na,
                    "lift_x1e6": (1_000_000 * c * n_baskets) // (na * nc),
                }
            )
    if not out:
        return pd.DataFrame(columns=cols).astype(dtypes)
    return pd.DataFrame(out).astype(dtypes)[cols]


# ---------------------------------------------------------------- pairs

COPURCHASE_TOPK = 20


def copurchase_pairs_df(sf_dir: str, *, k: int = COPURCHASE_TOPK) -> pd.DataFrame:
    """Top-k co-purchased PART pairs across orders (item-item
    co-occurrence mining — the recommender-candidate primitive, one
    granularity below assoc_rules' bounded brand domain).

    Scale shape: the self-join explosion is contained per order — an
    order-sharded exchange co-locates each basket, the within-shard
    pandas self-merge emits only intra-order pairs (baskets are small:
    pairs grow as Σ b_i², not N²), a second pair-sharded exchange sums
    counts, and the global top-k is per-block partial top-k on INTEGER
    keys merged on the driver (k × n_blocks rows, never the data).
    Ties are impossible past (n, pk1, pk2) — the full sort key is
    unique — so LIMIT k is deterministic on both engines."""
    path = (
        os.path.join(sf_dir, "lineitem.parquet")
        if os.path.isdir(sf_dir) else sf_dir
    )
    li = read_parquet_sized(path, columns=["l_orderkey", "l_partkey"])

    def pairs_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        g = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
        return g.rename(columns={
            "l_partkey_x": "pk1", "l_partkey_y": "pk2", "size": "n"
        })

    per_shard = _sharded_groupby(
        li, ["l_orderkey"], pairs_in_shard, empty_schema=None
    )

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["pk1", "pk2"], as_index=False)["n"].sum()

    schema = pa.schema(
        [("pk1", pa.int64()), ("pk2", pa.int64()), ("n", pa.int64())]
    )
    counts = _sharded_groupby(per_shard, ["pk1"], sum_pairs,
                              empty_schema=schema)

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "pk1", "pk2"], ascending=[False, True, True]
        ).head(k)

    cand = pd.DataFrame(
        counts.map_batches(partial_topk, batch_format="pandas").take_all(),
        columns=["pk1", "pk2", "n"],
    )
    out = cand.sort_values(
        ["n", "pk1", "pk2"], ascending=[False, True, True]
    ).head(k).reset_index(drop=True)
    for c in ("pk1", "pk2", "n"):
        out[c] = out[c].astype("int64")
    return out[["pk1", "pk2", "n"]]


SQL_COPURCHASE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
    SELECT a.l_partkey AS pk1, b.l_partkey AS pk2
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT pk1, pk2, count(*)::BIGINT AS n
FROM p GROUP BY 1, 2
ORDER BY n DESC, pk1, pk2
LIMIT {COPURCHASE_TOPK}
"""


# ---------------------------------------------------------------- triples

MIN_SUPPORT_3 = 10


def frequent_triples_df(
    sf_dir: str, min_support: int = MIN_SUPPORT_3
) -> pd.DataFrame:
    """Frequent brand 3-itemsets across order baskets (the Apriori
    depth-3 step above assoc_rules' pairs).  Same containment shape:
    an order-sharded exchange co-locates each basket, the within-shard
    double self-merge emits only intra-order ordered triples (the item
    domain is the bounded brand enumeration, so shard output is
    O(#brands^3) worst case, independent of basket count), and the
    per-shard counts sum on the driver.  Columns: ``brand_a, brand_b,
    brand_c, support`` with support >= ``min_support``, brand_a <
    brand_b < brand_c."""
    li = read_parquet_sized(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    part = read_parquet_sized(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"],
    )
    n_li = li.count()
    joined = partitioned_hash_join(
        li, part, left_on="l_partkey", right_on="p_partkey",
        num_partitions=_join_partitions(n_li),
    ).select_columns(["l_orderkey", "p_brand"])

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l_orderkey", "p_brand"])
        m = d.merge(d, on="l_orderkey").merge(
            d, on="l_orderkey", suffixes=("", "_z")
        )
        m = m[(m["p_brand_x"] < m["p_brand_y"])
              & (m["p_brand_y"] < m["p_brand"])]
        t = m.groupby(
            ["p_brand_x", "p_brand_y", "p_brand"], as_index=False
        ).size()
        return t.rename(columns={
            "p_brand_x": "brand_a", "p_brand_y": "brand_b",
            "p_brand": "brand_c", "size": "support",
        })

    schema = pa.schema([
        ("brand_a", pa.utf8()), ("brand_b", pa.utf8()),
        ("brand_c", pa.utf8()), ("support", pa.int64()),
    ])
    parts = _sharded_groupby(
        joined, ["l_orderkey"], per_shard,
        num_shards=_shards_for(n_li), empty_schema=schema,
    ).to_pandas()
    cols = ["brand_a", "brand_b", "brand_c", "support"]
    if not len(parts):
        return pd.DataFrame(columns=cols).astype({"support": "int64"})
    agg = parts.groupby(
        ["brand_a", "brand_b", "brand_c"], as_index=False
    )["support"].sum()
    agg = agg[agg["support"] >= min_support]
    agg["support"] = agg["support"].astype("int64")
    return agg.sort_values(cols[:3]).reset_index(drop=True)[cols]


SQL_FREQUENT_TRIPLES = f"""
WITH b AS (
    SELECT DISTINCT l_orderkey, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT b1.p_brand AS brand_a, b2.p_brand AS brand_b, b3.p_brand AS brand_c,
       count(*)::BIGINT AS support
FROM b b1
JOIN b b2 ON b1.l_orderkey = b2.l_orderkey AND b1.p_brand < b2.p_brand
JOIN b b3 ON b2.l_orderkey = b3.l_orderkey AND b2.p_brand < b3.p_brand
GROUP BY 1, 2, 3
HAVING count(*) >= {MIN_SUPPORT_3}
ORDER BY 1, 2, 3
"""
