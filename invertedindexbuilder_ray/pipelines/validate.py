"""Deequ-style data-validation suite over the warehouse tables.

A 100-TB ingest runs constraint checks (completeness, uniqueness,
referential integrity, value domains) as a gate before any expensive
downstream stage.  This module expresses each check as a streaming
aggregate:

- scalar checks (null counts, range/domain violations) are per-batch
  Arrow counters — one tiny row per batch reaches the driver;
- uniqueness and foreign-key checks need key co-location, so they run
  through ``dedup._sharded_groupby`` (hash-shard the key space to a
  bounded group count, vectorized pandas inside each shard) — never a
  per-key Ray groupby and never a driver-side key set.

Output is one row per check: ``(check_name, tbl, metric, passed)``
where ``metric`` is the violation count and ``passed = (metric == 0)``
as int64 — all-integer so the DuckDB oracle pairs hash-exact.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.util import read_parquet_sized
from .dedup import _sharded_groupby, _shards_for

LANG_DOMAIN = ("en", "de", "fr", "es", "zh")
ORDERSTATUS_DOMAIN = ("F", "O", "P")
QTY_LO, QTY_HI = 1.0, 50.0
ACCT_LO, ACCT_HI = -1000.0, 10000.0
TS_LO = pd.Timestamp("2024-01-01").value // 1000  # us since epoch
TS_HI = pd.Timestamp("2025-01-01").value // 1000


def _tbl(sf_dir: str, name: str, columns: list[str]) -> rd.Dataset:
    return read_parquet_sized(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def _sum_counts(ds: rd.Dataset, partials) -> dict[str, int]:
    """Run a per-batch counter fn (Table -> {name: int}) and sum on the
    driver; only one fixed-width row per batch crosses the object store."""

    def f(batch: pa.Table) -> pa.Table:
        d = partials(batch)
        return pa.table({k: pa.array([v], pa.int64()) for k, v in d.items()})

    out: dict[str, int] = {}
    for row in ds.map_batches(f, batch_format="pyarrow").take_all():
        for k, v in row.items():
            out[k] = out.get(k, 0) + int(v)
    return out


def _dup_count(ds: rd.Dataset, key: str, n_rows: int) -> int:
    """Rows minus distinct keys, via per-batch unique partials + a
    key-sharded exchange (per-shard ``sum(c) - nunique``)."""

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.select([key]).group_by(key).aggregate([([], "count_all")])
        return pa.table(
            {"k": g[key].cast(pa.int64()), "c": g["count_all"].cast(pa.int64())}
        )

    pr = ds.map_batches(partials, batch_format="pyarrow")

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("k")["c"].sum()
        return pd.DataFrame(
            [{"dups": np.int64(int(s.sum()) - len(s))}]
        ).astype({"dups": "int64"})

    schema = pa.schema([("dups", pa.int64())])
    parts = _sharded_groupby(
        pr, ["k"], per_shard, num_shards=_shards_for(n_rows),
        empty_schema=schema,
    ).to_pandas()
    return int(parts["dups"].sum()) if len(parts) else 0


def _fk_orphans(
    child: rd.Dataset, child_key: str, parent: rd.Dataset, parent_key: str,
    n_rows: int,
) -> int:
    """Count child rows whose key has no parent row: tag sides, union,
    shard by key, per-shard anti count.  Both sides stream; no driver
    key set, no broadcast bound."""

    def tag(side: int, key: str):
        def f(batch: pa.Table) -> pa.Table:
            g = batch.select([key]).group_by(key).aggregate(
                [([], "count_all")]
            )
            n = g.num_rows
            return pa.table(
                {
                    "k": g[key].cast(pa.int64()),
                    "c": g["count_all"].cast(pa.int64()),
                    "side": pa.array(np.full(n, side, np.int64)),
                }
            )

        return f

    both = child.map_batches(tag(0, child_key), batch_format="pyarrow").union(
        parent.map_batches(tag(1, parent_key), batch_format="pyarrow")
    )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        has_parent = set(g.loc[g["side"] == 1, "k"])
        ch = g[g["side"] == 0]
        orphans = int(ch.loc[~ch["k"].isin(has_parent), "c"].sum())
        return pd.DataFrame([{"orphans": np.int64(orphans)}]).astype(
            {"orphans": "int64"}
        )

    schema = pa.schema([("orphans", pa.int64())])
    parts = _sharded_groupby(
        both, ["k"], per_shard, num_shards=_shards_for(n_rows),
        empty_schema=schema,
    ).to_pandas()
    return int(parts["orphans"].sum()) if len(parts) else 0


def validation_suite_df(sf_dir: str) -> pd.DataFrame:
    """Run the full constraint suite; one row per check.

    Columns: ``check_name, tbl, metric, passed`` (metric = violation
    count; passed = 1 iff metric == 0)."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text", "lang"])
    orders = _tbl(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"]
    )
    lineitem = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    customer = _tbl(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    events = _tbl(sf_dir, "events", ["ts"])
    emb = _tbl(sf_dir, "embeddings", ["embedding"])

    n_docs = docs.count()
    n_orders = orders.count()
    n_lineitem = lineitem.count()

    # --- scalar per-batch counters (one pass per table) ------------------
    def docs_counts(batch: pa.Table) -> dict[str, int]:
        text_null = int(pc.sum(pc.is_null(batch["text"])).as_py() or 0)
        lang = batch["lang"]
        bad_lang = int(
            pc.sum(
                pc.or_kleene(
                    pc.is_null(lang),
                    pc.invert(pc.is_in(lang, value_set=pa.array(LANG_DOMAIN))),
                )
            ).as_py()
            or 0
        )
        return {"text_null": text_null, "bad_lang": bad_lang}

    def orders_counts(batch: pa.Table) -> dict[str, int]:
        st = batch["o_orderstatus"]
        bad = int(
            pc.sum(
                pc.or_kleene(
                    pc.is_null(st),
                    pc.invert(
                        pc.is_in(st, value_set=pa.array(ORDERSTATUS_DOMAIN))
                    ),
                )
            ).as_py()
            or 0
        )
        return {"bad_status": bad}

    def lineitem_counts(batch: pa.Table) -> dict[str, int]:
        q = batch["l_quantity"]
        bad = int(
            pc.sum(
                pc.or_kleene(
                    pc.is_null(q),
                    pc.or_(pc.less(q, QTY_LO), pc.greater(q, QTY_HI)),
                )
            ).as_py()
            or 0
        )
        return {"bad_qty": bad}

    def customer_counts(batch: pa.Table) -> dict[str, int]:
        b = batch["c_acctbal"]
        bad = int(
            pc.sum(
                pc.or_kleene(
                    pc.is_null(b),
                    pc.or_(pc.less(b, ACCT_LO), pc.greater(b, ACCT_HI)),
                )
            ).as_py()
            or 0
        )
        return {"bad_bal": bad}

    def events_counts(batch: pa.Table) -> dict[str, int]:
        us = batch["ts"].cast(pa.int64())
        bad = int(
            pc.sum(
                pc.or_kleene(
                    pc.is_null(us),
                    pc.or_(pc.less(us, TS_LO), pc.greater_equal(us, TS_HI)),
                )
            ).as_py()
            or 0
        )
        return {"bad_ts": bad}

    def emb_counts(batch: pa.Table) -> dict[str, int]:
        lens = pc.list_value_length(batch["embedding"]).cast(pa.int64())
        vc = pa.table({"l": lens}).group_by("l").aggregate([([], "count_all")])
        out = {"emb_n": batch.num_rows}
        for ln, c in zip(
            vc["l"].to_pylist(), vc["count_all"].to_pylist()
        ):
            key = "len_null" if ln is None else f"len_{ln}"
            out[key] = out.get(key, 0) + int(c)
        return out

    dc = _sum_counts(docs, docs_counts)
    oc = _sum_counts(orders, orders_counts)
    lc = _sum_counts(lineitem, lineitem_counts)
    cc = _sum_counts(customer, customer_counts)
    ec = _sum_counts(events, events_counts)

    # embedding-dim check: per-batch (len -> count) partials; the distinct
    # dimension count is bounded (one fixed dim per corpus, a handful on a
    # corrupted one), so the driver combine is O(#distinct dims).  The
    # expected dim is the MODE length (ties: smaller len) — "!= min"
    # would flag the whole corpus when a single row is truncated.
    emb_parts = _sum_counts(emb, emb_counts)
    emb_n = emb_parts.pop("emb_n", 0)
    dims = sorted(
        (int(k.split("_", 1)[1]), c)
        for k, c in emb_parts.items()
        if k.startswith("len_") and k != "len_null"
    )
    if dims:
        mode_len = max(dims, key=lambda lc: (lc[1], -lc[0]))[0]
        bad_dim = emb_n - emb_parts[f"len_{mode_len}"]
    else:
        bad_dim = emb_n  # all-null (or empty) embedding column

    dup_docs = _dup_count(docs.select_columns(["doc_id"]), "doc_id", n_docs)
    orphan_orders = _fk_orphans(
        orders.select_columns(["o_custkey"]), "o_custkey",
        customer.select_columns(["c_custkey"]), "c_custkey",
        n_orders,
    )
    orphan_lineitem = _fk_orphans(
        lineitem.select_columns(["l_orderkey"]), "l_orderkey",
        orders.select_columns(["o_orderkey"]), "o_orderkey",
        n_lineitem,
    )

    rows = [
        ("doc_id_unique", "documents", dup_docs),
        ("text_nonnull", "documents", dc["text_null"]),
        ("lang_domain", "documents", dc["bad_lang"]),
        ("orders_custkey_fk", "orders", orphan_orders),
        ("orderstatus_domain", "orders", oc["bad_status"]),
        ("lineitem_orderkey_fk", "lineitem", orphan_lineitem),
        ("quantity_range", "lineitem", lc["bad_qty"]),
        ("acctbal_range", "customer", cc["bad_bal"]),
        ("events_ts_bounds", "events", ec["bad_ts"]),
        ("embedding_dim", "embeddings", bad_dim),
    ]
    df = pd.DataFrame(
        [
            {
                "check_name": n,
                "tbl": t,
                "metric": np.int64(m),
                "passed": np.int64(1 if m == 0 else 0),
            }
            for n, t, m in rows
        ]
    )
    return df.astype({"metric": "int64", "passed": "int64"})[
        ["check_name", "tbl", "metric", "passed"]
    ]


# ---------------------------------------------------------------------------
# k-anonymity with a generalization hierarchy over the documents
# quasi-identifiers (lang, source).  Level 0 releases QI groups with
# count >= k as-is; rows in failing groups generalize source -> '*'
# (level 1, regrouped by lang); groups failing again are suppressed into
# a single ('*', '*') row (level 2).  The QI domain is a bounded
# enumeration (langs x sources), so per-batch Arrow group_by partials +
# a driver combine is the scale-correct plan — no shuffle at all.

K_ANON = 5


def k_anonymity_df(sf_dir: str, k: int = K_ANON) -> pd.DataFrame:
    """Rows: ``(lang, source, cnt, lvl)`` — lvl 0 released, 1 source-
    generalized, 2 suppressed."""
    docs = _tbl(sf_dir, "documents", ["lang", "source"])

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "source": g["source"],
                "c": g["count_all"].cast(pa.int64()),
            }
        )

    parts = docs.map_batches(partials, batch_format="pyarrow").to_pandas()
    cols = ["lang", "source", "cnt", "lvl"]
    if not len(parts):
        return pd.DataFrame(columns=cols).astype(
            {"lang": "object", "source": "object", "cnt": "int64",
             "lvl": "int64"}
        )
    g0 = parts.groupby(["lang", "source"], as_index=False)["c"].sum()
    rel0 = g0[g0["c"] >= k]
    fail0 = g0[g0["c"] < k]
    g1 = fail0.groupby("lang", as_index=False)["c"].sum()
    rel1 = g1[g1["c"] >= k].assign(source="*")
    sup = int(g1.loc[g1["c"] < k, "c"].sum())
    rows = [
        pd.DataFrame(
            {"lang": rel0["lang"], "source": rel0["source"],
             "cnt": rel0["c"], "lvl": 0}
        ),
        pd.DataFrame(
            {"lang": rel1["lang"], "source": rel1["source"],
             "cnt": rel1["c"], "lvl": 1}
        ),
    ]
    if sup > 0:
        rows.append(
            pd.DataFrame(
                [{"lang": "*", "source": "*", "cnt": sup, "lvl": 2}]
            )
        )
    out = pd.concat(rows, ignore_index=True)
    return out.astype({"cnt": "int64", "lvl": "int64"})[cols]


# ---------------------------------------------------------------- Benford

BENFORD_EXP_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
                   51153, 45757)  # round(log10(1+1/d)*1e6), d = 1..9


def benford_digits_df(sf_dir: str) -> pd.DataFrame:
    """Benford's-law leading-digit profile of order totals (the classic
    numeric-fraud / data-quality screen).  The leading digit is pure
    integer arithmetic (repeated //10 — no float log10, whose 1-ulp
    error at powers of ten would mis-digit), per-block digit counts
    combine on the driver, and the observed share is an exact integer
    ppm ratio, so every column is driver-hash-coverable.  The expected
    Benford ppm table is a precomputed integer constant inlined into
    both engines (the _NDCG_W pattern)."""
    path = (
        os.path.join(sf_dir, "orders.parquet")
        if os.path.isdir(sf_dir) else sf_dir
    )
    from ..functions.rounding import round_half_away

    orders = read_parquet_sized(path, columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        d = cents[cents > 0]
        while len(d) and int(d.max()) >= 10:
            d = np.where(d >= 10, d // 10, d)
        counts = np.bincount(d, minlength=10)[1:10]
        return pa.table({
            "digit": pa.array(np.arange(1, 10), pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    parts = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    n = np.zeros(9, np.int64)
    if len(parts):
        agg = parts.groupby("digit")["n"].sum()
        for dig, cnt in agg.items():
            n[int(dig) - 1] = int(cnt)
    total = int(n.sum())
    obs = [int(v) * 1_000_000 // total if total else 0 for v in n]
    return pd.DataFrame({
        "digit": pd.Series(np.arange(1, 10), dtype="int64"),
        "n": pd.Series(n, dtype="int64"),
        "obs_ppm": pd.Series(obs, dtype="int64"),
        "exp_ppm": pd.Series(BENFORD_EXP_PPM, dtype="int64"),
    })


def sql_benford_digits() -> str:
    evals = ", ".join(
        f"({d}, {ppm})" for d, ppm in enumerate(BENFORD_EXP_PPM, start=1)
    )
    return f"""
WITH c AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
    FROM orders
    WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
),
d AS (SELECT substr(v::VARCHAR, 1, 1)::BIGINT AS digit FROM c),
m AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1),
t AS (SELECT coalesce(sum(n), 0)::HUGEINT AS total FROM m),
e(digit, exp_ppm) AS (VALUES {evals})
SELECT e.digit::BIGINT AS digit, coalesce(m.n, 0)::BIGINT AS n,
       (CASE WHEN t.total > 0
             THEN coalesce(m.n, 0)::HUGEINT * 1000000 // t.total
             ELSE 0 END)::BIGINT AS obs_ppm,
       e.exp_ppm::BIGINT AS exp_ppm
FROM e LEFT JOIN m USING (digit) CROSS JOIN t
ORDER BY e.digit
"""


# ---------------------------------------------------------------------------
# Deterministic bootstrap: B hash-resampled replicates of the mean doc
# length.  Classic resampling inference with NO RNG — draw (b, i) picks
# doc rank ((k*A + C) mod 2^64) mod N with k = b*m + i, so both engines
# generate the identical multiset of doc_ids (the dense-doc_id contract
# is loudly checked: every draw must match exactly one document).  The
# 95% CI is the (1, 62) order-stat pair of the 64 replicate sums
# (floor/ceil of the 2.5/97.5 percentile ranks of B=64).

BOOT_B = 64
BOOT_M = 1000
BOOT_A = 0x9E3779B97F4A7C15  # splitmix64 gamma (public constant)
BOOT_C = 0xBF58476D1CE4E5B9
BOOT_SCALE = 10**6
_M64 = 1 << 64


def bootstrap_mean_ci(docs: rd.Dataset, *, val_col: str = "n_chars",
                      id_col: str = "doc_id") -> pd.DataFrame:
    """Per-replicate bootstrap sums of ``val_col`` plus the 95% CI order
    stats: columns ``(b, n_draws, sum_chars, mean_fp, ci_lo_sum,
    ci_hi_sum)``.

    Shape (100 TB): the 64k-draw multiset is generated once on the
    driver (constant size), sorted by target doc_id, and broadcast into
    ONE streaming ``map_batches`` pass that emits B-row partial sums
    per block — no shuffle, nothing unbounded at the driver.  Requires
    dense doc_ids [0, N): violated draws match nothing and the final
    coverage assertion raises."""
    n = docs.count()
    if n == 0:
        cols = ["b", "n_draws", "sum_chars", "mean_fp", "ci_lo_sum",
                "ci_hi_sum"]
        return pd.DataFrame(columns=cols).astype({c: "int64" for c in cols})
    k = np.arange(BOOT_B * BOOT_M, dtype=np.uint64)
    with np.errstate(over="ignore"):
        did = ((k * np.uint64(BOOT_A) + np.uint64(BOOT_C)) % np.uint64(n)
               ).astype(np.int64)
    b_of = (k // np.uint64(BOOT_M)).astype(np.int64)
    order = np.argsort(did, kind="stable")
    did_sorted, b_sorted = did[order], b_of[order]

    def partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        vals = pc.cast(batch[val_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        lo = np.searchsorted(did_sorted, ids, "left")
        hi = np.searchsorted(did_sorted, ids, "right")
        cnt = hi - lo
        sel = np.flatnonzero(cnt > 0)
        sums = np.zeros(BOOT_B, np.int64)
        draws = np.zeros(BOOT_B, np.int64)
        if len(sel):
            c = cnt[sel]
            total = int(c.sum())
            starts = np.repeat(lo[sel], c)
            offs = np.arange(total) - np.repeat(
                np.cumsum(c) - c, c)
            draw_idx = starts + offs
            bb = b_sorted[draw_idx]
            vv = np.repeat(vals[sel], c)
            np.add.at(sums, bb, vv)
            np.add.at(draws, bb, 1)
        return pa.table(
            {"b": pa.array(np.arange(BOOT_B, dtype=np.int64)),
             "s": pa.array(sums), "c": pa.array(draws)}
        )

    parts = docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    agg = parts.groupby("b", as_index=False)[["s", "c"]].sum()
    agg = agg.sort_values("b").reset_index(drop=True)
    if int(agg["c"].sum()) != BOOT_B * BOOT_M:
        raise ValueError(
            "bootstrap_mean_ci: draw coverage "
            f"{int(agg['c'].sum())} != {BOOT_B * BOOT_M} — doc_ids are "
            "not dense [0, N)"
        )
    by_s = agg.sort_values(["s", "b"]).reset_index(drop=True)
    lo, hi = int(by_s["s"][1]), int(by_s["s"][BOOT_B - 2])
    out = pd.DataFrame(
        {
            "b": agg["b"].astype("int64"),
            "n_draws": agg["c"].astype("int64"),
            "sum_chars": agg["s"].astype("int64"),
            "mean_fp": (agg["s"].astype(object) * BOOT_SCALE
                        // BOOT_M).astype("int64"),
            "ci_lo_sum": np.int64(lo),
            "ci_hi_sum": np.int64(hi),
        }
    )
    return out


def sql_bootstrap_mean_ci() -> str:
    return f"""
WITH n AS (SELECT count(*)::HUGEINT AS n FROM documents),
draws AS (
    SELECT k // {BOOT_M} AS b,
           ((k::HUGEINT * {BOOT_A}::HUGEINT + {BOOT_C}::HUGEINT)
            % {_M64}) % n.n AS did
    FROM (SELECT unnest(range(0, {BOOT_B * BOOT_M})) AS k), n
),
j AS (
    SELECT d.b, doc.n_chars
    FROM draws d JOIN documents doc ON doc.doc_id = d.did
),
per AS (
    SELECT b, count(*)::HUGEINT AS c, sum(n_chars)::HUGEINT AS s
    FROM j GROUP BY b
),
ci AS (
    SELECT (SELECT s FROM per ORDER BY s, b OFFSET 1 LIMIT 1) AS lo,
           (SELECT s FROM per ORDER BY s, b OFFSET {BOOT_B - 2} LIMIT 1)
               AS hi
)
SELECT b::BIGINT AS b, c::BIGINT AS n_draws, s::BIGINT AS sum_chars,
       (s * {BOOT_SCALE} // {BOOT_M})::BIGINT AS mean_fp,
       ci.lo::BIGINT AS ci_lo_sum, ci.hi::BIGINT AS ci_hi_sum
FROM per, ci
ORDER BY b
"""


# ---------------------------------------------------------------------------
# Generic column profiling (the data-engineering "describe" an ingest
# tier runs before committing a 100-TB load): per column n / nulls /
# exact distinct / min / max.  Numeric-ish columns canonicalize to an
# INJECTIVE int64 key (ids as-is, money in half-away cents, dates as
# epoch-us) so min/max/ndv are integer-exact; string columns carry
# min_str/max_str instead.  Exact ndv shards values by an int64 hash
# (``dedup._sharded_groupby``) and counts nunique of the VALUE inside
# each shard — collision-proof, only per-shard partial counts reach the
# driver.

_PROFILE_COLS: list[tuple[str, str]] = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_totalprice", "cents"),
    ("o_orderdate", "ts"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
]


def _profile_key(batch: pa.Table, col: str, kind: str) -> tuple:
    """(key64 int64 array or None, sval string array) for one column."""
    from ..functions.hashing import term_hash
    from ..functions.rounding import round_half_away

    arr = batch[col]
    if kind == "int":
        k = pc.cast(arr, pa.int64()).to_numpy(zero_copy_only=False)
        return k, k.astype("U")
    if kind == "cents":
        v = arr.to_numpy(zero_copy_only=False)
        k = round_half_away(v * 100.0, 0).astype(np.int64)
        return k, k.astype("U")
    if kind == "ts":
        k = pc.cast(arr, pa.int64()).to_numpy(zero_copy_only=False)
        return k, k.astype("U")
    sval = arr.to_numpy(zero_copy_only=False).astype("U")
    k = term_hash(pa.array(sval)).view(np.int64)
    return k, sval


def table_profile(orders: rd.Dataset) -> pd.DataFrame:
    """Profile of the orders table: rows ``(column, n, n_null,
    n_distinct, min_key, max_key, min_str, max_str)`` — min/max_key for
    numeric-canonical columns (NULL for strings), min/max_str for
    string columns (NULL otherwise)."""
    kinds = dict(_PROFILE_COLS)

    def partial(batch: pa.Table) -> pa.Table:
        rows = []
        for col, kind in _PROFILE_COLS:
            n_null = batch[col].null_count
            nn = batch.num_rows - n_null
            if nn == 0:
                rows.append((col, 0, n_null, None, None, None, None))
                continue
            b = batch.filter(pc.is_valid(batch[col])) if n_null else batch
            k, sval = _profile_key(b, col, kind)
            if kind == "str":
                vals = sval.tolist()
                rows.append((col, nn, n_null, None, None,
                             min(vals), max(vals)))
            else:
                rows.append((col, nn, n_null, int(k.min()), int(k.max()),
                             None, None))
        return pa.table(
            {
                "column": pa.array([r[0] for r in rows], pa.utf8()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "n_null": pa.array([r[2] for r in rows], pa.int64()),
                "min_key": pa.array([r[3] for r in rows], pa.int64()),
                "max_key": pa.array([r[4] for r in rows], pa.int64()),
                "min_str": pa.array([r[5] for r in rows], pa.utf8()),
                "max_str": pa.array([r[6] for r in rows], pa.utf8()),
            }
        )

    stats = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()

    def ndv_pairs(batch: pa.Table) -> pa.Table:
        cols, ks, svals = [], [], []
        for col, kind in _PROFILE_COLS:
            b = (batch.filter(pc.is_valid(batch[col]))
                 if batch[col].null_count else batch)
            if b.num_rows == 0:
                continue
            k, sval = _profile_key(b, col, kind)
            _, idx = np.unique(k, return_index=True)
            cols.extend([col] * len(idx))
            ks.append(k[idx])
            svals.append(sval[idx])
        if not cols:
            return pa.table({"column": pa.array([], pa.utf8()),
                             "k": pa.array([], pa.int64()),
                             "sval": pa.array([], pa.utf8())})
        return pa.table(
            {"column": pa.array(cols, pa.utf8()),
             "k": pa.array(np.concatenate(ks).astype(np.int64)),
             "sval": pa.array(np.concatenate(svals).astype("U"))}
        )

    def shard_ndv(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("column", as_index=False)["sval"].nunique()
        out = out.rename(columns={"sval": "ndv"})
        return out.astype({"ndv": "int64"})

    pairs = orders.map_batches(
        ndv_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    ndv_parts = _sharded_groupby(
        pairs, ["k"], shard_ndv,
        empty_schema=pa.schema([("column", pa.utf8()), ("ndv", pa.int64())]),
    ).to_pandas()
    ndv = (ndv_parts.groupby("column")["ndv"].sum() if len(ndv_parts)
           else pd.Series(dtype="int64"))

    rows = []
    for col, kind in _PROFILE_COLS:
        sub = stats[stats["column"] == col]
        n = int(sub["n"].sum())
        n_null = int(sub["n_null"].sum())
        if kind == "str":
            mn = sub["min_str"].dropna().min() if n else None
            mx = sub["max_str"].dropna().max() if n else None
            rows.append((col, n, n_null, int(ndv.get(col, 0)),
                         None, None, mn, mx))
        else:
            mn = int(sub["min_key"].min()) if n else None
            mx = int(sub["max_key"].max()) if n else None
            rows.append((col, n, n_null, int(ndv.get(col, 0)),
                         mn, mx, None, None))
    out = pd.DataFrame(
        rows,
        columns=["column", "n", "n_null", "n_distinct", "min_key",
                 "max_key", "min_str", "max_str"],
    )
    for c in ("n", "n_null", "n_distinct"):
        out[c] = out[c].astype("int64")
    return out


def sql_table_profile() -> str:
    parts = []
    for col, kind in _PROFILE_COLS:
        if kind == "int":
            key = col
        elif kind == "cents":
            key = f"CAST(round({col} * 100) AS BIGINT)"
        elif kind == "ts":
            key = f"epoch_us({col})"
        else:
            key = None
        if key is not None:
            parts.append(f"""
SELECT '{col}' AS "column", count({col})::BIGINT AS n,
       (count(*) - count({col}))::BIGINT AS n_null,
       count(DISTINCT {key})::BIGINT AS n_distinct,
       min({key})::BIGINT AS min_key, max({key})::BIGINT AS max_key,
       NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
FROM orders""")
        else:
            parts.append(f"""
SELECT '{col}' AS "column", count({col})::BIGINT AS n,
       (count(*) - count({col}))::BIGINT AS n_null,
       count(DISTINCT {col})::BIGINT AS n_distinct,
       NULL::BIGINT AS min_key, NULL::BIGINT AS max_key,
       min({col}) AS min_str, max({col}) AS max_str
FROM orders""")
    return "\nUNION ALL".join(parts) + "\nORDER BY \"column\""
