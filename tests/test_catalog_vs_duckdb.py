"""Driver-simulation: every catalog query vs its DuckDB oracle at sf0.01.

Mirrors the driver's comparison: row count, column names, and an
order-insensitive value comparison (rows sorted by all columns).
"""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _compare(name: str, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _canon(got), _canon(want)
    for col in g.columns:
        gv, wv = g[col], w[col]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            # EXACT: the driver hashes values, so any bit difference is a
            # fail — a tolerance here would mask rounding-mode mismatches
            # (exactly the round-1 `quality` red cell)
            pd.testing.assert_series_equal(
                gv.astype(float), wv.astype(float), check_names=False,
                rtol=0, atol=0, obj=f"{name}.{col}",
            )
        else:
            assert gv.astype(str).tolist() == wv.astype(str).tolist(), f"{name}.{col}"


def _entries():
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    return [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql is not None]


@pytest.mark.parametrize("name", [n for n, _, _ in _entries()])
def test_catalog_query_matches_oracle(ray_session, name):
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    fn, sql = QUERIES[name]
    got = _to_df(fn(SF_DIR))
    con = _duck(SF_DIR)
    want = con.execute(sql).fetchdf()
    con.close()
    _compare(name, got, want)


@pytest.mark.parametrize("name", [n for n, _, _ in _entries()])
def test_catalog_query_matches_oracle_sf0001(ray_session, name):
    """Same gate at the tiniest sf: small corpora produce empty candidate
    sets / single-row groups, exercising the empty-result edge paths."""
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    fn, sql = QUERIES[name]
    sf = "/root/testdata/sf0.001"
    got = _to_df(fn(sf))
    con = _duck(sf)
    want = con.execute(sql).fetchdf()
    con.close()
    _compare(name, got, want)


@pytest.mark.parametrize(
    "name",
    [
        n
        for n, (fn, sql) in __import__(
            "invertedindexbuilder_ray.pipelines.catalog", fromlist=["QUERIES"]
        ).QUERIES.items()
        if sql is None
    ],
)
def test_rows_only_entries_run(ray_session, name):
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    fn, _ = QUERIES[name]
    got = _to_df(fn("/root/testdata/sf0.001"))
    assert got is not None and len(got.columns) > 0


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = _to_df(e.entry())
    assert len(res) >= 0
    assert set(res.columns) == {"query_id", "rank", "doc_id", "url", "score"}
    ks = set(e.queries().keys())
    assert set(e.oracle_sql().keys()) <= ks
