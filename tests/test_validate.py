"""Validation suite: violation counting vs DuckDB on a corrupted corpus.

The sf tables are clean (every check passes with metric 0), so parity
there never exercises the counting paths.  This test writes a corrupted
copy of each table to tmp — duplicate doc_ids, null text, bad langs,
FK orphans, out-of-range values, wrong embedding dims — and asserts the
engine matches the SQL oracle metric-for-metric."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def corrupted_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corrupted_sf"))
    for t in TABLES:
        src = os.path.join(SF, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = pd.read_parquet(src)
        if t == "documents":
            dup = df.head(3).copy()  # duplicate doc_ids
            df = pd.concat([df, dup], ignore_index=True)
            df.loc[df.index[:2], "text"] = None
            df.loc[df.index[2:5], "lang"] = "xx"
        elif t == "orders":
            df.loc[df.index[:4], "o_custkey"] = 10**9  # FK orphans
            df.loc[df.index[4:6], "o_orderstatus"] = "Z"
        elif t == "lineitem":
            df.loc[df.index[:3], "l_orderkey"] = 10**9
            df.loc[df.index[3:5], "l_quantity"] = 99.0
        elif t == "customer":
            df.loc[df.index[:2], "c_acctbal"] = -99999.0
        elif t == "events":
            df.loc[df.index[:3], "ts"] = pd.Timestamp("2030-01-01")
        elif t == "embeddings":
            short = df["embedding"].iloc[0][:8]
            df.at[df.index[0], "embedding"] = np.asarray(
                short, dtype=np.float32
            )
        df.to_parquet(os.path.join(d, f"{t}.parquet"), index=False)
    return d


def test_validation_suite_counts_violations(ray_session, corrupted_dir):
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    fn, sql = QUERIES["validation_suite"]
    got = fn(corrupted_dir).sort_values("check_name").reset_index(drop=True)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(corrupted_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    want = (
        con.execute(sql).df().sort_values("check_name")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(
            got[sorted(got.columns)].dtypes.to_dict()
        ),
        check_names=True,
    )
    # the corruption must actually trip every check
    m = dict(zip(got["check_name"], got["metric"]))
    assert m["doc_id_unique"] == 3
    assert m["text_nonnull"] == 2
    assert m["lang_domain"] == 3
    assert m["orders_custkey_fk"] == 4
    assert m["orderstatus_domain"] == 2
    assert m["lineitem_orderkey_fk"] == 3
    assert m["quantity_range"] == 2
    assert m["acctbal_range"] == 2
    assert m["events_ts_bounds"] == 3
    assert m["embedding_dim"] == 1
    assert (got["passed"] == 0).all()
