"""Fuzz coreset_sample: engine vs DuckDB oracle vs a pure-numpy
farthest-first reference on RANDOM small embedding tables.

Values are drawn from a coarse grid (k/8: exercises quantization ties
and duplicate points — the argmax tie-break is the part that matters).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

DIM = 4

_VEC = st.lists(
    st.integers(min_value=-16, max_value=16), min_size=DIM, max_size=DIM
)


def _write_embeddings(tmpdir: str, vecs: list[list[int]]) -> str:
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array(
                [[v / 8.0 for v in vec] for vec in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "embeddings.parquet"))
    return tmpdir


def _numpy_farthest_first(vecs: list[list[int]], k: int, grid: int):
    q = np.array(
        [[round(v / 8.0 * grid) for v in vec] for vec in vecs], np.int64
    )
    n = len(q)
    chosen = [0]
    rows = [(1, 0, 0)]
    for rank in range(2, min(k, n) + 1):
        best = None
        for i in range(n):
            if i in chosen:
                continue
            mind = min(int(((q[i] - q[c]) ** 2).sum()) for c in chosen)
            key = (-mind, i)
            if best is None or key < best[0]:
                best = (key, i, mind)
        chosen.append(best[1])
        rows.append((rank, best[1], best[2]))
    return rows


@settings(max_examples=10, deadline=None)
@given(vecs=st.lists(_VEC, min_size=1, max_size=24))
def test_coreset_fuzz(ray_session, tmp_path_factory, vecs):
    from invertedindexbuilder_ray.pipelines.catalog import (
        CORESET_GRID,
        CORESET_K,
        QUERIES,
    )

    tmpdir = str(tmp_path_factory.mktemp("coreset"))
    _write_embeddings(tmpdir, vecs)
    fn, sql = QUERIES["coreset_sample"]
    got = fn(tmpdir)
    want_rows = _numpy_farthest_first(vecs, CORESET_K, CORESET_GRID)
    assert list(map(tuple, got[["rank", "vec_id", "d2"]].to_numpy())) == [
        tuple(map(np.int64, r)) for r in want_rows
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmpdir, 'embeddings.parquet')}')"
    )
    oracle = con.execute(sql).fetchdf().sort_values("rank")
    con.close()
    assert list(map(tuple, oracle[["rank", "vec_id", "d2"]].to_numpy())) \
        == want_rows


@settings(max_examples=10, deadline=None)
@given(vecs=st.lists(_VEC, min_size=1, max_size=24))
def test_mmr_fuzz(ray_session, tmp_path_factory, vecs):
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    tmpdir = str(tmp_path_factory.mktemp("mmr"))
    _write_embeddings(tmpdir, vecs)
    fn, sql = QUERIES["mmr_rerank"]
    got = fn(tmpdir).sort_values("step").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmpdir, 'embeddings.parquet')}')"
    )
    want = con.execute(sql).fetchdf().sort_values("step").reset_index(drop=True)
    con.close()
    assert got[["step", "vec_id", "rel", "maxdiv", "mmr_x2"]].to_numpy(
    ).tolist() == want[["step", "vec_id", "rel", "maxdiv", "mmr_x2"]].to_numpy(
    ).tolist()


@settings(max_examples=10, deadline=None)
@given(vecs=st.lists(_VEC, min_size=1, max_size=24))
def test_kmeans_fuzz(ray_session, tmp_path_factory, vecs):
    """Engine vs DuckDB oracle on random coarse-grid tables: exercises
    quantization ties, duplicate points (empty-cluster drop), and
    n < K seeds."""
    import pandas as pd

    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    tmpdir = str(tmp_path_factory.mktemp("kmeans"))
    _write_embeddings(tmpdir, vecs)
    fn, sql = QUERIES["kmeans_embed"]
    got = fn(tmpdir).sort_values("cid").reset_index(drop=True)
    assert int(got["n_vecs"].sum()) == len(vecs)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmpdir, 'embeddings.parquet')}')"
    )
    want = con.execute(sql).fetchdf().sort_values("cid").reset_index(
        drop=True)[list(got.columns)]
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(vecs=st.lists(_VEC, min_size=1, max_size=20))
def test_semdedup_fuzz(ray_session, tmp_path_factory, vecs):
    """Engine vs DuckDB oracle on random coarse-grid tables — exercises
    the exact squared-form threshold test (grid points produce many
    exact-boundary cosines) and the augmentation's duplicate pairs."""
    import pandas as pd

    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    tmpdir = str(tmp_path_factory.mktemp("semdedup"))
    _write_embeddings(tmpdir, vecs)
    fn, sql = QUERIES["semdedup_pairs"]
    got = fn(tmpdir).sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmpdir, 'embeddings.parquet')}')"
    )
    want = con.execute(sql).fetchdf().sort_values(
        ["vec_a", "vec_b"]).reset_index(drop=True)[list(got.columns)]
    con.close()
    if len(got) == 0 and len(want) == 0:
        return
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(vecs=st.lists(_VEC, min_size=1, max_size=20))
def test_pq_codebook_fuzz(ray_session, tmp_path_factory, vecs):
    """Engine vs DuckDB oracle on random coarse-grid tables (DIM=4 with
    PQ_SUB=4 -> 1-dim subspaces: the degenerate-width edge)."""
    import pandas as pd

    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    tmpdir = str(tmp_path_factory.mktemp("pq"))
    _write_embeddings(tmpdir, vecs)
    fn, sql = QUERIES["pq_codebook"]
    got = fn(tmpdir).sort_values(["sub", "cid"]).reset_index(drop=True)
    assert int(got.groupby("sub")["n_vecs"].sum().min()) == len(vecs)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmpdir, 'embeddings.parquet')}')"
    )
    want = con.execute(sql).fetchdf().sort_values(
        ["sub", "cid"]).reset_index(drop=True)[list(got.columns)]
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(vecs=st.lists(_VEC, min_size=1, max_size=20))
def test_pca_power_fuzz(ray_session, tmp_path_factory, vecs):
    """Engine vs DuckDB on random coarse-grid tables: exercises negative
    Gram entries (arithmetic >> on negatives) and the zero-matrix edge."""
    import pandas as pd

    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    tmpdir = str(tmp_path_factory.mktemp("pca"))
    _write_embeddings(tmpdir, vecs)
    fn, sql = QUERIES["embed_pca_power"]
    got = fn(tmpdir).sort_values("j").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmpdir, 'embeddings.parquet')}')"
    )
    want = con.execute(sql).fetchdf().sort_values("j").reset_index(
        drop=True)[list(got.columns)]
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
