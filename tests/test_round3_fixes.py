"""Round-3 regression tests: merge stale-resume guard, semi/anti
partitioned fallback, resize zero-dim sentinels, empty-input quantiles,
TREC content fingerprint in the CLI."""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_SMALL = "/root/testdata/sf0.001"


def test_merge_stale_resume_raises(ray_session, webpages_small, tmp_path):
    """Re-merging DIFFERENT inputs into an existing out_dir must fail, not
    silently re-encode from the stale docs/checkpoint (ADVICE r2)."""
    from invertedindexbuilder_ray.pipelines.build import build_index
    from invertedindexbuilder_ray.pipelines.merge import merge_indexes
    from invertedindexbuilder_ray.sources.webpages import load_webpages

    tbl = webpages_small
    for name, sl in [("a", tbl.slice(0, 100)), ("b", tbl.slice(100, 100)),
                     ("c", tbl.slice(0, 150))]:
        d = tmp_path / name
        d.mkdir()
        pq.write_table(sl, d / "w.parquet")
    ia, ib, ic = str(tmp_path / "ia"), str(tmp_path / "ib"), str(tmp_path / "ic")
    build_index(load_webpages(str(tmp_path / "a")), ia, num_partitions=4,
                input_fingerprint="fp-a")
    build_index(load_webpages(str(tmp_path / "b")), ib, num_partitions=4,
                input_fingerprint="fp-b")
    build_index(load_webpages(str(tmp_path / "c")), ic, num_partitions=4,
                input_fingerprint="fp-c")
    out = str(tmp_path / "merged")
    merge_indexes([ia, ib], out)
    with pytest.raises(ValueError, match="different inputs"):
        merge_indexes([ia, ic], out)  # resume=True is the default
    # resume=False wipes and rebuilds cleanly
    man = merge_indexes([ia, ic], out, resume=False)
    assert man.n_docs > 0


def test_semi_anti_partitioned_fallback_matches_broadcast(ray_session):
    """key_limit=0 forces the partitioned-join path; results must be
    identical to the broadcast path."""
    from invertedindexbuilder_ray.pipelines.catalog import _semi_anti

    for anti in (False, True):
        bcast = _semi_anti(SF_SMALL, anti)
        part = _semi_anti(SF_SMALL, anti, key_limit=0)
        pd.testing.assert_frame_equal(
            bcast.reset_index(drop=True), part.reset_index(drop=True)
        )


def test_resize_zero_dims_emit_sentinel():
    """(0,0) sentinel dims from an undecodable payload must yield a 0/0/0.0
    plan row, not inf*0=NaN -> INT32_MIN garbage (ADVICE r2)."""
    from invertedindexbuilder_ray.stages.multimodal import ResizeImageStub

    batch = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "height": pa.array([0, 480, 0], pa.int32()),
            "width": pa.array([0, 640, 7], pa.int32()),
        }
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a RuntimeWarning here is the bug
        out = ResizeImageStub(target=(224, 224))(batch).to_pandas()
    assert out.loc[0, ["out_height", "out_width", "scale"]].tolist() == [0, 0, 0.0]
    assert out.loc[2, ["out_height", "out_width", "scale"]].tolist() == [0, 0, 0.0]
    assert out.loc[1, "out_height"] == 168 and out.loc[1, "out_width"] == 224


def test_quantiles_empty_input_returns_nulls(ray_session, tmp_path):
    """Zero-row lineitem: DuckDB quantile_disc yields NULL; the Ray op must
    match (NaN) instead of crashing (ADVICE r2)."""
    from invertedindexbuilder_ray.pipelines.catalog import q_lineitem_quantiles

    empty = pa.table({"l_quantity": pa.array([], pa.float64())})
    p = tmp_path / "lineitem.parquet"
    pq.write_table(empty, p)
    out = q_lineitem_quantiles(str(p))
    assert len(out) == 4
    assert out["value"].isna().all()


def _write_trec(path, n_docs: int, body: str = "alpha beta") -> None:
    with open(path, "wb") as f:
        for i in range(n_docs):
            f.write(
                f"<TEXT>\nhttp://site{i}/x\n{body} {i}\n</TEXT>\n\n".encode()
            )


def test_cli_trec_fingerprint_invalidates_resume(ray_session, tmp_path):
    """`build --format trec` must fingerprint the TREC file list: resuming
    over changed TREC content fails loudly instead of serving a stale
    index (ADVICE r2)."""
    import os
    import time

    from invertedindexbuilder_ray.cli import main

    src = tmp_path / "trec"
    src.mkdir()
    _write_trec(src / "corpus.trec", 30)
    out = str(tmp_path / "idx")
    assert main(["build", "--format", "trec", "--input", str(src),
                 "--out", out, "--partitions", "2"]) == 0
    # changed content (different size so the coarse mtime can't mask it)
    _write_trec(src / "corpus.trec", 30, body="gamma delta epsilon")
    os.utime(src / "corpus.trec", (time.time() + 2, time.time() + 2))
    with pytest.raises(ValueError, match="different input"):
        main(["build", "--format", "trec", "--input", str(src),
              "--out", out, "--partitions", "2"])


def test_cli_empty_input_dir_fails_loudly(ray_session, tmp_path):
    from invertedindexbuilder_ray.cli import main

    empty = tmp_path / "nothing"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no input files"):
        main(["build", "--input", str(empty), "--out", str(tmp_path / "o")])


def test_exact_quantiles_high_cardinality_vs_duckdb(ray_session, tmp_path):
    """Histogram-refinement quantiles must equal quantile_disc exactly on
    continuous data (distinct ~ N), including negatives, duplicates, and
    a heavy spike — with a tiny collect_limit to force refinement rounds."""
    import duckdb
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.quantiles import exact_quantiles_disc

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [
            rng.standard_normal(20_000) * 1e6,   # continuous, both signs
            np.full(5_000, 42.5),                # heavy spike (duplicate key)
            rng.uniform(-1e-9, 1e-9, 1_000),     # values straddling zero
        ]
    )
    rng.shuffle(vals)
    tbl = pa.table({"x": pa.array(vals, pa.float64())})
    p = tmp_path / "x.parquet"
    pq.write_table(tbl, p, row_group_size=4000)

    qs = [0.01, 0.25, 0.5, 0.75, 0.95, 0.99]
    got = exact_quantiles_disc(
        rd.read_parquet(str(p)), "x", qs, n_bins=16, collect_limit=64
    )
    exp = duckdb.sql(
        " UNION ALL ".join(
            f"SELECT {q} AS q, quantile_disc(x, {q}) AS value FROM '{p}'"
            for q in qs
        )
    ).df()
    got = got.sort_values("q").reset_index(drop=True)
    exp = exp.sort_values("q").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)  # exact — atol 0


def test_exact_quantiles_degenerate_shapes(ray_session, tmp_path):
    """Shapes that stress specific branches: all-one-value (range collapses
    before any collect), two values with massive ties (bin resolution on a
    1-key range), integers with heavy duplication (ties across targets)."""
    import duckdb
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.quantiles import exact_quantiles_disc

    rng = np.random.RandomState(3)
    shapes = {
        "const": np.full(10_000, 7.25),
        "two": np.concatenate([np.full(9_000, -1.5), np.full(1_000, 3.25)]),
        "ints": rng.randint(0, 5, 50_000).astype(np.float64),
    }
    qs = [0.1, 0.5, 0.9, 1.0]
    for name, vals in shapes.items():
        p = tmp_path / f"{name}.parquet"
        pq.write_table(pa.table({"x": pa.array(vals, pa.float64())}), p,
                       row_group_size=7000)
        got = exact_quantiles_disc(
            rd.read_parquet(str(p)), "x", qs, n_bins=8, collect_limit=100
        ).sort_values("q").reset_index(drop=True)
        exp = duckdb.sql(
            " UNION ALL ".join(
                f"SELECT {q} AS q, quantile_disc(x, {q}) AS value FROM '{p}'"
                for q in qs
            )
        ).df().sort_values("q").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp), name


def test_exact_quantiles_key_mapping_roundtrip():
    from invertedindexbuilder_ray.pipelines.quantiles import (
        doubles_to_keys,
        key_to_double,
    )

    vals = np.array(
        [-np.inf, -1e300, -42.5, -1e-300, -0.0, 0.0, 1e-300, 42.5, 1e300, np.inf]
    )
    keys = doubles_to_keys(vals)
    assert (np.diff(keys.astype(np.float64)) >= 0).all()
    assert (np.diff(keys[np.abs(vals) > 0]) > 0).all()  # strict off the 0 tie
    for v, k in zip(vals, keys):
        assert key_to_double(int(k)) == v or (v == 0.0 and key_to_double(int(k)) == 0.0)


def test_ann_constants_derive_from_n():
    """LSH bits grow ~log2(N/bucket) and IVF centroids ~sqrt(N), so
    bucket/list sizes stay bounded at any corpus size."""
    from invertedindexbuilder_ray.pipelines.similarity import (
        ivf_centroids_for,
        lsh_bits_for,
    )

    assert lsh_bits_for(500) == 4          # min clamp
    assert lsh_bits_for(1 << 20) == 10     # 2^20/1024 = 2^10 buckets
    assert lsh_bits_for((1 << 20) + 1) == 11
    assert lsh_bits_for(1 << 30) == 20
    assert lsh_bits_for(10**12) == 24      # max clamp
    assert ivf_centroids_for(10**6) == 1000
    assert ivf_centroids_for(999) == 32
    assert ivf_centroids_for(1) == 1


def test_sql_nbits_derivation_matches_python():
    """The testdata only exercises nbits=4 (small N); validate the SQL
    params-CTE arithmetic against lsh_bits_for across the whole range a
    real corpus would hit, including exact powers of two."""
    import duckdb

    from invertedindexbuilder_ray.pipelines.similarity import (
        ANN_TARGET_BUCKET,
        LSH_MAX_BITS,
        LSH_MIN_BITS,
        ivf_centroids_for,
        lsh_bits_for,
    )

    tb = ANN_TARGET_BUCKET
    ns = [1, 500, 1024, 1025, 2**20, 2**20 + 1, 10**9, 2**34, 10**12]
    for n in ns:
        got = duckdb.sql(f"""
            SELECT least({LSH_MAX_BITS}, greatest({LSH_MIN_BITS}, coalesce((
                SELECT min(t.b) FROM range(1, {LSH_MAX_BITS + 1}) t(b)
                WHERE (1::BIGINT << t.b) >= greatest(1, ({n} + {tb - 1}) // {tb})
            ), {LSH_MAX_BITS})))::BIGINT
        """).fetchone()[0]
        assert got == lsh_bits_for(n), (n, got, lsh_bits_for(n))
    for n in [1, 500, 10**6, 10**6 + 1, 999, 2**40]:
        got = duckdb.sql(
            f"SELECT greatest(1, ceil(sqrt({n}))::BIGINT)"
        ).fetchone()[0]
        assert got == ivf_centroids_for(n), (n, got, ivf_centroids_for(n))


def test_ann_planes_prefix_property():
    """The SQL oracle inlines MAX_BITS plane columns and selects a prefix;
    the engine's _planes(dim, b) must equal that prefix for every b."""
    import numpy as np

    from invertedindexbuilder_ray.pipelines.similarity import LSH_MAX_BITS, _planes

    full = _planes(64, LSH_MAX_BITS)
    for b in (4, 8, 17):
        np.testing.assert_array_equal(_planes(64, b), full[:, :b])


def test_ann_has_no_full_side_shuffle():
    """Both ANN paths must scan the index once with a broadcast probe set
    — no partitioned join shipping the full embeddings table."""
    import inspect

    import invertedindexbuilder_ray.pipelines.similarity as s

    src = inspect.getsource(s)
    assert "partitioned_hash_join" not in src


def test_shards_scale_with_input():
    from invertedindexbuilder_ray.pipelines.dedup import _shards_for

    assert _shards_for(0) == 64          # floor clamp
    assert _shards_for(10**8) == 64      # ceil(1e8/2e6)=50 < floor
    assert _shards_for(10**9) == 500
    assert _shards_for(10**12) == 4096   # ceiling clamp


def test_session_windows_no_per_user_groupby():
    """The windows module must not contain a high-cardinality
    groupby().map_groups (the repo's own scale rule)."""
    import inspect

    import invertedindexbuilder_ray.pipelines.windows as w

    src = inspect.getsource(w)
    assert 'groupby("user_id")' not in src


def test_corpus_clean_antijoin_fallback_matches_broadcast(ray_session):
    """max_broadcast_losers=0 forces the partitioned anti-join path; the
    kept set must be identical to the broadcast path."""
    from invertedindexbuilder_ray.pipelines.clean import corpus_clean

    a = (
        corpus_clean(SF_SMALL)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        corpus_clean(SF_SMALL, max_broadcast_losers=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
