"""Round-4 regression tests (VERDICT round 3 worklist).

Item 1: `dedup_clusters` large-graph label propagation must run to
convergence — the round-3 code silently stopped at max_rounds=10, so a
component with diameter > 10 in a graph above the union-find cutoff got
WRONG labels with no error.  Fixed via pointer doubling + label-sum
fixpoint; these tests pin it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _chain_edges(n_nodes: int, start: int = 0) -> pd.DataFrame:
    a = np.arange(start, start + n_nodes - 1, dtype=np.int64)
    return pd.DataFrame({"doc_a": a, "doc_b": a + 1})


def _union_find_truth(edges: pd.DataFrame) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {n: find(n) for n in parent}


def test_clusters_long_chain_propagation_path(ray_session, monkeypatch):
    """Force the propagation path (monkeypatched cutoff) on a 64-node
    chain — diameter 63 >> the old silent 10-round cap."""
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines import dedup

    monkeypatch.setattr(dedup, "SMALL_GRAPH_EDGES", 4)
    edges = pd.concat(
        [
            _chain_edges(64, start=0),
            # a second component far away, plus an isolated pair
            _chain_edges(17, start=1000),
            pd.DataFrame({"doc_a": [5000], "doc_b": [5001]}),
        ],
        ignore_index=True,
    )
    pairs = rd.from_arrow(pa.Table.from_pandas(edges, preserve_index=False))
    labels = dedup.dedup_clusters(pairs, None).to_pandas()
    got = dict(zip(labels.node.astype(int), labels.lbl.astype(int)))
    assert got == _union_find_truth(edges)


def test_clusters_large_graph_converges(ray_session):
    """Real >200k-edge fixture (above SMALL_GRAPH_EDGES, no monkeypatch)
    containing a diameter-63 chain: the propagation path must converge to
    the exact union-find labels."""
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines import dedup

    n_fill = dedup.SMALL_GRAPH_EDGES + 25_000  # pair rows > the cutoff
    base = 10_000
    fill_a = base + 2 * np.arange(n_fill, dtype=np.int64)
    edges = pd.concat(
        [
            _chain_edges(64, start=0),
            pd.DataFrame({"doc_a": fill_a, "doc_b": fill_a + 1}),
        ],
        ignore_index=True,
    )
    assert len(edges) > dedup.SMALL_GRAPH_EDGES
    pairs = rd.from_arrow(pa.Table.from_pandas(edges, preserve_index=False))
    labels = dedup.dedup_clusters(pairs, None).to_pandas()
    got = dict(zip(labels.node.astype(int), labels.lbl.astype(int)))
    # chain collapses to min label 0 despite diameter > 10
    for n in range(64):
        assert got[n] == 0
    # every filler pair keeps its own min label
    assert len(got) == 64 + 2 * n_fill
    samp = np.linspace(0, n_fill - 1, 50).astype(int)
    for i in samp:
        a = int(fill_a[i])
        assert got[a] == a and got[a + 1] == a


def _clustered_embeddings(tmp_path_factory, name: str, seed: int = 11):
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((30, 64)) * 3
    vecs = np.repeat(centers, 20, axis=0) + rng.standard_normal((600, 64)) * 0.15
    root = tmp_path_factory.mktemp(name)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(600), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        root / "embeddings.parquet",
    )
    return str(root)


def test_emb_lsh_params_regimes():
    """High thresholds get a band plan well under the grid replication;
    low thresholds fall back (None)."""
    from invertedindexbuilder_ray.pipelines.dedup import (
        EMB_LSH_MAX_BANDS, _emb_lsh_params,
    )

    for t in (0.8, 0.9, 0.95, 0.99):
        params = _emb_lsh_params(t, 10**9)
        assert params is not None, t
        w, r = params
        assert 8 <= w and 1 <= r <= EMB_LSH_MAX_BANDS
        # replication: N*r key rows vs the grid's N*(N/4096) payload rows
        assert r < 10**9 / 4096
    assert _emb_lsh_params(0.4, 10**9) is None
    assert _emb_lsh_params(1.0, 10**9) == (8, 1)


def test_emb_lsh_matches_grid_exactly(ray_session, tmp_path_factory):
    """The SRP-prefiltered path must return the IDENTICAL pair set and
    rounded cosines as the exact grid join (recall bound 1e-12/pair)."""
    from invertedindexbuilder_ray.pipelines.dedup import embedding_dedup_pairs

    root = _clustered_embeddings(tmp_path_factory, "emb_lsh")
    grid = embedding_dedup_pairs(root, threshold=0.9, method="grid").to_pandas()
    lsh = embedding_dedup_pairs(root, threshold=0.9, method="lsh").to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b", "cosine"]].to_numpy()))
    assert len(grid) > 100  # clustered fixture produces real pairs
    assert key(lsh) == key(grid)


def test_emb_lsh_broadcast_verify_matches_join_fallback(
    ray_session, tmp_path_factory, monkeypatch
):
    """The broadcast-small-side verify (default for bounded candidate sets)
    and the partitioned-join fallback must produce the identical pair set —
    same hybrid-parity contract as minhash_dedup_pairs."""
    from invertedindexbuilder_ray.pipelines import dedup

    root = _clustered_embeddings(tmp_path_factory, "emb_bcast")
    bcast = dedup.embedding_dedup_pairs(root, threshold=0.9, method="lsh").to_pandas()
    monkeypatch.setattr(dedup, "EMB_VERIFY_BCAST_PAIRS", 0)  # force the joins
    joins = dedup.embedding_dedup_pairs(root, threshold=0.9, method="lsh").to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b", "cosine"]].to_numpy()))
    assert len(bcast) > 100
    assert key(bcast) == key(joins)


def test_emb_lsh_empty_result_keeps_schema(ray_session):
    """Zero surviving candidate pairs must still return a Dataset whose
    schema() reports (vec_a, vec_b, cosine).  Without the typed-empty
    union (and the n_pairs==0 early return) the all-empty pipeline yields
    a SCHEMALESS dataset.  NOTE this is the strongest guarantee a Dataset
    can give: Ray's to_pandas()/iter_batches drop empty blocks entirely,
    so ANY all-empty Dataset converts to a column-less DataFrame — which
    is why driver-facing catalog entries must never be empty at sf scale
    (the SRP entry runs over an augmented table for exactly this reason)."""
    from invertedindexbuilder_ray.pipelines.dedup import embedding_dedup_pairs

    # sf0.001 embeddings have NO pairs above cosine 0.8 (checked in
    # DuckDB), so threshold 0.9 exercises the empty path.
    ds = embedding_dedup_pairs("/root/testdata/sf0.001", threshold=0.9, method="lsh")
    assert sorted(ds.schema().names) == ["cosine", "vec_a", "vec_b"]
    assert ds.count() == 0
    # grid plan, same guarantee
    ds_g = embedding_dedup_pairs("/root/testdata/sf0.001", threshold=0.9, method="grid")
    assert sorted(ds_g.schema().names) == ["cosine", "vec_a", "vec_b"]
    assert ds_g.count() == 0


def test_emb_auto_picks_lsh_at_scale_params(ray_session, tmp_path_factory):
    """method='auto' routes high-threshold joins through the prefilter
    once the band count undercuts the grid replication factor."""
    from invertedindexbuilder_ray.pipelines import dedup

    root = _clustered_embeddings(tmp_path_factory, "emb_auto")
    # force a multi-block grid so G > r and auto picks LSH
    out = dedup.embedding_dedup_pairs(
        root, threshold=0.95, block_rows=2, method="auto"
    ).to_pandas()
    grid = dedup.embedding_dedup_pairs(root, threshold=0.95, method="grid").to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b", "cosine"]].to_numpy()))
    assert key(out) == key(grid)
    params = dedup._emb_lsh_params(0.95, 600)
    assert params is not None and params[1] < -(-600 // 2)


def test_dataset_fingerprint_detects_content_swap(ray_session, tmp_path):
    """Round-4 item 7: two corpora with the SAME schema but different
    content must produce different Dataset fingerprints, so a stale
    resume fails loudly through the Dataset entrypoint too."""
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.build import _fingerprint, build_index

    def corpus(texts):
        return pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "url": pa.array([f"http://x/{i}" for i in range(len(texts))]),
                "text": pa.array(texts),
                "dl": pa.array([len(t.split()) for t in texts], pa.int64()),
            }
        )

    a = rd.from_arrow(corpus(["alpha beta gamma", "delta epsilon"]))
    b = rd.from_arrow(corpus(["totally different words", "another corpus"]))
    fa, fb = _fingerprint(a), _fingerprint(b)
    assert fa != fb
    # same content -> same fingerprint (order-independent hash)
    assert fa == _fingerprint(rd.from_arrow(corpus(["alpha beta gamma", "delta epsilon"])))
    out = str(tmp_path / "idx")
    build_index(a, out, num_partitions=2, input_fingerprint=fa)
    with pytest.raises(ValueError, match="different input"):
        build_index(b, out, num_partitions=2, resume=True, input_fingerprint=fb)


def test_quantiles_nan_ordering_matches_duckdb(ray_session):
    """NaN values (both sign bit patterns) must be IGNORED like DuckDB
    does in quantile_disc (measured: [1,2,3,NaN] @ q=1.0 -> 3.0; the raw
    sign-magnitude key trick had scattered negative-NaN below -inf AND
    kept NaNs in the rank count, shifting every quantile by the NaN
    count)."""
    import duckdb
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.quantiles import exact_quantiles_disc

    neg_nan = np.frombuffer(np.uint64(0xFFF8000000000005).tobytes(), np.float64)[0]
    rng = np.random.RandomState(3)
    vals = np.concatenate(
        [rng.standard_normal(500) * 10, [np.nan, neg_nan, np.inf, -np.inf, 0.0, -0.0]]
    )
    rng.shuffle(vals)
    qs = [0.1, 0.5, 0.9, 0.995, 1.0]
    got = exact_quantiles_disc(
        rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())})), "v", qs,
        n_bins=16, collect_limit=8,
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    for q, g in zip(qs, got["value"]):
        w = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert g == w, (q, g, w)
    # an all-NaN column has no quantile: DuckDB NULL, engine NaN
    got = exact_quantiles_disc(
        rd.from_arrow(pa.table({"v": pa.array([np.nan, neg_nan], pa.float64())})),
        "v", [0.5], n_bins=16, collect_limit=8,
    )
    assert got["value"][0] != got["value"][0]


def test_batch_query_engine_preserves_query_id_type(ray_session, tmp_path, webpages_small):
    """Round-3 advice: non-integer query ids must flow through verbatim."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.build import build_index
    from invertedindexbuilder_ray.pipelines.query import BatchQueryEngine
    from invertedindexbuilder_ray.sources.webpages import load_webpages

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(webpages_small, src / "w.parquet")
    idx = str(tmp_path / "idx")
    build_index(load_webpages(str(src)), idx, num_partitions=2)
    queries = rd.from_arrow(
        pa.table(
            {
                "query_id": pa.array(["q-alpha", "q-beta"], pa.string()),
                "terms": pa.array(["the", "data"], pa.string()),
            }
        )
    )
    out = queries.map_batches(
        BatchQueryEngine,
        fn_constructor_kwargs={"index_dir": idx},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    assert set(out["query_id"].unique()) <= {"q-alpha", "q-beta"}
    assert out["query_id"].dtype == object


def test_cli_run_requires_pipeline_and_input():
    from invertedindexbuilder_ray.cli import main

    with pytest.raises(SystemExit, match="usage: run"):
        main(["run"])


def test_clusters_cap_out_raises(ray_session, monkeypatch):
    """If the safety cap is ever hit, dedup_clusters must RAISE, not
    return non-converged labels."""
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines import dedup

    monkeypatch.setattr(dedup, "SMALL_GRAPH_EDGES", 4)
    edges = _chain_edges(40, start=0)
    pairs = rd.from_arrow(pa.Table.from_pandas(edges, preserve_index=False))
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(pairs, None, max_rounds=1)


def test_qty_by_nation_broadcast_and_partitioned_parity(ray_session, monkeypatch):
    """The customer-dimension broadcast and its partitioned-join fallback
    must produce identical rollups (same guarantee class as the
    semi_join fallback-parity test)."""
    import invertedindexbuilder_ray.pipelines.catalog as cat

    sf = "/root/testdata/sf0.001"
    fast = cat.q_qty_by_nation(sf)
    monkeypatch.setattr(cat, "STAR_DIM_BROADCAST_LIMIT", 0)
    slow = cat.q_qty_by_nation(sf)
    assert fast.equals(slow)
    assert len(fast) > 0


def test_grouped_order_stats_refinement_path(ray_session):
    # force the histogram-refinement rounds (collect_limit below group
    # size) and check every (group, rank) against a local sort; keys are
    # ~2^62-scale uint64, so this also guards the exact-int combine (a
    # float64 upcast of the bounds silently shifts ranks by a few)
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.quantiles import (
        exact_order_stats_grouped,
    )

    rng = np.random.default_rng(42)
    n = 30_000
    df = pd.DataFrame(
        {
            "g": np.where(rng.integers(0, 2, n) > 0, "x", "y"),
            "v": np.round(rng.normal(50_000, 20_000, n), 2),
        }
    )
    # duplicates + exact-boundary values: the tie cases that matter
    df.loc[: n // 10, "v"] = 52833.80
    ds = rd.from_pandas(df).repartition(8)

    def mid(m):
        return [(m - 1) // 2, m // 2]

    got = exact_order_stats_grouped(ds, "v", "g", mid, collect_limit=100)
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        n_g, vals = got[g]
        assert n_g == len(v)
        assert vals == [v[(n_g - 1) // 2], v[n_g // 2]]
