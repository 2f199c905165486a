"""pagerank_terms semantics: the fixed-point recurrence must (a) rank an
obvious hub first and (b) track TRUE float PageRank closely — the floor
divisions exist for cross-engine determinism, not to change the math.
(SQL parity is covered by test_catalog_vs_duckdb + test_curation_fuzz.)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invertedindexbuilder_ray.pipelines.curation import (
    PR_ITERS,
    PR_SCALE,
    pagerank_terms,
)


def _write(tmp_path, texts):
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_hub_ranks_first_and_tracks_float_pagerank(ray_session, tmp_path):
    # 'hub' appears with every spoke; spokes never co-occur directly.
    # Repeat each spoke doc so every spoke also clears the df threshold.
    spokes = [f"spoke{i}" for i in range(8)]
    texts = [f"hub {s} filler" for s in spokes for _ in range(2)]
    out = pagerank_terms(_write(tmp_path, texts), top_vocab=16)

    # 'hub' and 'filler' are graph-isomorphic universal nodes: they tie
    # at the top (tie order is alphabetical) and beat every spoke
    top2 = set(out.head(2)["term"])
    assert top2 == {"hub", "filler"}
    assert out.iloc[0]["pr"] == out.iloc[1]["pr"]
    assert out.iloc[0]["pr"] > out.iloc[2]["pr"]

    # reconstruct the star graph (hub + 'filler' behave identically as
    # universal nodes) and run TRUE float PageRank on the same adjacency
    terms = out["term"].tolist()
    nv = len(terms)
    adj = np.zeros((nv, nv), np.int64)
    universal = {"hub", "filler"}
    for i, a in enumerate(terms):
        for j, b in enumerate(terms):
            if i != j and (a in universal or b in universal):
                adj[i, j] = 1
    deg = adj.sum(axis=1)
    r = np.full(nv, 1.0 / nv)
    for _ in range(PR_ITERS):
        r = 0.15 / nv + 0.85 * (adj @ (r / deg))
    got = out.set_index("term")["pr"].reindex(terms).to_numpy() / PR_SCALE
    # floor-division quantization error: <= nv * iters ulps of 1/SCALE
    # per step — astronomically below this tolerance
    assert np.allclose(got, r, atol=1e-6)
