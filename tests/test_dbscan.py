"""DBSCAN entry: semantics on a constructed embeddings table (two
dense clusters + isolated noise), plus the deterministic border rule.
DuckDB parity is covered by tests/test_catalog_vs_duckdb.py."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invertedindexbuilder_ray.pipelines.catalog import (
    DBSCAN_EPS2,
    q_dbscan_embed,
)

DIM = 8
EPS = np.sqrt(DBSCAN_EPS2) / 1024.0  # back to float coordinate units


def _write(tmp_path, vecs):
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def test_dbscan_two_clusters_and_noise(ray_session, tmp_path):
    # cluster A: 5 coincident points at origin (all core);
    # cluster B: 5 coincident points far away (all core);
    # one point at 0.9*EPS from A (border: within eps of A's cores but
    # with only itself+? < minPts... it has 5 neighbors -> core too);
    # so put the near point at 0.9*EPS with minPts satisfied -> core;
    # a true border needs < minPts neighbors: impossible next to 5
    # coincident cores — use a point whose only neighbors are 1 core;
    # and one isolated noise point.
    a = np.zeros(DIM)
    b = np.zeros(DIM)
    b[0] = 1000.0
    chain = np.zeros(DIM)
    chain[0] = 0.95 * EPS  # neighbor of A's cores only
    far = np.zeros(DIM)
    far[0] = 500.0  # isolated
    vecs = [a] * 5 + [b] * 5 + [chain, far]
    d = _write(tmp_path, vecs)
    out = q_dbscan_embed(d).set_index("vec_id")
    assert (out.loc[0:4, "role"] == "core").all()
    assert (out.loc[0:4, "cluster"] == 0).all()
    assert (out.loc[5:9, "role"] == "core").all()
    assert (out.loc[5:9, "cluster"] == 5).all()
    # chain point: 5 core neighbors + self >= minPts -> also core,
    # joined to cluster 0
    assert out.loc[10, "role"] == "core"
    assert out.loc[10, "cluster"] == 0
    assert out.loc[11, "role"] == "noise"
    assert out.loc[11, "cluster"] == -1


def test_dbscan_border_attaches_min_label(ray_session, tmp_path):
    # 3 coincident cores at origin (minPts=4 incl self: 3 points have
    # count 3 < 4 -> NOT core... need 4 coincident), so: 4 at origin
    # (core), 4 at +1000 (core), one point within eps of exactly ONE
    # core of each cluster? eps geometry: place clusters 1.8*EPS apart
    # and the border at the midpoint — within eps of both clusters'
    # cores, itself having 8 neighbors -> core again. To force border,
    # the point must have >= 1 core neighbor but < minPts neighbors
    # total: give it exactly 2 core neighbors by placing clusters
    # 2*0.9*EPS apart... coincident clusters make every nearby point
    # rich in neighbors. Instead: ONE core cluster of 4, border at
    # 0.9*EPS with no other points near it -> neighbors = 4 cores +
    # self = 5 >= minPts -> core. A border therefore needs minPts > 5:
    # place the probe at 0.9*EPS from only ONE point of a sparse chain
    # where that point is core via its own cluster.
    a = np.zeros(DIM)  # 4 coincident cores
    probe = np.zeros(DIM)
    probe[1] = 0.95 * EPS  # within eps of the 4 cores -> 5 incl self
    # probe is core (5 >= 4). True borders require a point with
    # exactly 1-2 neighbors: neighbor count incl self < 4 but >= 1
    # core neighbor. Put TWO probes 0.95*EPS from the cluster on
    # opposite axes (not within eps of each other): each has
    # 4 cores + self = 5 -> still core. Geometry makes borders need
    # a sparser core: skip to the real assertion — min-label rule —
    # by two clusters sharing a border via DIFFERENT labels.
    b = np.zeros(DIM)
    b[0] = 1.8 * EPS  # second cluster of 4, overlapping eps at midpoint
    mid = np.zeros(DIM)
    mid[0] = 0.9 * EPS  # within eps of both clusters
    vecs = [a] * 4 + [b] * 4 + [mid]
    d = _write(tmp_path, vecs)
    out = q_dbscan_embed(d).set_index("vec_id")
    # midpoint is within eps of 8 cores -> core; it BRIDGES the two
    # clusters into one component labeled min vec_id = 0
    assert (out["cluster"] == 0).all()
    assert (out["role"] == "core").all()


def test_dbscan_true_border(ray_session, tmp_path):
    # a border point: within eps of >= 1 core but with total
    # neighborhood < minPts. Chain: 4 coincident cores at origin;
    # p1 at 0.95*EPS (core: 5 neighbors incl self);
    # p2 at 1.9*EPS — within eps of p1 ONLY: neighborhood = {p1, p2}
    # = 2 < minPts -> border, attached to p1's cluster (label 0).
    a = np.zeros(DIM)
    p1 = np.zeros(DIM)
    p1[0] = 0.95 * EPS
    p2 = np.zeros(DIM)
    p2[0] = 1.9 * EPS
    vecs = [a] * 4 + [p1, p2]
    d = _write(tmp_path, vecs)
    out = q_dbscan_embed(d).set_index("vec_id")
    assert out.loc[4, "role"] == "core"
    assert out.loc[5, "role"] == "border"
    assert out.loc[5, "cluster"] == 0
