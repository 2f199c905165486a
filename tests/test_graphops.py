"""Unit tests for the graph-structure tier (graphops.py) and the Naive
Bayes classifier (classify.py): algorithm correctness on constructed
graphs/corpora, independent of the DuckDB parity gate (which
tests/test_catalog_vs_duckdb.py and the fuzz harness cover)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invertedindexbuilder_ray.pipelines.graphops import (
    kcore_peel,
    link_prediction_aa_df,
    pmi_graph,
    term_kcore_df,
)


def _adj_from_edges(nv, edges):
    a = np.zeros((nv, nv), np.int64)
    for u, v in edges:
        a[u, v] = a[v, u] = 1
    return a


def test_kcore_clique_plus_tail():
    # 4-clique (0..3) with a tail 3-4-5: clique is 3-core, tail peels
    adj = _adj_from_edges(
        6, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    )
    core = kcore_peel(adj)
    assert core.tolist() == [3, 3, 3, 3, 1, 1]


def test_kcore_isolated_and_star():
    # isolated vertex -> core 0; star center/leaves -> core 1
    adj = _adj_from_edges(5, [(0, 1), (0, 2), (0, 3)])
    core = kcore_peel(adj)
    assert core.tolist() == [1, 1, 1, 1, 0]


def test_kcore_matches_networkx_style_reference():
    # brute-force reference: core(v) = max k with v in the k-core
    rng = np.random.RandomState(7)
    nv = 20
    adj = np.zeros((nv, nv), np.int64)
    iu, iv = np.triu_indices(nv, 1)
    pick = rng.rand(len(iu)) < 0.2
    adj[iu[pick], iv[pick]] = 1
    adj = adj | adj.T

    def in_kcore(k):
        alive = np.ones(nv, bool)
        while True:
            deg = adj[:, alive].sum(axis=1)
            dead = alive & (deg < k)
            if not dead.any():
                return alive
            alive &= ~dead

    core = kcore_peel(adj)
    for k in range(0, int(core.max()) + 2):
        member = in_kcore(k)
        assert ((core >= k) == member).all(), k


def _write_docs(tmpdir, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "documents.parquet"))
    return str(tmpdir)


def test_pmi_graph_splits_anticorrelated_pairs(ray_session, tmp_path):
    # two disjoint topic clusters: PMI>0 inside a cluster, <0 across
    rows = []
    for i in range(12):
        rows.append((i, "alpha beta gamma", "en"))
    for i in range(12, 24):
        rows.append((i, "delta epsilon zeta", "en"))
    d = _write_docs(tmp_path, rows)
    terms, adj = pmi_graph(
        __import__(
            "invertedindexbuilder_ray.pipelines.textpipe", fromlist=["_docs"]
        )._docs(d)
    )
    ti = {t: i for i, t in enumerate(terms)}
    assert adj[ti["alpha"], ti["beta"]] == 1
    assert adj[ti["delta"], ti["zeta"]] == 1
    assert adj[ti["alpha"], ti["delta"]] == 0


def test_link_prediction_nonadjacent_only(ray_session, tmp_path):
    # a-b, b-c strongly associated; a-c never co-occur but share b:
    # (a, c) must be the predicted link
    rows = []
    for i in range(10):
        rows.append((i, "aterm bterm", "en"))
    for i in range(10, 20):
        rows.append((i, "bterm cterm", "en"))
    # noise docs so df ratios keep PMI(a,c) negative
    for i in range(20, 30):
        rows.append((i, "xterm", "en"))
    d = _write_docs(tmp_path, rows)
    out = link_prediction_aa_df(d)
    pairs = set(zip(out["term_a"], out["term_b"]))
    assert ("aterm", "cterm") in pairs
    row = out[(out["term_a"] == "aterm") & (out["term_b"] == "cterm")].iloc[0]
    assert row["cn"] == 1
    # common neighbor bterm has deg 2 -> w = 1e12 // L(2) = 1e12 // 1e9
    assert row["aa_fp"] == 1000


def test_kcore_entry_runs_on_testdata(ray_session):
    df = term_kcore_df("/root/testdata/sf0.001")
    assert len(df) > 0
    assert (df["core"] <= df["deg"]).all()
    assert (df["core"] >= 0).all()


def test_nb_classifier_learns_separable_langs(ray_session, tmp_path):
    # distinctive vocab per lang -> diagonal confusion on the held-out
    # split (doc_id % 5 == 4)
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "hund katze maus", "de"))
        else:
            rows.append((i, "dog cat mouse", "en"))
    d = _write_docs(tmp_path, rows)
    from invertedindexbuilder_ray.pipelines.classify import (
        nb_lang_confusion_df,
    )

    out = nb_lang_confusion_df(d)
    assert set(zip(out["lang_true"], out["lang_pred"])) == {
        ("de", "de"),
        ("en", "en"),
    }
    assert out["n_docs"].sum() == 8  # 40 docs, 1 in 5 held out
