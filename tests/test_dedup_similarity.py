from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _dup_corpus():
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(200)]
    texts = []
    for i in range(40):
        texts.append(" ".join(rng.choice(vocab) for _ in range(60)))
    # exact dup, near dup (small edit), and whitespace-variant dup
    texts.append(texts[0])
    near = texts[1].split()
    near[5] = "CHANGED"
    texts.append(" ".join(near))
    texts.append(texts[2].replace(" ", "\t").replace("w", "w"))
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    return rows


@pytest.fixture(scope="module")
def dup_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(_dup_corpus()))


def _brute_jaccard(a: str, b: str, k: int = 3) -> float:
    from invertedindexbuilder_ray.oracle import tokenize

    ta = tokenize(a, drop_trailing=False)
    tb = tokenize(b, drop_trailing=False)
    sa = {tuple(ta[i : i + k]) for i in range(len(ta) - k + 1)}
    sb = {tuple(tb[i : i + k]) for i in range(len(tb) - k + 1)}
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_minhash_finds_dups(dup_ds):
    from invertedindexbuilder_ray.pipelines.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(dup_ds, threshold=0.5).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (0, 40) in got  # exact dup
    assert (1, 41) in got  # near dup
    assert (2, 42) in got  # whitespace variant
    # no false positives among unrelated random docs
    rows = _dup_corpus()
    for a, b in got:
        assert _brute_jaccard(rows[a]["text"], rows[b]["text"]) >= 0.35, (a, b)


def test_ngram_jaccard_exact(dup_ds):
    from invertedindexbuilder_ray.pipelines.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(dup_ds, threshold=0.5).to_pandas()
    rows = _dup_corpus()
    got = {(int(a), int(b)): float(j) for a, b, j in zip(pairs.doc_a, pairs.doc_b, pairs.jaccard)}
    assert (0, 40) in got and got[(0, 40)] == 1.0
    for (a, b), j in got.items():
        assert j == pytest.approx(_brute_jaccard(rows[a]["text"], rows[b]["text"]), abs=1e-6)


def test_ngram_jaccard_broadcast_join_parity(dup_ds):
    """The small-corpus broadcast verify and the at-scale partitioned-
    join verify must return the IDENTICAL pair set and jaccard values
    (bcast_docs=0 forces the join path)."""
    import pandas as pd

    from invertedindexbuilder_ray.pipelines.dedup import ngram_jaccard_pairs

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    fast = canon(ngram_jaccard_pairs(dup_ds, threshold=0.5))
    slow = canon(ngram_jaccard_pairs(dup_ds, threshold=0.5, bcast_docs=0))
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0


def test_simhash_dups(dup_ds):
    from invertedindexbuilder_ray.pipelines.dedup import simhash_dedup_pairs

    pairs = simhash_dedup_pairs(dup_ds, max_hamming=3).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (0, 40) in got  # identical text -> identical simhash
    assert (2, 42) in got  # whitespace variant -> same token stream
    for _, r in pairs.iterrows():
        assert r.hamming <= 3


def test_dedup_clusters(dup_ds):
    from invertedindexbuilder_ray.pipelines.dedup import dedup_clusters, minhash_dedup_pairs

    pairs = minhash_dedup_pairs(dup_ds, threshold=0.5)
    labels = dedup_clusters(pairs, dup_ds).to_pandas()
    lbl = dict(zip(labels.node, labels.lbl))
    assert lbl[40] == min(0, lbl.get(0, 0))
    assert lbl[40] == lbl.get(0, lbl[40])


def test_embedding_dedup_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from invertedindexbuilder_ray.pipelines.dedup import embedding_dedup_pairs

    got = embedding_dedup_pairs(SF_DIR, threshold=0.4).to_pandas()
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = tbl["vec_id"].to_numpy()
    mat = np.stack([np.asarray(e, np.float64) for e in tbl["embedding"].to_pylist()])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ii, jj = np.nonzero(sims >= 0.4)
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(ii, jj) if ids[i] < ids[j]}
    assert len(want) > 0  # sf0.001 embeddings have pairs above 0.4
    assert {(int(a), int(b)) for a, b in zip(got["vec_a"], got["vec_b"])} == want


def test_ann_lsh_recall(ray_session, tmp_path_factory):
    """Recall vs brute force on clustered embeddings (LSH's target regime;
    the sf embeddings are near-orthogonal random vectors where any
    sublinear ANN necessarily degrades — smoke-tested separately)."""
    import pyarrow.parquet as pq

    from invertedindexbuilder_ray.pipelines.catalog import q_knn_cosine
    from invertedindexbuilder_ray.pipelines.similarity import ann_lsh

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((20, 64)) * 3
    vecs = np.repeat(centers, 25, axis=0) + rng.standard_normal((500, 64)) * 0.3
    root = tmp_path_factory.mktemp("ann")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(500), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        root / "embeddings.parquet",
    )
    exact = q_knn_cosine(str(root)).to_pandas()
    approx = ann_lsh(str(root), n_queries=5, top_k=10).to_pandas()
    recalls = []
    for qid in range(5):
        e = set(exact[exact.qid == qid].vec_id)
        a = set(approx[approx.qid == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.7, recalls


def test_ann_lsh_smoke_sf(ray_session):
    from invertedindexbuilder_ray.pipelines.similarity import ann_lsh

    out = ann_lsh(SF_DIR, n_queries=3, top_k=5).to_pandas()
    assert set(out.columns) >= {"qid", "vec_id", "sim", "rank"}
    assert (out.groupby("qid")["rank"].max() <= 5).all()


def test_quality_and_fingerprint(ray_session):
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.textpipe import fingerprint_ds, langid_ds, quality_ds

    rows = [
        {"doc_id": 0, "text": "The cat and the hat is on a mat"},
        {"doc_id": 1, "text": "the  cat\tand the hat   is on a mat."},
        {"doc_id": 2, "text": "mat a on is hat the and cat The"},
        {"doc_id": 3, "text": "el perro y el gato en la casa de la abuela con pan"},
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": "12345 67890 a1b2"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    q = quality_ds(ds).to_pandas().set_index("doc_id").sort_index()
    assert q.loc[0, "n_tokens"] == 9
    assert q.loc[4, "n_tokens"] == 0 and q.loc[4, "alnum_ratio"] == 0.0
    assert q.loc[5, "digit_ratio"] > 0.5
    assert 0 < q.loc[0, "stopword_ratio"] < 1
    # fingerprints: whitespace/punct-insensitive, order-sensitive
    fp = fingerprint_ds(ds).to_pandas().set_index("doc_id")["fingerprint"]
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    lang = langid_ds(ds).to_pandas().set_index("doc_id")
    assert lang.loc[0, "lang_pred"] == "en"
    assert lang.loc[3, "lang_pred"] == "es"
    assert lang.loc[4, "lang_pred"] == "und"


def test_skew_guard_truncation_is_audited(ray_session):
    """A hot bucket (>MAX_BUCKET identical docs) must be truncated AND the
    dropped pairs counted — the skew guard is auditable, never silent."""
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines import dedup

    n = dedup.MAX_BUCKET + 44  # 300 identical docs -> every band bucket is hot
    rows = [
        {"doc_id": i, "text": "same boilerplate text repeated here often"}
        for i in range(n)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    per_bucket = n * (n - 1) // 2 - dedup.MAX_BUCKET * (dedup.MAX_BUCKET - 1) // 2
    audit = dedup.truncation_audit(ds).to_pandas()
    assert len(audit) == 16  # all 16 band buckets are oversize
    assert (audit.bucket_size == n).all()
    assert int(audit.dropped.sum()) == 16 * per_bucket
    # the surviving candidate pairs are still produced (capped, not zeroed)
    pairs, _ = dedup.minhash_candidate_pairs(ds)
    assert pairs.count() == dedup.MAX_BUCKET * (dedup.MAX_BUCKET - 1) // 2
    # and the pair generator reports the same drop count in the worker log
    df = pa.Table.from_pylist(
        [
            {"shard": 0, "band_key": 1, "doc_id": i}
            for i in range(dedup.MAX_BUCKET + 10)
        ]
    ).to_pandas()
    import logging

    records = []

    class Grab(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    h = Grab()
    dedup.logger.addHandler(h)
    try:
        out = dedup._bucket_pairs(df, key="band_key")
    finally:
        dedup.logger.removeHandler(h)
    m = dedup.MAX_BUCKET
    assert len(out) == m * (m - 1) // 2
    assert any("dropping" in r for r in records), records


def test_simhash_truncation_audit_empty_when_no_skew(dup_ds):
    from invertedindexbuilder_ray.pipelines import dedup

    audit = dedup.truncation_audit(dup_ds, mode="simhash").to_pandas()
    assert len(audit) == 0


def test_embedding_dedup_grid_multiblock(ray_session):
    """Tiny block_rows forces a multi-cell grid (off-diagonal cells); the
    result must still equal single-block brute force exactly."""
    from invertedindexbuilder_ray.pipelines.dedup import embedding_dedup_pairs

    one = embedding_dedup_pairs(SF_DIR, threshold=0.4).to_pandas()
    many = embedding_dedup_pairs(SF_DIR, threshold=0.4, block_rows=7).to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b", "cosine"]].to_numpy()))
    assert key(one) == key(many)
    assert len(one) > 0


def test_ann_ivf_recall(ray_session, tmp_path_factory):
    """IVF recall vs brute force on clustered embeddings."""
    import pyarrow.parquet as pq

    from invertedindexbuilder_ray.pipelines.catalog import q_knn_cosine
    from invertedindexbuilder_ray.pipelines.similarity import ann_ivf

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((20, 64)) * 3
    vecs = np.repeat(centers, 25, axis=0) + rng.standard_normal((500, 64)) * 0.3
    root = tmp_path_factory.mktemp("ivf")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(500), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        root / "embeddings.parquet",
    )
    exact = q_knn_cosine(str(root)).to_pandas()
    approx = ann_ivf(str(root), n_queries=5, top_k=10, n_centroids=24, n_probe=6).to_pandas()
    recalls = []
    for qid in range(5):
        e = set(exact[exact.qid == qid].vec_id)
        a = set(approx[approx.qid == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.7, recalls


def test_ann_ivf_smoke_sf(ray_session):
    from invertedindexbuilder_ray.pipelines.similarity import ann_ivf

    out = ann_ivf(SF_DIR, n_queries=3, top_k=5).to_pandas()
    assert set(out.columns) >= {"qid", "vec_id", "sim", "rank"}
    assert (out.groupby("qid")["rank"].max() <= 5).all()
    # determinism: same seed, same codebook, same result
    out2 = ann_ivf(SF_DIR, n_queries=3, top_k=5).to_pandas()
    key = lambda df: sorted(map(tuple, df[["qid", "vec_id", "rank"]].to_numpy()))
    assert key(out) == key(out2)


def test_unicode_robustness(ray_session):
    """Multi-byte UTF-8 (CJK, emoji, combining marks) must flow through the
    byte-level kernels without crashes: non-ASCII bytes are token
    separators (quirk Q3 byte classes), so these docs mostly produce few
    or no tokens — but every pipeline must still return sane results."""
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.dedup import (
        minhash_dedup_pairs, ngram_jaccard_pairs, simhash_dedup_pairs,
    )
    from invertedindexbuilder_ray.pipelines.textpipe import (
        bpe_token_count_ds, fingerprint_groups_ds, langid_ds, quality_ds,
    )

    rows = [
        {"doc_id": 0, "text": "日本語のテキスト with some ascii words"},
        {"doc_id": 1, "text": "🎉🎊 emoji only 🎈"},
        {"doc_id": 2, "text": "café naïve résumé"},
        {"doc_id": 3, "text": "普通的中文文本没有空格"},
        {"doc_id": 4, "text": "mixed 混合 text with 単語 tokens here ok"},
        {"doc_id": 5, "text": "mixed 混合 text with 単語 tokens here ok"},  # dup of 4
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    q = quality_ds(ds).to_pandas().set_index("doc_id").sort_index()
    assert len(q) == 6 and (q.alnum_ratio <= 1).all()
    lang = langid_ds(ds).to_pandas()
    assert len(lang) == 6
    fp = fingerprint_groups_ds(ds).to_pandas()
    assert len(fp) == 6
    # identical docs share a fingerprint group
    by_doc = fp.set_index("doc_id")
    assert by_doc.loc[4, "canon_doc_id"] == by_doc.loc[5, "canon_doc_id"] == 4
    bpe = bpe_token_count_ds(ds).to_pandas()
    assert (bpe.n_bpe_tokens > 0).all()
    mh = minhash_dedup_pairs(ds, threshold=0.5).to_pandas()
    assert (4, 5) in set(zip(mh.doc_a, mh.doc_b))
    sh = simhash_dedup_pairs(ds).to_pandas()
    assert (4, 5) in set(zip(sh.doc_a, sh.doc_b))
    ng = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    got = {(int(a), int(b)): j for a, b, j in zip(ng.doc_a, ng.doc_b, ng.jaccard)}
    assert got.get((4, 5)) == 1.0
