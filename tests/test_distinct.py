"""HyperLogLog (pipelines/distinct.py): merge algebra + estimate accuracy.

SQL bit-exactness of the registers is gated by test_catalog_vs_duckdb.py
(approx_distinct_hll entry); here we test what SQL can't — the sketch's
associativity under block splits and the estimator's error bounds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindexbuilder_ray.pipelines.distinct import (
    HLL_M,
    _batch_registers,
    hll_estimate,
    hll_token_registers,
)


def _merge(tables):
    reg = np.zeros(HLL_M, np.int64)
    for t in tables:
        b = t["bucket"].to_numpy()
        r = t["maxrank"].to_numpy()
        np.maximum.at(reg, b, r)
    nz = np.flatnonzero(reg)
    return pa.table({"bucket": pa.array(nz, pa.int64()),
                     "maxrank": pa.array(reg[nz], pa.int64())})


def test_registers_split_invariant():
    rng = np.random.default_rng(7)
    h = rng.integers(0, 1 << 64, 50_000, dtype=np.uint64)
    whole = _batch_registers(h)
    parts = [_batch_registers(c) for c in np.array_split(h, 7)]
    assert _merge([whole]).equals(_merge(parts))


def test_registers_duplicate_invariant():
    rng = np.random.default_rng(8)
    h = rng.integers(0, 1 << 64, 10_000, dtype=np.uint64)
    once = _batch_registers(h)
    thrice = _batch_registers(np.concatenate([h, h, h]))
    assert once.equals(thrice)


def test_estimate_accuracy_large():
    rng = np.random.default_rng(9)
    for n in (50_000, 200_000):
        h = rng.integers(0, 1 << 64, n, dtype=np.uint64)
        n_true = len(np.unique(h))
        est = hll_estimate(_batch_registers(h))
        assert abs(est - n_true) / n_true < 0.05  # ~1.04/sqrt(4096) = 1.6% sd


def test_estimate_small_range_linear_counting():
    rng = np.random.default_rng(10)
    h = rng.integers(0, 1 << 64, 300, dtype=np.uint64)
    est = hll_estimate(_batch_registers(h))
    assert abs(est - 300) / 300 < 0.10


def test_estimate_empty():
    assert hll_estimate(pa.table({"bucket": pa.array([], pa.int64()),
                                  "maxrank": pa.array([], pa.int64())})) == 0.0


def test_dataset_registers_match_single_batch(ray_session):
    import ray.data as rd

    from invertedindexbuilder_ray.functions.sketch import _token_hashes

    texts = [f"alpha beta{i} gamma delta{i % 7} epsilon" for i in range(500)]
    tbl = pa.table({"text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(5)
    got = (
        hll_token_registers(ds)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    h, _ = _token_hashes(tbl["text"])
    want = (
        _batch_registers(h)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    est = hll_estimate(pa.table({"bucket": pa.array(got["bucket"]),
                                 "maxrank": pa.array(got["maxrank"])}))
    n_true = len(np.unique(h))
    assert abs(est - n_true) / n_true < 0.10


# ---------------------------------------------------------------------------
# Count-Min-Sketch heavy hitters (pipelines/heavyhitters.py)


def _docs_tbl(texts):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_cms_est_one_sided_and_exact_counts(ray_session):
    import numpy as np

    from invertedindexbuilder_ray.pipelines.heavyhitters import (
        cms_probe_estimates,
    )

    # doc 0 (the probe doc) uses a small vocab with known counts; the rest
    # of the corpus floods the sketch with 5k distinct terms so row
    # collisions overcount SOME probe term
    probe_doc = "alpha alpha beta gamma"
    flood = [" ".join(f"f{i}x{j}" for j in range(40)) for i in range(125)]
    df = cms_probe_estimates(_docs_tbl([probe_doc] + flood)).set_index("term")
    assert df.loc["alpha", "exact"] == 2
    assert df.loc["beta", "exact"] == 1
    assert (df["est"] >= df["exact"]).all()  # CMS one-sided guarantee
    # error bound sanity: est - exact <= corpus tokens / w (expected),
    # allow 10x slack for the 4-row min
    n_tokens = 4 + 125 * 40
    assert ((df["est"] - df["exact"]) <= max(10 * n_tokens // 1024, 5)).all()


def test_cms_registers_split_invariant(ray_session):
    from invertedindexbuilder_ray.pipelines.heavyhitters import (
        cms_token_registers,
    )

    texts = [" ".join(f"w{(i * 5 + j) % 97}" for j in range(30)) for i in range(80)]
    one = (
        cms_token_registers(_docs_tbl(texts))
        .to_pandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    many = (
        cms_token_registers(_docs_tbl(texts).repartition(9))
        .to_pandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    assert one.equals(many)
    # total register mass per row == total token count
    assert one["cnt"].sum() == 4 * 80 * 30


# ---------------------------------------------------------------------------
# Bloom filter (pipelines/bloom.py)


def test_bloom_one_sided_and_negatives(ray_session):
    from invertedindexbuilder_ray.pipelines.bloom import bloom_probe

    # doc_ids 0,5,10 are held out; their terms overlap the base partially
    texts = [f"shared{i % 7} only{i} common word" for i in range(20)]
    df = bloom_probe(_docs_tbl(texts)).set_index("term")
    # no false negatives, ever
    assert (df["maybe_in_base"] >= df["actually_in_base"]).all()
    # 'common' and 'word' are in every doc -> in base, and the filter says so
    assert df.loc["common", "actually_in_base"] == 1
    assert df.loc["common", "maybe_in_base"] == 1
    # held-out-only terms (only0/only5/...) are definitely new
    assert df.loc["only0", "actually_in_base"] == 0
    # at least one probe exercises the definitely-new fast path
    assert (df["maybe_in_base"] == 0).any()
    # synthetic negatives present and (at this tiny fill rate) rejected
    assert df.loc["commonqq9", "actually_in_base"] == 0


def test_bloom_words_split_invariant(ray_session):
    from invertedindexbuilder_ray.pipelines.bloom import bloom_term_words

    texts = [" ".join(f"w{(i * 5 + j) % 97}" for j in range(30)) for i in range(80)]
    one = (
        bloom_term_words(_docs_tbl(texts))
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    many = (
        bloom_term_words(_docs_tbl(texts).repartition(9))
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    assert one.equals(many)


def test_bloom_duplicate_probe_term_marked_correctly(ray_session):
    # a natural held term EQUAL to a truncated synthetic negative that
    # also exists in base: the probe set must dedup (set union) so the
    # single row carries actually_in_base=1 (review finding, round 4)
    from invertedindexbuilder_ray.pipelines.bloom import bloom_probe

    texts = [
        "abc abcqq9 held stuff",  # doc 0: held (0 % 5 == 0)
        "abcqq9 base stuff",      # docs 1-4: base
        "filler one",
        "filler two",
        "filler three",
    ]
    df = bloom_probe(_docs_tbl(texts)).set_index("term")
    assert not df.index.has_duplicates
    assert df.loc["abcqq9", "actually_in_base"] == 1
    assert df.loc["abcqq9", "maybe_in_base"] == 1


# ---------------------------------------------------------------- KMV


def test_kmv_split_and_duplicate_invariant(ray_session):
    """The k-minima over blocks must equal the k-minima of the whole
    stream, and duplicates must not perturb the synopsis."""
    import pandas as pd
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.distinct import kmv_minima

    texts = [f"document number {i}" for i in range(2000)]
    whole = kmv_minima(rd.from_pandas(pd.DataFrame({"text": texts})))
    split = kmv_minima(
        rd.from_pandas(pd.DataFrame({"text": texts})).repartition(13)
    )
    duped = kmv_minima(
        rd.from_pandas(pd.DataFrame({"text": texts * 3})).repartition(5)
    )
    pd.testing.assert_frame_equal(whole, split)
    pd.testing.assert_frame_equal(whole, duped)


def test_kmv_estimate_accuracy(ray_session):
    """KMV relative error is ~1/sqrt(k-2) (Beyer et al.); assert a lax
    4-sigma band at n >> k, and exactness below k."""
    import pandas as pd
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.distinct import KMV_K, kmv_minima

    n = 50_000
    texts = [f"unique doc {i}" for i in range(n)]
    out = kmv_minima(rd.from_pandas(pd.DataFrame({"text": texts})))
    assert len(out) == KMV_K
    est = int(out["est"].iloc[0])
    sigma = 1.0 / (KMV_K - 2) ** 0.5
    assert abs(est - n) / n < 4 * sigma

    small = kmv_minima(
        rd.from_pandas(pd.DataFrame({"text": texts[: KMV_K - 10]}))
    )
    assert int(small["est"].iloc[0]) == KMV_K - 10
    assert len(small) == KMV_K - 10
