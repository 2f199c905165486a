"""bigram_topk (textpipe) semantics: ties, splits, filtered adjacency."""

from __future__ import annotations

import pyarrow as pa

from invertedindexbuilder_ray.pipelines.textpipe import bigram_topk


def _ds(texts, blocks=1):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
    return ds.repartition(blocks) if blocks > 1 else ds


def test_bigram_counts_and_tie_order(ray_session):
    # "b c" and "a b" both occur twice; tie broken lexicographically
    df = bigram_topk(_ds(["a b c", "a b", "b c x"]), k=5).to_pandas()
    assert df["bigram"].tolist()[:2] == ["a b", "b c"]
    assert df["n"].tolist()[:2] == [2, 2]
    assert df["rank"].tolist() == list(range(1, len(df) + 1))


def test_bigram_split_invariant(ray_session):
    texts = [f"w{i % 7} w{(i + 1) % 5} common pair tail{i % 3}" for i in range(200)]
    one = bigram_topk(_ds(texts, 1), k=10).to_pandas()
    many = bigram_topk(_ds(texts, 9), k=10).to_pandas()
    assert one.equals(many)


def test_bigram_adjacency_after_length_filter(ray_session):
    # the >15-char token is dropped BEFORE pairing (both engine and SQL),
    # so its neighbors become adjacent
    df = bigram_topk(_ds(["aa " + "x" * 20 + " bb"]), k=5).to_pandas()
    assert df["bigram"].tolist() == ["aa bb"]
    assert df["n"].tolist() == [1]


def test_bigram_single_token_docs(ray_session):
    df = bigram_topk(_ds(["one", "two", ""]), k=5).to_pandas()
    assert len(df) == 0
