from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindexbuilder_ray import oracle
from invertedindexbuilder_ray.functions import tokenize as vtok


def _postings_via_vectorized(texts, drop_trailing=True):
    arr = pa.array(texts, pa.string())
    doc_ids = np.arange(len(texts), dtype=np.int64)
    terms, dids, tfs = vtok.tokenize_to_postings(arr, doc_ids, drop_trailing=drop_trailing)
    return sorted(zip(terms.to_pylist(), dids.tolist(), tfs.tolist()))


def _postings_via_oracle(texts, drop_trailing=True):
    out = []
    for i, t in enumerate(texts):
        tf: dict[str, int] = {}
        for tok in oracle.tokenize(t, drop_trailing=drop_trailing):
            tf[tok] = tf.get(tok, 0) + 1
        out.extend((term, i, c) for term, c in tf.items())
    return sorted(out)


def test_quirks_q1_q2_q3():
    texts = [
        "Hello WORLD tail",          # trailing 'tail' dropped (Q1)
        "abcdefghijklmno x.",        # 15-char kept, 1-char kept
        "abcdefghijklmnop ok.",      # 16-char dropped whole (Q2)
        "MiXeD42Case done.",         # lowercased, digits kept (Q3)
        "aéb end.",             # UTF-8 bytes separate: 'a','b' tokens
        "",                           # empty
        "punct-only !!! ...",
    ]
    got = _postings_via_vectorized(texts)
    want = _postings_via_oracle(texts)
    assert got == want
    terms = {t for t, _, _ in got}
    assert "tail" not in terms
    assert "abcdefghijklmno" in terms
    assert "abcdefghijklmnop" not in terms
    assert "mixed42case" in terms
    assert {"a", "b"} <= terms


def test_clean_mode_keeps_trailing():
    got = _postings_via_vectorized(["keep this tail"], drop_trailing=False)
    assert ("tail", 0, 1) in got


def test_tf_accumulation_and_doc_major_order():
    texts = ["the the the cat.", "cat the."]
    arr = pa.array(texts, pa.string())
    terms, dids, tfs = vtok.tokenize_to_postings(arr, np.array([7, 9]))
    rows = list(zip(terms.to_pylist(), dids.tolist(), tfs.tolist()))
    assert ("the", 7, 3) in rows and ("cat", 7, 1) in rows
    assert ("cat", 9, 1) in rows and ("the", 9, 1) in rows
    assert dids.tolist() == sorted(dids.tolist())  # doc-major emission


def test_sliced_and_chunked_arrays():
    texts = ["alpha beta.", "gamma delta.", "epsilon zeta."]
    arr = pa.array(texts, pa.string()).slice(1, 2)
    terms, dids, tfs = vtok.tokenize_to_postings(arr, np.array([0, 1]))
    assert set(terms.to_pylist()) == {"gamma", "delta", "epsilon", "zeta"}
    chunked = pa.chunked_array([pa.array(["a b."]), pa.array(["c d."])])
    terms2, dids2, _ = vtok.tokenize_to_postings(chunked, np.array([5, 6]))
    assert sorted(zip(terms2.to_pylist(), dids2.tolist())) == [
        ("a", 5), ("b", 5), ("c", 6), ("d", 6)
    ]


def test_token_counts_matches_oracle():
    texts = ["one two three", "four.", "", "abcdefghijklmnop toolong."]
    counts = vtok.token_counts(pa.array(texts, pa.string()))
    want = [len(oracle.tokenize(t)) for t in texts]
    assert counts.tolist() == want


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(alphabet=list("abcXYZ019 .,\n\t-_éñ中!"), max_size=60),
        max_size=12,
    )
)
def test_vectorized_matches_oracle(texts):
    assert _postings_via_vectorized(texts) == _postings_via_oracle(texts)
    assert _postings_via_vectorized(texts, False) == _postings_via_oracle(texts, False)
