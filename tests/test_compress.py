from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindexbuilder_ray.stages import compress


def _encode_one(doc_ids, tfs, **kw):
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.array([0, len(doc_ids)], dtype=np.int64)
    return compress.encode_term_lists(["t"], starts, doc_ids, tfs, **kw)


def test_reference_verified_bytes():
    # SURVEY.md §9.1 verified hexdump: df=2, postings (0,tf=2),(1,tf=1)
    enc = _encode_one([0, 1], [2, 1], block_max=False)
    assert enc.blob == bytes([0x82, 0x81, 0x81, 0x81, 0x84, 0x80, 0x81, 0x82, 0x81])


def test_roundtrip_multi_block_delta_carry():
    # 300 postings -> 3 blocks; deltas must carry across block boundaries
    docs = np.cumsum(np.arange(1, 301))  # strictly increasing, growing gaps
    tfs = (np.arange(300) % 7) + 1
    enc = _encode_one(docs, tfs, block_max=False)
    got_docs, got_tfs = compress.decode_full(np.frombuffer(enc.blob, np.uint8), block_max=False)
    assert got_docs.tolist() == docs.tolist()
    assert got_tfs.tolist() == tfs.tolist()


def test_block_max_scores():
    docs = np.arange(0, 200, dtype=np.int64)
    tfs = np.ones(200, dtype=np.int64)
    tfs[130] = 50  # spike in block 2
    dls = np.full(200, 100.0)
    enc = _encode_one(docs, tfs, doc_lens=dls, n_docs=1000, d_avr=100.0, block_max=True)
    dl = compress.open_list(np.frombuffer(enc.blob, np.uint8), block_max=True)
    assert dl.n_blocks == 2
    expected = compress.bm25_components(tfs, dls, 200, 1000, 100.0)
    assert abs(dl.block_max[0] - expected[:128].max()) < 1e-5
    assert abs(dl.block_max[1] - expected[128:].max()) < 1e-5
    assert abs(enc.max_scores[0] - expected.max()) < 1e-5
    got_docs, got_tfs = compress.decode_full(np.frombuffer(enc.blob, np.uint8))
    assert got_docs.tolist() == docs.tolist() and got_tfs.tolist() == tfs.tolist()


def test_multi_term_partition():
    terms = ["aa", "bb", "cc"]
    starts = np.array([0, 2, 5, 6])
    docs = np.array([3, 9, 0, 4, 7, 5])
    tfs = np.array([1, 2, 3, 1, 1, 9])
    dls = np.full(6, 50.0)
    enc = compress.encode_term_lists(
        terms, starts, docs, tfs, doc_lens=dls, n_docs=100, d_avr=50.0
    )
    blob = np.frombuffer(enc.blob, np.uint8)
    for i, (s, e) in enumerate([(0, 2), (2, 5), (5, 6)]):
        piece = blob[enc.offsets[i] : enc.offsets[i] + enc.nbytes[i]]
        got_docs, got_tfs = compress.decode_full(piece)
        assert got_docs.tolist() == docs[s:e].tolist()
        assert got_tfs.tolist() == tfs[s:e].tolist()
        assert enc.dfs[i] == e - s


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5_000_000), st.integers(1, 1000)),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    )
)
def test_roundtrip_property(postings):
    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.full(len(docs), 80.0)
    enc = _encode_one(docs, tfs, doc_lens=dls, n_docs=10_000_000, d_avr=80.0)
    got_docs, got_tfs = compress.decode_full(np.frombuffer(enc.blob, np.uint8))
    assert got_docs.tolist() == docs.tolist()
    assert got_tfs.tolist() == tfs.tolist()
