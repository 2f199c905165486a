"""Heavy-hitter splitting: segmented build must be query-identical to unsegmented."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from invertedindexbuilder_ray import corpus
from invertedindexbuilder_ray.pipelines.build import build_index
from invertedindexbuilder_ray.pipelines.query import QueryEngine
from invertedindexbuilder_ray.sources.webpages import load_webpages
from invertedindexbuilder_ray.state.reader import IndexReader, SegmentedCursor


@pytest.fixture(scope="module")
def two_indexes(ray_session, webpages_medium, tmp_path_factory):
    root = tmp_path_factory.mktemp("seg")
    src = root / "wp"
    src.mkdir()
    pq.write_table(webpages_medium, src / "a.parquet", row_group_size=250)
    plain = root / "idx_plain"
    segd = root / "idx_seg"
    build_index(load_webpages(str(src)), str(plain), num_partitions=4)
    # tiny segment cap -> every hot term splits into many segments
    build_index(
        load_webpages(str(src)), str(segd), num_partitions=4, segment_max_postings=100
    )
    return str(plain), str(segd)


def test_segments_exist_and_postings_identical(two_indexes):
    plain, segd = two_indexes
    rp, rs = IndexReader(plain), IndexReader(segd)
    assert set(rp.lexicon) == set(rs.lexicon)
    n_seg_terms = 0
    for term in rp.lexicon:
        cs = rs.open_list(term)
        if isinstance(cs, SegmentedCursor):
            n_seg_terms += 1
        dp = rp.open_list(term).decode_all_remaining()
        ds_ = cs.decode_all_remaining()
        assert dp[0].tolist() == ds_[0].tolist(), term
        assert dp[1].tolist() == ds_[1].tolist(), term
        assert rp.open_list(term).df == cs.df
    assert n_seg_terms > 0  # hot fixture terms exceed the 100-posting cap


@pytest.mark.parametrize("mode", ["and_conf", "and_correct", "or", "wand"])
def test_segmented_queries_rank_identical(two_indexes, mode):
    plain, segd = two_indexes
    conf = mode == "and_conf"
    ep = QueryEngine(plain, conformance=conf)
    es = QueryEngine(segd, conformance=conf)
    for q in corpus.make_queries():
        terms = ep.parse_query(q["terms"])
        if mode in ("and_conf", "and_correct"):
            a, b = ep.conjunctive(terms, q["k"]), es.conjunctive(terms, q["k"])
        elif mode == "or":
            a, b = ep.disjunctive(terms, q["k"]), es.disjunctive(terms, q["k"])
        else:
            a, b = ep.wand(terms, q["k"]), es.wand(terms, q["k"])
        assert a == b, (mode, q)
