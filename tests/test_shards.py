"""Document-partitioned scatter-gather querying must be rank-identical to
one monolithic index over the concatenated corpus (global-stats injection,
pipelines/shards.py)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from invertedindexbuilder_ray.pipelines.build import build_index
from invertedindexbuilder_ray.pipelines.query import CONJUNCTIVE, DISJUNCTIVE, QueryEngine
from invertedindexbuilder_ray.pipelines.shards import ShardedEngine
from invertedindexbuilder_ray.sources.webpages import load_webpages

QUERIES = [
    "the data",            # hot terms, everywhere
    "data join merge",     # multi-term AND/OR
    "vector",              # single term
    "data missingzzz",     # one term globally absent
    "the of and a to in",  # many hot ties (Zipf scores collide)
]


@pytest.fixture(scope="module")
def sharded_setup(ray_session, webpages_medium, tmp_path_factory):
    root = tmp_path_factory.mktemp("shards")
    tbl = webpages_medium
    slices = [tbl.slice(0, 400), tbl.slice(400, 300), tbl.slice(700)]
    shard_dirs = []
    for i, sl in enumerate(slices):
        src = root / f"src{i}"
        src.mkdir()
        pq.write_table(sl, src / "w.parquet", row_group_size=100)
        idx = str(root / f"idx{i}")
        build_index(load_webpages(str(src)), idx, num_partitions=4)
        shard_dirs.append(idx)
    full_src = root / "full"
    full_src.mkdir()
    pq.write_table(tbl, full_src / "w.parquet", row_group_size=100)
    full = str(root / "idx_full")
    build_index(load_webpages(str(full_src)), full, num_partitions=4)
    return shard_dirs, full


def _canon(ranked):
    return sorted(ranked, key=lambda p: (-p[1], p[0]))


@pytest.mark.parametrize("mode", [CONJUNCTIVE, DISJUNCTIVE])
@pytest.mark.parametrize("conformance", [False, True])
def test_sharded_rank_identical(sharded_setup, mode, conformance):
    """Same top-k members, bit-identical scores; order compared after
    canonicalizing both sides (the monolithic heap's EQUAL-score pop
    layout depends on full insertion history — documented deviation)."""
    shard_dirs, full = sharded_setup
    mono = QueryEngine(full, conformance=conformance)
    sharded = ShardedEngine(shard_dirs, conformance=conformance)
    for q in QUERIES:
        for k in (3, 10, 50):
            terms = mono.parse_query(q)
            if mode == CONJUNCTIVE:
                want = mono.conjunctive(terms, k)
            else:
                want = mono.disjunctive(terms, k)
            got = sharded.search_terms(terms, k, mode)
            assert _canon(got) == _canon(want), (q, k, mode, conformance)
            # canonical order IS sharded output order
            assert got == _canon(got)


def test_sharded_single_shard_degenerates_to_mono(sharded_setup):
    shard_dirs, full = sharded_setup
    mono = QueryEngine(full, conformance=False)
    one = ShardedEngine([full], conformance=False)
    got = one.search("data join", 10, CONJUNCTIVE)
    want = [
        (h["doc_id"], h["score"])
        for h in mono.search("data join", 10, CONJUNCTIVE)
    ]
    assert _canon(got) == _canon(want)


def test_cli_sharded_query(sharded_setup, capsys):
    from invertedindexbuilder_ray.cli import main

    shard_dirs, full = sharded_setup
    assert main(["query", "--shards", *shard_dirs, "--terms", "data join",
                 "--k", "3", "--mode", "and"]) == 0
    out = capsys.readouterr().out
    assert "BM25:" in out and "[1]" in out

    with pytest.raises(SystemExit, match="--index or --shards"):
        main(["query", "--terms", "x"])


def test_sharded_identity_fuzz(sharded_setup):
    """Random query mixes over the corpus vocabulary, both modes, boundary
    k values — canonical-order identity must hold for every one."""
    import numpy as np

    shard_dirs, full = sharded_setup
    mono = QueryEngine(full, conformance=False)
    sharded = ShardedEngine(shard_dirs, conformance=False)
    vocab = list(mono.reader.lexicon)[:200] if hasattr(mono.reader, "lexicon") else []
    if not vocab:  # fall back: harvest terms from a hot query's docs
        vocab = ["the", "data", "join", "merge", "of", "a", "model", "vector"]
    rng = np.random.RandomState(5)
    for trial in range(25):
        n_terms = int(rng.randint(1, 5))
        terms = [vocab[i] for i in rng.randint(0, len(vocab), n_terms)]
        k = int(rng.choice([1, 2, 7, 100]))
        mode = int(rng.randint(0, 2))
        want = (
            mono.conjunctive(terms, k) if mode == CONJUNCTIVE
            else mono.disjunctive(terms, k)
        )
        got = sharded.search_terms(terms, k, mode)
        assert _canon(got) == _canon(want), (terms, k, mode)


def test_rolling_delta_served_as_shard(ray_session, webpages_medium, tmp_path):
    """Zero-downtime rolling ingestion: a fresh delta index is queryable
    IMMEDIATELY as a second shard (same doc_id offset contract as
    merge_indexes), identical to the eventual compacted index — compaction
    becomes a background concern, not a serving prerequisite."""
    import pyarrow.parquet as pq_

    from invertedindexbuilder_ray.pipelines.merge import merge_indexes

    tbl = webpages_medium
    for name, sl in [("base", tbl.slice(0, 700)), ("new", tbl.slice(700))]:
        d = tmp_path / name
        d.mkdir()
        pq_.write_table(sl, d / "w.parquet", row_group_size=100)
    base_idx, delta_idx = str(tmp_path / "ib"), str(tmp_path / "id")
    build_index(load_webpages(str(tmp_path / "base")), base_idx, num_partitions=4)
    build_index(load_webpages(str(tmp_path / "new")), delta_idx, num_partitions=4)

    live = ShardedEngine([base_idx, delta_idx], conformance=False)
    compacted = str(tmp_path / "im")
    merge_indexes([base_idx, delta_idx], compacted)
    mono = QueryEngine(compacted, conformance=False)
    for q in ["the data", "data join merge", "vector"]:
        got = live.search(q, 10, DISJUNCTIVE)
        want = [(h["doc_id"], h["score"]) for h in mono.search(q, 10, DISJUNCTIVE)]
        assert _canon(got) == _canon(want), q
        got_and = live.search(q, 10, CONJUNCTIVE)
        want_and = mono.conjunctive(mono.parse_query(q), 10)
        assert _canon(got_and) == _canon(want_and), q
