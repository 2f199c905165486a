"""Document-partitioned scatter-gather querying must be EXACTLY the
total-order top-k — (score desc, doc_id asc) — of the whole corpus, with
scores bit-identical to the monolithic engine (global-stats injection,
pipelines/shards.py).  The reference heap's equal-score tie membership is
insertion-history-dependent and provably not distributable (see the
counterexample test), so sharded semantics are DEFINED as the total order."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from invertedindexbuilder_ray.pipelines.build import build_index
from invertedindexbuilder_ray.pipelines.query import (
    CONJUNCTIVE,
    DISJUNCTIVE,
    QueryEngine,
    _total_topk,
)
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


def _mono_truth(mono: QueryEngine, terms, k, mode):
    """Ground truth: total-order top-k over the monolithic FULL ranking
    (k = corpus size, so the quirk heap keeps every match)."""
    k_all = mono.reader.max_doc_id + 1
    if mode == CONJUNCTIVE:
        full = mono.conjunctive(terms, k_all)
    else:
        full = mono.disjunctive(terms, k_all)
    return _total_topk([d for d, _ in full], [s for _, s in full], k)


@pytest.mark.parametrize("mode", [CONJUNCTIVE, DISJUNCTIVE])
@pytest.mark.parametrize("conformance", [False, True])
def test_sharded_is_exact_total_order_topk(sharded_setup, mode, conformance):
    shard_dirs, full = sharded_setup
    mono = QueryEngine(full, conformance=conformance)
    sharded = ShardedEngine(shard_dirs, conformance=conformance)
    for q in QUERIES:
        for k in (3, 10, 50):
            terms = mono.parse_query(q)
            want = _mono_truth(mono, terms, k, mode)
            got = sharded.search_terms(terms, k, mode)
            assert got == want, (q, k, mode, conformance)


def test_sharded_single_shard_degenerates_to_mono(sharded_setup):
    shard_dirs, full = sharded_setup
    mono = QueryEngine(full, conformance=False)
    one = ShardedEngine([full], conformance=False)
    terms = mono.parse_query("data join")
    got = one.search_terms(terms, 10, CONJUNCTIVE)
    assert got == _mono_truth(mono, terms, 10, CONJUNCTIVE)


def test_total_order_engine_same_members_as_heap(sharded_setup):
    """A monolithic engine in total-order mode returns the same SCORE
    multiset as the quirk-heap engine (tie membership may differ)."""
    _, full = sharded_setup
    heap_eng = QueryEngine(full, conformance=False)
    tot_eng = QueryEngine(full, conformance=False, total_order_topk=True)
    for q in QUERIES:
        terms = heap_eng.parse_query(q)
        a = heap_eng.disjunctive(terms, 10)
        b = tot_eng.disjunctive(terms, 10)
        assert sorted(round(s, 9) for _, s in a) == sorted(
            round(s, 9) for _, s in b
        ), q


def test_ref_heap_ties_are_not_distributable():
    """The documented counterexample: with k+1 boundary ties split across
    shards, the quirk heap's surviving tie member depends on the full
    insertion history — per-shard top-k replay picks a DIFFERENT member.
    This is why sharded serving defines total-order semantics instead."""
    from invertedindexbuilder_ray.oracle import (
        _RefHeap,
        _out_rank_heap,
        _to_rank_heap,
    )

    def heap_topk(cands, k):
        hp = _RefHeap()
        for d, s in sorted(cands):
            _to_rank_heap(hp, d, s, k)
        return _out_rank_heap(hp)

    shard_a = [(1, 5.0), (2, 5.0), (3, 5.0), (4, 7.0)]
    shard_b = [(5, 6.0)]
    k = 3
    mono = heap_topk(shard_a + shard_b, k)
    merged = heap_topk(heap_topk(shard_a, k) + heap_topk(shard_b, k), k)
    assert {d for d, _ in mono} != {d for d, _ in merged}  # the divergence

    # total order decomposes exactly on the same input
    def tot(cands, k):
        return _total_topk([d for d, _ in cands], [s for _, s in cands], k)

    assert tot(shard_a + shard_b, k) == tot(tot(shard_a, k) + tot(shard_b, k), k)


def test_cli_sharded_query(sharded_setup, capsys):
    from invertedindexbuilder_ray.cli import main

    shard_dirs, full = sharded_setup
    assert main(["query", "--shards", *shard_dirs, "--terms", "data join",
                 "--k", "3", "--mode", "and"]) == 0
    out = capsys.readouterr().out
    assert "BM25:" in out and "[1]" in out

    with pytest.raises(SystemExit, match="--index or --shards"):
        main(["query", "--terms", "x"])
    # --algorithm wand opts the shards into block-max WAND (identical output)
    assert main(["query", "--shards", *shard_dirs, "--terms", "data join",
                 "--k", "3", "--mode", "or", "--algorithm", "wand"]) == 0
    wand_out = capsys.readouterr().out
    assert main(["query", "--shards", *shard_dirs, "--terms", "data join",
                 "--k", "3", "--mode", "or"]) == 0
    assert capsys.readouterr().out == wand_out


def test_sharded_identity_fuzz(sharded_setup):
    """Random query mixes over the corpus vocabulary, both modes, boundary
    k values — exact total-order identity must hold for every one."""
    import numpy as np

    shard_dirs, full = sharded_setup
    mono = QueryEngine(full, conformance=False)
    sharded = ShardedEngine(shard_dirs, conformance=False)
    vocab = sorted(mono.reader.lexicon)[:200]
    rng = np.random.RandomState(5)
    for trial in range(25):
        n_terms = int(rng.randint(1, 5))
        terms = [vocab[i] for i in rng.randint(0, len(vocab), n_terms)]
        k = int(rng.choice([1, 2, 7, 100]))
        mode = int(rng.randint(0, 2))
        got = sharded.search_terms(terms, k, mode)
        assert got == _mono_truth(mono, terms, k, mode), (terms, k, mode)


def test_total_order_wand_identical_to_disjunctive(sharded_setup):
    """Round-4: WAND under total_order_topk (the sharded serving path)
    must return EXACTLY the total-order disjunctive result — including
    score ties resolved by doc id (skip condition is strict < theta)."""
    import numpy as np

    _, full = sharded_setup
    eng = QueryEngine(full, conformance=False, total_order_topk=True)
    vocab = sorted(eng.reader.lexicon)[:200]
    rng = np.random.RandomState(17)
    for q in QUERIES:
        terms = eng.parse_query(q)
        for k in (1, 3, 10, 50):
            assert eng.wand(terms, k) == eng.disjunctive(terms, k), (q, k)
    for _ in range(25):
        n_terms = int(rng.randint(1, 6))
        terms = [vocab[i] for i in rng.randint(0, len(vocab), n_terms)]
        k = int(rng.choice([1, 2, 7, 100]))
        assert eng.wand(terms, k) == eng.disjunctive(terms, k), (terms, k)


def test_sharded_wand_bound_rescale_fuzz(sharded_setup):
    """Round-4: sharded disjunctive can run block-max WAND (opt-in,
    ``algorithm="wand"``) with bounds rescaled to the injected global
    triple — identity with the monolithic total-order truth must survive
    a dedicated OR-heavy fuzz (uneven shards make local d_avr/idf differ
    from global, exercising every branch of _set_bound_scale).  The
    default exhaustive path is fuzzed side by side: both algorithms must
    produce the identical result."""
    import numpy as np

    shard_dirs, full = sharded_setup
    mono = QueryEngine(full, conformance=False)
    sharded = ShardedEngine(shard_dirs, conformance=False)
    vocab = sorted(mono.reader.lexicon)
    rng = np.random.RandomState(23)
    for _ in range(40):
        n_terms = int(rng.randint(1, 7))
        terms = [vocab[i] for i in rng.randint(0, len(vocab), n_terms)]
        k = int(rng.choice([1, 3, 10, 100]))
        truth = _mono_truth(mono, terms, k, DISJUNCTIVE)
        got_wand = sharded.search_terms(terms, k, DISJUNCTIVE, algorithm="wand")
        assert got_wand == truth, (terms, k)
        got_default = sharded.search_terms(terms, k, DISJUNCTIVE)
        assert got_default == truth, (terms, k)


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
        terms = mono.parse_query(q)
        for mode in (CONJUNCTIVE, DISJUNCTIVE):
            got = live.search_terms(terms, 10, mode)
            assert got == _mono_truth(mono, terms, 10, mode), (q, mode)


def test_sharded_respects_per_shard_tombstones(sharded_setup, tmp_path):
    """Query-time tombstones (merge.mark_deleted) compose with the sharded
    tier: each shard's reader loads its own tombstones.bin (LOCAL doc ids)
    while the injected global stats triple — n_docs / d_avr from the
    manifests, df from the lexicons — is untouched by marking, so the
    sharded result is exactly the tombstone-filtered monolithic total-order
    ranking at the UNCHANGED pre-delete scores."""
    import shutil

    from invertedindexbuilder_ray.pipelines.merge import mark_deleted
    from invertedindexbuilder_ray.state.manifest import IndexManifest

    shard_dirs, full = sharded_setup
    copies, offsets, off = [], [], 0
    for i, d in enumerate(shard_dirs):
        c = str(tmp_path / f"tomb{i}")
        shutil.copytree(d, c)
        copies.append(c)
        offsets.append(off)
        off += IndexManifest.load(d).max_doc_id
    # per-shard LOCAL tombstones: every 5th doc of shard 0, 7th of shard 1
    # (bounded by each shard's max_doc_id — mark_deleted rejects ids
    # outside the shard's own [0, max_doc_id) domain since round 5)
    local_dead = {
        0: list(range(0, min(400, IndexManifest.load(copies[0]).max_doc_id), 5)),
        1: list(range(0, min(300, IndexManifest.load(copies[1]).max_doc_id), 7)),
    }
    dead_global = set()
    for si, ids in local_dead.items():
        mark_deleted(copies[si], ids)
        dead_global |= {d + offsets[si] for d in ids}

    mono = QueryEngine(full, conformance=False)
    sharded = ShardedEngine(copies, conformance=False)
    for q in QUERIES:
        terms = mono.parse_query(q)
        for mode in (CONJUNCTIVE, DISJUNCTIVE):
            # filtered monolithic truth: full live ranking minus dead ids
            k_all = mono.reader.max_doc_id + 1
            full_rank = _mono_truth(mono, terms, k_all, mode)
            want = [(d, s) for d, s in full_rank if d not in dead_global][:10]
            got = sharded.search_terms(terms, 10, mode)
            assert got == want, (q, mode)


def test_sharded_cnf_matches_monolithic(sharded_setup):
    """CNF composes over shards: per-doc group coverage is shard-local and
    scores use the injected global stats, so the scatter-gather result is
    the monolithic total-order CNF top-k exactly — including the case
    where one group has no term at all in some shard."""
    from invertedindexbuilder_ray.pipelines.query import CNF

    shard_dirs, full = sharded_setup
    mono = QueryEngine(full, conformance=False, total_order_topk=True)
    sharded = ShardedEngine(shard_dirs, conformance=False)
    cases = [
        "the data; join merge",
        "vector; the",
        "data; missingzzz",        # unsatisfiable group -> empty
        "the of and; a to in",     # hot ties
    ]
    for q in cases:
        groups = mono.parse_cnf(q)
        k_all = mono.reader.max_doc_id + 1
        full_rank = mono.cnf(groups, k_all)
        want = _total_topk(
            [d for d, _ in full_rank], [s for _, s in full_rank], 10
        )
        got = sharded.search(q, 10, CNF)
        assert got == want, q
