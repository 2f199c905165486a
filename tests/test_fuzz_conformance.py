"""Randomized + adversarial corpora: engine vs oracle conformance fuzzing."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from invertedindexbuilder_ray import oracle
from invertedindexbuilder_ray.corpus import WEBPAGES_SCHEMA
from invertedindexbuilder_ray.pipelines.build import build_index
from invertedindexbuilder_ray.pipelines.query import QueryEngine
from invertedindexbuilder_ray.sources.webpages import load_webpages
from invertedindexbuilder_ray.state.reader import IndexReader


def _rows_to_table(rows: list[dict]) -> pa.Table:
    import datetime

    base = datetime.datetime(2025, 1, 1)
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([base] * len(rows), pa.timestamp("us")),
            "html": pa.array([b""] * len(rows), pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        },
        schema=WEBPAGES_SCHEMA,
    )


def _random_rows(seed: int, n: int) -> list[dict]:
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(30)] + ["Q", "zz9", "abcdefghijklmno"]
    rows = []
    for i in range(n):
        scheme = "ftp" if rng.random() < 0.2 else "http"
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        text = " ".join(words) + rng.choice(["", ".", " "])
        rows.append({"url": f"{scheme}://s{i}.com/{i}", "text": text})
    return rows


ADVERSARIAL = [
    # all docs filtered (no 'h' urls)
    [{"url": "ftp://a", "text": "hello world."}, {"url": "zzz://b", "text": "x y."}],
    # single doc, single token
    [{"url": "http://a", "text": "one."}],
    # only overlong / trailing-dropped tokens -> empty index, docs exist
    [{"url": "http://a", "text": "abcdefghijklmnopq stillgoingmorechars tail"}],
    # empty texts
    [{"url": "http://a", "text": ""}, {"url": "http://b", "text": "  \n\t "}],
    # identical docs (duplicate postings paths)
    [{"url": "http://a", "text": "dup dup dup."}] * 5,
]


@pytest.mark.parametrize("case", range(len(ADVERSARIAL)))
def test_adversarial_corpora(ray_session, tmp_path, case):
    rows = ADVERSARIAL[case]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(_rows_to_table(rows), src / "a.parquet")
    out = tmp_path / "idx"
    build_index(load_webpages(str(src)), str(out), num_partitions=2)
    ora = oracle.build_index(rows)
    r = IndexReader(str(out))
    assert r.n_docs == ora.n_docs
    assert set(r.lexicon) == set(ora.postings)
    eng = QueryEngine(str(out))
    for q in ["hello", "one", "dup", "tail", "missing", ""]:
        terms = eng.parse_query(q)
        got = eng.conjunctive(terms, 5)
        want = oracle.conjunctive_topk(ora, terms, 5)
        assert [d for d, _ in got] == [d for d, _ in want], (case, q)
        got_o = eng.disjunctive(terms, 5)
        want_o = oracle.disjunctive_topk(ora, terms, 5)
        assert [d for d, _ in got_o] == [d for d, _ in want_o], (case, q)


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_random_corpora_conformance(ray_session, tmp_path, seed):
    rows = _random_rows(seed, 60)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(_rows_to_table(rows), src / "a.parquet", row_group_size=17)
    out = tmp_path / "idx"
    build_index(load_webpages(str(src)), str(out), num_partitions=3)
    ora = oracle.build_index(rows)
    r = IndexReader(str(out))
    assert set(r.lexicon) == set(ora.postings)
    for term, plist in ora.postings.items():
        docs, tfs = r.open_list(term).decode_all_remaining()
        assert list(zip(docs.tolist(), tfs.tolist())) == plist, (seed, term)
    eng = QueryEngine(str(out))
    rng = random.Random(seed)
    vocab = list(ora.postings) + ["notthere"]
    for _ in range(15):
        terms = [rng.choice(vocab) for _ in range(rng.randint(1, 4))]
        k = rng.choice([1, 3, 10])
        got = eng.conjunctive(terms, k)
        want = oracle.conjunctive_topk(ora, terms, k)
        assert [d for d, _ in got] == [d for d, _ in want], (seed, terms)
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-9
        )
        got_o = eng.wand(terms, k)
        want_o = oracle.disjunctive_topk(ora, terms, k)
        assert [d for d, _ in got_o] == [d for d, _ in want_o], (seed, terms)
        neg = [rng.choice(vocab) for _ in range(rng.randint(0, 2))]
        got_n = eng.and_not(terms, neg, k)
        want_n = oracle.and_not_topk(ora, terms, neg, k)
        assert [d for d, _ in got_n] == [d for d, _ in want_n], (seed, terms, neg)
        np.testing.assert_allclose(
            [s for _, s in got_n], [s for _, s in want_n], rtol=1e-9
        )
        # identity: empty exclusion == correct-mode conjunction
        got_c = eng.and_not(terms, [], k)
        want_c = oracle.conjunctive_topk(ora, terms, k, mode="correct")
        assert [d for d, _ in got_c] == [d for d, _ in want_c], (seed, terms)
