"""Positional index tier: position assignment, phrase adjacency, proximity.

The catalog entries are hash-checked vs DuckDB by the driver-simulation
gate; these tests pin the SEMANTICS the SQL can't express as directly —
positions counted over all runs (dropped tokens occupy ordinals), phrase
non-matches across dropped tokens, multi-term chains, window edges.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindexbuilder_ray.functions.tokenize import tokenize_with_positions
from invertedindexbuilder_ray.pipelines.positional import (
    phrase_match,
    positional_postings,
    proximity_match,
)


def _oracle_positions(text: str) -> list[tuple[str, int]]:
    toks = re.findall("[a-z0-9]+", text.lower())
    # \Z, not $: Python's $ also matches before a trailing newline, but the
    # engine (and DuckDB's RE2 $) drop the last token only when the text
    # truly ends mid-run.
    if re.search(r"[A-Za-z0-9]\Z", text):
        toks = toks[:-1]
    return [(w, i + 1) for i, w in enumerate(toks) if 1 <= len(w) <= 15]


_CHARS = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    + list("  ..@-_%+:/!?\n\t")
)


@settings(max_examples=50, deadline=None)
@given(texts=st.lists(st.text(alphabet=_CHARS, max_size=120), min_size=1, max_size=8))
def test_positions_match_regex_oracle(texts):
    terms, docs, pos = tokenize_with_positions(
        pa.array(texts, pa.string()), np.arange(len(texts))
    )
    got: dict[int, list[tuple[str, int]]] = {}
    for t, d, p in zip(terms.to_pylist(), docs, pos):
        got.setdefault(int(d), []).append((t, int(p)))
    for i, text in enumerate(texts):
        assert got.get(i, []) == _oracle_positions(text), (i, text)


def _docs_ds(texts: list[str]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _rows(ds) -> dict[int, int]:
    df = ds.to_pandas()
    if len(df) == 0:
        return {}
    return dict(zip(df["doc_id"].astype(int), df[df.columns[1]].astype(int)))


def test_phrase_adjacency_and_counts(ray_session):
    ds = _docs_ds(
        [
            "big data join now ",          # one occurrence
            "data join data join x ",      # two occurrences
            "data x join ",                # not adjacent
            "join data ",                  # wrong order
            "data join",                   # trailing token dropped (Q1): no match
        ]
    )
    got = _rows(phrase_match(ds, ["data", "join"]))
    assert got == {0: 1, 1: 2}


def test_phrase_does_not_match_across_dropped_token(ray_session):
    # the 16-char token is dropped by Q2 but still OCCUPIES a position,
    # so "data join" must not match around it
    long = "x" * 16
    ds = _docs_ds([f"data {long} join end ", "data join end "])
    got = _rows(phrase_match(ds, ["data", "join"]))
    assert got == {1: 1}


def test_phrase_three_terms(ray_session):
    ds = _docs_ds(
        [
            "a b c tail ",
            "a b x c tail ",
            "z a b c a b c tail ",
        ]
    )
    got = _rows(phrase_match(ds, ["a", "b", "c"]))
    assert got == {0: 1, 2: 2}


def test_phrase_first_position_edge(ray_session):
    # phrase starting at position 1, and a phrase term AT position 1 that
    # would underflow the key shift if not masked
    ds = _docs_ds(["b a tail ", "a b tail "])
    got = _rows(phrase_match(ds, ["a", "b"]))
    assert got == {1: 1}


def test_phrase_empty_raises():
    with pytest.raises(ValueError):
        phrase_match(_docs_ds(["x "]), [])


def test_proximity_window_edges(ray_session):
    # positions: q=1; a at 2 (dist 1), 6 (dist 5), 7 (dist 6, outside w=5)
    ds = _docs_ds(["q a x x x a a end "])
    got = _rows(proximity_match(ds, "q", "a", 5))
    assert got == {0: 2}
    # unordered: b before a counts too
    ds2 = _docs_ds(["a x q end "])
    assert _rows(proximity_match(ds2, "q", "a", 5)) == {0: 1}


def test_proximity_counts_pairs_not_docs(ray_session):
    ds = _docs_ds(["a q a q end "])  # pairs within w=2: (1,2)(1,4)? dist 3 >2 -> no
    # a at 1,3; q at 2,4. |1-2|=1, |1-4|=3, |3-2|=1, |3-4|=1 -> 3 pairs at w=2
    assert _rows(proximity_match(ds, "a", "q", 2)) == {0: 3}


def test_proximity_bad_window():
    with pytest.raises(ValueError):
        proximity_match(_docs_ds(["x "]), "a", "b", 0)


def test_positional_postings_shape(ray_session):
    ds = _docs_ds(["w v w v w end ", ""])
    df = positional_postings(ds).to_pandas().set_index("term")
    assert df.loc["w", "tf"] == 3
    assert df.loc["w", "first_pos"] == 1
    assert df.loc["w", "last_pos"] == 5
    assert df.loc["v", "tf"] == 2
    assert df.loc["v", "first_pos"] == 2
    assert df.loc["v", "last_pos"] == 4
