"""strsim: the closed-form distance-≤1 classifier vs reference DP, and
the FastSS blocking recall property."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindexbuilder_ray.pipelines.strsim import (
    NAME_LEN, _pad16, dist_le1,
)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


_S = st.text(
    alphabet=st.sampled_from(list("abcz .")), min_size=0, max_size=NAME_LEN
)


@given(st.lists(st.tuples(_S, _S), min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_dist_le1_matches_dp(pairs):
    A, la = _pad16([p[0] for p in pairs])
    B, lb = _pad16([p[1] for p in pairs])
    got = dist_le1(A, la, B, lb)
    for (a, b), g in zip(pairs, got):
        ref = _lev(a, b)
        if ref <= 1:
            assert g == ref, (a, b)
        else:
            assert g == 99, (a, b)


@given(st.tuples(_S, _S))
@settings(max_examples=200, deadline=None)
def test_deletion_blocking_recall(pair):
    """dist(s,t) ≤ 1 ⇒ the deletion neighborhoods intersect (the FastSS
    guarantee edit1_pairs' candidate generation relies on)."""
    s, t = pair
    if _lev(s, t) > 1:
        return
    ds = {s} | {s[:i] + s[i + 1:] for i in range(len(s))}
    dt = {t} | {t[:i] + t[i + 1:] for i in range(len(t))}
    assert ds & dt


def test_soundex_textbook_values():
    from invertedindexbuilder_ray.pipelines.strsim import _soundex_one

    assert _soundex_one("Robert") == "R163"
    assert _soundex_one("Rupert") == "R163"
    assert _soundex_one("Tymczak") == "T522"
    assert _soundex_one("Pfister") == "P236"
    assert _soundex_one("Ashcraft") == "A226"  # simplified: no H/W bridge
    assert _soundex_one("") == ""
    assert _soundex_one("123 .!") == ""
    assert _soundex_one("a") == "A000"
