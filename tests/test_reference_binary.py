"""Oracle vs patched reference binary (the full conformance chain).

Two legs:

* ``test_oracle_matches_patched_binary`` compiles a patched scratch copy
  of /root/reference (crash defects D1/D2 fixed, sources untouched) and
  checks the oracle reproduces its query output live.  Skipped when no C
  compiler is available.
* ``test_oracle_matches_recorded_goldens`` replays the SAME assertion
  against ``tests/data/reference_binary_goldens.json`` — the binary's
  per-query output recorded by ``tools/validate_oracle_vs_reference.py
  --dump-goldens`` in a gcc-equipped sandbox — so the oracle-vs-binary
  leg runs EVERYWHERE (round-3 verdict item 9).  The goldens carry the
  defect-exclusion sets (D3/D4/D7, SURVEY.md §8) captured at record
  time, since D7's victim set depends on the binary's heap state.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

GOLDENS = Path(__file__).parent / "data" / "reference_binary_goldens.json"


@pytest.mark.skipif(
    shutil.which("gcc") is None or not Path("/root/reference/src").is_dir(),
    reason="needs gcc + the reference sources",
)
def test_oracle_matches_patched_binary():
    res = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent / "tools" / "validate_oracle_vs_reference.py")],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-1000:]
    assert "PASS" in res.stdout


def test_oracle_matches_recorded_goldens():
    from invertedindexbuilder_ray import corpus, oracle

    g = json.loads(GOLDENS.read_text())
    rows = corpus.make_webpages(
        g["corpus"]["n_docs"], seed=g["corpus"]["seed"]
    ).to_pylist()
    ora = oracle.build_index(rows)
    k = g["k"]

    def check(q: str, want: list, mode: str):
        terms = oracle.tokenize(q + " ")
        if mode == "AND":
            got = oracle.conjunctive_topk(ora, terms, k, mode="conformance")
        else:
            got = oracle.disjunctive_topk(ora, terms, k)
        got_fmt = [(ora.urls[d], round(s, 6)) for d, s in got]
        assert [u for u, _ in got_fmt] == [u for u, _ in want], (mode, q, got_fmt, want)
        assert all(
            abs(a - b) <= 2e-6 for (_, a), (_, b) in zip(got_fmt, want)
        ), (mode, q, got_fmt, want)

    n = 0
    for q, want in g["conjunctive"].items():
        check(q, [(u, s) for u, s in want], "AND")
        n += 1
    for q, want in g["disjunctive_single"].items():
        check(q, [(u, s) for u, s in want], "OR1")
        n += 1
    assert n >= 12  # the recorded query set is non-trivial
