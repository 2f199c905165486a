"""Winnowing property tests (Schleimer et al. 2003 guarantees).

The SQL parity leg lives in test_catalog_vs_duckdb / test_curation_fuzz;
here we assert the algorithmic contract the parity tests can't see:
the shared-substring detection guarantee and the selection density.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindexbuilder_ray.pipelines.curation import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints_ds,
)


def _docs_table(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    p = str(tmp_path / "documents.parquet")
    pq.write_table(tbl, p)
    return p


def test_shared_run_guarantee(ray_session, tmp_path):
    """Any shared run of >= W + K - 1 tokens must share a fingerprint."""
    rng = np.random.RandomState(11)
    shared = " ".join(f"sh{c}" for c in rng.randint(0, 50, WINNOW_W + WINNOW_K - 1))
    a = " ".join(f"a{c}" for c in rng.randint(0, 99, 30)) + " " + shared
    b = shared + " " + " ".join(f"b{c}" for c in rng.randint(0, 99, 30))
    df = winnow_fingerprints_ds(_docs_table(tmp_path, [a, b])).to_pandas()
    fa = set(df[df.doc_id == 0].fp)
    fb = set(df[df.doc_id == 1].fp)
    assert fa & fb, "winnowing guarantee violated: no shared fingerprint"


def test_every_long_doc_fingerprinted(ray_session, tmp_path):
    texts = [
        " ".join(f"w{i * 7 + j}" for j in range(WINNOW_W + WINNOW_K + 2))
        for i in range(8)
    ]
    df = winnow_fingerprints_ds(_docs_table(tmp_path, texts)).to_pandas()
    assert set(df.doc_id) == set(range(8))
    # density: winnowing selects ~2/(w+1) of shingles, never all of them
    # (each doc here has w+3 shingles; selecting every one would mean the
    # window rule degenerated)
    per_doc = df.groupby("doc_id").size()
    assert (per_doc >= 1).all() and (per_doc <= WINNOW_W + 3).all()


@settings(deadline=None, max_examples=20)
@given(st.lists(st.integers(0, 6), min_size=WINNOW_K, max_size=60))
def test_matches_reference_quadratic(tokens):
    """Engine selection == a direct per-window scan on one synthetic doc."""
    from invertedindexbuilder_ray.functions.sketch import shingle_hashes

    text = " ".join(f"t{c}" for c in tokens)
    arr = pa.array([text], pa.string())
    sh, _row, _bounds = shingle_hashes(arr, WINNOW_K)
    fp = sh % np.uint64((1 << 61) - 1)
    n, w = len(fp), WINNOW_W
    want = set()
    for s in range(max(n - w + 1, 0)):
        win = fp[s : s + w]
        m = win.min()
        p = s + max(np.flatnonzero(win == m))
        want.add((p + 1, int(fp[p])))
    if n >= w:
        V = np.lib.stride_tricks.sliding_window_view(fp, w)
        j = V[:, ::-1].argmin(axis=1)
        sel = np.unique(np.arange(n - w + 1) + (w - 1 - j))
        got = {(int(p) + 1, int(fp[p])) for p in sel}
    else:
        got = set()
    assert got == want
