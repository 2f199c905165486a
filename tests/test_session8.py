"""Session-8 regression tests: the _span_hashes >16-byte guard (it used
to spin ~2^64 pad iterations silently) and multi-batch exactness of the
shared top-df derivation used by percolate / ndcg_eval / prf_expand."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def test_span_hashes_raises_past_16_bytes():
    from invertedindexbuilder_ray.functions.tokenize import _span_hashes

    data = np.frombuffer(b"x" * 64, np.uint8).copy()
    starts = np.array([0], np.int64)
    with pytest.raises(ValueError, match="span length"):
        _span_hashes(data, starts, np.array([17], np.int64))
    # 16 exactly is the supported maximum
    h1, h2 = _span_hashes(data, starts, np.array([16], np.int64))
    assert len(h1) == 1 and len(h2) == 1


def test_top_df_terms_exact_across_batches(ray_session):
    """The per-shard top-k -> driver top-k merge must equal brute force
    even when a term's df accumulates across MANY batches (ties broken
    (df desc, term asc))."""
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.ranking import _top_df_terms

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for i in range(300):
        words = rng.choice(vocab, size=rng.integers(1, 12)).tolist()
        texts.append(" ".join(words) + ".")
        ids.append(i)
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "text": pa.array(texts, pa.string()),
         "lang": pa.array(["en"] * len(ids)),
         "source": pa.array(["s"] * len(ids)),
         "n_chars": pa.array([len(t) for t in texts], pa.int64())}
    )
    # many small blocks: terms repeat across batches
    ds = rd.from_arrow(tbl).repartition(16)
    got = _top_df_terms(ds, 8)

    df = Counter()
    for i, t in enumerate(texts):
        toks = {w for w in re.findall(r"[a-z0-9]+", t.lower())
                if len(w) <= 15}
        for w in toks:
            df[w] += 1
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    assert got == want
