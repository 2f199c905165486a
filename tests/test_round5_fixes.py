"""Round-5 fixes (round-4 VERDICT item 4 + ADVICE items 1-4).

- actor_pool() raises before ray.init instead of silently sizing to 4 CPUs
- facet_counts groups NULL lang/source like the DuckDB oracle (sentinel
  fill/restore around Ray's sort groupby, which crashes on NULL string keys)
- dataset_card's dup_docs agrees with the SQL on NULL-text corpora
- knn_classify's key-domain guard survives python -O (ValueError, not assert)
- mark_deleted rejects doc_ids outside [0, manifest.max_doc_id)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_actor_pool_raises_before_ray_init(monkeypatch):
    import ray

    from invertedindexbuilder_ray.sources.util import actor_pool

    monkeypatch.setattr(ray, "is_initialized", lambda: False)
    monkeypatch.delenv("IIB_ALLOW_PREINIT_ACTOR_POOL", raising=False)
    with pytest.raises(RuntimeError, match="before ray.init"):
        actor_pool()
    # the escape hatch restores the old warn-and-4-CPU sizing
    monkeypatch.setenv("IIB_ALLOW_PREINIT_ACTOR_POOL", "1")
    with pytest.warns(RuntimeWarning, match="before ray.init"):
        assert actor_pool() == (1, 3)


def _null_facet_corpus(tmp_path):
    """sf-style dir whose documents table has NULL lang/source rows."""
    import pyarrow.parquet as pq

    n = 60
    rng = np.random.RandomState(5)
    texts = [
        " ".join(rng.choice(["data", "join", "merge", "spark", "row"], 12))
        for _ in range(n)
    ]
    lang = [None if i % 7 == 0 else ["en", "de"][i % 2] for i in range(n)]
    source = [None if i % 11 == 0 else ["web", "wiki"][i % 2] for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(source, pa.string()),
        }
    )
    d = tmp_path / "sf_nulls"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_facet_counts_null_keys_match_duckdb(ray_session, tmp_path):
    import duckdb

    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    sf = _null_facet_corpus(tmp_path)
    fn, sql = QUERIES["facet_counts"]
    got = (
        fn(sf)
        .to_pandas()
        .sort_values(["source", "lang"], na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(sql)
        .df()
        .sort_values(["source", "lang"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert got["lang"].isna().any() or got["source"].isna().any(), (
        "corpus must actually exercise NULL facet keys"
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_dataset_card_null_text_matches_duckdb(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    n = 40
    texts = [None if i % 5 == 0 else f"data join merge doc{i % 3}" for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["web"] * n, pa.string()),
        }
    )
    d = tmp_path / "sf_nulltext"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    fn, sql = QUERIES["dataset_card"]
    got = fn(str(d)).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(sql).df()
    assert int(got.loc[0, "dup_docs"]) == int(want.loc[0, "dup_docs"])
    assert int(got.loc[0, "dup_docs"]) > 0  # NULLs actually collide as dups


def test_mark_deleted_rejects_out_of_range(ray_session, tmp_path):
    from invertedindexbuilder_ray.pipelines.build import build_index
    from invertedindexbuilder_ray.pipelines.merge import mark_deleted
    from invertedindexbuilder_ray.sources.documents import load_documents
    from invertedindexbuilder_ray.state.manifest import IndexManifest

    idx = str(tmp_path / "idx")
    build_index(
        load_documents("/root/testdata/sf0.001"), idx, num_partitions=2
    )
    max_doc = IndexManifest.load(idx).max_doc_id
    with pytest.raises(ValueError, match="outside"):
        mark_deleted(idx, [0, max_doc])
    with pytest.raises(ValueError, match="outside"):
        mark_deleted(idx, [-1])
    # the failed calls must not have written anything
    import os

    assert not os.path.exists(os.path.join(idx, "tombstones.bin"))
    assert mark_deleted(idx, [0, max_doc - 1]) == 2


def test_gc_ckpt_root(tmp_path, capsys):
    """state/gc: old complete entries and old interrupted writes go; young
    ones stay; dry_run touches nothing; CLI `gc` reports JSON."""
    import json as _json
    import os
    import time

    from invertedindexbuilder_ray.cli import main
    from invertedindexbuilder_ray.state import manifest as mf
    from invertedindexbuilder_ray.state.gc import gc_ckpt_root

    root = tmp_path / "ckpts"
    old_done = root / "aa"
    old_interrupted = root / "bb"
    young = root / "cc"
    for d in (old_done, old_interrupted, young):
        d.mkdir(parents=True)
        (d / "part.parquet").write_bytes(b"x")
    mf.mark_complete(str(old_done))
    mf.mark_complete(str(young))
    stale = time.time() - 10 * 86400
    os.utime(mf.marker_path(str(old_done)), (stale, stale))
    os.utime(old_interrupted, (stale, stale))

    would = gc_ckpt_root(str(root), max_age_days=7, dry_run=True)
    assert sorted(would) == [str(old_done), str(old_interrupted)]
    assert old_done.exists() and old_interrupted.exists()

    assert main(["gc", "--max-age-days", "7", str(root)]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(rep["removed"][str(root)]) == [str(old_done), str(old_interrupted)]
    assert not old_done.exists() and not old_interrupted.exists()
    assert young.exists()
    # nonexistent root is a no-op
    assert gc_ckpt_root(str(tmp_path / "nope")) == []
