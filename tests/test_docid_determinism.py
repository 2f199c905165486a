"""Doc-id assignment must be bit-stable across runs, file orders, and
parallelism — rank identity depends on it (SURVEY.md §7.5)."""

from __future__ import annotations

import pyarrow.parquet as pq

from invertedindexbuilder_ray.sources.webpages import (
    load_webpages,
    plan_doc_ids,
    resolve_paths,
)


def test_plan_is_deterministic_and_order_independent(ray_session, webpages_small, tmp_path):
    src = tmp_path / "wp"
    src.mkdir()
    t = webpages_small
    pq.write_table(t.slice(0, 40), src / "b.parquet", row_group_size=13)
    pq.write_table(t.slice(40), src / "a.parquet", row_group_size=17)

    p1 = plan_doc_ids(resolve_paths(str(src)))
    p2 = plan_doc_ids(resolve_paths(str(src)))
    assert [(p.path, p.row_group, p.doc_id_base) for p in p1] == [
        (p.path, p.row_group, p.doc_id_base) for p in p2
    ]
    # resolve_paths sorts, so listing order never leaks into ids
    p3 = plan_doc_ids(resolve_paths([str(src / "b.parquet"), str(src / "a.parquet")]))
    assert [(p.path, p.doc_id_base) for p in p3] == [(p.path, p.doc_id_base) for p in p1]

    rows = sorted(
        (r["doc_id"], r["url"]) for r in load_webpages(str(src)).take_all()
    )
    ids = [d for d, _ in rows]
    assert ids == list(range(len(ids)))  # dense, gapless
    # ids follow sorted-file input order: every kept url of a.parquet precedes b's
    kept_a = [u for u in t.slice(40)["url"].to_pylist() if u.startswith("h")]
    assert rows[0][1] == kept_a[0]


def test_plan_cache_hits_and_invalidates(ray_session, tmp_path):
    """The kept-count plan cache must hit for identical input and miss when
    the file changes at the same path (size/mtime keyed)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from invertedindexbuilder_ray.sources import webpages as wp

    p = tmp_path / "w.parquet"
    t1 = pa.table({"url": ["ha", "xb", "hc"], "text": ["one", "two", "three"]})
    pq.write_table(t1, p, row_group_size=2)
    plans1 = wp.plan_doc_ids_for(wp.list_row_groups([str(p)]))
    cache = wp._plan_cache_path(wp.list_row_groups([str(p)]))
    assert os.path.exists(cache)
    # second call: cache hit produces the same bases
    plans2 = wp.plan_doc_ids_for(wp.list_row_groups([str(p)]))
    assert [x.doc_id_base for x in plans1] == [x.doc_id_base for x in plans2]
    # rewrite the file with different kept rows -> different cache key
    time.sleep(1.1)  # mtime granularity
    t2 = pa.table({"url": ["ha", "hb", "hc"], "text": ["one", "two", "three"]})
    pq.write_table(t2, p, row_group_size=2)
    plans3 = wp.plan_doc_ids_for(wp.list_row_groups([str(p)]))
    assert plans3[-1].doc_id_base == 2  # 2 kept in first row group now
    assert wp._plan_cache_path(wp.list_row_groups([str(p)])) != cache
