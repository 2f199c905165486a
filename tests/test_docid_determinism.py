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
