"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module;
nothing here (or in the library) may call ``ray.init`` / ``ray.shutdown``.

``queries()`` exposes every implemented pipeline from SURVEY.md §2 plus
the training-data operators (dedup / similarity / text analysis /
sampling / joins); ``oracle_sql()`` gives the DuckDB-equivalent SQL for
EVERY entry (same column names; floats rounded half-away-from-zero via
functions/rounding; sketch ops replicated bit-exactly in integer SQL by
pipelines/sketch_sql.py) — no entry falls back to the rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: build the inverted index over the
    documents table, then answer a batch of BM25 queries through the
    actor-pool query stage; returns the top-k result table."""
    import ray.data as rd

    from invertedindexbuilder_ray.pipelines.catalog import index_for
    from invertedindexbuilder_ray.pipelines.query import BatchQueryEngine

    sf_dir = "/root/testdata/sf0.001"
    index_dir = index_for(sf_dir)
    queries_ds = rd.from_items(
        [
            {"query_id": 0, "terms": "data join merge", "mode": 0, "k": 10},
            {"query_id": 1, "terms": "data join merge", "mode": 1, "k": 10},
            {"query_id": 2, "terms": "spark window", "mode": 0, "k": 5},
            {"query_id": 3, "terms": "the vector", "mode": 1, "k": 5},
        ]
    )
    return queries_ds.map_batches(
        BatchQueryEngine,
        fn_constructor_kwargs={"index_dir": index_dir, "conformance": True},
        batch_format="pyarrow",
        concurrency=2,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from invertedindexbuilder_ray.pipelines.catalog import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
