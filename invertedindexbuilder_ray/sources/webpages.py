"""Webpages source: Parquet -> (doc_id, url, text, dl) with deterministic doc_ids.

The reference assigns dense sequential doc_ids in input order, skipping
documents whose first content byte is not ``'h'`` (quirks Q4;
/root/reference/src/main.c:124,271-272).  Those ids are load-bearing for
rank identity (they appear in delta compression and tie order), so they
must be reproduced deterministically under parallel reads.

Strategy (scales to arbitrary input): a cheap metadata + url-column
prepass counts *kept* rows per Parquet row group (embarrassingly
parallel, reads one narrow column); the driver prefix-sums those counts
into per-row-group doc_id bases; the main read then processes row
groups as independent tasks, each assigning ``base + cumsum(kept)``.
No global sort, no ``preserve_order``, no driver-side row loop.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd


@dataclass
class RowGroupPlan:
    path: str
    row_group: int
    n_rows: int
    doc_id_base: int  # filled after the prepass


def _kept_mask(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Quirk Q4: kept iff the url (first content byte) starts with 'h'."""
    return pc.starts_with(pc.coalesce(urls, pa.scalar("")), pattern="h")


def list_row_groups(paths: list[str]) -> list[RowGroupPlan]:
    plans: list[RowGroupPlan] = []
    for path in paths:
        meta = pq.ParquetFile(path).metadata
        for rg in range(meta.num_row_groups):
            plans.append(RowGroupPlan(path, rg, meta.row_group(rg).num_rows, 0))
    return plans


def resolve_paths(path: str | list[str]) -> list[str]:
    if isinstance(path, list):
        return sorted(path)
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return sorted(glob.glob(path)) or [path]


def _count_kept_batch(batch: pa.Table) -> pa.Table:
    counts = []
    for i in range(batch.num_rows):
        path = batch["path"][i].as_py()
        rg = batch["row_group"][i].as_py()
        urls = pq.ParquetFile(path).read_row_group(rg, columns=["url"])["url"]
        counts.append(pc.sum(_kept_mask(urls)).as_py() or 0)
    return pa.table(
        {
            "path": batch["path"],
            "row_group": batch["row_group"],
            "kept": pa.array(counts, pa.int64()),
        }
    )


def plan_doc_ids(paths: list[str]) -> list[RowGroupPlan]:
    """Prepass: per-row-group kept counts (parallel) -> doc_id bases (driver cumsum)."""
    return plan_doc_ids_for(list_row_groups(paths))


def _plan_cache_dir() -> str:
    """Per-user private cache dir (mode 0700): a world-writable shared /tmp
    dir would let any local user pre-seed poisoned kept counts, silently
    shifting every doc_id downstream (ADVICE r2)."""
    d = os.environ.get(
        "IIB_PLAN_CACHE_DIR", f"/tmp/iib_plan_cache_{os.getuid()}"
    )
    os.makedirs(d, mode=0o700, exist_ok=True)
    try:
        os.chmod(d, 0o700)  # pre-existing dir: enforce, don't trust umask
    except OSError:
        pass
    return d


def _plan_cache_path(plans: list[RowGroupPlan]) -> str:
    """Cache key = every (path, size, mtime_ns, row_group) — nanosecond
    mtime so a same-second same-size rewrite cannot hit a stale entry."""
    parts = []
    for p in plans:
        st = os.stat(p.path)
        parts.append(f"{p.path}:{st.st_size}:{st.st_mtime_ns}:{p.row_group}")
    key = hashlib.md5(";".join(parts).encode()).hexdigest()
    return os.path.join(_plan_cache_dir(), f"{key}.json")


def plan_doc_ids_for(
    plans: list[RowGroupPlan], *, use_cache: bool = True
) -> list[RowGroupPlan]:
    """Kept counts are deterministic input metadata, so they are cached on
    disk (footer-cache style): a rebuild/resume of the same input skips the
    whole url-column scan — one fewer fixed cost per job."""
    cache_path = _plan_cache_path(plans) if use_cache else None
    kept: dict[tuple[str, int], int] | None = None
    if cache_path and os.path.exists(cache_path):
        try:
            with open(cache_path) as f:
                kept = {(p, int(rg)): int(k) for p, rg, k in json.load(f)}
        except (OSError, ValueError):
            kept = None
        if kept is not None and any(
            (p.path, p.row_group) not in kept for p in plans
        ):
            kept = None
    if kept is None:
        items = [{"path": p.path, "row_group": p.row_group} for p in plans]
        counts_tbl = (
            rd.from_items(items)
            .map_batches(_count_kept_batch, batch_format="pyarrow")
            .to_pandas()
        )
        kept = {
            (r.path, r.row_group): int(r.kept)
            for r in counts_tbl.itertuples(index=False)
        }
        if cache_path:
            from ..state.manifest import atomic_write_json

            atomic_write_json(
                cache_path, [[p, rg, k] for (p, rg), k in kept.items()]
            )
    base = 0
    for p in plans:
        p.doc_id_base = base
        base += kept[(p.path, p.row_group)]
    return plans


class ReadWebpageRowGroup:
    """Actor-pool stage: row-group descriptor -> (doc_id, url, text, dl) rows.

    Reads only ``url`` and ``text`` (column pruning: the ``html``/``lang``
    ballast never leaves storage).  ``dl`` is the reference BM25 document
    length in bytes: ``len(url) + 1 + len(text)`` (quirk Q5).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            rg = batch["row_group"][i].as_py()
            base = batch["doc_id_base"][i].as_py()
            tbl = pq.ParquetFile(path).read_row_group(rg, columns=["url", "text"])
            keep = _kept_mask(tbl["url"])
            kept_tbl = tbl.filter(keep)
            n = kept_tbl.num_rows
            doc_ids = pa.array(base + np.arange(n, dtype=np.int64), pa.int64())
            url_bytes = pc.binary_length(pc.cast(kept_tbl["url"], pa.binary()))
            text_bytes = pc.binary_length(pc.cast(kept_tbl["text"], pa.binary()))
            dl = pc.add(pc.add(url_bytes, text_bytes), 1)
            out.append(
                pa.table(
                    {
                        "doc_id": doc_ids,
                        "url": kept_tbl["url"],
                        "text": kept_tbl["text"],
                        "dl": pc.cast(dl, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out) if out else pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "dl": pa.array([], pa.int64()),
            }
        )


def prefix_sample(plans: list[RowGroupPlan], fraction: float) -> list[RowGroupPlan]:
    """Reference ``-p`` semantics (src/main.c:244-246): truncate the input to
    the first ``fraction`` of its BYTES — here, whole row groups until the
    cumulative on-disk size reaches the fraction (deterministic prefix,
    never a random sample)."""
    sizes = []
    for p in plans:
        meta = pq.ParquetFile(p.path).metadata
        sizes.append(meta.row_group(p.row_group).total_byte_size)
    total = sum(sizes)
    budget = total * fraction
    out, acc = [], 0
    for p, s in zip(plans, sizes):
        if out and acc + s > budget:
            break
        out.append(p)
        acc += s
    return out


def load_webpages(
    path: str | list[str],
    *,
    concurrency: int | None = None,
    prefix_fraction: float | None = None,
) -> rd.Dataset:
    """Webpages Parquet -> Dataset of (doc_id, url, text, dl), doc_ids deterministic."""
    paths = resolve_paths(path)
    plans = list_row_groups(paths)
    if prefix_fraction is not None:
        plans = prefix_sample(plans, prefix_fraction)
    plans = plan_doc_ids_for(plans)
    items = [
        {"path": p.path, "row_group": p.row_group, "doc_id_base": p.doc_id_base}
        for p in plans
    ]
    ds = rd.from_items(items)
    return ds.map_batches(
        ReadWebpageRowGroup(),
        batch_format="pyarrow",
        batch_size=1,
    )
