"""Documents-table adapter: ``documents.parquet`` -> (doc_id, url, text, dl).

The sf testdata ``documents`` table carries its own ``doc_id``; there is
no URL, so quirk Q4 (the 'h'-prefix doc filter) does not apply and the
BM25 document length is just the text byte length.  ``url`` is a
synthetic ``doc:<id>`` string so the query layer's result shape matches
the webpages pipeline.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _adapt(batch: pa.Table) -> pa.Table:
    dl = pc.cast(pc.binary_length(pc.cast(batch["text"], pa.binary())), pa.int64())
    url = pc.binary_join_element_wise(
        pa.array(["doc:"] * batch.num_rows, pa.string()),
        pc.cast(batch["doc_id"], pa.string()),
        "",
    )
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "url": url,
            "text": pc.cast(batch["text"], pa.string()),
            "dl": dl,
        }
    )


TARGET_BLOCK_BYTES = 32 << 20
HEAVY_BLOCK_BYTES = 2 << 20


def load_documents(
    path: str,
    *,
    num_blocks: int | None = None,
    target_bytes: int = TARGET_BLOCK_BYTES,
    min_blocks: int = 4,
) -> rd.Dataset:
    """``path`` is a documents.parquet file or an sf directory containing one.

    Block count is sized to the DATA, not the CPU count: Ray's default
    splits a small file into num_cpus blocks, and every downstream
    groupby/sort pays a fixed per-block shuffle cost (measured 2x on 64
    vs 8 blocks for the same 5000 rows).  Scan-light pipelines use the
    32 MB default; compute-heavy stages (sketches) pass
    ``target_bytes=HEAVY_BLOCK_BYTES`` so a mid-size corpus still fans
    out across the cluster (43 MB at the default = 2 blocks = 2 busy
    cores for a minhash pass)."""
    if os.path.isdir(path):
        path = os.path.join(path, "documents.parquet")
    if num_blocks is None:
        try:
            sz = os.path.getsize(path)
        except OSError:
            sz = 0
        num_blocks = int(min(2048, max(min_blocks, -(-sz // target_bytes))))
    ds = rd.read_parquet(
        path, columns=["doc_id", "text"], override_num_blocks=num_blocks
    )
    return ds.map_batches(_adapt, batch_format="pyarrow", zero_copy_batch=True)


def load_documents_jsonl(
    path: str,
    *,
    id_field: str = "id",
    text_field: str = "text",
    url_field: str | None = "url",
    target_bytes: int = TARGET_BLOCK_BYTES,
) -> rd.Dataset:
    """JSON-lines corpus source — the de-facto webtext interchange format
    (one JSON object per line).  Produces the same (doc_id, url, text,
    dl) schema as :func:`load_documents`, so every downstream pipeline
    (index build, dedup, curation) runs unchanged on .jsonl input.

    ``doc_id`` comes from ``id_field`` when present (must be integral);
    otherwise records are numbered by a deterministic parallel prepass:
    per-file line counts give each file a stable offset, identical at
    any parallelism (the same recipe as the webpages reader's kept-count
    prepass).  ``url`` falls back to ``jsonl:<doc_id>``.  Reads stream
    through ``ray.data.read_json`` (Arrow JSON under the hood) — blocks
    are sized to the data like the parquet path."""
    import glob as _glob

    import numpy as np

    paths = sorted(_glob.glob(os.path.join(path, "*.jsonl"))) if os.path.isdir(path) else [path]
    if not paths:
        raise FileNotFoundError(f"no .jsonl files under {path!r}")
    total = sum(os.path.getsize(p) for p in paths)
    num_blocks = int(min(2048, max(4, -(-total // target_bytes))))
    ds = rd.read_json(paths, override_num_blocks=num_blocks)
    cols = set(ds.schema().names)
    if text_field not in cols:
        raise ValueError(f"jsonl records lack the {text_field!r} field")
    has_id = id_field in cols
    has_url = url_field is not None and url_field in cols

    if not has_id:
        # deterministic numbering: per-file record counts -> base offsets
        import pyarrow.json as pj

        offsets = {}
        base = 0
        for p in paths:
            n = pj.read_json(p).num_rows if os.path.getsize(p) else 0
            offsets[p] = base
            base += n
        # re-read per file as ONE block so the offset closure sees the
        # whole file (several batches would each restart at the offset);
        # id-less numbering therefore serializes within a file — corpora
        # that want full parallelism should carry their own id field
        parts = []
        for p in paths:
            sub = rd.read_json([p], override_num_blocks=1)

            def number(t: pa.Table, _off=offsets[p]) -> pa.Table:
                n = t.num_rows
                ids = pa.array(range(_off, _off + n), pa.int64())
                return t.append_column("__doc_id", ids)

            parts.append(
                sub.map_batches(number, batch_format="pyarrow", batch_size=None)
            )
        ds = parts[0]
        for sub in parts[1:]:
            ds = ds.union(sub)

    def adapt(t: pa.Table) -> pa.Table:
        if has_id:
            ids = pc.cast(t[id_field], pa.int64())
        else:
            ids = t["__doc_id"]
        text = pc.cast(t[text_field], pa.string())
        if has_url:
            url = pc.cast(t[url_field], pa.string())
        else:
            url = pc.binary_join_element_wise(
                pa.array(["jsonl:"] * t.num_rows, pa.string()),
                pc.cast(ids, pa.string()),
                "",
            )
        dl = pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64())
        return pa.table({"doc_id": ids, "url": url, "text": text, "dl": dl})

    return ds.map_batches(adapt, batch_format="pyarrow", zero_copy_batch=True)
