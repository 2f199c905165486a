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
