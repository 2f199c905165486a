"""Shared read helpers.

``read_parquet_sized`` sizes the block count to the DATA (~32 MB per
block) instead of Ray's CPU-count default: every downstream groupby /
sort / join pays a fixed per-block shuffle cost, so a 3 MB table split
into 64 blocks doubles its shuffle time for nothing.  At real scale the
rule converges to Ray's own target block size; it only changes behavior
for small inputs.
"""

from __future__ import annotations

import os

import ray.data as rd

TARGET_BLOCK_BYTES = 32 << 20


def sized_num_blocks(path: str, *, target: int = TARGET_BLOCK_BYTES) -> int:
    try:
        sz = os.path.getsize(path)
    except OSError:
        sz = 0
    return int(min(2048, max(4, -(-sz // target))))


def read_parquet_sized(
    path: str, *, columns: list[str] | None = None
) -> rd.Dataset:
    return rd.read_parquet(
        path, columns=columns, override_num_blocks=sized_num_blocks(path)
    )
