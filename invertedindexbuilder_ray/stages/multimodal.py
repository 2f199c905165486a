"""Multimodal (binary-column) stages: decode / feature-extract plumbing.

Images, audio, and video ride through the engine as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.  The decode libraries (Pillow, ffmpeg, torchaudio, ...) are NOT
in this container, so the decode kernels are STUBBED: importing a real
decoder is attempted once per actor; absent that, a clearly-marked
deterministic fake produces stable pseudo-decodes so the Ray-side
plumbing — schemas, batch sizing, actor lifecycle, output layout — is
real and tested end-to-end.

Batch-size guidance: binary payloads dominate block size; size
``batch_size`` so batch_bytes x concurrency stays inside worker heaps
(e.g. 32 rows of 4 MB images per batch, not 4096).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

IMAGE_FEATURE_DIM = 64


def _binary_buffers(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """View a binary column as (flat uint8 bytes, int64 row offsets) —
    zero-copy; nulls fall back to a per-row path (treated as empty)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    if arr.null_count:
        chunks = [arr[i].as_py() or b"" for i in range(n)]
        lens = np.array([len(c) for c in chunks], np.int64)
        return (
            np.frombuffer(b"".join(chunks), np.uint8),
            np.concatenate([[0], np.cumsum(lens)]),
        )
    if pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], off_dtype)[arr.offset : arr.offset + n + 1]
    data = (
        np.frombuffer(buffers[2], np.uint8)
        if buffers[2] is not None
        else np.empty(0, np.uint8)
    )
    return data, offsets.astype(np.int64, copy=False)


class DecodeImageStub:
    """Actor-pool stage: ``(id, payload: binary)`` -> decoded image metadata.

    With a real decoder installed this would return (height, width,
    channels, pixels).  The deterministic fake derives stable pseudo
    dimensions from a content hash — same bytes, same output, any worker.
    """

    def __init__(self):
        try:  # pragma: no cover - decoder not present in this container
            import PIL.Image  # noqa: F401

            self.real = True
        except ImportError:
            self.real = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:  # pragma: no cover
            raise NotImplementedError(
                "real image decode path requires Pillow; wire PIL.Image.open here"
            )
        data, offsets = _binary_buffers(batch["payload"])
        mv = memoryview(data)
        heights, widths = [], []
        for i in range(batch.num_rows):  # sha256 over buffer slices, no .as_py()
            h = hashlib.sha256(mv[offsets[i] : offsets[i + 1]]).digest()
            heights.append(64 + h[0] % 192)
            widths.append(64 + h[1] % 192)
        channels = [3] * batch.num_rows
        return pa.table(
            {
                "id": batch["id"],
                "height": pa.array(heights, pa.int32()),
                "width": pa.array(widths, pa.int32()),
                "channels": pa.array(channels, pa.int32()),
                "decoder": pa.array(["stub"] * batch.num_rows, pa.string()),
            }
        )


class ByteHistogramFeatures:
    """Actor-pool stage: binary payloads -> 64-bin byte-histogram features.

    A real (and deterministic) feature extractor over opaque binary —
    the pattern stands in for CNN/CLIP embedding stages: fixed-dim
    ``list<float>`` output aligned with the embedding pipelines.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _binary_buffers(batch["payload"])
        n = batch.num_rows
        lens = np.diff(offsets)
        # one bincount over the whole batch: bin = row * 64 + (byte >> 2)
        flat = data[offsets[0] : offsets[-1]]
        row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = (
            np.bincount(
                row_ids * IMAGE_FEATURE_DIM + (flat.astype(np.int64) >> 2),
                minlength=n * IMAGE_FEATURE_DIM,
            )
            .reshape(n, IMAGE_FEATURE_DIM)
            .astype(np.float32)
        )
        sums = hist.sum(axis=1, keepdims=True)
        feats = hist / np.where(sums == 0, 1.0, sums)  # empty payload -> zeros
        return pa.table(
            {
                "id": batch["id"],
                "feature": pa.ListArray.from_arrays(
                    pa.array(
                        np.arange(0, (n + 1) * IMAGE_FEATURE_DIM, IMAGE_FEATURE_DIM),
                        pa.int32(),
                    ),
                    pa.array(feats.ravel(), pa.float32()),
                ),
            }
        )


def image_features(
    ds: rd.Dataset, *, id_col: str = "id", payload_col: str = "payload",
    batch_size: int = 64, concurrency=(1, 4),
) -> rd.Dataset:
    """payload column -> (id, feature list<float32>) via the actor pool."""
    renamed = ds.map_batches(
        lambda t: t.select([id_col, payload_col]).rename_columns(["id", "payload"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return renamed.map_batches(
        ByteHistogramFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,   # small: payload bytes dominate block size
        concurrency=concurrency,
    )


def decode_images(
    ds: rd.Dataset, *, id_col: str = "id", payload_col: str = "payload",
    batch_size: int = 64, concurrency=(1, 4),
) -> rd.Dataset:
    renamed = ds.map_batches(
        lambda t: t.select([id_col, payload_col]).rename_columns(["id", "payload"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return renamed.map_batches(
        DecodeImageStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
