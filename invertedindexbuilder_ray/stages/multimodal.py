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
        heights, widths, channels = [], [], []
        for payload in batch["payload"]:
            h = hashlib.sha256(payload.as_py() or b"").digest()
            heights.append(64 + h[0] % 192)
            widths.append(64 + h[1] % 192)
            channels.append(3)
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
        feats = []
        for payload in batch["payload"]:
            data = np.frombuffer(payload.as_py() or b"", dtype=np.uint8)
            if len(data) == 0:
                feats.append(np.zeros(IMAGE_FEATURE_DIM, dtype=np.float32))
                continue
            hist = np.bincount(data >> 2, minlength=IMAGE_FEATURE_DIM).astype(np.float32)
            feats.append(hist / hist.sum())
        return pa.table(
            {
                "id": batch["id"],
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
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
