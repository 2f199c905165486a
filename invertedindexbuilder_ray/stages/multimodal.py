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

from ..sources.util import actor_pool

IMAGE_FEATURE_DIM = 64


def _frame_ranges(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]), [0..lens[1]), ... concatenated (vectorized arange)."""
    lens = lens.astype(np.int64, copy=False)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    ids = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.arange(total, dtype=np.int64) - starts[ids]


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

    Three tiers, best available per payload (decoder column says which):

    1. ``pil``  — Pillow, imported once per actor when present;
    2. ``pure`` — the vendored pure-Python PNG/BMP codec
       (functions/imagecodec.py, round-4 verdict item 10): REAL decode
       with no external dependency, so CI exercises actual codecs;
    3. ``stub`` — deterministic content-hash pseudo-dimensions for
       payloads neither tier recognizes (same bytes, same output, any
       worker).
    """

    def __init__(self):
        try:  # decoder imported once per actor, never per batch
            import PIL.Image

            self._pil = PIL.Image
        except ImportError:  # this container has no Pillow — pure/stub path
            self._pil = None
        from ..functions import imagecodec

        self._codec = imagecodec

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._pil is not None:  # pragma: no cover - no Pillow in container
            import io

            data, offsets = _binary_buffers(batch["payload"])
            mv = memoryview(data)
            heights, widths, channels = [], [], []
            for i in range(batch.num_rows):
                try:
                    with self._pil.open(
                        io.BytesIO(mv[offsets[i] : offsets[i + 1]])
                    ) as im:
                        heights.append(im.height)
                        widths.append(im.width)
                        channels.append(len(im.getbands()))
                except Exception:  # undecodable payload -> zero-dim sentinel
                    heights.append(0)
                    widths.append(0)
                    channels.append(0)
            return pa.table(
                {
                    "id": batch["id"],
                    "height": pa.array(heights, pa.int32()),
                    "width": pa.array(widths, pa.int32()),
                    "channels": pa.array(channels, pa.int32()),
                    "decoder": pa.array(["pil"] * batch.num_rows, pa.string()),
                }
            )
        data, offsets = _binary_buffers(batch["payload"])
        mv = memoryview(data)
        heights, widths, channels, decoders = [], [], [], []
        for i in range(batch.num_rows):  # buffer slices, no .as_py()
            payload = mv[offsets[i] : offsets[i + 1]]
            if self._codec.sniff(bytes(payload[:18])) is not None:
                try:  # REAL decode: vendored pure-Python PNG/BMP codec
                    px = self._codec.decode(bytes(payload))
                    heights.append(px.shape[0])
                    widths.append(px.shape[1])
                    channels.append(px.shape[2])
                    decoders.append("pure")
                    continue
                except ValueError:  # recognized magic, malformed body
                    heights.append(0)
                    widths.append(0)
                    channels.append(0)
                    decoders.append("pure")
                    continue
            h = hashlib.sha256(payload).digest()
            heights.append(64 + h[0] % 192)
            widths.append(64 + h[1] % 192)
            channels.append(3)
            decoders.append("stub")
        return pa.table(
            {
                "id": batch["id"],
                "height": pa.array(heights, pa.int32()),
                "width": pa.array(widths, pa.int32()),
                "channels": pa.array(channels, pa.int32()),
                "decoder": pa.array(decoders, pa.string()),
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
    batch_size: int = 64, concurrency=None,
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
        concurrency=concurrency or actor_pool(),
    )


def decode_images(
    ds: rd.Dataset, *, id_col: str = "id", payload_col: str = "payload",
    batch_size: int = 64, concurrency=None,
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
        concurrency=concurrency or actor_pool(),
    )


class ResizeImageStub:
    """Actor-pool stage: decoded-image metadata -> letterbox-resize plan.

    With a real decoder this would emit resized pixel payloads; the
    deterministic fake computes the REAL resize arithmetic (aspect-
    preserving fit into ``target`` with output dims + scale) over the
    stub dimensions, so schemas and the fit logic are tested for real.
    """

    def __init__(self, target: tuple[int, int] = (224, 224)):
        self.th, self.tw = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        # undecodable payloads arrive as (0, 0) sentinel dims from the real
        # decode path; propagate a 0/0/0.0 sentinel row instead of the
        # inf*0=NaN -> INT32_MIN garbage a blind divide would produce
        ok = (h > 0) & (w > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            scale = np.where(ok, np.minimum(self.th / h, self.tw / w), 0.0)
        out_h = np.where(ok, np.maximum(1, np.round(h * scale)), 0).astype(np.int32)
        out_w = np.where(ok, np.maximum(1, np.round(w * scale)), 0).astype(np.int32)
        return pa.table(
            {
                "id": batch["id"],
                "out_height": pa.array(out_h, pa.int32()),
                "out_width": pa.array(out_w, pa.int32()),
                "scale": pa.array(np.round(scale, 6), pa.float64()),
            }
        )


def resize_images(
    ds: rd.Dataset, *, target: tuple[int, int] = (224, 224),
    batch_size: int = 256, concurrency=None,
) -> rd.Dataset:
    """decode (stub) -> resize plan; chained actor-pool stages."""
    return decode_images(ds).map_batches(
        ResizeImageStub,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or actor_pool(),
    )


class SampleVideoFramesStub:
    """Actor-pool stage: video binary -> one row PER SAMPLED FRAME.

    A real decoder would seek keyframes; the deterministic fake slices
    the payload into ``n_frames`` equal byte windows (a stand-in for
    decoded frames) so the explode plumbing — row fan-out, frame_idx
    assignment, per-frame payload rows with bounded batch sizes — is
    real.  Output: (id, frame_idx, frame_payload, frame_bytes)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _binary_buffers(batch["payload"])
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = np.diff(offsets)
        k = np.where(ln > 0, np.minimum(self.n_frames, np.maximum(ln, 1)), 0)
        step = np.maximum(ln // np.maximum(k, 1), 1)
        # per-frame arrays, fully vectorized (no per-row/per-frame loop):
        # frame j of row i = bytes [j*step, min((j+1)*step, ln)) of payload i
        fidx = _frame_ranges(k)
        row = np.repeat(np.arange(len(ids), dtype=np.int64), k)
        f_len = np.minimum(step[row], ln[row] - fidx * step[row])
        f_start = offsets[:-1][row] + fidx * step[row]
        gather = np.repeat(f_start, f_len) + _frame_ranges(f_len)
        flat = data[gather] if len(gather) else np.empty(0, np.uint8)
        # int64 offsets (large_binary): int32 offsets would WRAP silently
        # past 2 GiB of frame bytes per batch
        out_offsets = np.concatenate([[0], np.cumsum(f_len)]).astype(np.int64)
        payload = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            len(f_len),
            [None, pa.py_buffer(out_offsets.tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table(
            {
                "id": pa.array(ids[row], pa.int64()),
                "frame_idx": pa.array(fidx.astype(np.int32), pa.int32()),
                "frame_payload": payload,
                "frame_bytes": pa.array(f_len, pa.int64()),
            }
        )


def sample_video_frames(
    ds: rd.Dataset, *, id_col: str = "id", payload_col: str = "payload",
    n_frames: int = 4, batch_size: int = 16, concurrency=None,
) -> rd.Dataset:
    """Frame-sample explode: small batch_size — the fan-out multiplies
    payload bytes per output block by n_frames."""
    renamed = ds.map_batches(
        lambda t: t.select([id_col, payload_col]).rename_columns(["id", "payload"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return renamed.map_batches(
        SampleVideoFramesStub,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or actor_pool(),
    )


AUDIO_FRAME = 256  # samples per energy window


class AudioEnergyFeatures:
    """Actor-pool stage: audio binary -> RMS-energy envelope, REAL compute.

    Bytes are interpreted as an int8 PCM waveform (no codec needed), and
    per-window root-mean-square energy is computed vectorized over the
    whole batch — the shape of any framed audio featurizer (fbank/MFCC
    would slot in here with a real decoder).  Output: (id, n_windows,
    energy list<float32>)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _binary_buffers(batch["payload"])
        n = batch.num_rows
        energies: list[np.ndarray] = []
        for i in range(n):  # per row: one vectorized reshape+mean, no byte loops
            wave = data[offsets[i] : offsets[i + 1]].view(np.int8).astype(np.float32)
            usable = (len(wave) // AUDIO_FRAME) * AUDIO_FRAME
            if usable == 0:
                energies.append(np.zeros(0, np.float32))
                continue
            frames = wave[:usable].reshape(-1, AUDIO_FRAME)
            energies.append(np.sqrt((frames * frames).mean(axis=1)).astype(np.float32))
        lens = np.array([len(e) for e in energies], np.int64)
        flat = (
            np.concatenate(energies) if lens.sum() else np.zeros(0, np.float32)
        )
        return pa.table(
            {
                "id": batch["id"],
                "n_windows": pa.array(lens, pa.int64()),
                "energy": pa.ListArray.from_arrays(
                    pa.array(np.concatenate([[0], np.cumsum(lens)]), pa.int32()),
                    pa.array(flat, pa.float32()),
                ),
            }
        )


def audio_energy(
    ds: rd.Dataset, *, id_col: str = "id", payload_col: str = "payload",
    batch_size: int = 64, concurrency=None,
) -> rd.Dataset:
    renamed = ds.map_batches(
        lambda t: t.select([id_col, payload_col]).rename_columns(["id", "payload"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return renamed.map_batches(
        AudioEnergyFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or actor_pool(),
    )
