from __future__ import annotations

import pyarrow as pa


def _binary_ds(ray_session):
    import ray.data as rd

    from invertedindexbuilder_ray.corpus import make_webpages

    tbl = make_webpages(50)
    return rd.from_arrow(
        pa.table(
            {
                "id": pa.array(range(50), pa.int64()),
                "payload": tbl["html"],  # the fixture's binary column
            }
        )
    )


def test_decode_stub_deterministic(ray_session):
    from invertedindexbuilder_ray.stages.multimodal import decode_images

    ds = _binary_ds(ray_session)
    a = decode_images(ds).to_pandas().sort_values("id").reset_index(drop=True)
    b = decode_images(ds).to_pandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["channels"] == 3).all()
    assert a["height"].between(64, 255).all()
    assert (a["decoder"] == "stub").all()


def test_byte_histogram_features(ray_session):
    import numpy as np

    from invertedindexbuilder_ray.stages.multimodal import IMAGE_FEATURE_DIM, image_features

    ds = _binary_ds(ray_session)
    out = image_features(ds).to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 50
    f0 = np.asarray(out.loc[0, "feature"], dtype=np.float32)
    assert len(f0) == IMAGE_FEATURE_DIM
    assert abs(f0.sum() - 1.0) < 1e-5  # normalized histogram


def test_resize_plan(ray_session):
    from invertedindexbuilder_ray.stages.multimodal import resize_images

    ds = _binary_ds(ray_session)
    out = resize_images(ds, target=(224, 224)).to_pandas()
    assert len(out) == 50
    assert (out.out_height <= 224).all() and (out.out_width <= 224).all()
    # aspect preserved: the binding dimension hits the target exactly
    assert ((out.out_height == 224) | (out.out_width == 224)).all()
    assert (out.scale > 0).all()


def test_video_frame_sampling(ray_session):
    import numpy as np

    from invertedindexbuilder_ray.stages.multimodal import sample_video_frames

    ds = _binary_ds(ray_session)
    out = sample_video_frames(ds, n_frames=4).to_pandas()
    per = out.groupby("id").frame_idx.count()
    assert (per == 4).all()  # payloads are large enough for 4 windows
    assert (out.frame_bytes > 0).all()
    # frames are disjoint prefixes of the payload in order
    g = out[out.id == out.id.iloc[0]].sort_values("frame_idx")
    assert list(g.frame_idx) == [0, 1, 2, 3]
    assert (np.diff([len(p) for p in g.frame_payload]) <= 0).sum() >= 0  # shape sane


def test_audio_energy(ray_session):
    import numpy as np

    from invertedindexbuilder_ray.stages.multimodal import AUDIO_FRAME, audio_energy

    ds = _binary_ds(ray_session)
    out = audio_energy(ds).to_pandas()
    assert len(out) == 50
    assert (out.n_windows > 0).any()  # short payloads legitimately yield 0
    row = out[out.n_windows > 0].iloc[0]
    assert len(row.energy) == row.n_windows
    assert all(e >= 0 for e in row.energy)
    # empty payload -> zero windows
    import pyarrow as pa
    import ray.data as rd

    from invertedindexbuilder_ray.stages.multimodal import AudioEnergyFeatures

    empty = AudioEnergyFeatures()(pa.table({"id": pa.array([1], pa.int64()),
                                            "payload": pa.array([b""], pa.binary())}))
    assert empty["n_windows"][0].as_py() == 0


def _minimal_bmp(width: int, height: int) -> bytes:
    """Hand-rolled uncompressed 24-bit BMP — decodable by any real image
    library, no encoder dependency needed to produce it."""
    import struct

    row = width * 3
    pad = (4 - row % 4) % 4
    pixels = b"".join(
        b"".join(bytes((x % 256, y % 256, (x + y) % 256)) for x in range(width))
        + b"\0" * pad
        for y in range(height)
    )
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def test_real_pil_decode_path():
    """Auto-activates the guarded PIL branch the day the environment gains
    a decoder (r2 verdict: keep the real path from bit-rotting); skips
    otherwise."""
    import pyarrow as pa
    import pytest

    pytest.importorskip("PIL.Image")
    from invertedindexbuilder_ray.stages.multimodal import DecodeImageStub

    batch = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([_minimal_bmp(7, 5), b"not an image"], pa.binary()),
        }
    )
    out = DecodeImageStub()(batch).to_pandas()
    assert list(out.decoder) == ["pil", "pil"]
    assert (out.loc[0, ["height", "width", "channels"]] == [5, 7, 3]).all()
    assert (out.loc[1, ["height", "width", "channels"]] == [0, 0, 0]).all()


def test_minimal_bmp_wellformed():
    """The fixture itself must be a structurally valid BMP (so the skip-
    marked PIL test exercises a real decode, not a sentinel)."""
    b = _minimal_bmp(7, 5)
    assert b[:2] == b"BM"
    assert int.from_bytes(b[2:6], "little") == len(b)
    assert int.from_bytes(b[10:14], "little") == 54
    assert int.from_bytes(b[18:22], "little", signed=True) == 7
    assert int.from_bytes(b[22:26], "little", signed=True) == 5


def test_video_frame_slicing_matches_reference_loop():
    """Vectorized frame slicing vs a straightforward per-row loop across
    edge sizes: empty, 1 byte, < n_frames bytes, exact multiples, ragged."""
    import numpy as np
    import pyarrow as pa

    from invertedindexbuilder_ray.stages.multimodal import SampleVideoFramesStub

    rng = np.random.RandomState(11)
    payloads = [b"", b"x", b"ab", b"abc", bytes(rng.bytes(17)), bytes(rng.bytes(64)),
                bytes(rng.bytes(65)), bytes(rng.bytes(4)), bytes(rng.bytes(1000))]
    batch = pa.table(
        {
            "id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    n_frames = 4
    got = SampleVideoFramesStub(n_frames=n_frames)(batch).to_pandas()

    exp_rows = []
    for i, p in enumerate(payloads):
        ln = len(p)
        if ln == 0:
            continue
        k = min(n_frames, max(ln, 1))
        step = max(ln // k, 1)
        for j in range(k):
            fs, fe = j * step, min((j + 1) * step, ln)
            exp_rows.append((i, j, p[fs:fe], fe - fs))
    assert len(got) == len(exp_rows)
    for (i, j, fp, fb), (_, row) in zip(exp_rows, got.iterrows()):
        assert (row.id, row.frame_idx, bytes(row.frame_payload), row.frame_bytes) == (
            i, j, fp, fb
        )
