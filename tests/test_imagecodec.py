"""Pure-Python PNG/BMP codec + the decode stage's real 'pure' tier
(round-4 verdict item 10: real codecs must run in CI without Pillow)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from invertedindexbuilder_ray.functions import imagecodec as ic


@pytest.mark.parametrize("nch", [1, 2, 3, 4])
def test_png_roundtrip_all_channel_counts(nch):
    rng = np.random.RandomState(nch)
    px = rng.randint(0, 256, (13, 9, nch), dtype=np.uint8)
    dec = ic.decode_png(ic.encode_png(px[:, :, 0] if nch == 1 else px))
    assert dec.shape == (13, 9, nch)
    assert (dec == px).all()


def test_png_all_five_filters_decode_exactly():
    """Hand-filter scanlines with Sub/Up/Average/Paeth per the spec and
    check the decoder reconstructs the original pixels bit-exactly."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (5, 6, 3), dtype=np.uint8)
    h, w, nch = px.shape
    stride = w * nch
    rows, prev = [], np.zeros(stride, np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = px[y].reshape(-1).astype(np.int64)
        line = [f]
        for x in range(stride):
            a = cur[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            line.append(int((cur[x] - pred) & 0xFF))
        rows.append(bytes(line))
        prev = cur
    data = (
        ic.PNG_SIG
        + ic._chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + ic._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + ic._chunk(b"IEND", b"")
    )
    assert (ic.decode_png(data) == px).all()


def test_png_palette_expands_to_rgb():
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (4, 3), np.uint8)
    idx = rng.randint(0, 4, (5, 5), np.uint8)
    scan = np.concatenate([np.zeros((5, 1), np.uint8), idx], axis=1)
    data = (
        ic.PNG_SIG
        + ic._chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 5, 8, 3, 0, 0, 0))
        + ic._chunk(b"PLTE", pal.tobytes())
        + ic._chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + ic._chunk(b"IEND", b"")
    )
    assert (ic.decode_png(data) == pal[idx]).all()


@pytest.mark.parametrize("w", [7, 8, 9])  # exercises 4-byte row padding
def test_bmp_roundtrip(w):
    rng = np.random.RandomState(w)
    px = rng.randint(0, 256, (5, w, 3), np.uint8)
    assert (ic.decode_bmp(ic.encode_bmp(px)) == px).all()


def test_bmp_decoder_matches_multimodal_fixture():
    """decode_bmp must agree with the hand-rolled fixture the PIL-gated
    test uses: pixel (x, y) = (x, y, x+y) mod 256, bottom-up."""
    from test_multimodal import _minimal_bmp

    px = ic.decode_bmp(_minimal_bmp(7, 5))
    assert px.shape == (5, 7, 3)
    # BMP rows are bottom-up: fixture row y=0 is the BOTTOM row
    for y in range(5):
        for x in range(7):
            # fixture writes bytes (x, y, x+y) in BGR file order
            assert tuple(px[4 - y, x]) == ((x + y) % 256, y % 256, x % 256)


def test_rejects():
    with pytest.raises(ValueError):
        ic.decode(b"garbage")
    with pytest.raises(ValueError):
        ic.decode_png(ic.PNG_SIG + b"\x00" * 10)
    with pytest.raises(ValueError):
        ic.decode_bmp(b"BM" + b"\x00" * 10)
    assert ic.sniff(b"\x89PNG\r\n\x1a\n123") == "png"
    real_bmp = ic.encode_bmp(np.zeros((2, 2, 3), np.uint8))
    assert ic.sniff(real_bmp[:18]) == "bmp"
    # bare 'BM' magic without a plausible DIB header is NOT a BMP
    assert ic.sniff(b"BM123") is None
    assert ic.sniff(b"RIFF") is None


def test_decode_stage_pure_tier(ray_session):
    """decode_images runs REAL decodes for PNG/BMP payloads (decoder
    column 'pure'), 0-dim sentinel for malformed recognized payloads,
    hash stub for everything else — all in one batch."""
    import ray.data as rd

    from invertedindexbuilder_ray.stages.multimodal import decode_images

    rng = np.random.RandomState(1)
    png = ic.encode_png(rng.randint(0, 256, (11, 4, 3), np.uint8))
    bmp = ic.encode_bmp(rng.randint(0, 256, (6, 10, 3), np.uint8))
    bad_png = ic.PNG_SIG + b"\x00\x00\x00\x04IHDRxxxx"  # sniffs png, malformed
    other = b"just some bytes"
    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1, 2, 3], pa.int64()),
                "payload": pa.array([png, bmp, bad_png, other], pa.binary()),
            }
        )
    )
    out = decode_images(ds).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(out.decoder) == ["pure", "pure", "pure", "stub"]
    assert tuple(out.loc[0, ["height", "width", "channels"]]) == (11, 4, 3)
    assert tuple(out.loc[1, ["height", "width", "channels"]]) == (6, 10, 3)
    assert tuple(out.loc[2, ["height", "width", "channels"]]) == (0, 0, 0)


def test_palette_index_overflow_is_valueerror():
    """Corrupt palette PNG (pixel index beyond PLTE) must raise the
    contractual ValueError, not IndexError (review finding: IndexError
    escaped the decode stage's fallback)."""
    pal = np.zeros((2, 3), np.uint8)
    idx = np.full((3, 3), 200, np.uint8)
    scan = np.concatenate([np.zeros((3, 1), np.uint8), idx], axis=1)
    data = (
        ic.PNG_SIG
        + ic._chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 3, 0, 0, 0))
        + ic._chunk(b"PLTE", pal.tobytes())
        + ic._chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + ic._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette"):
        ic.decode_png(data)


def test_bm_prefixed_text_stays_on_stub_path(ray_session):
    """'BM'-prefixed non-image payloads must NOT sniff as BMP (review
    finding: 2-byte magic reclassified arbitrary text onto the sentinel
    path, breaking the stub tier's stable-pseudo-dims invariant)."""
    import ray.data as rd

    from invertedindexbuilder_ray.stages.multimodal import decode_images

    payload = b"BMW review: the 3 series remains the benchmark..."
    assert ic.sniff(payload) is None
    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([0], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
            }
        )
    )
    out = decode_images(ds).to_pandas()
    assert list(out.decoder) == ["stub"]
    assert int(out.height[0]) >= 64  # hash dims, not the 0-sentinel
