from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindexbuilder_ray.functions import varbyte


def test_zero_encodes_as_0x80():
    # verified reference behavior: 0 -> 0x80 (src/var_bytes.c:5-18)
    assert varbyte.encode_single(0) == b"\x80"


def test_known_reference_bytes():
    # SURVEY.md §9.1 verified hexdump: values 2,1,1,1,4,0,1,2,1
    vals = np.array([2, 1, 1, 1, 4, 0, 1, 2, 1])
    buf, sizes = varbyte.encode(vals)
    assert buf.tobytes() == bytes([0x82, 0x81, 0x81, 0x81, 0x84, 0x80, 0x81, 0x82, 0x81])
    assert sizes.tolist() == [1] * 9


def test_multibyte_layout():
    # 300 = 0b100101100 -> digits LE: 0x2c, 0x02|0x80
    buf, sizes = varbyte.encode(np.array([300]))
    assert buf.tobytes() == bytes([0x2C, 0x82])
    assert sizes.tolist() == [2]
    vals, consumed = varbyte.decode(buf)
    assert vals.tolist() == [300] and consumed == 2


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_roundtrip(values):
    vals = np.array(values, dtype=np.int64)
    buf, sizes = varbyte.encode(vals)
    assert sizes.sum() == len(buf)
    out, consumed = varbyte.decode(buf)
    assert out.tolist() == values
    assert consumed == len(buf)


def test_decode_count_and_trailing():
    vals = np.array([0, 127, 128, 1, 10**6])
    buf, _ = varbyte.encode(vals)
    extended = np.concatenate([buf, np.array([0x7F, 0x7F], dtype=np.uint8)])
    out, consumed = varbyte.decode(extended, count=5)
    assert out.tolist() == vals.tolist()
    assert consumed == len(buf)
    with pytest.raises(ValueError):
        varbyte.decode(buf, count=6)


def test_negative_rejected():
    with pytest.raises(ValueError):
        varbyte.encode(np.array([-1]))
