from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_search_spark.index.codec import (
    decode_docids,
    delta_decode,
    delta_encode,
    encode_docids,
    varint_decode,
    varint_encode,
)


def _ref_varint(values):
    out = bytearray()
    for v in values:
        v = int(v)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_and_wire_format(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = varint_encode(arr)
    assert enc == _ref_varint(vals)  # byte-exact LEB128
    dec = varint_decode(enc, count=len(vals))
    assert dec.tolist() == vals


@given(st.sets(st.integers(min_value=0, max_value=2**48), max_size=300))
@settings(max_examples=100, deadline=None)
def test_docid_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert decode_docids(encode_docids(arr), count=arr.size).tolist() == arr.tolist()


def test_delta_strictly_increasing():
    arr = np.array([3, 4, 10, 11, 1000], dtype=np.uint64)
    d = delta_encode(arr)
    assert d.tolist() == [3, 1, 6, 1, 989]
    assert delta_decode(d).tolist() == arr.tolist()


def test_decode_count_mismatch_raises():
    with pytest.raises(ValueError):
        varint_decode(varint_encode(np.array([1, 2], dtype=np.uint64)), count=3)
