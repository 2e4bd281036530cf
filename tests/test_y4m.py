"""Y4M codec tests: mono + 444 roundtrips, header parsing, typed errors."""

from __future__ import annotations

import numpy as np
import pytest

from realestatedeals_spark.operators.y4m import decode_y4m, encode_y4m


def test_roundtrip_mono_and_444():
    rng = np.random.RandomState(1)
    mono = [rng.randint(0, 256, (6, 9), dtype=np.uint8) for _ in range(3)]
    w, h, fps, out = decode_y4m(encode_y4m(mono, 30, 1))
    assert (w, h, fps, len(out)) == (9, 6, (30, 1), 3)
    assert all((a == b).all() for a, b in zip(mono, out))

    yuv = [rng.randint(0, 256, (5, 7, 3), dtype=np.uint8) for _ in range(4)]
    w, h, fps, out = decode_y4m(encode_y4m(yuv, 24000, 1001))
    assert (w, h, fps, len(out)) == (7, 5, (24000, 1001), 4)
    assert all((a == b).all() for a, b in zip(yuv, out))


def test_planar_layout_is_real():
    # one frame, distinct planes: the encoded body must be Y-plane bytes,
    # then U, then V — not interleaved pixels
    fr = np.zeros((2, 2, 3), dtype=np.uint8)
    fr[:, :, 0], fr[:, :, 1], fr[:, :, 2] = 1, 2, 3
    data = encode_y4m([fr])
    body = data.split(b"FRAME\n", 1)[1]
    assert body == bytes([1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3])


def test_typed_errors():
    fr = [np.zeros((2, 2), dtype=np.uint8)]
    good = encode_y4m(fr)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"JUNK" + good)
    with pytest.raises(ValueError, match="unsupported y4m colourspace"):
        decode_y4m(good.replace(b"Cmono", b"C420jpeg"))
    with pytest.raises(ValueError, match="frame truncated"):
        decode_y4m(good[:-1])
    with pytest.raises(ValueError, match="FRAME marker"):
        decode_y4m(good.replace(b"FRAME", b"FRAMX"))
    with pytest.raises(ValueError, match="one geometry"):
        encode_y4m([np.zeros((2, 2), np.uint8), np.zeros((3, 2), np.uint8)])
    with pytest.raises(ValueError, match="at least one frame"):
        encode_y4m([])
