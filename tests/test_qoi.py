"""QOI codec tests: randomized lossless roundtrip, chunk-op coverage,
actual compression on plateaued images, and typed corrupt-stream errors."""

from __future__ import annotations

import numpy as np
import pytest

from realestatedeals_spark.operators.qoi import decode_qoi, encode_qoi

_OP_RGB, _OP_RGBA = 0xFE, 0xFF


def _ops_used(data: bytes) -> set[str]:
    """Walk the chunk stream and record which op kinds appear."""
    ops: set[str] = set()
    pos, end = 14, len(data) - 8
    while pos < end:
        b0 = data[pos]
        pos += 1
        if b0 == _OP_RGB:
            ops.add("RGB")
            pos += 3
        elif b0 == _OP_RGBA:
            ops.add("RGBA")
            pos += 4
        else:
            tag = b0 & 0xC0
            if tag == 0x00:
                ops.add("INDEX")
            elif tag == 0x40:
                ops.add("DIFF")
            elif tag == 0x80:
                ops.add("LUMA")
                pos += 1
            else:
                ops.add("RUN")
    return ops


@pytest.mark.parametrize("channels", [3, 4])
def test_qoi_roundtrip_random(channels):
    rng = np.random.RandomState(11 + channels)
    for style in range(6):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        if style % 3 == 0:
            img = rng.randint(0, 256, (h, w, channels), dtype=np.uint8)
        elif style % 3 == 1:
            pal = rng.randint(0, 256, (5, channels), dtype=np.uint8)
            img = pal[rng.randint(0, 5, (h, w))]
        else:
            base = int(rng.randint(0, 256))
            img = ((base + np.cumsum(rng.randint(0, 3, h * w * channels))) % 256)
            img = img.reshape(h, w, channels).astype(np.uint8)
        dec = decode_qoi(encode_qoi(img))
        assert dec.shape == img.shape
        assert (dec == img).all()


def test_qoi_query_pattern_exercises_every_rgb_op():
    # the registered query's pixel formula (doc_id=3, n_chars=100)
    did, nch = 3, 100
    h, w = did % 11 + 6, nch % 19 + 8
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    g = (did * 31 + 7 * r) % 256 + 0 * c
    px = np.stack([(g + r % 3) % 256, g, (g + (c // 4) % 2) % 256], axis=2).astype(np.uint8)
    enc = encode_qoi(px)
    assert (decode_qoi(enc) == px).all()
    assert {"RUN", "INDEX", "DIFF", "LUMA", "RGB"} <= _ops_used(enc)


def test_qoi_rgba_op_fires_on_varying_alpha():
    img = np.zeros((4, 4, 4), dtype=np.uint8)
    img[..., 3] = 255
    img[2, 2] = (10, 20, 30, 99)
    enc = encode_qoi(img)
    assert "RGBA" in _ops_used(enc)
    assert (decode_qoi(enc) == img).all()


def test_qoi_compresses_plateaus():
    img = np.full((64, 64, 3), 77, dtype=np.uint8)
    enc = encode_qoi(img)
    assert len(enc) < 64 * 64 * 3 // 10  # runs collapse the flat image


def test_qoi_long_run_split_at_62():
    img = np.zeros((1, 200, 3), dtype=np.uint8)
    assert (decode_qoi(encode_qoi(img)) == img).all()


def test_qoi_typed_errors():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    enc = encode_qoi(img)
    with pytest.raises(ValueError, match="not a QOI"):
        decode_qoi(b"junk" + enc[4:])
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(enc[:-1] + b"\x02")
    with pytest.raises(ValueError, match="truncated|overflows"):
        decode_qoi(enc[:14] + enc[-8:])  # chunks removed, header says 4 px
    with pytest.raises(ValueError, match="needs"):
        encode_qoi(np.zeros((2, 2), dtype=np.uint8))
