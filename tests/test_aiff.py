"""AIFF codec tests: exact 80-bit extended rate, multichannel roundtrip,
IFF padding/unknown-chunk tolerance, and typed corrupt-stream errors."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from realestatedeals_spark.operators.aiff import (
    _ext80_decode,
    _ext80_encode,
    decode_aiff_pcm16,
    encode_aiff_pcm16,
)


def test_ext80_exact_for_integer_rates():
    for rate in (1, 7, 8000, 11025, 22050, 44100, 48000, 96000, 192000, 2**30):
        assert _ext80_decode(_ext80_encode(rate)) == rate


def test_roundtrip_mono_and_multichannel():
    rng = np.random.RandomState(5)
    for ch in (1, 2, 3):
        s = rng.randint(-32768, 32768, (257, ch)).astype(np.int16)
        rate, out = decode_aiff_pcm16(encode_aiff_pcm16(s, 44100))
        assert rate == 44100 and out.shape == (257, ch) and (out == s).all()
    mono = rng.randint(-100, 100, 9).astype(np.int16)
    rate, out = decode_aiff_pcm16(encode_aiff_pcm16(mono, 8000))
    assert out.shape == (9, 1) and (out[:, 0] == mono).all()


def test_odd_chunk_padding_and_unknown_chunks():
    s = np.arange(-3, 4, dtype=np.int16)  # 7 frames mono -> odd SSND payload? 14+8 even; force odd via ANNO
    data = encode_aiff_pcm16(s, 16000)
    # splice an odd-sized unknown ANNO chunk before COMM; decoder must skip
    # it and its pad byte
    anno = b"ANNO" + struct.pack(">I", 3) + b"abc" + b"\x00"
    spliced = data[:12] + anno + data[12:]
    spliced = spliced[:4] + struct.pack(">I", len(spliced) - 8) + spliced[8:]
    rate, out = decode_aiff_pcm16(spliced)
    assert rate == 16000 and (out[:, 0] == s).all()


def test_typed_errors():
    s = np.zeros(4, dtype=np.int16)
    good = encode_aiff_pcm16(s, 22050)
    with pytest.raises(ValueError, match="not an IFF FORM"):
        decode_aiff_pcm16(b"RIFF" + good[4:])
    with pytest.raises(ValueError, match="not AIFF"):
        decode_aiff_pcm16(good[:8] + b"AIFC" + good[12:])
    with pytest.raises(ValueError, match="missing SSND"):
        decode_aiff_pcm16(good[: good.index(b"SSND")])
    with pytest.raises(ValueError, match="truncated"):
        decode_aiff_pcm16(good[:-4])  # SSND payload cut mid-chunk
    # COMM declares more frames than SSND carries
    comm_at = good.index(b"COMM") + 8
    lying = (
        good[: comm_at + 2] + struct.pack(">I", 99) + good[comm_at + 6 :]
    )
    with pytest.raises(ValueError, match="shorter than COMM"):
        decode_aiff_pcm16(lying)
    with pytest.raises(ValueError, match="int16 range"):
        encode_aiff_pcm16(np.array([40000]), 8000)
    with pytest.raises(ValueError, match="positive"):
        encode_aiff_pcm16(s, 0)
