"""FLAC codec tests: lossless roundtrips across signal shapes, CRC/MD5
integrity enforcement, escape-coded residuals, CONSTANT subframes, typed
decode boundaries, and the audio_features magic-byte dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from realestatedeals_spark.operators.flac import (
    _crc8,
    _crc16,
    _utf8_coded_number,
    decode_flac,
    encode_flac,
)


def test_crc_known_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005, init 0: standard check values
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8
    assert _crc8(b"") == 0 and _crc16(b"") == 0


def test_utf8_coded_number_shapes():
    assert _utf8_coded_number(0) == b"\x00"
    assert _utf8_coded_number(0x7F) == b"\x7F"
    # 2-byte shape: 110xxxxx 10xxxxxx
    two = _utf8_coded_number(0x80)
    assert two[0] & 0xE0 == 0xC0 and two[1] & 0xC0 == 0x80
    # decodes back: standard UTF-8 rules
    assert ((two[0] & 0x1F) << 6) | (two[1] & 0x3F) == 0x80
    three = _utf8_coded_number(0x800)
    assert three[0] & 0xF0 == 0xE0 and len(three) == 3


@pytest.mark.parametrize(
    "name,signal",
    [
        ("smooth", lambda: (9000 * np.sin(np.arange(10000) / 40)).astype(np.int64)),
        ("noise", lambda: np.random.RandomState(3).randint(-32768, 32768, 5000).astype(np.int64)),
        ("constant", lambda: np.full(300, -123, dtype=np.int64)),
        ("single", lambda: np.array([5], dtype=np.int64)),
        ("ramp", lambda: np.arange(-3000, 3000, 7, dtype=np.int64)),
        ("extremes", lambda: np.array([32767, -32768] * 50, dtype=np.int64)),
        ("zeros_frame_boundary", lambda: np.zeros(4097, dtype=np.int64)),
        ("multi_frame", lambda: (7000 * np.sin(np.arange(13000) / 15)).astype(np.int64)),
    ],
)
def test_flac_lossless_roundtrip(name, signal):
    s = signal()
    data = encode_flac(s, 16000)
    rate, got = decode_flac(data)
    assert rate == 16000
    assert np.array_equal(got.astype(np.int64), s), name


def test_flac_actually_compresses_smooth_audio():
    s = (9000 * np.sin(np.arange(20000) / 40)).astype(np.int64)
    data = encode_flac(s, 8000)
    assert len(data) < 0.3 * (2 * len(s))  # vs raw 16-bit PCM


def test_flac_escape_path_roundtrips_wide_residuals():
    # alternating extremes force raw (escape-coded) residuals
    s = np.array([32767, -32768] * 200, dtype=np.int64)
    _, got = decode_flac(encode_flac(s, 8000))
    assert np.array_equal(got.astype(np.int64), s)


def test_flac_integrity_checks_are_typed():
    s = (5000 * np.sin(np.arange(3000) / 20)).astype(np.int64)
    data = bytearray(encode_flac(s, 8000))
    # flip a bit inside frame payload → CRC-16 catches
    bad = bytearray(data)
    bad[70] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # corrupt the sync word → lost sync
    bad = bytearray(data)
    bad[42] = 0x00  # first frame byte (4 magic + 4 block hdr + 34 STREAMINFO)
    with pytest.raises(ValueError, match="sync"):
        decode_flac(bytes(bad))
    # corrupt STREAMINFO md5 → decoded-PCM MD5 check fires
    bad = bytearray(data)
    bad[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    # truncation → typed, not IndexError
    with pytest.raises(ValueError):
        decode_flac(bytes(data[: len(data) // 2]))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFF1234")


def test_flac_unsupported_shapes_are_typed():
    with pytest.raises(ValueError, match="16-bit range"):
        encode_flac(np.array([40000]), 8000)
    with pytest.raises(ValueError, match="empty"):
        encode_flac(np.array([], dtype=np.int64), 8000)
    # hand-build a stereo STREAMINFO → typed NotImplementedError
    s = np.array([1, 2, 3], dtype=np.int64)
    data = bytearray(encode_flac(s, 8000))
    packed = struct.unpack(">Q", data[8 + 10 : 8 + 18])[0]
    packed |= 1 << 41  # channels-1 = 1
    data[8 + 10 : 8 + 18] = struct.pack(">Q", packed)
    with pytest.raises(NotImplementedError, match="channels=2"):
        decode_flac(bytes(data))


def test_audio_features_dispatches_flac(spark):
    from realestatedeals_spark.operators.multimodal import MEDIA_SCHEMA, audio_features

    s = ((np.arange(500) * 31) % 20001 - 10000).astype(np.int64)
    rows = [(1, "audio", bytearray(encode_flac(s, 8000)), None)]
    row = audio_features(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()[0]
    assert row["sample_rate"] == 8000 and row["n_samples"] == 500
    assert row["s_sum"] == int(s.sum()) and row["s_peak"] == int(np.abs(s).max())


def test_flac_random_fuzz_roundtrip():
    """Property fuzz: 30 random signals across lengths, amplitudes, and
    smoothness regimes all roundtrip losslessly (order/k selection and the
    escape heuristic must never lose bits)."""
    rng = np.random.RandomState(42)
    for trial in range(30):
        n = int(rng.randint(1, 9000))
        style = trial % 3
        if style == 0:
            s = rng.randint(-32768, 32768, n).astype(np.int64)
        elif style == 1:
            amp = int(rng.randint(1, 30000))
            s = (amp * np.sin(np.arange(n) / max(1, rng.randint(1, 100)))).astype(np.int64)
        else:
            s = np.cumsum(rng.randint(-50, 51, n)).clip(-32768, 32767).astype(np.int64)
        data = encode_flac(s, 8000)
        _, got = decode_flac(data)
        assert np.array_equal(got.astype(np.int64), s), (trial, n, style)
