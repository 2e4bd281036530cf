"""AIFF (Audio Interchange File Format) codec, from the public Apple
"EA IFF 85"-based specification: a FORM/AIFF container whose COMM chunk
carries channels, frame count, bit depth and an 80-bit IEEE 754 extended
sample rate, and whose SSND chunk carries interleaved BIG-endian signed
PCM (the byte-order mirror of RIFF/WAV). Lossless, so roundtrip queries
carry plain arithmetic oracles.

Covers multi-channel interleave, odd-size chunk padding (IFF pads every
odd chunk to an even boundary), unknown-chunk skipping, and exact
extended-float encode/decode for integer rates.
"""

from __future__ import annotations

import struct

import numpy as np


def _ext80_encode(rate: int) -> bytes:
    """Integer sample rate -> 80-bit IEEE 754 extended, exact."""
    if rate <= 0:
        raise ValueError("AIFF sample rate must be positive")
    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def _ext80_decode(b: bytes) -> int:
    se, mant = struct.unpack(">HQ", b)
    if mant == 0:
        return 0
    sign = -1 if se & 0x8000 else 1
    e = (se & 0x7FFF) - 16383
    # mant carries the explicit integer bit at position 63
    shift = e - 63
    val = mant << shift if shift >= 0 else (mant + (1 << (-shift - 1))) >> -shift
    return sign * val


def encode_aiff_pcm16(samples: np.ndarray, sample_rate: int = 22050) -> bytes:
    """Encode (n,) or (n, channels) int16-range samples as an AIFF file."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] < 1:
        raise ValueError("encode_aiff_pcm16 needs (n,) or (n, channels)")
    if s.size and (s.max() > 32767 or s.min() < -32768):
        raise ValueError("samples exceed int16 range")
    n_frames, n_ch = s.shape
    pcm = s.astype(">i2").tobytes()  # interleaved big-endian
    comm = b"COMM" + struct.pack(">I", 18)
    comm += struct.pack(">HIH", n_ch, n_frames, 16) + _ext80_encode(sample_rate)
    ssnd_body = struct.pack(">II", 0, 0) + pcm
    ssnd = b"SSND" + struct.pack(">I", len(ssnd_body)) + ssnd_body
    if len(ssnd_body) % 2:
        ssnd += b"\x00"  # IFF even padding (not counted in the chunk size)
    body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff_pcm16(data: bytes) -> tuple[int, np.ndarray]:
    """Decode an AIFF file -> (sample_rate, (n_frames, channels) int16)."""
    if len(data) < 12 or data[:4] != b"FORM":
        raise ValueError("not an IFF FORM stream")
    if data[8:12] != b"AIFF":
        raise ValueError("FORM type is not AIFF")
    form_size = struct.unpack(">I", data[4:8])[0]
    end = min(len(data), 8 + form_size)
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack(">I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError(f"AIFF chunk {cid!r} truncated")
        if cid == b"COMM":
            comm = payload
        elif cid == b"SSND":
            ssnd = payload
        pos += 8 + size + (size % 2)  # skip the odd-size pad byte
    if comm is None:
        raise ValueError("AIFF missing COMM chunk")
    if ssnd is None:
        raise ValueError("AIFF missing SSND chunk")
    if len(comm) < 18:
        raise ValueError("AIFF COMM chunk too short")
    n_ch, n_frames, bits = struct.unpack(">HIH", comm[:8])
    rate = _ext80_decode(comm[8:18])
    if bits != 16:
        raise ValueError(f"only 16-bit AIFF PCM supported, got {bits}")
    offset, _block = struct.unpack(">II", ssnd[:8])
    pcm = ssnd[8 + offset : 8 + offset + n_frames * n_ch * 2]
    if len(pcm) < n_frames * n_ch * 2:
        raise ValueError("AIFF SSND data shorter than COMM frame count")
    out = np.frombuffer(pcm, dtype=">i2").astype(np.int16).reshape(n_frames, n_ch)
    return rate, out
