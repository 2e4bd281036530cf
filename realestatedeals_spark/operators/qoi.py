"""QOI ("Quite OK Image") codec, implemented from the public specification
(qoiformat.org, spec v1.0, public domain). Lossless, byte-oriented — the
decode side reproduces input pixels exactly, so roundtrip queries carry a
plain arithmetic oracle like the other lossless codecs (BMP/PNG/TIFF).

Covers all six chunk ops (RGB, RGBA, INDEX, DIFF, LUMA, RUN), the 64-slot
color index with the (3r+5g+7b+11a) % 64 hash, wraparound diffs, and the
7x00+01 end marker. Encoder accepts (H, W, 3) or (H, W, 4) uint8; decoder
returns the channel count found in the header.

Extension slot in the reference's data model: ``listing.py:9`` keeps media
as an opaque ``photoUrl`` string; here media bytes are an opaque binary
column processed inside Arrow-batched ``mapInPandas`` stages.
"""

from __future__ import annotations

import struct

import numpy as np

_QOI_MAGIC = b"qoif"
_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(pixels: np.ndarray, colorspace: int = 0) -> bytes:
    """Encode an (H, W, 3|4) uint8 array as a QOI byte stream."""
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError("encode_qoi needs (H, W, 3) or (H, W, 4)")
    h, w, channels = pixels.shape
    out = bytearray()
    out += _QOI_MAGIC
    out += struct.pack(">IIBB", w, h, channels, colorspace)

    flat = pixels.reshape(-1, channels).astype(np.int64)
    if channels == 3:
        alpha = np.full((flat.shape[0], 1), 255, dtype=np.int64)
        flat = np.concatenate([flat, alpha], axis=1)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    n = flat.shape[0]
    for i in range(n):
        px = (int(flat[i, 0]), int(flat[i, 1]), int(flat[i, 2]), int(flat[i, 3]))
        if px == prev:
            run += 1
            if run == 62 or i == n - 1:
                out.append(_OP_RUN | (run - 1))
                run = 0
        else:
            if run > 0:
                out.append(_OP_RUN | (run - 1))
                run = 0
            idx = _hash(*px)
            if index[idx] == px:
                out.append(_OP_INDEX | idx)
            else:
                index[idx] = px
                if px[3] == prev[3]:
                    dr = (px[0] - prev[0] + 128) % 256 - 128
                    dg = (px[1] - prev[1] + 128) % 256 - 128
                    db = (px[2] - prev[2] + 128) % 256 - 128
                    dr_dg = dr - dg
                    db_dg = db - dg
                    if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                        out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                    elif -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                        out.append(_OP_LUMA | (dg + 32))
                        out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                    else:
                        out.append(_OP_RGB)
                        out += bytes(px[:3])
                else:
                    out.append(_OP_RGBA)
                    out += bytes(px)
        prev = px
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> np.ndarray:
    """Decode a QOI byte stream to an (H, W, channels) uint8 array."""
    if len(data) < 14 + len(_END) or data[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI stream")
    w, h, channels, colorspace = struct.unpack(">IIBB", data[4:14])
    if channels not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"QOI colorspace must be 0 or 1, got {colorspace}")
    if data[-8:] != _END:
        raise ValueError("QOI end marker missing")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    pos = 14
    end = len(data) - 8
    i = 0
    while i < n:
        if pos >= end:
            raise ValueError("QOI stream truncated")
        b0 = data[pos]
        pos += 1
        if b0 == _OP_RGB:
            if pos + 3 > end:
                raise ValueError("QOI stream truncated in RGB chunk")
            px = (data[pos], data[pos + 1], data[pos + 2], px[3])
            pos += 3
        elif b0 == _OP_RGBA:
            if pos + 4 > end:
                raise ValueError("QOI stream truncated in RGBA chunk")
            px = (data[pos], data[pos + 1], data[pos + 2], data[pos + 3])
            pos += 4
        else:
            tag = b0 & 0xC0
            if tag == _OP_INDEX:
                px = index[b0 & 0x3F]
            elif tag == _OP_DIFF:
                dr = ((b0 >> 4) & 0x03) - 2
                dg = ((b0 >> 2) & 0x03) - 2
                db = (b0 & 0x03) - 2
                px = ((px[0] + dr) % 256, (px[1] + dg) % 256, (px[2] + db) % 256, px[3])
            elif tag == _OP_LUMA:
                if pos + 1 > end:
                    raise ValueError("QOI stream truncated in LUMA chunk")
                dg = (b0 & 0x3F) - 32
                b1 = data[pos]
                pos += 1
                dr = dg + ((b1 >> 4) & 0x0F) - 8
                db = dg + (b1 & 0x0F) - 8
                px = ((px[0] + dr) % 256, (px[1] + dg) % 256, (px[2] + db) % 256, px[3])
            else:  # _OP_RUN
                run = (b0 & 0x3F) + 1
                if i + run > n:
                    raise ValueError("QOI run overflows pixel count")
                out[i : i + run] = px
                i += run
                index[_hash(*px)] = px
                continue
        index[_hash(*px)] = px
        out[i] = px
        i += 1
    return out[:, :channels].reshape(h, w, channels)
