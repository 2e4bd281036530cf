"""YUV4MPEG2 (.y4m) codec, from the public mjpegtools stream format: a
plain-text stream header (``YUV4MPEG2 W.. H.. F..:.. I. A..:.. C..``),
then one ``FRAME``-delimited planar picture per frame. Raw video — no
entropy coding — so roundtrips are lossless and queries carry plain
arithmetic oracles. Supports C444 (full-rate planar YUV) and Cmono
(luma-only); C420's chroma decimation is lossy by construction and out
of scope like other lossy boundaries.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: list[np.ndarray], fps_num: int = 25, fps_den: int = 1
) -> bytes:
    """Encode frames — each (H, W) mono or (H, W, 3) planar-packed YUV
    uint8 — as a .y4m stream. All frames must share one geometry."""
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    f0 = np.asarray(frames[0])
    if f0.ndim == 2:
        mode, h, w = "mono", *f0.shape
    elif f0.ndim == 3 and f0.shape[2] == 3:
        mode, h, w = "444", f0.shape[0], f0.shape[1]
    else:
        raise ValueError("frames must be (H, W) or (H, W, 3) uint8")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("frame rate must be positive")
    out = bytearray()
    out += _MAGIC + f" W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C{mode}\n".encode()
    for fr in frames:
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.shape != f0.shape:
            raise ValueError("all frames must share one geometry")
        out += b"FRAME\n"
        if mode == "mono":
            out += fr.tobytes()
        else:
            # planar layout: full Y plane, then U, then V
            out += fr[:, :, 0].tobytes()
            out += fr[:, :, 1].tobytes()
            out += fr[:, :, 2].tobytes()
    return bytes(out)


def decode_y4m(data: bytes) -> tuple[int, int, tuple[int, int], list[np.ndarray]]:
    """Decode a .y4m stream -> (width, height, (fps_num, fps_den), frames)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    mode = "420jpeg"  # format default when no C tag present
    for tok in data[len(_MAGIC) : nl].split():
        tag, val = chr(tok[0]), tok[1:].decode()
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == "C":
            mode = val
    if not w or not h:
        raise ValueError("y4m header missing W or H")
    if mode == "mono":
        frame_bytes = w * h
    elif mode == "444":
        frame_bytes = 3 * w * h
    else:
        raise ValueError(f"unsupported y4m colourspace C{mode}")
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("y4m FRAME marker missing")
        start = fnl + 1
        raw = data[start : start + frame_bytes]
        if len(raw) < frame_bytes:
            raise ValueError("y4m frame truncated")
        if mode == "mono":
            frames.append(np.frombuffer(raw, np.uint8).reshape(h, w).copy())
        else:
            planes = np.frombuffer(raw, np.uint8).reshape(3, h, w)
            frames.append(np.stack([planes[0], planes[1], planes[2]], axis=2))
        pos = start + frame_bytes
    return w, h, fps, frames
