"""Temporal video fingerprint (operators/multimodal.video_fingerprint):
brightness-offset invariance, frame-count separation, color-luma path,
and typed-null edges."""

from __future__ import annotations

import numpy as np

from realestatedeals_spark.operators.multimodal import video_fingerprint
from realestatedeals_spark.operators.y4m import encode_y4m


def _clip(base: int, n: int = 5, off: int = 0) -> list[np.ndarray]:
    r = np.arange(16, dtype=np.int64)[:, None]
    c = np.arange(16, dtype=np.int64)[None, :]
    return [
        ((base * 19 + 29 * f + 3 * r + 5 * c) % 200 + off).astype(np.uint8)
        for f in range(n)
    ]


def _fps(spark, rows):
    media = spark.createDataFrame(
        [(mid, bytearray(b)) for mid, b in rows], "media_id long, content binary"
    )
    return {r.media_id: r.fp for r in video_fingerprint(media).collect()}


def test_brightness_invariance_and_clip_separation(spark):
    fps = _fps(
        spark,
        [
            (1, encode_y4m(_clip(3))),
            (2, encode_y4m(_clip(3, off=10))),   # brighter copy: same print
            (3, encode_y4m(_clip(3, off=20))),
            (4, encode_y4m(_clip(11))),          # different clip
            (5, encode_y4m(_clip(3, n=4))),      # fewer frames: length differs
        ],
    )
    assert fps[1] == fps[2] == fps[3]
    assert len(fps[1]) == 5 * 3 + 4
    assert fps[4] != fps[1]
    assert len(fps[5]) == 4 * 3 + 3  # can never collide with 5-frame prints


def test_color_uses_luma_plane(spark):
    """(H, W, 3) frames print from the Y plane: chroma-only differences
    collapse (the near-dup semantic for recolored copies)."""
    mono = _clip(7, n=4)
    color_a = [np.stack([f, f // 2, f // 3], axis=2).astype(np.uint8) for f in mono]
    color_b = [
        np.stack([f, np.zeros_like(f), np.full_like(f, 9)], axis=2) for f in mono
    ]
    fps = _fps(
        spark,
        [(1, encode_y4m(mono)), (2, encode_y4m(color_a)), (3, encode_y4m(color_b))],
    )
    assert fps[1] == fps[2] == fps[3]


def test_bad_clips_yield_null(spark):
    odd = [np.zeros((15, 16), np.uint8)] * 3  # odd height: no exact quadrants
    fps = _fps(
        spark,
        [(1, b"not a y4m stream"), (2, encode_y4m(odd)), (3, encode_y4m(_clip(2)))],
    )
    assert fps[1] is None and fps[2] is None and fps[3] is not None


def test_matches_numpy_reference(spark):
    frames = _clip(13, n=4)
    fp = _fps(spark, [(1, encode_y4m(frames))])[1]
    bits, totals = [], []
    for f in frames:
        x = f.astype(np.int64)
        q0, q1 = x[:8, :8].sum(), x[:8, 8:].sum()
        q2, q3 = x[8:, :8].sum(), x[8:, 8:].sum()
        bits += ["1" if q1 > q0 else "0", "1" if q2 > q0 else "0",
                 "1" if q3 > q0 else "0"]
        totals.append(q0 + q1 + q2 + q3)
    bits += ["1" if totals[i + 1] > totals[i] else "0" for i in range(3)]
    assert fp == "".join(bits)
