"""Acoustic fingerprint near-dup (operators/multimodal.audio_fingerprint):
gain invariance, cross-container identity (WAV vs FLAC of the same PCM),
and the typed-null edges the sf fixture never exercises."""

from __future__ import annotations

import numpy as np

from realestatedeals_spark.operators.flac import encode_flac
from realestatedeals_spark.operators.multimodal import (
    audio_fingerprint,
    encode_wav_pcm16,
)


def _pcm(base: int, n: int = 1600) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return (base * 7 + i * 13) % 401 - 200


def _media(spark, rows):
    return spark.createDataFrame(
        [(mid, bytearray(b)) for mid, b in rows], "media_id long, content binary"
    )


def _fps(spark, rows):
    out = audio_fingerprint(_media(spark, rows)).collect()
    return {r.media_id: r.fp for r in out}


def test_gain_invariance_and_base_separation(spark):
    s = _pcm(3)
    rows = [
        (1, encode_wav_pcm16(s, 8000)),
        (2, encode_wav_pcm16(2 * s, 8000)),   # volume x2: same print
        (3, encode_wav_pcm16(3 * s, 8000)),   # volume x3: same print
        (4, encode_wav_pcm16(_pcm(17), 8000)),  # different recording
    ]
    fps = _fps(spark, rows)
    assert fps[1] == fps[2] == fps[3]
    assert len(fps[1]) == 30 and set(fps[1]) <= {"0", "1"}
    assert fps[4] != fps[1]


def test_cross_container_wav_flac_same_print(spark):
    """A lossless re-encode in a different container is the canonical
    near-duplicate: the FLAC of the same PCM must print identically to the
    WAV (both decode through the magic-byte dispatcher)."""
    s = _pcm(9)
    fps = _fps(
        spark,
        [(1, encode_wav_pcm16(s, 8000)), (2, encode_flac(s, 8000))],
    )
    assert fps[1] == fps[2] and fps[1] is not None


def test_short_and_corrupt_tracks_yield_null(spark):
    fps = _fps(
        spark,
        [
            (1, encode_wav_pcm16(_pcm(5, n=1599), 8000)),  # one sample short
            (2, b"\x00\x01not audio"),
            (3, encode_wav_pcm16(_pcm(5), 8000)),
        ],
    )
    assert fps[1] is None and fps[2] is None
    assert fps[3] is not None


def test_matches_numpy_reference(spark):
    """Bit order pinned against a from-first-principles recompute."""
    s = _pcm(21)
    fp = _fps(spark, [(1, encode_wav_pcm16(s, 8000))])[1]
    x = s.reshape(16, 100)
    e = np.abs(x).sum(axis=1)
    z = ((x[:, :-1] * x[:, 1:]) < 0).sum(axis=1)
    want = "".join(
        str(int(b)) for b in np.concatenate([e[1:] > e[:-1], z[1:] > z[:-1]])
    )
    assert fp == want


def test_fingerprint_ops_survive_mutation_fuzz_end_to_end(spark):
    """Byte-mutation fuzz THROUGH the Spark Arrow path: a batch of mutated
    WAV/FLAC/y4m blobs must come back as one row per input — a bitstring
    or a typed null — never a crashed task (the decoders are allowed to
    raise IndexError/EOFError/zlib.error on corrupt bytes per the unified
    codec fuzz; the fingerprint catch lists must cover all of them)."""
    import random

    from realestatedeals_spark.operators.multimodal import video_fingerprint
    from realestatedeals_spark.operators.y4m import encode_y4m

    random.seed(31)
    wav = bytes(encode_wav_pcm16(_pcm(3), 8000))
    flac = bytes(encode_flac(_pcm(9), 8000))
    clip = bytes(
        encode_y4m([(_pcm(5)[:256].reshape(16, 16) % 200).astype(np.uint8)] * 4)
    )

    def mutate(data):
        b = bytearray(data)
        for _ in range(random.randrange(1, 4)):
            b[random.randrange(len(b))] = random.randrange(256)
        return bytes(b)

    audio_rows = [(i, mutate(wav if i % 2 else flac)) for i in range(120)]
    video_rows = [(i, mutate(clip)) for i in range(120)]
    got_a = audio_fingerprint(_media(spark, audio_rows)).collect()
    got_v = video_fingerprint(_media(spark, video_rows)).collect()
    assert len(got_a) == 120 and len(got_v) == 120
    for rows in (got_a, got_v):
        ok = sum(1 for r in rows if r.fp is not None)
        bad = sum(1 for r in rows if r.fp is None)
        assert all(set(r.fp) <= {"0", "1"} for r in rows if r.fp is not None)
        # both outcomes must occur for the fuzz to mean anything
        assert ok > 5 and bad > 5, (ok, bad)
