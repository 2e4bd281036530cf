"""Multimodal plumbing tests: schema, batch shape, determinism, binaryFile
source — decode itself is a deterministic fake in this environment."""

from __future__ import annotations

from realestatedeals_spark.operators.multimodal import (
    image_features,
    media_profile,
    read_binary_files,
    resize_images,
    sample_frames,
    synth_media,
)


def test_image_features_deterministic(spark):
    media = synth_media(spark, n=16)
    f1 = {r["media_id"]: list(r["features"]) for r in image_features(media).collect()}
    f2 = {r["media_id"]: list(r["features"]) for r in image_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_frame_sampling_shape(spark):
    media = synth_media(spark, n=4, kind="video")
    frames = sample_frames(media, every_k=2, frame_bytes=64)
    rows = frames.collect()
    # 256-byte payloads → 4 frames each → every 2nd → 2 per video
    assert len(rows) == 8
    assert all(len(bytes(r["frame"])) == 64 for r in rows)
    assert {r["frame_idx"] for r in rows} == {0, 2}


def test_resize_updates_meta(spark):
    media = synth_media(spark, n=3)
    out = resize_images(media, 224, 224)
    assert all(r["meta"]["width"] == 224 for r in out.collect())


def test_media_profile_prunes_content(spark):
    media = synth_media(spark, n=10)
    prof = {r["kind"]: r for r in media_profile(media).collect()}
    assert prof["image"]["n_items"] == 10
    assert prof["image"]["total_bytes"] == 10 * 256


def test_binary_file_source(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"img_{i}.bin").write_bytes(b"\x01\x02" * 50)
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    assert df.count() == 3
    row = df.select("length", "content").first()
    assert row["length"] == 100 and len(bytes(row["content"])) == 100
