"""Multimodal columns (SURVEY.md §2b X5).

Image/audio/video ride as opaque ``binary`` columns with a typed metadata
struct; per-item compute (decode, feature-extract, resize, frame-sample) is
Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema, batch
shape, partitioning) is real and tested, while codec work is import-gated:
with no imaging/codec libraries in the environment, decode falls back to a
clearly-marked deterministic fake so pipelines remain testable end-to-end
(the contract the build mandates: stub the decode, keep the plumbing real).

The reference's vestigial multimodal hook is the ``photoUrl`` field
(listing.py:9) — fetched-image bytes would land in exactly this layout.

Scale notes: binary payloads dominate partition size — size partitions by
``spark.sql.files.maxPartitionBytes``/``binaryFile`` source, keep metadata
in separate (pruned) columns so metadata-only queries never touch bytes,
and never collect content to the driver.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synth_media(spark: SparkSession, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake payloads (seeded by media_id) for tests/demos."""
    rows = []
    for i in range(n):
        blob = hashlib.sha256(f"{kind}-{i}".encode()).digest() * 8  # 256 bytes
        meta = {
            "format": "fake",
            "width": 32 + (i % 8) * 16,
            "height": 32 + (i % 5) * 16,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 16 if kind == "video" else None,
        }
        rows.append((i, kind, bytearray(blob), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """X5 source — files as (path, modificationTime, length, content) rows;
    pushdown on path/length happens before content is read."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


_FEATURE_DIM = 8


def image_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Decode + feature-extract per image, Arrow-batched.

    The real-codec path is OPT-IN (``use_real_codec=True``) and currently a
    marked stub — merely having PIL installed must not change behavior. The
    default path derives a deterministic ``_FEATURE_DIM``-float vector from
    the content hash — FAKE values, real plumbing (batch iteration, schema,
    null handling). Output: media_id, n_bytes, features array<float>.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real_codec:
            raise NotImplementedError(
                "real image decode path not implemented in this container; "
                "plug a codec (e.g. PIL) into this mapInPandas body"
            )
        for pdf in batches:
            ids, nbytes, feats = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                ids.append(mid)
                if content is None:
                    nbytes.append(0)
                    feats.append(None)
                    continue
                b = bytes(content)
                nbytes.append(len(b))
                h = hashlib.sha256(b).digest()
                feats.append(
                    [
                        _struct.unpack(">I", h[4 * j : 4 * j + 4])[0] / 2**32
                        for j in range(_FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame({"media_id": ids, "n_bytes": nbytes, "features": feats})

    return media.select("media_id", "content").mapInPandas(
        run, schema=f"media_id long, n_bytes long, features array<float>"
    )


def resize_images(
    media: DataFrame, width: int, height: int, use_real_codec: bool = False
) -> DataFrame:
    """Resize stub: metadata transforms are real column ops; pixel work is
    an opt-in stub (``use_real_codec=True`` raises until a codec is plugged
    in). Output keeps the media schema with updated meta so downstream
    plumbing is exercisable."""
    if use_real_codec:
        raise NotImplementedError("plug a codec resize into a mapInPandas body here")
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )


def sample_frames(media: DataFrame, every_k: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Frame sampling for video rows — pure byte-chunk math (no codec):
    frame i = content[i*frame_bytes : (i+1)*frame_bytes], keep every k-th.
    One output row per kept frame. Real codecs would replace the chunking,
    not the dataflow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                b = bytes(content)
                n = len(b) // frame_bytes
                for i in range(0, n, every_k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytearray(b[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(run, schema="media_id long, frame_idx int, frame binary")
    )


def media_profile(media: DataFrame) -> DataFrame:
    """Metadata-only profiling — must never deserialize ``content`` (column
    pruning keeps the binary out of the scan)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.avg("meta.width").alias("avg_width"),
        F.max("meta.n_frames").alias("max_frames"),
    )
