"""Multimodal (image/audio/video) column handling.

Media travel as opaque ``binary`` columns with typed metadata; all heavy
per-item work (decode, resize, feature extraction, frame sampling) runs as
Arrow-batched ``mapInPandas`` stages so the Spark-side plumbing — schema,
partitioning, batch shape — is identical to a production pipeline.

The actual codecs (PIL/ffmpeg/soundfile) are NOT available in this sandbox,
so the decode step is stubbed: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder derives
(width, height, mean_luma) from the bytes — keeping every downstream stage
real and testable. Swap ``_fake_decode`` for a PIL call on a real cluster;
nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), False),     # opaque encoded bytes
    StructField("mime", StringType(), True),
    StructField("n_bytes", LongType(), True),
])


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height, mean_luma) from the byte content."""
    h = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    width = 64 + int(h[:8].sum()) % 1984
    height = 64 + int(h[8:16].sum()) % 1984
    mean_luma = float(h.mean()) / 255.0
    return width, height, mean_luma


IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("mean_luma", DoubleType(), False),
    StructField("n_bytes", LongType(), False),
])


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Per-image decode + feature extraction as an Arrow-batched stage.

    On a real cluster replace the fake decoder with PIL:
        img = PIL.Image.open(io.BytesIO(payload)); arr = np.asarray(img)
    The Spark plumbing (schema, batch iteration, partitioning) is unchanged.
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if not fake:
                    raise NotImplementedError(
                        "image decoding requires PIL/ffmpeg, not present in "
                        "this sandbox; pass fake=True for the deterministic "
                        "stub decoder")
                w, h, luma = _fake_decode(data)
                rows.append((int(mid), w, h, luma, len(data)))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return (df.where(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(stage, schema=IMAGE_FEATURES_SCHEMA))


def sample_video_frames(df: DataFrame, every_nth: int = 30,
                        fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_idx, frame binary).
    The fake path slices the payload deterministically; a real decoder would
    demux with ffmpeg. One input row fans out to ceil(n_frames/every_nth)
    rows — mapInPandas handles the 1->N shape natively."""
    out_schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ])

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if not fake:
                    raise NotImplementedError(
                        "video demuxing requires ffmpeg; pass fake=True")
                n_frames = max(1, len(data) // 64)
                for fi in range(0, n_frames, every_nth):
                    rows.append((int(mid), fi, data[fi * 64:(fi + 1) * 64]))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return (df.where(F.col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(stage, schema=out_schema))


def synthetic_media(spark, n: int = 200) -> DataFrame:
    """Deterministic fake media table exercising the binary-column plumbing."""
    rng = np.random.default_rng(42)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append((i, kind, bytearray(payload), f"{kind}/x-fake", size))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
