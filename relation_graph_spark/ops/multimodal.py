"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The decode step itself is STUBBED (the image/audio libraries are not in this
container): `decode_image_features` raises NotImplementedError unless
`fake=True`, in which case it produces a deterministic fake feature vector
from the bytes — the Spark-side plumbing (schema, Arrow batching, partition
shape, UDF signature) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", StringType(), True),  # opaque bytes (binary at scale)
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from documents: payload =
    text bytes, metadata from lengths. Stands in for a real binary column."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("text").alias("payload"),
        (F.length("text") % 1920).cast("int").alias("width"),
        (F.length("text") % 1080).cast("int").alias("height"),
        (F.length("text") * 7).cast("int").alias("duration_ms"),
    )


def decode_image_features(media: DataFrame, dim: int = 8, fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payload column.

    Real decode requires PIL/ffmpeg (absent here): raises NotImplementedError
    unless fake=True, which computes a deterministic byte-histogram feature —
    exercising the exact mapInPandas batch shape a real decoder would use.
    """
    if not fake:
        raise NotImplementedError(
            "image/audio decode libraries are not available in this environment; "
            "pass fake=True for the deterministic byte-histogram stand-in"
        )
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].astype(str)
            feats = []
            for s in payloads:  # per-cell numpy hist; vectorized over bytes
                arr = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = max(1, hist.sum())
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)
