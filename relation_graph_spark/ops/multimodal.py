"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

Design for 100 TB: media payloads are an opaque ``binary`` column carried
alongside typed metadata (width/height/duration); all compute over them goes
through Arrow-batched ``mapInPandas`` so the bytes move Python-side once per
batch, never per row, and the output is a narrow integer frame that joins /
aggregates JVM-side afterwards.

Two featurizers:

- ``payload_byte_features`` — a real, deterministic featurizer over the raw
  bytes (per-bin byte histogram in exact ppm). Fully vectorized: the batch's
  payloads are concatenated into one contiguous buffer and a single
  ``np.bincount`` over ``segment_id * dim + (byte >> shift)`` produces every
  histogram at once — zero per-row Python. This is the oracle-checked path.
- ``decode_image_features`` — the *actual* image/audio decode, STUBBED: the
  decode libraries (PIL/ffmpeg) are not in this container, so it raises
  NotImplementedError. The batch shape, schema and partitioning it would use
  are exactly those of ``payload_byte_features``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("dim_idx", IntegerType(), False),
        StructField("feat_ppm", LongType(), False),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from documents: payload =
    UTF-8 text bytes as a true ``binary`` column, metadata from lengths.
    Stands in for a real image/audio/video payload column."""
    return docs.select(
        F.col("doc_id").cast("bigint").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),  # binary
        (F.length("text") % 1920).cast("int").alias("width"),
        (F.length("text") % 1080).cast("int").alias("height"),
        (F.length("text") * 7).cast("int").alias("duration_ms"),
    )


def payload_byte_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Byte-histogram features over the binary payload, exact integer ppm.

    Output: one row per (media_id, dim_idx) with
    ``feat_ppm = floor(count(bytes in bin) * 1e6 / n_bytes)`` where
    ``bin = byte >> log2(256/dim)``. Deterministic and engine-order-free, so
    a DuckDB oracle reproduces it bit-for-bit.

    Vectorization: one buffer concat + one np.bincount per Arrow batch; no
    per-row Python. The row explosion to (media_id, dim_idx) happens inside
    the same batch via np.repeat, so the UDF emits the final narrow frame.
    """
    assert dim > 0 and 256 % dim == 0 and (256 // dim).bit_length() >= 1
    shift = (256 // dim).bit_length() - 1  # byte >> shift in [0, dim)

    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            payloads = pdf["payload"]  # bytes objects
            lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            seg = np.repeat(np.arange(n, dtype=np.int64), lens)
            bins = buf >> shift
            counts = np.bincount(seg * dim + bins, minlength=n * dim).reshape(n, dim)
            safe_lens = np.where(lens == 0, 1, lens)
            ppm = counts * 1_000_000 // safe_lens[:, None]
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(np.int64), dim),
                    "n_bytes": np.repeat(lens, dim),
                    "dim_idx": np.tile(np.arange(dim, dtype=np.int32), n),
                    "feat_ppm": ppm.reshape(-1),
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video/audio payloads: emit `n_frames`
    evenly-spaced sample positions per media item with the byte found there
    — entirely JVM column expressions (sequence + explode + substring), so
    the sampling plan is whole-stage-codegen'd and the (huge) payload column
    is read once per row.

    A real deployment replaces "byte at offset" with "decoded frame at
    timestamp" inside the same exploded shape (decode lives behind
    `decode_image_features`, stubbed here); offsets are
    1 + floor(k * n_bytes / n_frames) — deterministic, oracle-checkable.
    """
    n_bytes = F.length("payload").cast("bigint")
    frames = media.select(
        "media_id",
        n_bytes.alias("n_bytes"),
        F.col("payload"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    ).where(n_bytes > 0)
    offset = F.expr(f"1 + (frame_idx * n_bytes) div {n_frames}")  # exact int
    # payloads here are UTF-8 text bytes (synthesize_media); real binary
    # payloads swap decode() for a direct byte slice
    sample = F.ascii(F.decode(F.col("payload"), "UTF-8").substr(offset, F.lit(1)))
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        offset.alias("byte_offset"),
        sample.cast("int").alias("sample_byte"),
    )


def decode_image_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Real image/audio decode + feature extraction — STUB.

    The decode libraries (PIL / torchaudio / ffmpeg) are not available in
    this environment. A real deployment decodes inside the same
    ``mapInPandas`` batch loop that ``payload_byte_features`` uses (same
    schema, same partitioning, same Arrow batch shape); see that function for
    the live plumbing.
    """
    raise NotImplementedError(
        "image/audio decode libraries are not available in this environment; "
        "use payload_byte_features for the deterministic byte-level featurizer "
        "with identical Spark-side plumbing"
    )
