"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are stubbed
(deterministic fake or NotImplementedError) — but everything Spark-side is
real and tested: schemas, batch shapes, partition sizing, and the UDF
seams. Swapping the stub for PIL/torchaudio changes one function.

Design rules for 100 TB of blobs:
- blobs ride as ``binary`` columns next to typed metadata structs; readers
  use ``spark.read.format("binaryFile")`` or parquet with the blob column,
  and Catalyst prunes the blob column away for metadata-only queries — the
  scan never touches bytes a query doesn't project.
- decode/feature kernels are ``mapInPandas`` (Arrow batches), never
  per-row UDFs; ``spark.sql.files.maxPartitionBytes`` + a repartition by a
  size-aware key keeps batches within executor memory.
- derived features (dims, fingerprints, embeddings) are written back as
  ordinary columns so downstream joins/dedup run on cheap typed data, with
  the blob column dropped as early as possible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried beside the blob.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image/audio/video
        StructField("format", StringType()),  # png/jpeg/wav/...
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),  # images/video
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),  # audio/video
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("content", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sha256", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_image_stub(content: bytes) -> tuple[int, int]:
    """STUB decode (no codec libs in this container): derives a
    deterministic fake (width, height) from the bytes. Replace with
    PIL.Image.open for real decoding — the Spark plumbing is unchanged."""
    if content is None:
        return (0, 0)
    h = hashlib.sha256(content).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192)


def extract_image_features(
    media: DataFrame,
    decode: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over the blob column.

    ``mapInPandas`` receives pandas batches (spark.sql.execution.arrow.
    maxRecordsPerBatch rows at a time); per batch we hash + decode and emit
    ONLY typed features — the binary column dies here, so every downstream
    exchange moves small rows.

    Default decoder is defined inside (cloudpickle-by-value) so the kernel
    runs on executors without this package on sys.path; a passed-in decoder
    must be worker-importable or dynamically defined.
    """
    if decode is None:

        def decode(content: bytes):  # mirrors decode_image_stub, by value
            import hashlib as _hashlib

            if content is None:
                return (0, 0)
            h = _hashlib.sha256(content).digest()
            return (64 + h[0] % 192, 64 + h[1] % 192)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["content"].map(lambda b: decode(bytes(b)) if b is not None else (0, 0))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": pdf["content"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest() if b is not None else None
                    ),
                    "byte_len": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                }
            )

    return media.select("media_id", "content").mapInPandas(kernel, IMAGE_FEATURE_SCHEMA)


def sample_frames_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — pure plumbing with a stubbed decoder: one
    output row per sampled timestamp, frame content left NULL (a real
    decoder fills it). Output schema is what a real pipeline needs:
    (media_id, frame_ts_ms, frame).
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_ts_ms", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_ts_ms": [], "frame": []}
            for mid, dur in zip(pdf["media_id"], pdf["duration_ms"]):
                dur = int(dur) if pd.notna(dur) else 0
                for ts in range(0, dur, every_ms):
                    rows["media_id"].append(mid)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame"].append(None)  # real decoder emits bytes
            yield pd.DataFrame(rows)

    cols = media.select("media_id", F.col("meta.duration_ms").alias("duration_ms"))
    return cols.mapInPandas(kernel, out_schema)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: blob = repeated digest
    bytes, metadata consistent with the stub decoder."""
    rows = []
    for i in range(n):
        content = hashlib.sha256(str(i).encode()).digest() * (1 + i % 7)
        w, h = decode_image_stub(content)
        rows.append(
            (
                i,
                bytearray(content),
                ("image", "fake", len(content), w, h, None)
                if i % 3 != 0
                else ("video", "fake", len(content), w, h, 1000 * (1 + i % 5)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
