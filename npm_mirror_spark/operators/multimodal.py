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
    DoubleType,
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


# -- RAW-RGB8: a codec-free image format with REAL kernels --------------------
#
# Compressed formats need codec libs this container lacks — but nothing
# stops a real byte-level image pipeline over an uncompressed format. RAW1
# is 12 bytes of header (magic, width, height, little-endian uint32) plus
# H*W*3 RGB bytes. The kernels below are genuine numpy transforms
# (vectorized per Arrow batch), so the multimodal path exercises real
# decode -> transform -> re-encode work end-to-end; swapping RAW1 decode
# for PIL on JPEG bytes changes only the two codec functions.

RAW1_MAGIC = b"RAW1"

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

BRIGHTNESS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def encode_raw_rgb(arr) -> bytes:
    """(H, W, 3) uint8 array -> RAW1 bytes."""
    import struct

    h, w, c = arr.shape
    assert c == 3
    return RAW1_MAGIC + struct.pack("<II", w, h) + arr.tobytes()


def decode_raw_rgb(content: bytes):
    """RAW1 bytes -> (H, W, 3) uint8 numpy array."""
    import struct

    import numpy as np

    assert content[:4] == RAW1_MAGIC, "not a RAW1 blob"
    w, h = struct.unpack("<II", content[4:12])
    return np.frombuffer(content[12:], dtype=np.uint8).reshape(h, w, 3)


def resize_raw_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of RAW1 blobs to (out_w, out_h) — a REAL
    decode/transform/re-encode kernel: numpy integer-index gather per
    image, Arrow-batched, deterministic to the byte. The blob stays
    executor-side for the whole transform; only resized bytes return."""

    def kernel(batches):
        import struct

        import numpy as np
        import pandas as _pd

        magic = b"RAW1"

        def one(b):
            b = bytes(b)
            assert b[:4] == magic
            w, h = struct.unpack("<II", b[4:12])
            arr = np.frombuffer(b[12:], dtype=np.uint8).reshape(h, w, 3)
            ys = (np.arange(out_h) * h) // out_h
            xs = (np.arange(out_w) * w) // out_w
            out = arr[ys][:, xs]
            return magic + struct.pack("<II", out_w, out_h) + out.tobytes()

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"].map(one),
                    "width": out_w,
                    "height": out_h,
                }
            )

    return media.select("media_id", "content").mapInPandas(kernel, RESIZED_SCHEMA)


def raw_image_brightness(media: DataFrame) -> DataFrame:
    """Per-channel mean brightness of RAW1 blobs — the feature-extraction
    face of the raw kernel (exact double means over uint8 pixels)."""

    def kernel(batches):
        import struct

        import numpy as np
        import pandas as _pd

        def one(b):
            b = bytes(b)
            w, h = struct.unpack("<II", b[4:12])
            arr = np.frombuffer(b[12:], dtype=np.uint8).reshape(h, w, 3)
            m = arr.reshape(-1, 3).mean(axis=0)
            return float(m[0]), float(m[1]), float(m[2])

        for pdf in batches:
            means = pdf["content"].map(one)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mean_r": means.map(lambda t: t[0]),
                    "mean_g": means.map(lambda t: t[1]),
                    "mean_b": means.map(lambda t: t[2]),
                }
            )

    return media.select("media_id", "content").mapInPandas(kernel, BRIGHTNESS_SCHEMA)


# -- PCM16: the audio analog of RAW1 -----------------------------------------

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def encode_pcm16(samples) -> bytes:
    """int16 numpy array -> little-endian PCM bytes."""
    import numpy as np

    return np.asarray(samples, dtype="<i2").tobytes()


def decode_pcm16(content: bytes):
    import numpy as np

    return np.frombuffer(content, dtype="<i2")


def pcm_features(media: DataFrame) -> DataFrame:
    """Per-clip audio features over raw PCM16 blobs: sample count, RMS
    energy, zero-crossing count — real numpy signal math, Arrow-batched,
    deterministic. (Compressed audio decode would slot in front exactly
    like PIL would for RAW1.)"""

    def kernel(batches):
        import numpy as np
        import pandas as _pd

        def one(b):
            s = np.frombuffer(bytes(b), dtype="<i2").astype(np.float64)
            n = len(s)
            rms = float(np.sqrt(np.mean(s * s))) if n else 0.0
            zc = int(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))) if n > 1 else 0
            return n, rms, zc

        for pdf in batches:
            feats = pdf["content"].map(one)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": feats.map(lambda t: t[0]),
                    "rms": feats.map(lambda t: t[1]),
                    "zero_crossings": feats.map(lambda t: t[2]),
                }
            )

    return media.select("media_id", "content").mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)
