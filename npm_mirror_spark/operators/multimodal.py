"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no codec LIBRARIES, but three formats get REAL codecs
here with zero extra deps: PNG (pure stdlib zlib/struct, all five scanline
filters — see encode_png/decode_png), RAW1 RGB, and PCM16 audio. Only
JPEG/video decode remains a stub (deterministic fake); everything
Spark-side — schemas, batch shapes, partition sizing, UDF seams — is real
and tested either way. Swapping a stub for PIL/torchaudio changes one
function.

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


# -- PNG: a REAL compressed-image codec, pure stdlib --------------------------
#
# The container has no PIL/libpng, but PNG's container + DEFLATE + scanline
# filters need nothing beyond zlib/struct/numpy. This retires the "decode
# is stubbed" caveat for images: decode_png handles 8-bit truecolor
# (RGB/RGBA, the overwhelming training-data case) with ALL five scanline
# filter types; encode_png writes spec-valid files (cycling filters so the
# decoder's unfilter paths are genuinely exercised). Grayscale/palette/
# 16-bit/interlaced PNGs raise ValueError — a real corpus routes those to
# the error path exactly like malformed rows (F9).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr) -> bytes:
    """(H, W, 3|4) uint8 array -> PNG bytes (8-bit truecolor, non-interlaced).

    Scanline filters cycle 0..4 per row — spec-valid output that forces a
    decoder through None/Sub/Up/Average/Paeth, not just the trivial path.
    """
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    assert ch in (3, 4)
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.astype(np.int16)
    prior = np.zeros((w, ch), dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.vstack([np.zeros((1, ch), np.int16), cur[:-1]])
        ftype = y % 5
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prior
        elif ftype == 3:
            filt = cur - (left + prior) // 2
        else:  # Paeth
            up_left = np.vstack([np.zeros((1, ch), np.int16), prior[:-1]])
            p = left + prior - up_left
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - up_left)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, up_left)
            )
            filt = cur - pred
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
        prior = cur
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(content: bytes):
    """PNG bytes -> (H, W, 3|4) uint8 numpy array.

    Pure stdlib: chunk walk, zlib inflate, per-scanline unfilter (all five
    filter types, vectorized along the row). Supports 8-bit truecolor
    (color types 2/6), non-interlaced — anything else raises ValueError.
    """
    import struct
    import zlib

    import numpy as np

    b = bytes(content)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    # Every slice below is bounds-checked BEFORE struct parsing so a
    # truncated file raises ValueError, never struct.error/IndexError —
    # the F9 error-routing contract callers rely on.
    pos, ihdr, idat = 8, None, []
    while pos < len(b):
        if pos + 8 > len(b):
            raise ValueError("PNG truncated chunk header")
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > len(b):
            raise ValueError(f"PNG truncated chunk {tag!r}")
        payload = b[pos + 8 : end]
        (crc,) = struct.unpack(">I", b[end : end + 4])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            if length != 13:
                raise ValueError("PNG bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos = end + 4
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp or filt_method or interlace:
        raise ValueError(
            "unsupported PNG (need 8-bit truecolor RGB/RGBA, non-interlaced)"
        )
    ch = 3 if color_type == 2 else 4
    try:
        data = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    stride = 1 + w * ch
    if len(data) != h * stride:
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, w, ch), dtype=np.int16)
    prior = np.zeros((w, ch), dtype=np.int16)
    for y in range(h):
        line = data[y * stride : (y + 1) * stride]
        ftype = line[0]
        cur = np.frombuffer(line[1:], dtype=np.uint8).reshape(w, ch).astype(np.int16)
        if ftype == 0:
            recon = cur
        elif ftype == 2:
            recon = (cur + prior) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters recur along the row
            recon = np.zeros((w, ch), dtype=np.int16)
            up_left = np.vstack([np.zeros((1, ch), np.int16), prior[:-1]])
            for x in range(w):
                left = recon[x - 1] if x else np.zeros(ch, np.int16)
                if ftype == 1:
                    recon[x] = (cur[x] + left) % 256
                elif ftype == 3:
                    recon[x] = (cur[x] + (left + prior[x]) // 2) % 256
                else:
                    p = left + prior[x] - up_left[x]
                    pa, pb, pc = (
                        np.abs(p - left),
                        np.abs(p - prior[x]),
                        np.abs(p - up_left[x]),
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, prior[x], up_left[x]),
                    )
                    recon[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"PNG bad filter type {ftype}")
        out[y] = recon
        prior = recon
    return out.astype(np.uint8)


def png_image_features(media: DataFrame) -> DataFrame:
    """REAL image feature extraction over PNG blobs: decode (stdlib codec
    above) -> (sha256, byte_len, true width/height) via the same Arrow
    mapInPandas seam as extract_image_features. The kernel imports the
    codec from this package — importable on workers in local mode and
    wherever the wheel ships; the inline-by-value pattern stays available
    for environments without it."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        from npm_mirror_spark.operators.multimodal import decode_png as _dec

        for pdf in batches:
            dims = pdf["content"].map(
                lambda b: _dec(bytes(b)).shape[:2] if b is not None else (0, 0)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": pdf["content"].map(
                        lambda b: _hashlib.sha256(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "byte_len": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "width": dims.map(lambda d: int(d[1])),
                    "height": dims.map(lambda d: int(d[0])),
                }
            )

    return media.select("media_id", "content").mapInPandas(
        kernel, IMAGE_FEATURE_SCHEMA
    )
