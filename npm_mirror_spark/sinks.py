"""Batch sinks: the reference's artifact-store layout as table layout.

The reference buckets artifacts into 3-char-prefix directories "for quicker
access from the file system" (changes_consumer.py:95-125, README.md:27).
The Spark-native equivalent is ``partitionBy(bucket)`` on write: the same
prefix scheme becomes parquet partition directories, and every read that
filters on the bucket gets partition-pruned by Catalyst — the 100 TB
version of 'quicker access'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from npm_mirror_spark.operators.projections import prefix_bucket


def write_bucketed_by_prefix(
    df: DataFrame,
    path: str,
    name_col: str,
    width: int = 3,
    mode: str = "overwrite",
) -> None:
    """Write with the prefix-hash directory layout (P7/P11/K5).

    Scale notes: partition count is bounded by the prefix alphabet
    (36^width); each partition dir holds many row groups, so this layout
    never fragments into small-file hell the way per-package dirs would.
    """
    out = df.withColumn("bucket", prefix_bucket(name_col, width))
    out.write.partitionBy("bucket").mode(mode).parquet(path)


def append_log(df: DataFrame, path: str) -> None:
    """Append-only log table (K4 deletion log / K2 stage logs)."""
    df.write.mode("append").parquet(path)


def write_deduped(
    df: DataFrame,
    existing: DataFrame | None,
    key: str,
    path: str,
    min_key=None,
) -> None:
    """Effectively-once append: in-batch dropDuplicates + anti-join against
    the already-committed keys (K3 upgrade over the reference's
    duplicate-happy db.save, changes_consumer.py:325).

    Pass ``min_key`` (the batch's smallest key — exact, since a redelivered
    row keeps its original key) to bound the committed side: the filter
    pushes into the committed-keys scan so the anti-join input tracks the
    redelivery window, not the sink's whole history. No broadcast hint —
    AQE broadcasts small committed sets itself and a large one must be
    allowed to shuffle instead of exhausting the driver."""
    out = df.dropDuplicates([key])
    if existing is not None:
        committed = existing.select(key)
        if min_key is not None:
            committed = committed.filter(F.col(key) >= F.lit(min_key))
        out = out.join(committed, key, "left_anti")
    out.write.mode("append").parquet(path)
