"""Z-order (Morton) clustering: a physical layout for multi-dimensional
predicate pruning.

partitionBy prunes on ONE column; bucketBy co-locates ONE join key. When
queries filter on two or more numeric columns (the reference's
organize-NAS.py scans by both prefix bucket and size; a curation pipeline
filters by (quality, length) or (cluster, ts)), interleaving the bits of
the per-column buckets gives every parquet row group a narrow min/max
range in EVERY dimension at once — so predicate pushdown on any of them
skips most of the file. This is the same technique Delta/Iceberg expose
as OPTIMIZE ZORDER BY; here it is expressed with nothing but Spark
expressions: range-scale each column to a fixed-width integer, interleave
bits JVM-side, repartitionByRange + sortWithinPartitions on the key.

Scale notes: the min/max scaling bounds come from a broadcast 1-row
aggregate (one extra pass, no shuffle); the layout write is exactly one
range shuffle — the same cost as any global sort write — and readers pay
nothing: pruning works through plain parquet row-group statistics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled_bucket(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column linearly onto [0, 2^bits) as a BIGINT.

    floor on a non-negative scaled double; the hi==lo degenerate case
    collapses to bucket 0 (constant columns cannot be clustered anyway).
    """
    n = F.lit((1 << bits) - 1)
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span > 0, (F.col(col).cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(F.floor(frac * (1 << bits)).cast("bigint"), n.cast("bigint"))


def zorder_key(cols: list[str], bounds: dict[str, tuple[Column, Column]], bits: int = 8) -> Column:
    """Interleaved-bit Morton key over ``cols`` (round-robin bit order)."""
    buckets = [_scaled_bucket(c, *bounds[c], bits) for c in cols]
    d = len(buckets)
    parts: list[Column] = []
    for i in range(bits):
        for j, b in enumerate(buckets):
            # bit i of bucket j lands at interleaved position i*d + j
            parts.append(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    return reduce(lambda a, x: a.bitwiseOR(x), parts).alias("__zkey")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
) -> None:
    """Write ``df`` clustered by the Morton key of ``cols``.

    One broadcast bounds pass + one range shuffle; every output file is
    sorted by the key, so row groups are tight in all ``cols`` at once.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    b = df.agg(*aggs)
    bounds = {c: (F.col(f"__lo_{c}"), F.col(f"__hi_{c}")) for c in cols}
    keyed = df.join(F.broadcast(b)).withColumn(
        "__zkey", zorder_key(cols, bounds, bits)
    )
    drop = [f"__lo_{c}" for c in cols] + [f"__hi_{c}" for c in cols]
    (
        keyed.drop(*drop)
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
