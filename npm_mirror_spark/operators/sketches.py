"""Deterministic mergeable sketches, expressed relationally.

The reference engine has no sketch surface (it is a ~1.4 kLoC ETL,
app/changes_consumer.py); this is extension surface for the spec's
approximate-analytics list, complementing q_approx_stats' built-in
HLL/KLL (approximate by nature, rows-only for the oracle) with a sketch
whose arithmetic is EXACTLY reproducible: Count-Min (Cormode &
Muthukrishnan 2005) built from seeded md5 hashes, so a SQL oracle can
replay every cell and every estimate bit-for-bit.

Why a groupBy IS the sketch: CMS cell (r, b) holds sum of counts of
keys with h_r(key) = b — i.e. ``groupBy(r, hash_r(key)).count()``.
That makes the sketch

- one shuffle of (r, b) int pairs, with map-side partial aggregation
  (Spark's partial HashAggregate is exactly the classic "mergeable
  sketch" property — partitions build local sketches, the exchange
  adds them cell-wise);
- bounded output: depth x width rows regardless of input size;
- composable: union two sketch frames and re-aggregate to merge.

Estimates are the textbook min over depth cells, via a broadcast join
of the (bounded) sketch onto the probe keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_bucket(key: F.Column, r: F.Column, width: int) -> F.Column:
    """h_r(key) = int64(md5(r ':' key)[:15 hex]) mod width — seeded,
    engine-portable (DuckDB replays it verbatim), uniform enough for
    counting; 15 hex chars keep the conv() inside int64."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", r.cast("string"), key.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(int(width)),
    ).cast("int")


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a depth x width CMS over ``key_col``: rows (r, b, c).

    Each input row contributes ``weight_col`` (default 1) to one cell
    per hash row r.  The depth-way row explosion happens map-side
    (inline array, no join); the only shuffle carries (r, b) int keys
    with partial aggregation — the mergeable-sketch addition.
    Cells never touched are absent (implicitly zero), so output is at
    most depth*width rows but usually fewer.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    rows = df.select(
        F.col(key_col).alias("__k"),
        w.alias("__w"),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    )
    return (
        rows.groupBy(
            "r", _cms_bucket(F.col("__k"), F.col("r"), width).alias("b")
        )
        .agg(F.sum("__w").alias("c"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the sketch for each probe key: (key, est).

    est(key) = min over r of cell(r, h_r(key)); a key hashing to an
    untouched cell reads 0.  The sketch is bounded (depth*width rows)
    so it BROADCASTS onto the probes — estimating is map-side, no
    probe shuffle except the final per-key min (|probes| x depth rows).
    The CMS guarantee: est >= true count always (one-sided error).
    """
    pr = probes.select(F.col(key_col)).distinct()
    lookups = pr.select(
        key_col,
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    ).withColumn("b", _cms_bucket(F.col(key_col), F.col("r"), width))
    return (
        lookups.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )
