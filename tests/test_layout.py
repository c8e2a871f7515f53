"""Z-order layout (operators/layout.py): key parity with a pure-Python
Morton reference, the locality payoff vs a single-column sort, and the
degenerate-input contracts.  q_zorder's value parity is oracle-checked
registry-wide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from npm_mirror_spark.operators.layout import (
    with_zorder_key,
    zorder_shard_stats,
)


def _morton(coords: list[int], bits: int) -> int:
    z = 0
    n = len(coords)
    for j, c in enumerate(coords):
        for i in range(bits):
            z |= ((c >> i) & 1) << (i * n + j)
    return z


def test_zkey_matches_python_reference(spark):
    """Spark's shift/mask expression == the textbook Morton interleave,
    including the integer range bucketing from min/max."""
    rows = [(i, x, y) for i, (x, y) in enumerate(
        [(0, 0), (7, 3), (100, 50), (255, 255), (13, 200)]
    )]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = {
        r["i"]: r["zkey"]
        for r in with_zorder_key(df, ["x", "y"], bits=8).collect()
    }
    xs, ys = [r[1] for r in rows], [r[2] for r in rows]
    mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)
    for i, x, y in rows:
        cx = (x - mnx) * 255 // (mxx - mnx)
        cy = (y - mny) * 255 // (mxy - mny)
        assert got[i] == _morton([cx, cy], 8), (i, x, y)


def test_zorder_tightens_both_dimensions(spark):
    """The file-skipping payoff: on a uniform 64x64 grid, Z-order shards
    bound BOTH columns (total bounding-box area far below the x-sorted
    layout, whose y-ranges stay full-width)."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )

    def total_area(stats_rows):
        return sum(
            (r["max_x"] - r["min_x"] + 1) * (r["max_y"] - r["min_y"] + 1)
            for r in stats_rows
        )

    z_area = total_area(
        zorder_shard_stats(grid, ["x", "y"], bits=6, shard_bits=4).collect()
    )
    # x-sorted layout: 16 equal shards by x alone -> y spread stays 64
    xsort = grid.withColumn("shard", (F.col("x") / 4).cast("int"))
    x_area = total_area(
        xsort.groupBy("shard")
        .agg(
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.min("y").alias("min_y"), F.max("y").alias("max_y"),
        )
        .collect()
    )
    # 16 z-shards tile the grid into 16x16 squares: area 16*256=4096;
    # x-sort shards are 4x64 strips: same area here, BUT restrict the
    # probe to a band predicate on y to see the skipping difference
    assert z_area <= x_area
    # direct skipping measure: files touched by a point-ish predicate
    # (x in [8,11], y in [8,11]) — Z-order touches 1 tile, x-sort
    # touches every strip overlapping x in [8,11] AND all y (1 strip,
    # y-range useless) vs a y-probe (y in [8,11]) where x-sort touches
    # ALL 16 strips and Z-order only the 4 tiles of that y-band
    zstats = zorder_shard_stats(grid, ["x", "y"], bits=6, shard_bits=4).collect()
    z_touched = sum(
        1 for r in zstats if r["min_y"] <= 11 and r["max_y"] >= 8
    )
    xstats = (
        xsort.groupBy("shard")
        .agg(F.min("y").alias("min_y"), F.max("y").alias("max_y"))
        .collect()
    )
    x_touched = sum(
        1 for r in xstats if r["min_y"] <= 11 and r["max_y"] >= 8
    )
    assert z_touched < x_touched, (z_touched, x_touched)


def test_zorder_null_and_constant_columns(spark):
    """NULLs and zero-span columns bucket to coordinate 0 instead of
    dividing by zero; every row still gets a key."""
    df = spark.createDataFrame(
        [(1, None, 5), (2, 3, 5), (3, 9, 5)], "i long, x long, y long"
    )
    rows = with_zorder_key(df, ["x", "y"], bits=4).collect()
    assert len(rows) == 3
    keys = {r["i"]: r["zkey"] for r in rows}
    assert keys[1] == 0  # NULL x -> coord 0; constant y -> coord 0
    assert all(r["zkey"] is not None for r in rows)


def test_zorder_rejects_overwide_key():
    with pytest.raises(ValueError, match="int64"):
        with_zorder_key(None, ["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match="at least one"):
        with_zorder_key(None, [], bits=16)
