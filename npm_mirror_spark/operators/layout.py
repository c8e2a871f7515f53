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

Two key faces, one interleave:

- the WRITE path (``zorder_key`` / ``write_zordered``) range-scales
  through doubles — it accepts any numeric column (events.value is a
  DOUBLE) and its output is a physical layout, judged by parquet
  row-group statistics, not value-hash parity;
- the AUDIT face (``with_zorder_key`` / ``zorder_shard_stats``, r7) is
  EXACT INTEGER arithmetic — ((v - lo) * (2^bits - 1)) div (hi - lo) on
  integer-valued columns — so the whole key is engine-portable and
  q_zorder hash-checks the per-shard range audit bit-for-bit against
  DuckDB.  NULL values and zero-span columns bucket to coordinate 0
  (nulls-first; a constant column cannot be clustered anyway).

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


def _interleave(coords: list[Column], bits: int) -> Column:
    """Morton interleave (round-robin bit order): bit i of coordinate j
    lands at position i*d + j.  Callers must pass STAGED columns, not
    raw expressions — each coordinate is referenced ``bits`` times and
    an embedded subtree would be evaluated once per reference."""
    d = len(coords)
    parts: list[Column] = []
    for i in range(bits):
        for j, b in enumerate(coords):
            parts.append(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    return reduce(lambda a, x: a.bitwiseOR(x), parts)


def zorder_key(cols: list[str], bounds: dict[str, tuple[Column, Column]], bits: int = 8) -> Column:
    """Interleaved-bit Morton key over ``cols`` (double-scaled buckets —
    the write-path face; see module docstring)."""
    return _interleave(
        [_scaled_bucket(c, *bounds[c], bits) for c in cols], bits
    ).alias("__zkey")


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Add the EXACT-INTEGER Morton Z-key over integer-valued ``cols``
    as ``out_col``: one broadcast min/max bounds pass (a 1-row frame
    cross-joined in — one lazy plan, no driver collect), coordinates
    staged as real projection columns (each is referenced ``bits``
    times by the interleave), then a pure map-side shift/mask
    expression.  Engine-portable: DuckDB replays every key bit-for-bit
    (the q_zorder oracle)."""
    if not cols:
        raise ValueError("need at least one column to Z-order")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{bits} bits x {len(cols)} cols exceeds the int64 key"
        )
    top = (1 << bits) - 1
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    coord_cols = {}
    max_span = (2**63 - 1) // top
    for c in cols:
        q, lo, hi = f"`{c}`", f"`__lo_{c}`", f"`__hi_{c}`"
        span = f"(cast({hi} as bigint) - cast({lo} as bigint))"
        # integer range bucket: div, never float division — float
        # quotients can round across a bucket edge for large values.
        # Span guard: same int64 wrap bound as with_hilbert_key — past
        # it the * {top} multiply wraps silently in non-ANSI mode.
        coord_cols[f"__coord_{c}"] = F.expr(
            f"CASE WHEN {q} IS NULL OR {hi} IS NULL THEN cast(0 as bigint) "
            # a NEGATIVE computed span is impossible without int64 wrap
            # (hi >= lo by construction), so it must raise too — falling
            # into a '<= 0' zero branch would silently collapse every
            # key (review finding)
            f"WHEN {span} < 0 THEN cast(raise_error(concat("
            f"'with_zorder_key: span of {c} wrapped int64 "
            f"(hi - lo overflows); pre-bucket the column')) as bigint) "
            f"WHEN {span} = 0 THEN cast(0 as bigint) "
            f"WHEN {span} > {max_span} THEN cast(raise_error(concat("
            f"'with_zorder_key: span of {c} (', cast({span} as string), "
            f"') overflows the int64 scale at {bits} bits; "
            f"pre-bucket the column')) as bigint) "
            f"ELSE ((cast({q} as bigint) - cast({lo} as bigint)) * {top}) "
            f"div {span} END"
        )
    out = out.withColumns(coord_cols)
    z = _interleave([F.col(f"__coord_{c}") for c in cols], bits)
    drop = (
        [f"__lo_{c}" for c in cols]
        + [f"__hi_{c}" for c in cols]
        + [f"__coord_{c}" for c in cols]
    )
    return out.withColumn(out_col, z).drop(*drop)


def zorder_shard_stats(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    shard_bits: int = 4,
) -> DataFrame:
    """Per-shard column-range audit of a Z-order layout: shard = the
    top ``shard_bits`` of the Z-key (2^shard_bits files), with each
    shard's row count and min/max per dimension — the numbers a
    file-skipping scan planner actually reads.  Tight ranges in EVERY
    column are the Z-order payoff; a single-column sort gives tight
    ranges in one.

    One map-side key expression + one (shard) aggregation shuffle of
    count/min/max — the audit costs less than the layout write it
    validates.
    """
    keyed = with_zorder_key(df, cols, bits)
    width = bits * len(cols)
    shard = F.shiftright(F.col("zkey"), width - shard_bits).cast("int")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"max_{c}"))
    return keyed.groupBy(shard.alias("shard")).agg(*aggs)


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


def with_hilbert_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "hkey",
) -> DataFrame:
    """Add the EXACT-INTEGER Hilbert-curve index over exactly TWO
    integer-valued columns as ``out_col`` — the locality upgrade over
    :func:`with_zorder_key`: the Hilbert curve never takes the long
    diagonal jumps Morton takes at quadrant boundaries, so consecutive
    key ranges map to tighter (x, y) rectangles and a range-clustered
    layout skips more row groups for 2-D box predicates (the property
    Delta/Iceberg's OPTIMIZE ... ZORDER literature measures; Hilbert
    is the curve the original Faloutsos/Jagadish locality studies
    recommend).

    Same scaling contract as the Z-key audit face: coordinates are
    ((v - lo) * (2^bits - 1)) div (hi - lo) on integer-valued columns
    (exact integer div, never float), bounds from ONE broadcast 1-row
    aggregate; NULL and zero-span columns bucket to coordinate 0.

    Span bound (the bigint twin of the ``bits * 2 > 62`` key guard):
    the scale multiply is exact only while (hi - lo) * (2^bits - 1)
    fits an int64, i.e. span <= (2^63 - 1) div (2^bits - 1) — ~2^47 at
    the default 16 bits, ~2^55 for the 8-bit audit face.  Beyond that
    the non-ANSI multiply would WRAP silently and produce wrong (but
    deterministic) keys, so the coordinate expression raises on such
    spans instead (staged raise_error, same pattern as km_cells); key
    domains wider than the bound should be pre-bucketed (v div 2^k)
    before layout.

    The xy→d transform is the classical rotate-and-accumulate loop
    (one step per bit, most-significant first).  Each step REDEFINES
    (x, y, d) — embedding the recurrence as one expression tree would
    double in size per level, so every step lands as a STAGED
    PROJECTION (the `_interleave` / minhash_bands discipline): ``bits``
    chained selects that whole-stage codegen fuses into one map stage.
    Engine-portable: pure shifts/compares/adds on BIGINTs, so a SQL
    oracle can replay the identical unrolled steps CTE by CTE.
    """
    if len(cols) != 2:
        raise ValueError("Hilbert key is 2-D: pass exactly two columns")
    if bits * 2 > 62:
        raise ValueError(f"{bits} bits x 2 cols exceeds the int64 key")
    top = (1 << bits) - 1
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    coord_cols = {}
    max_span = (2**63 - 1) // top
    for i, c in enumerate(cols):
        q, lo, hi = f"`{c}`", f"`__lo_{c}`", f"`__hi_{c}`"
        span = f"(cast({hi} as bigint) - cast({lo} as bigint))"
        coord_cols[f"__h{'xy'[i]}"] = F.expr(
            f"CASE WHEN {q} IS NULL OR {hi} IS NULL THEN cast(0 as bigint) "
            # a NEGATIVE computed span is impossible without int64 wrap
            # (hi >= lo by construction) — raise, don't zero (review
            # finding: a '<= 0' branch silently collapsed every key)
            f"WHEN {span} < 0 THEN cast(raise_error(concat("
            f"'with_hilbert_key: span of {c} wrapped int64 "
            f"(hi - lo overflows); pre-bucket the column')) as bigint) "
            f"WHEN {span} = 0 THEN cast(0 as bigint) "
            # overflow guard: past this span the * {top} multiply wraps
            # in non-ANSI mode (see the span bound in the docstring)
            f"WHEN {span} > {max_span} THEN cast(raise_error(concat("
            f"'with_hilbert_key: span of {c} (', cast({span} as string), "
            f"') overflows the int64 scale at {bits} bits; "
            f"pre-bucket the column')) as bigint) "
            f"ELSE ((cast({q} as bigint) - cast({lo} as bigint)) * {top}) "
            f"div {span} END"
        )
    out = out.withColumns(coord_cols)
    out = out.withColumn("__hd", F.lit(0).cast("bigint"))
    x, y, d = F.col("__hx"), F.col("__hy"), F.col("__hd")
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d_new = d + F.lit(s).cast("bigint") * F.lit(s).cast("bigint") * (
            (F.lit(3) * rx).bitwiseXOR(ry).cast("bigint")
        )
        # rotation: applied only while ry == 0; rx == 1 additionally
        # reflects both coordinates within the current sub-square
        x_new = (
            F.when(ry == 1, x)
            .when(rx == 1, F.lit(s - 1).cast("bigint") - y)
            .otherwise(y)
        )
        y_new = (
            F.when(ry == 1, y)
            .when(rx == 1, F.lit(s - 1).cast("bigint") - x)
            .otherwise(x)
        )
        out = out.withColumns(
            {"__hx": x_new, "__hy": y_new, "__hd": d_new}
        )
    return out.withColumn(out_col, F.col("__hd")).drop(
        "__hx", "__hy", "__hd",
        *[f"__lo_{c}" for c in cols],
        *[f"__hi_{c}" for c in cols],
    )


def hilbert_shard_stats(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    shard_bits: int = 4,
) -> DataFrame:
    """Per-shard column-range audit of a Hilbert layout — the
    :func:`zorder_shard_stats` twin, so the two curves' locality is
    directly comparable on the same data: shard = top ``shard_bits``
    of the 2*bits-wide Hilbert key, with per-shard count and min/max
    per dimension."""
    keyed = with_hilbert_key(df, cols, bits)
    shard = F.shiftright(F.col("hkey"), 2 * bits - shard_bits).cast("int")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"max_{c}"))
    return keyed.groupBy(shard.alias("shard")).agg(*aggs)


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
) -> None:
    """Write ``df`` clustered by the Hilbert key of two ``cols`` — the
    :func:`write_zordered` twin on the better curve: one broadcast
    bounds pass (inside :func:`with_hilbert_key`) + one range shuffle,
    every output file sorted by the key, so parquet row groups are
    tight in BOTH columns at once and tighter than the Morton layout's
    (the locality property tests/test_hilbert.py pins)."""
    keyed = with_hilbert_key(df, cols, bits, out_col="__hkey")
    (
        keyed.repartitionByRange(num_files, "__hkey")
        .sortWithinPartitions("__hkey")
        .drop("__hkey")
        .write.mode("overwrite")
        .parquet(path)
    )
