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
    """h_r(key) = md5_key64(key, seed=r) mod width — seeded,
    engine-portable (DuckDB replays it verbatim; the 15-hex-char int64
    contract is pinned once in dedup.md5_key64)."""
    from npm_mirror_spark.operators.dedup import md5_key64

    return F.pmod(md5_key64(key, r), F.lit(int(width))).cast("int")


def _cms_bucket_fast(key: F.Column, r: F.Column, width: int) -> F.Column:
    """h_r(key) = xxhash64(key, seed=r) mod width — the cheap JVM hash
    for sketch uses whose OUTPUT does not expose the sketch (r14, guide
    §1.2 step 2 per-task work): md5 goes through string rendering +
    a cryptographic digest per (key, row) pair and was the dominant
    stage of q_hh_twopass; xxhash64 is a codegen'd primitive.  Only
    valid where the sketch PRUNES (heavy_hitters_twopass: any
    pairwise-independent-ish family keeps the one-sided superset
    property and the verified output is the exact HAVING answer) —
    faces that REPORT sketch cells (q_count_min) keep the md5 oracle
    contract."""
    return F.pmod(
        F.xxhash64(key, r.cast("long")), F.lit(int(width))
    ).cast("int")


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
    bucket=_cms_bucket,
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
            "r", bucket(F.col("__k"), F.col("r"), width).alias("b")
        )
        .agg(F.sum("__w").alias("c"))
    )


def hll_registers(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """HyperLogLog registers with EXACT-replay arithmetic: (idx, mreg).

    Flajolet et al. 2007, built from the same seeded md5 base as the
    CMS: h = int64(md5(key)[:15 hex]) gives 60 uniform bits; the low p
    index the register, the high w = h div 2^p (60-p bits) feed the
    rank rho = (60-p) - len(bin(w)) + 1 — leading-zero count via the
    INTEGER length of the binary string, no libm log2, so every
    register value is engine-portable (DuckDB bin() agrees with Spark
    bin() bit-for-bit).  One (idx) shuffle of small ints with map-side
    partial max — the mergeable property again (union registers =
    max cell-wise).
    """
    from npm_mirror_spark.operators.dedup import md5_hash64

    m = 1 << p
    wbits = 60 - p
    h = md5_hash64(key_col)
    keyed = (
        df.select(h.alias("__h"))  # staged once; idx and w both read it
        .select(
            F.pmod(F.col("__h"), F.lit(m)).cast("int").alias("idx"),
            F.expr(f"__h div {m}").alias("__w"),
        )
    )
    rho = (
        F.when(F.col("__w") == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin("__w")))
        .cast("int")
    )
    return (
        keyed.select("idx", rho.alias("__rho"))
        .groupBy("idx")
        .agg(F.max("__rho").alias("mreg"))
    )


def hll_estimate(regs: DataFrame, p: int = 8) -> DataFrame:
    """Fold registers into the raw HLL estimate — one row: (m,
    zero_registers, hll_sum, est).

    The harmonic denominator is computed as the EXACT integer
    S = sum_j 2^(κ - M_j) with κ = 60-p+1 (every term a power of two,
    register count bounded, no float summation order to disagree on);
    untouched registers contribute M_j = 0, i.e. 2^κ each.  The only
    float step is the final closed form
        est = alpha_m * m^2 * 2^κ / S
    — literal constants and one division, IEEE-identical in any
    engine, which is what makes an APPROXIMATE cardinality sketch
    exactly oracle-checkable (contrast q_approx_stats'
    approx_count_distinct, whose HLL++ internals are opaque).  The
    standard small-range linear-counting correction needs ln() (libm)
    and is intentionally NOT applied — consumers with zero registers
    present can apply it; the raw estimate plus zero_registers carries
    the full information.
    """
    m = 1 << p
    kappa = 60 - p + 1
    agg = regs.agg(
        # coalesce: an EMPTY register frame (nothing ingested yet) must
        # yield the defined all-zero-registers value S = m * 2^kappa,
        # not a NULL estimate (review finding)
        F.coalesce(
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST({kappa} - mreg AS INT))"
                )
            ),
            F.lit(0).cast("long"),
        ).alias("__s_obs"),
        F.count(F.lit(1)).alias("__n_obs"),
    )
    s_total = (
        F.col("__s_obs")
        + (F.lit(m) - F.col("__n_obs")) * F.lit(1 << kappa).cast("long")
    )
    # alpha_m * m^2 * 2^kappa, with m^2 * 2^kappa folded into one exact
    # power-of-two double literal so both engines evaluate the identical
    # expression tree
    num = float((m * m) * (1 << kappa))
    return agg.select(
        F.lit(m).alias("m"),
        (F.lit(m) - F.col("__n_obs")).cast("long").alias("zero_registers"),
        s_total.cast("long").alias("hll_sum"),
        (
            F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
            * F.lit(num)
            / s_total.cast("double")
        ).alias("est"),
    )


def hll_registers_by(
    df: DataFrame, group_cols: list[str], key_col: str, p: int = 8
) -> DataFrame:
    """GROUPED HyperLogLog registers: (group..., idx, mreg) — one
    bounded sketch per group from a single pass.

    The per-group register table is the distributed-cube primitive the
    global :func:`hll_registers` can't give: distinct-key cardinality
    per group at <= 2^p small-int rows per group, mergeable BOTH ways —
    max over idx within a group folds micro-batches / partitions (the
    partial-agg property), and max over GROUPS rolls subtotals up to
    any coarser grouping, union semantics included, without ever
    revisiting raw keys.  At 100 TB that is the difference between one
    count_distinct shuffle per breakdown requested and ONE key-hash
    pass that answers all of them.  Same exact-replay arithmetic as the
    global sketch (seeded md5, integer bin()-rank, no libm)."""
    from npm_mirror_spark.operators.dedup import md5_hash64

    m = 1 << p
    wbits = 60 - p
    h = md5_hash64(key_col)
    keyed = df.select(*group_cols, h.alias("__h")).select(
        *group_cols,
        F.pmod(F.col("__h"), F.lit(m)).cast("int").alias("idx"),
        F.expr(f"__h div {m}").alias("__w"),
    )
    rho = (
        F.when(F.col("__w") == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin("__w")))
        .cast("int")
    )
    return (
        keyed.select(*group_cols, "idx", rho.alias("__rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("__rho").alias("mreg"))
    )


def hll_estimate_by(
    regs: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Fold grouped registers into one estimate row PER GROUP:
    (group..., zero_registers, hll_sum, est) — the same exact-integer
    harmonic fold as :func:`hll_estimate`, keyed; input is
    groups x <= 2^p rows, so this is bounded-table work."""
    m = 1 << p
    kappa = 60 - p + 1
    agg = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({kappa} - mreg AS INT))"
            )
        ).alias("__s_obs"),
        F.count(F.lit(1)).alias("__n_obs"),
    )
    s_total = (
        F.col("__s_obs")
        + (F.lit(m) - F.col("__n_obs")) * F.lit(1 << kappa).cast("long")
    )
    num = float((m * m) * (1 << kappa))
    return agg.select(
        *group_cols,
        (F.lit(m) - F.col("__n_obs")).cast("long").alias("zero_registers"),
        s_total.cast("long").alias("hll_sum"),
        (
            F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
            * F.lit(num)
            / s_total.cast("double")
        ).alias("est"),
    )


def hll_union(regs_a: DataFrame, regs_b: DataFrame) -> DataFrame:
    """HLL union: cell-wise max of two register tables — the same merge
    a map-side partial performs, so |A ∪ B| estimation needs no access
    to either side's raw keys.  Bounded work: both inputs are <= 2^p
    rows; with :func:`hll_estimate` and inclusion-exclusion this gives
    |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B) — the distributed-set
    algebra (audience overlap, cross-corpus key sharing) that exact
    distinct-joins would pay a corpus shuffle for.  The intersection
    estimate inherits BOTH sides' error and can go negative on tiny
    overlaps — report it alongside the operands, never alone."""
    a = regs_a.select("idx", F.col("mreg").alias("__a"))
    b = regs_b.select("idx", F.col("mreg").alias("__b"))
    return a.join(b, "idx", "full").select(
        "idx",
        F.greatest(
            F.coalesce(F.col("__a"), F.lit(0)),
            F.coalesce(F.col("__b"), F.lit(0)),
        ).cast("int").alias("mreg"),
    )


def hll_cumulative_by(
    df: DataFrame, axis_col: str, key_col: str, p: int = 8
) -> DataFrame:
    """Cumulative distinct-cardinality SERIES along an ordered axis:
    (axis, zero_registers, hll_sum, est) where each row estimates
    |distinct keys over ALL axis values <= this one| — the
    approximate retention/growth curve ("distinct users through week
    w") that exact distinct would recompute with one corpus shuffle
    PER axis value, done here with ONE key-hash pass.

    Register prefix property: cumulative registers are the cell-wise
    running max along the axis (union = max, and prefixes nest), so
    after :func:`hll_registers_by` keyed on the axis, a window
    partitioned by idx (2^p partitions) over the bounded axis produces
    every prefix sketch at once; the axis x 2^p dense frame keeps
    weeks an idx never saw in the fold (they inherit via the running
    max or stay zero-mass).  Same exact-replay arithmetic as the other
    HLL faces — the estimate hash-matches its oracle."""
    from pyspark.sql import Window

    m = 1 << p
    regs = hll_registers_by(df, [axis_col], key_col, p)
    axis = regs.select(axis_col).distinct()
    dense = axis.select(
        axis_col, F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("idx")
    )
    w = (
        Window.partitionBy("idx")
        .orderBy(axis_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        dense.join(regs, [axis_col, "idx"], "left")
        .select(axis_col, "idx", F.max("mreg").over(w).alias("mreg"))
        .where(F.col("mreg").isNotNull())
    )
    return hll_estimate_by(cum, [axis_col], p)


def kmv_sketch(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """KMV (k minimum values / bottom-k) distinct sketch — one row:
    (k, n_obs, kth_hash, est, n_exact is the caller's business).

    Bar-Yossef et al. 2002: the k-th smallest of distinct uniform
    hashes estimates cardinality as (k-1) * H / h_(k), H = the hash
    space (2^60 for md5_hash64).  What it buys over HLL: the k
    surviving hashes are a UNIFORM SAMPLE OF THE DISTINCT KEYS — the
    drill-down ("show me 64 representative users") registers
    structurally cannot answer — and bottom-k sets are trivially
    mergeable (union = bottom-k of the union).  What it costs: one
    distinct shuffle on the 8-byte hash (HLL stays map-side) — the
    honest trade, priced per face.  orderBy(h).limit(k) plans
    TakeOrderedAndProject: per-partition bottom-k, never a full sort.

    Exact replay: md5 order is deterministic, the estimate is literal
    constants and ONE division; under-full sketches (n_obs < k) return
    the exact observed count.
    """
    from npm_mirror_spark.operators.dedup import md5_hash64

    if k < 2:
        raise ValueError("k must be >= 2")
    h = df.select(md5_hash64(key_col).alias("__h")).distinct()
    bottom = h.orderBy("__h").limit(k)
    agg = bottom.agg(
        F.count(F.lit(1)).alias("n_obs"), F.max("__h").alias("kth_hash")
    )
    space = float(1 << 60)
    return agg.select(
        F.lit(k).alias("k"),
        "n_obs",
        "kth_hash",
        # denominator guard: hash 0 is a legal md5_hash64 value.  With
        # k >= 2 DISTINCT non-negative hashes the max cannot be 0, so the
        # guard is unreachable belt-and-braces — but it pins est finite by
        # construction rather than by that argument (mirrored in the
        # q_kmv_distinct oracle).
        F.when(F.col("n_obs") < k, F.col("n_obs").cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            * F.lit(space)
            / F.greatest(F.col("kth_hash"), F.lit(1)).cast("double")
        )
        .alias("est"),
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    bucket=_cms_bucket,
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
    ).withColumn("b", bucket(F.col(key_col), F.col("r"), width))
    return (
        lookups.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )


def count_min_join_size(
    a: DataFrame,
    key_a: str,
    b: DataFrame,
    key_b: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Equi-join cardinality estimate from CMS inner products (the
    AMS-style estimator Cormode & Muthukrishnan 2005 §4.2): sketch both
    sides, est = min over hash rows r of sum_b A[r,b] * B[r,b].  Pass
    the SAME table twice for the self-join size — the second frequency
    moment F2 = sum_k cnt_k^2, the quantity that predicts a join's
    output explosion and a groupBy's skew before you run it.

    ONE-SIDED error: colliding keys only ever add mass, so the estimate
    is >= the true join size (equality when no two distinct keys share
    a bucket in some row).  Exact integer arithmetic end to end — the
    oracle replays the estimate bit-for-bit.

    Cost at 100 TB: two CMS builds (each one bounded (r, b) int shuffle
    with map-side partials over its own scan) + arithmetic on
    depth x width rows.  The thing being estimated — the join — never
    runs.  Returns one row: (est_join_rows).
    """
    ca = count_min_sketch(a, key_a, depth, width)
    cb = count_min_sketch(b, key_b, depth, width)
    prod = (
        ca.alias("x")
        .join(cb.alias("y"), ["r", "b"])
        .select("r", (F.col("x.c") * F.col("y.c")).alias("__p"))
    )
    per_row = prod.groupBy("r").agg(F.sum("__p").alias("__s"))
    # a hash row with NO overlapping cells estimates 0 (true size is 0
    # by the one-sided bound); the inner join drops it, so re-anchor on
    # the full depth axis before the min
    axis = a.sparkSession.range(depth).select(F.col("id").cast("int").alias("r"))
    full = axis.join(per_row, "r", "left").select(
        F.coalesce(F.col("__s"), F.lit(0)).alias("__s")
    )
    return full.agg(F.min("__s").cast("long").alias("est_join_rows"))


def binned_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    bins: int = 256,
) -> DataFrame:
    """Approximate quantiles from an equi-width histogram — the
    third exact-replay sketch (counts: CMS, distinct: HLL, quantiles:
    this): (q, est, n) with error bounded by one bin width.

    One scalar min/max pass (broadcast 1-row frame), one (bin) shuffle
    of integer counts with map-side partial aggregation (mergeable like
    the others: histograms add bin-wise), then the quantile read-out
    runs entirely on the <=bins-row table: cumulative counts via a
    BOUNDED single-partition window (the prefix-sum-offsets contract),
    and each q picks the bin containing rank ceil-free as
        est = mn + span * (bin + (rank - cum_before) / bin_count) / bins
    — exact integer counts feeding one fixed-shape double expression,
    so DuckDB reproduces every estimate bit-for-bit (contrast
    q_approx_stats' percentile_approx, whose KLL internals are opaque).
    Degenerate spans (all values equal) read back mn exactly.
    """
    from pyspark.sql import Window

    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("quantiles must be in (0, 1]")
    if bins < 2:
        raise ValueError("bins must be >= 2")
    c = F.col(col).cast("double")
    # non-finite values are EXCLUDED from the histogram and from n
    # (review finding: a single NaN otherwise poisons the span — same
    # defect _range_stats fixed for the classifier's prefix-sum buckets)
    finite = (
        c.isNotNull()
        & ~F.isnan(c)
        & (c != F.lit(float("inf")))
        & (c != F.lit(float("-inf")))
    )
    df = df.where(finite)
    stats = df.agg(F.min(c).alias("__mn"), F.max(c).alias("__mx"))
    span = F.col("__mx") - F.col("__mn")
    bkt = (
        F.when(span <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.floor((c - F.col("__mn")) / span * bins).cast("int"),
            )
        )
    )
    counts = (
        df.crossJoin(F.broadcast(stats))
        .select(bkt.alias("bin"), "__mn", "__mx")
        .groupBy("bin", "__mn", "__mx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "bin", "cnt", "__mn", "__mx",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cumb"),
        F.sum("cnt").over(wt).alias("n"),
    )
    q_df = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = (
        cum.crossJoin(F.broadcast(q_df))
        .where(
            (F.col("q") * F.col("n") > F.col("cumb"))
            & (F.col("q") * F.col("n") <= F.col("cumb") + F.col("cnt"))
        )
    )
    span_d = F.col("__mx") - F.col("__mn")
    est = F.when(span_d <= 0, F.col("__mn")).otherwise(
        F.col("__mn")
        + span_d
        * (
            F.col("bin").cast("double")
            + (F.col("q") * F.col("n") - F.col("cumb")) / F.col("cnt")
        )
        / F.lit(float(bins))
    )
    return hit.select("q", est.alias("est"), "n")


def binned_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    bins: int = 256,
) -> DataFrame:
    """GROUPED :func:`binned_quantiles`: (group..., q, est, n) — one
    histogram pass answers every group's quantiles.

    Per-group min/max comes from ONE partial-aggregated groupBy and
    joins back as a broadcastable group-sized dim (never a scalar
    cross join per group, never a percentile shuffle per group — the
    same one-pass-many-breakdowns economics as hll_registers_by).  The
    cumulative window partitions by group AND runs on <= ``bins`` rows
    per group by construction — the bounded-window contract the global
    sketch pins, preserved per group.  Same exact-replay read-out:
    integer counts feeding one fixed-shape double expression, error
    <= one bin width of that GROUP's span (per-group spans adapt to
    each group's range — a global histogram would smear narrow groups
    across a wide corpus span)."""
    from pyspark.sql import Window

    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("quantiles must be in (0, 1]")
    if bins < 2:
        raise ValueError("bins must be >= 2")
    c = F.col(col).cast("double")
    finite = (
        c.isNotNull()
        & ~F.isnan(c)
        & (c != F.lit(float("inf")))
        & (c != F.lit(float("-inf")))
    )
    df = df.where(finite)
    stats = df.groupBy(*group_cols).agg(
        F.min(c).alias("__mn"), F.max(c).alias("__mx")
    )
    joined = df.join(F.broadcast(stats), group_cols)
    span = F.col("__mx") - F.col("__mn")
    bkt = (
        F.when(span <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.floor((c - F.col("__mn")) / span * bins).cast("int"),
            )
        )
    )
    counts = (
        joined.select(*group_cols, bkt.alias("bin"), "__mn", "__mx")
        .groupBy(*group_cols, "bin", "__mn", "__mx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = counts.select(
        *group_cols, "bin", "cnt", "__mn", "__mx",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cumb"),
        F.sum("cnt").over(wt).alias("n"),
    )
    q_df = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = cum.crossJoin(F.broadcast(q_df)).where(
        (F.col("q") * F.col("n") > F.col("cumb"))
        & (F.col("q") * F.col("n") <= F.col("cumb") + F.col("cnt"))
    )
    span_d = F.col("__mx") - F.col("__mn")
    est = F.when(span_d <= 0, F.col("__mn")).otherwise(
        F.col("__mn")
        + span_d
        * (
            F.col("bin").cast("double")
            + (F.col("q") * F.col("n") - F.col("cumb")) / F.col("cnt")
        )
        / F.lit(float(bins))
    )
    return hit.select(*group_cols, "q", est.alias("est"), "n")


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    hist_bins: int = 256,
) -> DataFrame:
    """Equi-frequency DISCRETIZATION without a global sort: adds a
    ``qbin`` column (0..n_bins-1) assigning each row its quantile
    bucket of ``col`` — the feature-binning step of a model pipeline
    (ntile() would do this with a corpus-wide sort; at 100 TB that
    single-axis sort is exactly the shuffle to refuse).

    Cut points come from :func:`binned_quantiles` (one histogram pass,
    error <= one bin width per cut), collect into ONE bounded
    (n_bins-1)-element array row, broadcast, and the assignment is a
    map-side in-row count of cut points STRICTLY below the value —
    whole-stage codegen, zero additional shuffle.  Rows with
    non-finite ``col`` get qbin NULL (excluded from the histogram, so
    no cut point is defined for them).

    Approximate in guarantee (bucket boundaries off by <= one histogram
    bin width), exact in replay: cut points and comparisons are the
    same doubles in any engine.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    qs = tuple(i / n_bins for i in range(1, n_bins))
    cuts = binned_quantiles(df, col, qs=qs, bins=hist_bins)
    arr = cuts.agg(F.sort_array(F.collect_list("est")).alias("__cuts"))
    c = F.col(col).cast("double")
    finite = (
        c.isNotNull()
        & ~F.isnan(c)
        & (c != F.lit(float("inf")))
        & (c != F.lit(float("-inf")))
    )
    return (
        df.crossJoin(F.broadcast(arr))
        .withColumn(
            "qbin",
            F.when(
                finite,
                F.size(F.filter(F.col("__cuts"), lambda x: x < c)),
            ).cast("int"),
        )
        .drop("__cuts")
    )


def heavy_hitters_twopass(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Exact heavy hitters (count >= ``threshold``) by sketch-prune +
    exact verify — the canonical two-pass pattern for skew-aware
    counting at 100 TB (Cormode & Muthukrishnan '05 for the sketch
    pass; the verify pass is what makes the OUTPUT exact).

    Pass 1 builds the bounded depth x width CMS (map-side combine, the
    only shuffle is depth*width int cells) and reads back every
    DISTINCT key's estimate with the sketch BROADCAST — cheap because
    CMS estimation is map-side.  One-sided error (est >= true) makes
    the candidate set a SUPERSET of the true heavy hitters, so pass 2's
    exact groupBy over only candidate-key rows (broadcast semi-join
    probe) loses nothing — and at scale it aggregates a sliver of the
    corpus instead of shuffling every key's partial counts: the CMS
    floor suppresses the long tail that dominates key cardinality.
    Output EQUALS the exact ``HAVING count(*) >= t`` answer — the
    sketch only prunes, never decides.

    The distinct-key estimate read in pass 1 does shuffle the key
    universe once (count_min_estimate's distinct); when the tail is
    TRULY huge, swap that read for estimating only keys seen in a
    sample — the superset property degrades gracefully.  Kept exact
    here because the oracle contract demands determinism.

    Returns (key, cnt) with cnt exact, cnt >= threshold.
    """
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    # prune pass hashes with the cheap codegen'd xxhash64 family (r14):
    # the md5 contract exists so sketch-REPORTING faces replay in the
    # oracle, but here the sketch only prunes — one-sided error holds
    # for any seeded hash family, the candidate set stays a superset,
    # and the verified output is the exact HAVING answer either way
    sketch = count_min_sketch(
        df, key_col, depth=depth, width=width, bucket=_cms_bucket_fast
    )
    ests = count_min_estimate(
        sketch,
        df.select(key_col),
        key_col,
        depth=depth,
        width=width,
        bucket=_cms_bucket_fast,
    )
    cands = ests.filter(F.col("est") >= threshold).select(key_col)
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
