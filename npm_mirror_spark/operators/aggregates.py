"""Aggregations / grouping / windows (SURVEY.md §2.4, A1-A8).

Scale notes:
- ``argmax_latest`` / ``retention_topn`` shuffle once on the group key, then
  sort within partitions — the canonical top-N-per-group plan. At 100 TB the
  win is that ONLY the group key shuffles the fat rows once; no driver-side
  loops (the reference iterates directories one by one,
  organize-NAS.py:74-78).
- Window + ``row_number`` is preferred over ``max_by`` where a deterministic
  tiebreak matters (oracle hashing): ties broken by explicit secondary keys.
- Singleton aggregates (max_seq, lag's global max) reduce map-side to one
  row per partition before the final single-partition exchange — cheap at
  any scale; the scalar is then broadcast-joined, never collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def argmax_latest(
    df: DataFrame, group: list[str], order: list[Column], keep_rank_col: bool = False
) -> DataFrame:
    """A1: per group, the row with the max ordering key — the reference's
    'latest JSON file per package dir' (organize-NAS.py:20-28,40).

    ``order`` columns must form a deterministic total order within a group.
    """
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out if keep_rank_col else out.drop("__rn")


def retention_topn(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    n: int = 5,
    rank_col: str | None = None,
) -> DataFrame:
    """A2 (keep side): newest-N-per-group — the reference's
    OLD_PACKAGE_VERSIONS_LIMIT=5 zip retention (changes_consumer.py:25,
    220-243), declaratively: rank desc by recency, keep rank <= n.
    """
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def retention_gc(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    n: int = 5,
) -> DataFrame:
    """A2 (delete side): the rows the retention rule evicts (rank > n) —
    these feed the deletion-log sink (K4, changes_consumer.py:209-216).
    """
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") > n).drop("__rn")


def retention_gc_tombstone_guard(
    df: DataFrame,
    group: list[str],
    asc_order: list[Column],
    tombstone: Column,
    n: int = 5,
) -> DataFrame:
    """A2 with the reference's exact nuance (changes_consumer.py:230-243):
    deleting the oldest artifacts, SKIP any whose immediate successor (next
    newer file) is a Deleted- tombstone — the tombstone marks the end of a
    package generation and the predecessor is kept as its last good state.

    Declaratively: rank ascending by age, candidates are ranks <= count-n,
    minus rows whose ``lead()`` is a tombstone. One shuffle + one sorted
    window pass, same cost as plain retention.
    """
    w = Window.partitionBy(*group).orderBy(*asc_order)
    wall = Window.partitionBy(*group)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(wall))
        .withColumn("__next_tomb", F.lead(tombstone).over(w))
        .filter(
            (F.col("__rn") <= F.col("__cnt") - n)
            & ~F.coalesce(F.col("__next_tomb"), F.lit(False))
        )
        .drop("__rn", "__cnt", "__next_tomb")
    )


def count_by(df: DataFrame, *group: str, alias: str = "n") -> DataFrame:
    """A3/A8: event counters as groupBy counts (map-side partial agg —
    Spark's HashAggregate does the combine before the shuffle)."""
    return df.groupBy(*group).agg(F.count(F.lit(1)).alias(alias))


def max_seq(df: DataFrame, seq_col: str, floor: int | None = None, alias: str = "start_seq") -> DataFrame:
    """A4/J3: running-max seq + the producer's start-seq reconciliation
    (max over kafka last msg / file store / config, producer.ts:61-97) —
    ``greatest()`` over a singleton aggregate.
    """
    agg = F.max(F.col(seq_col))
    if floor is not None:
        agg = F.greatest(agg, F.lit(floor))
    return df.agg(agg.alias(alias))


def lag_per_group(
    df: DataFrame, group: str, seq_col: str, alias: str = "lag"
) -> DataFrame:
    """A5: newest_seq - last_seq (producer.ts:206-243) generalized per
    group: global max minus per-group max. The singleton global aggregate is
    broadcast into the per-group result — no second shuffle of the big side.
    """
    per_group = df.groupBy(group).agg(F.max(seq_col).alias("__grp_max"))
    global_max = df.agg(F.max(seq_col).alias("__glob_max"))
    return (
        per_group.join(F.broadcast(global_max))
        .select(
            F.col(group),
            (F.col("__glob_max") - F.col("__grp_max")).alias(alias),
        )
    )


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_minutes: int | None = None,
) -> DataFrame:
    """Sequential-pattern (funnel) analysis: per user, how far through the
    ordered ``steps`` sequence they progressed, where each step must occur
    STRICTLY after the previous step's matched event (and, when
    ``within_minutes`` is set, no later than that deadline after it —
    the conversion-window form every funnel report actually uses).

    Spark-first single-shuffle form: one groupBy(user) collects the
    (ts, type) pairs, ``array_sort`` orders them, and an ``aggregate``
    lambda runs the state machine — no per-step self-joins, no O(steps)
    repeated shuffles of the event table. Strict ts guards make the
    result independent of how same-timestamp events tie-break in the
    sort, so a min()-per-step SQL restatement is value-identical (the
    oracle relies on this).

    Returns (user_col, stage): stage in [0, len(steps)].
    """
    evs = df.where(F.col(type_col).isin(list(steps)))
    per_user = evs.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
            )
        ).alias("__evs")
    )
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("ts")
    )

    def advance(acc, e):
        out = acc
        for i, s in enumerate(steps):
            cond = (acc["stage"] == i) & (e["et"] == s)
            if i > 0:
                cond = cond & (e["ts"] > acc["ts"])
                if within_minutes is not None:
                    cond = cond & (
                        e["ts"]
                        <= acc["ts"] + F.expr(f"INTERVAL {within_minutes} MINUTES")
                    )
            out = F.when(
                cond,
                F.struct(F.lit(i + 1).alias("stage"), e["ts"].alias("ts")),
            ).otherwise(out)
        return out

    return per_user.select(
        F.col(user_col),
        F.aggregate("__evs", init, advance)["stage"].alias("stage"),
    )


TREND_X0 = 1_600_000_000  # fixed epoch origin: keeps x small and x*x exact


def linear_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: Column | str,
    y_col: Column | str,
) -> DataFrame:
    """Per-group OLS trend line in ONE partial-aggregated job:
    (group..., n, slope, intercept) — slope of y over x from the five
    classical moments, every SUM exact.

    The moment sums (n, Σx, Σy, Σxy, Σx²) are map-side partial
    aggregates of exact DECIMAL/integer terms — the only shuffle
    carries five numbers per group, so per-source trend detection over
    100 TB of events costs one scan, like q_corr_moments.  The closing
    algebra
        slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
    runs in DOUBLE on the exact sums with one fixed expression tree —
    deterministic IEEE, replayed verbatim by the oracle (multiplying
    inside DECIMAL instead would hit precision-38 clamping, where
    engines' rescale rules diverge).

    ``x_col`` must be integer-valued (e.g. epoch seconds).  Callers
    should shift x near zero (see ``TREND_X0``) so x·x stays within
    int64 — the intercept is then AT THE SHIFTED ORIGIN, which is the
    documented output contract.  Degenerate groups (all x equal, or a
    single row) return NULL slope/intercept rather than a division by
    zero.
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("long")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    # rows with NULL x or non-finite y are EXCLUDED up front: count()
    # counts every row but decimal sums skip NULLs, so a single NULL
    # would silently skew the moments instead of erroring
    ok = (
        x.isNotNull()
        & y.isNotNull()
        & ~F.isnan(y)
        & (y != F.lit(float("inf")))
        & (y != F.lit(float("-inf")))
    )
    staged = df.where(ok).select(
        *group_cols, x.alias("__x"), y.alias("__y")
    )
    # every decimal SUM is kept at SCALE 0 (y pre-scaled by 10^4, still
    # exact: the product is integral) because a scale-4 decimal above
    # 2^53 converts to double by TWO roundings in DuckDB (int128 ->
    # double, then /10^4) but ONE in Spark (BigDecimal) — a 1-ulp
    # divergence the sf0.1 sweep caught in the sxy term.  Scale-0
    # decimals convert with a single correctly-rounded step in both
    # engines; the /10^4 then happens in the SHARED double algebra.
    y4 = (F.col("__y").cast("decimal(18,4)") * F.lit(10000)).cast(
        "decimal(18,0)"  # y*10^4 must fit 18 digits (|y| < 10^14)
    )
    agg = staged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__x").cast("decimal(38,0)")).alias("__sx"),
        F.sum(y4).alias("__sy4"),
        F.sum(
            (F.col("__x").cast("decimal(12,0)") * y4).cast("decimal(38,0)")
        ).alias("__sxy4"),
        F.sum((F.col("__x") * F.col("__x")).cast("decimal(38,0)")).alias(
            "__sxx"
        ),
    )
    n_d = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy4").cast("double") / F.lit(10000.0)
    sxy = F.col("__sxy4").cast("double") / F.lit(10000.0)
    sxx = F.col("__sxx").cast("double")
    denom = n_d * sxx - sx * sx
    slope = F.when(denom != 0, (n_d * sxy - sx * sy) / denom)
    with_slope = agg.select(
        *group_cols, "n", sx.alias("__sxd"), sy.alias("__syd"),
        slope.alias("slope"),
    )
    intercept = F.when(
        F.col("slope").isNotNull(),
        (F.col("__syd") - F.col("slope") * F.col("__sxd"))
        / F.col("n").cast("double"),
    )
    return with_slope.select(
        *group_cols, "n", "slope", intercept.alias("intercept")
    )


def weighted_percentile_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    p_num: int,
    p_den: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """EXACT weighted percentile per group: the smallest value v whose
    cumulative weight reaches p_num/p_den of the group's total —
    (group..., p_value, total_weight).

    The mass-weighted percentile is the honest corpus-report statistic:
    "the median TOKEN lives in a document of length X" weights each doc
    by its size, where the unweighted median answers a different
    question.  Exactness: weights must be integer-valued (cast long);
    the threshold test is cross-multiplied integers
    (cum_w * p_den >= p_num * total_w), so no division exists at all.

    Scale shape — the TWO-LEVEL bucketed prefix sum (the
    token_budget_select / classifier._with_prior_sums pattern), NOT a
    per-group unbounded window: the r7 advisory was that
    ``Window.partitionBy(group).orderBy(value)`` lands one group's whole
    distinct-VALUE axis on a single reducer when the measure is
    high-cardinality (doubles).  Instead: (1) one (group, value)
    weight-sum shuffle with map-side partials collapses the corpus to
    the distinct-value axis; (2) a per-group (min, max, total) aggregate
    — which also replaces the old unbounded total-weight window —
    broadcasts back so each value takes an ORDER-PRESERVING range
    bucket; (3) per-(group, bucket) weight sums roll up to a bounded
    |groups| x n_buckets offset table whose own prefix window runs per
    group over <= n_buckets+1 rows; (4) the cumulative window is then
    PARTITIONED BY (group, bucket) — parallel within each group — and
    the broadcast offset lifts it to the global per-group running total.
    Bucketing never changes which value first crosses the threshold
    (integer sums are associative across the same total order), so
    results are bit-identical to the single-window form and the DuckDB
    oracle is unchanged.  Value-range bucketing can skew if distinct
    values concentrate in a narrow band, but the worst case degrades to
    the old single-window shape, never below it.

    Edge order matches Spark's ascending sort (NULL first, then -Inf,
    finite, +Inf, NaN): NULL values take bucket -1, -Inf bucket 0,
    +Inf/NaN the top bucket (the within-bucket orderBy separates them)
    — without the explicit edges one NaN would poison the span and
    silently collapse every row into a single bucket.
    """
    if not (0 < p_num <= p_den):
        raise ValueError("need 0 < p_num <= p_den")
    if n_buckets < 2:
        raise ValueError("need n_buckets >= 2")
    v = F.col(value_col)
    g = df.groupBy(*group_cols, value_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("__w")
    )
    # min/max over the FINITE values only (Spark's max treats NaN as the
    # largest value, which would poison the bucket span); total weight
    # over ALL rows, NULL/non-finite included.
    v_d = v.cast("double")
    finite = F.when(
        v.isNull()
        | F.isnan(v_d)
        | (v_d == F.lit(float("inf")))
        | (v_d == F.lit(float("-inf"))),
        F.lit(None),
    ).otherwise(v_d)
    stats = g.groupBy(*group_cols).agg(
        F.min(finite).alias("__mn"),
        F.max(finite).alias("__mx"),
        F.sum("__w").alias("__tw"),
    )
    span = F.col("__mx") - F.col("__mn")
    bkt = (
        F.when(v.isNull(), F.lit(-1))
        .when(F.isnan(v_d) | (v_d == F.lit(float("inf"))), F.lit(n_buckets - 1))
        .when(v_d == F.lit(float("-inf")), F.lit(0))
        .when(span.isNull() | (span <= 0), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((v_d - F.col("__mn")) / span * n_buckets).cast("int"),
            )
        )
    )
    keyed = (
        g.join(F.broadcast(stats), list(group_cols))
        .withColumn("__bkt", bkt)
        .drop("__mn", "__mx")
    )
    per_bucket = keyed.groupBy(*group_cols, "__bkt").agg(
        F.sum("__w").alias("__bt")
    )
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        *group_cols,
        "__bkt",
        F.coalesce(F.sum("__bt").over(wb), F.lit(0)).alias("__off"),
    )
    ww = (
        Window.partitionBy(*group_cols, "__bkt")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = keyed.join(F.broadcast(offsets), [*group_cols, "__bkt"]).select(
        *group_cols,
        v,
        (F.col("__off") + F.sum("__w").over(ww)).alias("__cw"),
        F.col("__tw"),
    )
    return (
        cum.where(F.col("__cw") * F.lit(int(p_den)) >= F.lit(int(p_num)) * F.col("__tw"))
        .groupBy(*group_cols)
        .agg(
            F.min(value_col).alias("p_value"),
            F.min("__tw").alias("total_weight"),
        )
    )
