"""Distribution-comparison statistics, exact and engine-portable.

Two-sample tests an analytics engine needs for corpus A/B work (did the
new crawl shift the length distribution? does source X differ from the
rest?) — computed WITHOUT libm so every number replays bit-for-bit
against a SQL oracle:

- :func:`rank_sum_test` — Mann–Whitney U / Wilcoxon rank-sum with
  midrank tie handling, kept integer-exact by doubling (``2*R1`` and
  ``2*U1`` are integers even when midranks are half-integers).  The
  normal-approximation z (which needs a sqrt) is deliberately NOT
  computed; the effect size reported is the exact AUC
  ``U1 / (n1*n2)`` — one IEEE division.
- :func:`ks_2samp` — two-sample Kolmogorov–Smirnov D as a
  cross-multiplied INTEGER maximum: ``D = max_v |F1(v)-F2(v)|`` is
  ``max_v |cum1(v)*n2 - cum2(v)*n1| / (n1*n2)``, so the argmax is found
  in exact integer arithmetic and only the final report divides.

Both run on the distinct-VALUE axis: one groupBy collapses rows to
(value, count_a, count_b), then
:func:`~npm_mirror_spark.operators.classifier._with_prior_sums` supplies
strictly-prior cumulative counts with every window bounded by the
``__bkt`` range-bucket key (the token-budget two-level prefix pattern) —
no per-test single-reducer axis at 100 TB.  The reference
(data_pipeline/npm-mirror) has no statistics surface at all; this module
is part of the mandated training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def _ab_counts(df: DataFrame, value: str, in_a: Column) -> DataFrame:
    """Collapse to the distinct-value axis: (value, cnt_a, cnt_b)."""
    return df.groupBy(value).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(in_a, 0).otherwise(1)).alias("cnt_b"),
    )


def rank_sum_test(df: DataFrame, value: str, in_a: Column) -> DataFrame:
    """Mann–Whitney U between rows where ``in_a`` holds and the rest.

    1-row output: ``n1``, ``n2``, ``r1_x2`` (= 2 * rank-sum of group A,
    midranks), ``u1_x2`` (= 2 * U1), ``auc`` (= U1/(n1*n2), the
    probability a random A value exceeds a random B value, ties half).

    Midrank identity used: the ``t`` tied rows at a value whose
    strictly-prior count is ``b`` each take midrank ``b + (t+1)/2``, so
    the doubled A-contribution at that value is
    ``cnt_a * (2*b + t + 1)`` — integer.  Per-term products are cast to
    DECIMAL(38,0) BEFORE summing (at 1e11 rows the doubled rank exceeds
    int64); the one division runs on scale-0 decimal casts to double
    (single-rounding in both engines — the r7 q_trend_by_group
    contract).
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = _ab_counts(df, value, in_a)
    pri = _with_prior_sums(g, value, ("cnt_a", "cnt_b"))
    below = F.col("__prior_cnt_a") + F.col("__prior_cnt_b")
    ties = F.col("cnt_a") + F.col("cnt_b")
    term = F.col("cnt_a").cast(_D38) * (
        F.lit(2) * below + ties + F.lit(1)
    ).cast(_D38)
    tot = pri.agg(
        F.sum("cnt_a").alias("n1"),
        F.sum("cnt_b").alias("n2"),
        F.sum(term).cast(_D38).alias("r1_x2"),
    )
    u1_x2 = (
        F.col("r1_x2")
        - (F.col("n1").cast(_D38) * (F.col("n1") + 1).cast(_D38)).cast(_D38)
    ).cast(_D38)
    return tot.select(
        "n1",
        "n2",
        "r1_x2",
        u1_x2.alias("u1_x2"),
        (
            u1_x2.cast("double")
            / (
                F.lit(2).cast(_D38)
                * F.col("n1").cast(_D38)
                * F.col("n2").cast(_D38)
            ).cast("double")
        ).alias("auc"),
    )


def ks_2samp(df: DataFrame, value: str, in_a: Column) -> DataFrame:
    """Two-sample KS statistic between ``in_a`` rows and the rest.

    1-row output: ``n1``, ``n2``, ``d_num`` (the exact integer
    ``max_v |cum1*n2 - cum2*n1|``), ``at_value`` (the SMALLEST value
    attaining the max — deterministic argmax via max(struct)), ``d``
    (= d_num/(n1*n2), one division).

    The per-value ECDF gap comparison is exact: cumulative counts come
    from the bounded-window prefix machinery, the cross-multiplication
    avoids any per-value division, and the (gap, -value) struct max is a
    map-side-combinable aggregate — no sort, no window over raw rows.
    The 1-row (n1, n2) totals frame is cross-joined broadcast (the
    singleton-fold pattern; allowlisted in tests/test_plans.py).
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = _ab_counts(df, value, in_a)
    pri = _with_prior_sums(g, value, ("cnt_a", "cnt_b"))
    totals = g.agg(
        F.sum("cnt_a").alias("n1"), F.sum("cnt_b").alias("n2")
    )
    cum_a = (F.col("__prior_cnt_a") + F.col("cnt_a")).cast(_D38)
    cum_b = (F.col("__prior_cnt_b") + F.col("cnt_b")).cast(_D38)
    gap = F.abs(
        cum_a * F.col("n2").cast(_D38) - cum_b * F.col("n1").cast(_D38)
    ).cast(_D38)
    best = (
        pri.crossJoin(F.broadcast(totals))
        .agg(
            F.max(
                F.struct(
                    gap.alias("gap"), (-F.col(value)).alias("negv")
                )
            ).alias("b"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
    )
    return best.select(
        "n1",
        "n2",
        F.col("b.gap").alias("d_num"),
        (-F.col("b.negv")).alias("at_value"),
        (
            F.col("b.gap").cast("double")
            / (F.col("n1").cast(_D38) * F.col("n2").cast(_D38)).cast(
                "double"
            )
        ).alias("d"),
    )


def spearman_rho(df: DataFrame, x: str, y: str) -> DataFrame:
    """Spearman rank correlation from exact integer moments, tie-exact.

    Ranks are MIDRANKS doubled to stay integer (``2r = 2*below + ties
    + 1`` — the :func:`rank_sum_test` identity) and the correlation of
    the doubled ranks equals the correlation of the ranks (affine
    invariance), so Pearson's five moments over (2rx, 2ry) accumulate
    as exact DECIMAL(38,0) and only the final ``rho2 = (num/d1) *
    (num/d2)`` + sign report touches IEEE — the :func:`autocorr1_daily
    <npm_mirror_spark.operators.temporal.autocorr1_daily>` sqrt-free
    contract.

    Shape: each axis collapses to its distinct-value table, takes
    strictly-prior counts via the bounded two-level bucket prefix
    (``_with_prior_sums``), and the (value -> doubled midrank) map
    equi-joins back onto the rows — two groupBys + two value-keyed
    joins + one moment fold, no window ever ordering raw rows.  NULLs
    on either axis are excluded (pairwise-complete).

    1-row output: n_rows, s_rx, s_ry, s_rxx, s_ryy, s_rxy, rho_num,
    rho_d1, rho_d2, rho2, rho_sign.
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    rows = df.select(F.col(x).alias("__x"), F.col(y).alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )

    def _rank_map(col: str, alias: str) -> DataFrame:
        g = rows.groupBy(col).agg(F.count(F.lit(1)).alias("__c"))
        pri = _with_prior_sums(g, col, ("__c",))
        return pri.select(
            col,
            (
                F.lit(2) * F.col("__prior___c") + F.col("__c") + F.lit(1)
            ).alias(alias),
        )

    j = (
        rows.join(_rank_map("__x", "__rx"), "__x")
        .join(_rank_map("__y", "__ry"), "__y")
        .select("__rx", "__ry")
    )
    m = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("__rx").cast(_D38)).cast(_D38).alias("s_rx"),
        F.sum(F.col("__ry").cast(_D38)).cast(_D38).alias("s_ry"),
        F.sum(F.col("__rx").cast(_D38) * F.col("__rx").cast(_D38))
        .cast(_D38)
        .alias("s_rxx"),
        F.sum(F.col("__ry").cast(_D38) * F.col("__ry").cast(_D38))
        .cast(_D38)
        .alias("s_ryy"),
        F.sum(F.col("__rx").cast(_D38) * F.col("__ry").cast(_D38))
        .cast(_D38)
        .alias("s_rxy"),
    )
    n = F.col("n_rows").cast(_D38)
    num = (n * F.col("s_rxy") - F.col("s_rx") * F.col("s_ry")).cast(_D38)
    d1 = (n * F.col("s_rxx") - F.col("s_rx") * F.col("s_rx")).cast(_D38)
    d2 = (n * F.col("s_ryy") - F.col("s_ry") * F.col("s_ry")).cast(_D38)
    return m.select(
        "n_rows",
        "s_rx",
        "s_ry",
        "s_rxx",
        "s_ryy",
        "s_rxy",
        num.alias("rho_num"),
        d1.alias("rho_d1"),
        d2.alias("rho_d2"),
        (
            (num.cast("double") / d1.cast("double"))
            * (num.cast("double") / d2.cast("double"))
        ).alias("rho2"),
        F.signum(num.cast("double")).cast("int").alias("rho_sign"),
    )


def runs_test_daily(daily: DataFrame, day: str, cnt: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of a daily series: sign
    each day against the series MEDIAN (exact lower-median rank
    statistic off the distinct-value prefix — no sort), drop exact-
    median days (the standard convention), and count runs of equal
    sign.  Run starts are lag transitions over the bounded calendar-day
    axis (the q_drift_weekly contract); everything is exact counts —
    the expected-runs normal approximation (needs a sqrt) is
    deliberately not computed, matching :func:`rank_sum_test`.

    1-row output: n_plus, n_minus, n_runs, median_x.
    """
    from pyspark.sql import Window

    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = daily.select(
        F.datediff(F.col(day).cast("date"), F.lit("1970-01-01")).alias(
            "__day"
        ),
        F.col(cnt).alias("__x"),
    )
    vals = g.groupBy("__x").agg(F.count(F.lit(1)).alias("__c"))
    pri = _with_prior_sums(vals, "__x", ("__c",))
    tot = g.agg(F.count(F.lit(1)).alias("__n"))
    # lower median = value at rank ceil(n/2): smallest x with
    # prior + cnt >= ceil(n/2)  ->  min over qualifying values
    med = (
        pri.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("__prior___c") + F.col("__c"))
            >= F.ceil(F.col("__n") / 2).cast("long")
        )
        .agg(F.min("__x").alias("__med"))
    )
    signed = (
        g.crossJoin(F.broadcast(med))
        .filter(F.col("__x") != F.col("__med"))
        .select(
            "__day",
            F.when(F.col("__x") > F.col("__med"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("__s"),
            F.col("__med"),
        )
    )
    w = Window.orderBy("__day")
    runs = signed.select(
        "__s",
        "__med",
        F.when(
            F.lag("__s").over(w).isNull()
            | (F.lag("__s").over(w) != F.col("__s")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__start"),
    )
    return runs.agg(
        F.sum(F.when(F.col("__s") > 0, 1).otherwise(0)).alias("n_plus"),
        F.sum(F.when(F.col("__s") < 0, 1).otherwise(0)).alias("n_minus"),
        F.sum("__start").alias("n_runs"),
        F.max("__med").alias("median_x"),
    )


def mann_kendall_daily(daily: DataFrame, day: str, cnt: str) -> DataFrame:
    """Mann–Kendall trend statistic over a DAILY count series: S =
    Σ_{i<j} sign(x_j - x_i), the distribution-free monotone-trend test
    (Mann '45, Kendall '75) — exact integers throughout.

    The pair sum is quadratic ONLY over the calendar-day axis, which is
    bounded by construction (~3k rows/decade — the q_drift_weekly
    contract), so the self-join on ``a.day < b.day`` is a bounded
    wedge, never raw-row quadratic: raw rows collapse to one (day,
    count) row per day first.  Ties (x_i = x_j) contribute 0, the
    classic convention.  The normal-approximation variance needs a
    cube/ sqrt and is not computed (the :func:`rank_sum_test`
    discipline); the effect size reported is Kendall-style dominance
    ``s_over_pairs = S / (n*(n-1)/2)`` — one IEEE division.

    1-row output: n_days, n_pairs, s_stat, n_concordant, n_discordant,
    n_ties, s_over_pairs.
    """
    g = daily.select(
        F.datediff(F.col(day).cast("date"), F.lit("1970-01-01")).alias(
            "__day"
        ),
        F.col(cnt).alias("__x"),
    )
    a = g.select(F.col("__day").alias("__da"), F.col("__x").alias("__xa"))
    b = g.select(F.col("__day").alias("__db"), F.col("__x").alias("__xb"))
    # non-equi pair condition: broadcast the (bounded-by-construction)
    # day-axis side explicitly so the plan is a BNLJ over ≤~3k rows,
    # never a CartesianProduct on a bad size estimate
    pairs = a.join(F.broadcast(b), F.col("__db") > F.col("__da"))
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("__xb") > F.col("__xa"), 1).otherwise(0)
        ).alias("n_concordant"),
        F.sum(
            F.when(F.col("__xb") < F.col("__xa"), 1).otherwise(0)
        ).alias("n_discordant"),
        F.sum(
            F.when(F.col("__xb") == F.col("__xa"), 1).otherwise(0)
        ).alias("n_ties"),
    )
    n_days = g.agg(F.count(F.lit(1)).alias("n_days"))
    s = (F.col("n_concordant") - F.col("n_discordant")).alias("s_stat")
    return (
        agg.crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            "n_pairs",
            s,
            "n_concordant",
            "n_discordant",
            "n_ties",
            (
                (
                    F.col("n_concordant") - F.col("n_discordant")
                ).cast("double")
                / F.col("n_pairs").cast("double")
            ).alias("s_over_pairs"),
        )
    )


def theil_sen_daily(daily: DataFrame, day: str, cnt: str) -> DataFrame:
    """Theil–Sen slope estimator over a DAILY count series: the exact
    lower median of all pairwise slopes (x_j - x_i)/(d_j - d_i), i < j
    (Theil '50, Sen '68) — the robust companion to
    :func:`mann_kendall_daily`: MK answers IS there a monotone trend,
    Theil–Sen answers HOW STEEP, with a 29% breakdown point where
    least-squares (q_trend_by_group's fit) has zero.

    Determinism: each slope is ONE IEEE division of two exact ints
    (identical operands -> identical doubles in any engine); the median
    is then an exact rank selection over the distinct-slope axis via
    the bounded two-level prefix (`_with_prior_sums`) — no
    single-reducer sort of the pair table.  Slopes that collide in
    double space merge counts, which cannot move the selected value.

    Scale shape: pairs are quadratic ONLY over the calendar-day axis
    (bounded by construction — the mann_kendall wedge contract): raw
    rows collapse to one row per day first, the day side broadcasts,
    and the O(days^2) pair table feeds a distinct-value groupBy whose
    cardinality is <= pairs but typically far smaller.

    1-row output: n_days, n_pairs, median_slope.
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = daily.select(
        F.datediff(F.col(day).cast("date"), F.lit("1970-01-01")).alias(
            "__day"
        ),
        F.col(cnt).alias("__x"),
    )
    a = g.select(F.col("__day").alias("__da"), F.col("__x").alias("__xa"))
    b = g.select(F.col("__day").alias("__db"), F.col("__x").alias("__xb"))
    pairs = a.join(F.broadcast(b), F.col("__db") > F.col("__da")).select(
        (
            (F.col("__xb") - F.col("__xa")).cast("double")
            / (F.col("__db") - F.col("__da")).cast("double")
        ).alias("__slope")
    )
    vals = pairs.groupBy("__slope").agg(F.count(F.lit(1)).alias("__c"))
    pri = _with_prior_sums(vals, "__slope", ("__c",))
    tot = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    n_days = g.agg(F.count(F.lit(1)).alias("n_days"))
    med = (
        pri.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("__prior___c") + F.col("__c"))
            >= F.ceil(F.col("n_pairs") / 2).cast("long")
        )
        .agg(F.min("__slope").alias("median_slope"))
    )
    return (
        n_days.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(med))
        .select("n_days", "n_pairs", "median_slope")
    )


def mad_outliers_by(
    df: DataFrame, group: str, value: str, k: int = 3
) -> DataFrame:
    """Per-group robust outlier audit via the Median Absolute Deviation:
    for each group, the exact lower median m of ``value``, the exact
    lower median of |x - m| (the MAD), and the count of rows with
    |x - m| > k * MAD — the outlier gate that survives the heavy tails
    where a mean/stddev z-score (q_seasonal_outliers' parametric twin)
    is itself dragged by the outliers it should flag.  With integer
    values and integer ``k`` EVERYTHING here is exact integer
    arithmetic — no float enters until the reported fraction.

    Scale shape: two grouped distinct-value collapses (value axis, then
    deviation axis), each with a prefix window PARTITIONED BY group
    over the distinct-value table — per-partition rows bounded by the
    VALUE DOMAIN, not the corpus (the q_drift_weekly contract), and the
    per-group 1-row median/MAD frames join back by group key (broadcast
    by size).  No raw-row window anywhere.

    Output per group: n, median, mad, n_outliers, outlier_frac.
    """
    from pyspark.sql import Window

    g = df.select(F.col(group).alias("__g"), F.col(value).alias("__x"))

    def _lower_median(rows: DataFrame, col: str) -> DataFrame:
        """(group, median-of-col) by grouped distinct-value prefix."""
        vals = rows.groupBy("__g", col).agg(F.count(F.lit(1)).alias("__c"))
        w = (
            Window.partitionBy("__g")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        pri = vals.select(
            "__g",
            col,
            "__c",
            F.coalesce(F.sum("__c").over(w), F.lit(0)).alias("__b"),
        )
        tot = rows.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
        return (
            pri.join(tot, "__g")
            .filter(
                (F.col("__b") + F.col("__c"))
                >= F.ceil(F.col("__n") / 2).cast("long")
            )
            .groupBy("__g")
            .agg(F.min(col).alias("__med"))
        )

    med = _lower_median(g, "__x")
    dev = g.join(med, "__g").select(
        "__g", F.abs(F.col("__x") - F.col("__med")).alias("__d")
    )
    mad = _lower_median(dev, "__d").withColumnRenamed("__med", "__mad")
    flagged = (
        g.join(med, "__g")
        .join(mad, "__g")
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("__med").alias("median"),
            F.max("__mad").alias("mad"),
            F.sum(
                (
                    F.abs(F.col("__x") - F.col("__med"))
                    > F.lit(k) * F.col("__mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
    )
    return flagged.select(
        F.col("__g").alias(group),
        "n",
        "median",
        "mad",
        "n_outliers",
        (F.col("n_outliers").cast("double") / F.col("n").cast("double")).alias(
            "outlier_frac"
        ),
    )


def welch_t(df: DataFrame, value: str, in_a: Column) -> DataFrame:
    """Welch's unequal-variance t-test between rows where ``in_a`` holds
    and the rest — the parametric companion to :func:`rank_sum_test`
    (same two-sample question, mean-shift sensitive instead of
    rank-shift), reported WITHOUT the sqrt: ``t2`` (= t squared) and the
    Welch–Satterthwaite degrees of freedom.

    Determinism contract: ``value`` must be integer-typed, so the six
    ingredients (n1, n2, S1, S2, Q1=Σx², Q2) accumulate as exact
    DECIMAL(38,0) — order-independent.  Every reported float is then a
    FIXED sequence of correctly-rounded IEEE ops on exact-int-valued
    doubles (mean = S/n; var via A = n·Q − S² exact, var = A/(n(n−1));
    se = var1/n1 + var2/n2; t2 = (m1−m2)²/se; df = se²/(se1²/(n1−1) +
    se2²/(n2−1))) — the oracle replays the identical expression tree, so
    the doubles match bit-for-bit in any engine (the q_kappa contract).

    NULL handling: a row whose ``in_a`` predicate evaluates to NULL
    lands in group B — "in_a holds" is three-valued-false, matching the
    NULL-counts-as-negative convention of :func:`gini-stump scoring
    <npm_mirror_spark.operators.classifier.gini_best_split>` (the
    predicate is coalesced to FALSE up front; previously such rows were
    silently dropped from BOTH groups, an advisor-flagged semantic trap).
    Rows with NULL ``value`` are excluded outright, as documented.

    Shape: ONE scan, one map-side-combinable 6-column fold, 1-row
    output — nothing here grows with the corpus.

    Output: n1, n2, mean_a, mean_b, var_a, var_b, t2, welch_df.
    """
    g = df.select(
        F.col(value).alias("__x"),
        F.coalesce(in_a, F.lit(False)).alias("__a"),
    ).filter(F.col("__x").isNotNull())
    xd = F.col("__x").cast(_D38)
    tot = g.agg(
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("__a"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("__a"), xd).otherwise(F.lit(0).cast(_D38)))
        .cast(_D38)
        .alias("s1"),
        F.sum(F.when(~F.col("__a"), xd).otherwise(F.lit(0).cast(_D38)))
        .cast(_D38)
        .alias("s2"),
        F.sum(F.when(F.col("__a"), xd * xd).otherwise(F.lit(0).cast(_D38)))
        .cast(_D38)
        .alias("q1"),
        F.sum(F.when(~F.col("__a"), xd * xd).otherwise(F.lit(0).cast(_D38)))
        .cast(_D38)
        .alias("q2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1d
    m2 = F.col("s2").cast("double") / n2d
    a1 = (F.col("n1").cast(_D38) * F.col("q1") - F.col("s1") * F.col("s1")).cast(_D38)
    a2 = (F.col("n2").cast(_D38) * F.col("q2") - F.col("s2") * F.col("s2")).cast(_D38)
    # denominators ride DECIMAL(38,0) like the numerators: a raw long
    # n*(n-1) product wraps past ~3e9 rows per group (review finding)
    d1 = (F.col("n1").cast(_D38) * (F.col("n1") - 1).cast(_D38)).cast(_D38)
    d2 = (F.col("n2").cast(_D38) * (F.col("n2") - 1).cast(_D38)).cast(_D38)
    v1 = F.when(F.col("n1") > 1, a1.cast("double") / d1.cast("double"))
    v2 = F.when(F.col("n2") > 1, a2.cast("double") / d2.cast("double"))
    se1 = v1 / n1d
    se2 = v2 / n2d
    se = se1 + se2
    d = m1 - m2
    # degenerate inputs (a group smaller than 2, or zero pooled variance:
    # both groups constant) report NULL instead of an ANSI
    # divide-by-zero crash — found by the hypothesis adversary
    # (tests/test_ksample_properties.py)
    return tot.select(
        "n1",
        "n2",
        m1.alias("mean_a"),
        m2.alias("mean_b"),
        v1.alias("var_a"),
        v2.alias("var_b"),
        F.when(se > 0, (d * d) / se).alias("t2"),
        F.when(
            se > 0,
            (se * se)
            / (
                (se1 * se1) / (F.col("n1") - 1).cast("double")
                + (se2 * se2) / (F.col("n2") - 1).cast("double")
            ),
        ).alias("welch_df"),
    )


def kruskal_cells(df: DataFrame, value: str, group: str) -> DataFrame:
    """Kruskal–Wallis k-sample rank decomposition, reported PER GROUP —
    the k-group generalization of :func:`rank_sum_test` (is at least one
    group's distribution shifted?), kept cross-engine exact by emitting
    the per-group H contributions instead of their float sum (a float
    Σ over data-dependent group order is the one op two engines may
    round differently; the per-group terms are each a fixed IEEE
    sequence on exact ints).  H = (12/(N(N+1)))·Σ h_term − 3(N+1) and
    the tie correction 1 − tie_cubes/(N³−N) are one-liner derivations
    from the reported columns.

    Midranks doubled to stay integer (the :func:`rank_sum_test`
    identity): the doubled rank-sum per group is
    ``Σ_values cnt_g·(2·prior_total + ties_total + 1)`` — exact
    DECIMAL(38,0).  ``h_term = R_i²/n_i`` is computed as
    ``(r2d·r2d)/(4·n_i)`` where r2d is the correctly-rounded double of
    the exact doubled sum — identical in any engine.

    Shape: one (group,value) collapse, one value-axis collapse feeding
    the bounded two-level prefix (``_with_prior_sums`` — no raw-row
    window), a value-keyed join back, one per-group fold.  The 1-row
    totals frame broadcasts (singleton-fold pattern).

    Output per group: group, n_i, rank_sum_x2, mean_rank, h_term,
    n_total, tie_cubes.
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = df.select(F.col(group).alias("__g"), F.col(value).alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    vg = g.groupBy("__g", "__x").agg(F.count(F.lit(1)).alias("__cg"))
    vals = vg.groupBy("__x").agg(F.sum("__cg").alias("__c"))
    pri = _with_prior_sums(vals, "__x", ("__c",))
    j = vg.join(pri.select("__x", "__c", "__prior___c"), "__x")
    term = F.col("__cg").cast(_D38) * (
        F.lit(2) * F.col("__prior___c") + F.col("__c") + F.lit(1)
    ).cast(_D38)
    per = j.groupBy("__g").agg(
        F.sum("__cg").alias("n_i"),
        F.sum(term).cast(_D38).alias("__r2"),
    )
    cd = F.col("__c").cast(_D38)
    tot = vals.agg(
        F.sum("__c").alias("n_total"),
        F.sum(cd * cd * cd - cd).cast(_D38).alias("__tc"),
    )
    r2d = F.col("__r2").cast("double")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("__g").alias(group),
            "n_i",
            r2d.alias("rank_sum_x2"),
            (r2d / (F.lit(2) * F.col("n_i")).cast("double")).alias(
                "mean_rank"
            ),
            ((r2d * r2d) / (F.lit(4) * F.col("n_i")).cast("double")).alias(
                "h_term"
            ),
            "n_total",
            F.col("__tc").cast("double").alias("tie_cubes"),
        )
        .orderBy(group)
    )


def kendall_tau_daily(
    daily: DataFrame, day: str, x: str, y: str
) -> DataFrame:
    """Kendall's tau-b between TWO daily integer series (does measure y
    co-move with measure x, judged only by pair ORDER?) — exact
    concordant/discordant/tie counting over the bounded calendar-day
    wedge (the :func:`mann_kendall_daily` contract: raw rows collapse to
    one row per day FIRST, the day side broadcasts, and the non-equi
    pair join is quadratic only in the bounded day axis).

    The sqrt-free report (the :func:`rank_sum_test` discipline):
    ``tau_num = C − D`` exact, and the signed square
    ``tau_b_sq_signed = sign·num²/((n0−t_x)(n0−t_y))`` — |tau_b| =
    sqrt(|tau_b_sq_signed|), sign preserved.  num² stays below 2^53 for
    any day axis under ~8000 years, so every float here is a single
    correctly-rounded op on exact ints.

    NULL handling (the :func:`welch_t` contract): a row with a NULL
    day or NULL in EITHER measure is excluded up front — previously a
    NULL measure left the pair in ``n_pairs`` but in none of
    concordant/discordant/ties, silently inflating the tau-b
    denominators (advisor-flagged drift from the statistic's
    definition on dirty input).

    Caller contract: ``daily`` must hold at most ONE row per day (the
    output of a day-grain groupBy, as in q_kendall_tau).  Duplicate
    days would add same-day pairs to no bucket on the ``>`` wedge but
    would distort n_days/n_pairs; collapse duplicates first.

    1-row output: n_days, n_pairs, n_concordant, n_discordant, ties_x,
    ties_y, tau_num, tau_b_sq_signed.
    """
    g = daily.select(
        F.datediff(F.col(day).cast("date"), F.lit("1970-01-01")).alias(
            "__day"
        ),
        F.col(x).alias("__x"),
        F.col(y).alias("__y"),
    ).filter(
        F.col("__day").isNotNull()
        & F.col("__x").isNotNull()
        & F.col("__y").isNotNull()
    )
    a = g.select(
        F.col("__day").alias("__da"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
    )
    b = g.select(
        F.col("__day").alias("__db"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
    )
    pairs = a.join(F.broadcast(b), F.col("__db") > F.col("__da"))
    dx = F.col("__xb") - F.col("__xa")
    dy = F.col("__yb") - F.col("__ya")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(((dx > 0) & (dy > 0)) | ((dx < 0) & (dy < 0)), 1).otherwise(0)
        ).alias("n_concordant"),
        F.sum(
            F.when(((dx > 0) & (dy < 0)) | ((dx < 0) & (dy > 0)), 1).otherwise(0)
        ).alias("n_discordant"),
        F.sum((dx == 0).cast("long")).alias("ties_x"),
        F.sum((dy == 0).cast("long")).alias("ties_y"),
    )
    n_days = g.agg(F.count(F.lit(1)).alias("n_days"))
    num = (F.col("n_concordant") - F.col("n_discordant")).cast("double")
    denx = (F.col("n_pairs") - F.col("ties_x")).cast("double")
    deny = (F.col("n_pairs") - F.col("ties_y")).cast("double")
    return agg.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        "n_pairs",
        "n_concordant",
        "n_discordant",
        "ties_x",
        "ties_y",
        (F.col("n_concordant") - F.col("n_discordant")).alias("tau_num"),
        # an axis tied on EVERY pair zeroes its tau-b denominator factor:
        # report NULL, never an ANSI divide-by-zero (hypothesis-found
        # class, tests/test_ksample_properties.py)
        F.when(
            (denx > 0) & (deny > 0),
            F.signum(num) * (num * num) / (denx * deny),
        ).alias("tau_b_sq_signed"),
    )


def anova_cells(df: DataFrame, value: str, group: str) -> DataFrame:
    """One-way ANOVA decomposition, reported PER GROUP — the parametric
    k-sample companion to :func:`kruskal_cells` (mean shifts instead of
    rank shifts), with the same no-cross-group-float-sum contract: the
    face emits each group's within-SS and between-term, so
    F = (Σ between/(k−1)) / (Σ within/(N−k)) is a one-liner derivation
    and every REPORTED float is a fixed IEEE sequence on exact ints.

    ``value`` must be integer-typed: per-group (n_i, S_i, Q_i=Σx²)
    accumulate as exact DECIMAL(38,0); within_ss = A_i/n_i with
    A_i = n_i·Q_i − S_i² exact; between_term = n_i·(mean_i − gm)² with
    both means single correctly-rounded divisions of exact ints.

    Shape: one grouped fold over the scan + a broadcast 1-row totals
    frame — bounded output (one row per group).

    Output per group: group, n_i, sum_i, mean_i, within_ss,
    between_term, n_total, grand_mean.
    """
    g = df.select(F.col(group).alias("__g"), F.col(value).alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    xd = F.col("__x").cast(_D38)
    per = g.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum(xd).cast(_D38).alias("__s"),
        F.sum(xd * xd).cast(_D38).alias("__q"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(xd).cast(_D38).alias("__st"),
    )
    nid = F.col("n_i").cast("double")
    mean_i = F.col("__s").cast("double") / nid
    gm = F.col("__st").cast("double") / F.col("n_total").cast("double")
    a_i = (F.col("n_i").cast(_D38) * F.col("__q") - F.col("__s") * F.col("__s")).cast(_D38)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("__g").alias(group),
            "n_i",
            F.col("__s").cast("double").alias("sum_i"),
            mean_i.alias("mean_i"),
            (a_i.cast("double") / nid).alias("within_ss"),
            (nid * ((mean_i - gm) * (mean_i - gm))).alias("between_term"),
            "n_total",
            gm.alias("grand_mean"),
        )
        .orderBy(group)
    )


# Poisson(1) CDF thresholds as decimal-string literals: both engines
# parse the SAME string to the SAME correctly-rounded double, so the
# inverse-CDF CASE ladder is bit-identical (no libm exp at runtime).
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def poisson_bootstrap_fold(
    df: DataFrame, id_col: str, value: str, n_resamples: int = 32
) -> DataFrame:
    """Exact per-resample bootstrap state (Chamandy et al. '12 /
    Owen & Eckles '12 — THE bootstrap that scales: resample membership
    is decided per-row, independently, so one pass computes every
    resample): each row enters resample ``b`` with weight
    w ~ Poisson(1), derived DETERMINISTICALLY from the md5 contract.
    One digest feeds FIVE resamples (md5(j ':' id) sliced into five
    6-hex-char 24-bit uniforms — chars 31-32 unused), so B resamples
    cost ceil(B/5) digests per row, then an inverse-CDF CASE ladder on
    hard-coded Poisson(1) CDF literals (tail capped at 7,
    P(X>7) ≈ 1e-5 — part of the operator definition, identical in both
    engines).  No RNG, no seed state: any engine replays the exact
    resamples.

    Reported per resample: effective n, the exact DECIMAL(38,0)
    weighted sum, and the resample mean (one IEEE division) — the
    bootstrap distribution from which any CI quantile is a one-liner.
    ``value`` must be integer-typed (the welch_t exactness contract).

    Shape: NO row fan-out — the digests and weights are STAGED
    projections (the minhash_bands discipline: embedding them in the
    aggregate tree would re-evaluate each md5 per consuming column),
    then the ``n_resamples`` (n, Σwx) pairs fold in ONE
    map-side-combinable aggregate over a single scan (2B columns) and a
    1-row ``stack`` unpivots to B rows.  At any corpus size the shuffle
    is one row of 2B numbers per partition; the per-row cost is
    ceil(B/5) md5 evaluations.

    Output: (resample, n_eff, sum_wx, mean) — one row per resample.
    """
    if not 1 <= n_resamples <= 256:
        raise ValueError("n_resamples must be in [1, 256]")
    n_digests = (n_resamples + 4) // 5
    # widen a narrow input before the digest kernel: a single-file scan
    # would run ALL ceil(B/5) md5s per row in ONE task (the r10
    # narrow-scan pathology) — the widening shuffle moves only the two
    # skinny columns and is a no-op on already-wide cluster scans
    df = df.select(id_col, value)
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    staged = df.select(
        F.col(value).alias("__x"),
        *[
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(j).cast("string"),
                    F.col(id_col).cast("string"),
                )
            ).alias(f"__h{j}")
            for j in range(n_digests)
        ],
    )

    # stage the uniforms separately too: embedded in the CASE ladder the
    # conv(substring(...)) subtree would re-evaluate PER BRANCH (8x per
    # weight), the minhash_bands staging lesson one level down.  NOTE:
    # at sf0.1 the face's wall time is ~2.5 s of DRIVER planning/codegen
    # for the 71-column staged plan with ~0.15 s of executor compute
    # (profiled) — the q_kmeans fixed-cost class, amortized at scale
    def _uniform(b: int):
        j, slot = b // 5, b % 5
        return F.conv(
            F.substring(F.col(f"__h{j}"), slot * 6 + 1, 6), 16, 10
        ).cast("long").cast("double") / F.lit(16777216).cast("double")

    uniforms = staged.select(
        "__x", *[_uniform(b).alias(f"__u{b}") for b in range(n_resamples)]
    )

    def _weight(b: int):
        u = F.col(f"__u{b}")
        w = F.when(u < _POISSON1_CDF[0], 0)
        for k, c in enumerate(_POISSON1_CDF[1:], start=1):
            w = w.when(u < c, k)
        return w.otherwise(7).cast("long")

    weighted = uniforms.select(
        "__x", *[_weight(b).alias(f"__w{b}") for b in range(n_resamples)]
    )
    aggs = []
    for b in range(n_resamples):
        wb = F.col(f"__w{b}")
        aggs.append(F.sum(wb).alias(f"n_{b}"))
        aggs.append(
            F.sum(wb.cast(_D38) * F.col("__x").cast(_D38))
            .cast(_D38)
            .alias(f"s_{b}")
        )
    folded = weighted.agg(*aggs)
    stack_args = ", ".join(
        f"{b}, n_{b}, s_{b}" for b in range(n_resamples)
    )
    return folded.select(
        F.expr(
            f"stack({n_resamples}, {stack_args}) AS (resample, n_eff, s)"
        )
    )


def poisson_bootstrap_mean(
    df: DataFrame, id_col: str, value: str, n_resamples: int = 32
) -> DataFrame:
    """The report face of :func:`poisson_bootstrap_fold`: the exact
    per-resample (n, Σwx) state closed into doubles + the resample
    mean.  Kept separate so the streaming twin
    (streaming/incremental_sketch.py:StreamingBootstrap) can accumulate
    the EXACT decimal state across micro-batches and report through the
    identical closing arithmetic."""
    rows = poisson_bootstrap_fold(df, id_col, value, n_resamples)
    return rows.select(
        "resample",
        "n_eff",
        F.col("s").cast("double").alias("sum_wx"),
        F.when(
            F.col("n_eff") > 0,
            F.col("s").cast("double") / F.col("n_eff").cast("double"),
        ).alias("mean"),
    )


def friedman_cells(
    df: DataFrame, block: str, treatment: str, value: str
) -> DataFrame:
    """Friedman two-way rank test decomposition, reported PER TREATMENT
    — the blocked-design companion to :func:`kruskal_cells` (did any
    treatment shift, with block-to-block level differences removed?),
    under the same no-cross-group-float-sum contract: every reported
    float is a fixed IEEE op on exact integers, so the statistic
    chi2_F = (k-1) * Sigma(chi2_term_x4) / (something derivable) — see
    below — is a one-liner derivation and the face replays bit-for-bit
    in any engine.

    Complete-block contract: rows with a NULL block/treatment/value are
    dropped, then only COMPLETE blocks survive — blocks holding exactly
    one non-NULL row for every one of the k global treatments (the
    classical Friedman design; incomplete blocks would need Durbin's
    test).  Ranks are WITHIN-block midranks, doubled to stay integer
    (the :func:`rank_sum_test` identity): doubled midrank =
    2*prior + ties + 1 with prior/ties counted by a RANGE-framed window
    PARTITIONED BY block — every window partition is bounded by k, so
    there is no unbounded sort at 100 TB.

    Output per treatment: treatment, n_blocks, k_treatments,
    rank_sum_x2 (= 2*R_j, exact-int-valued double), mean_rank
    (= R_j / n, one IEEE division), chi2_term_x4
    (= (2*R_j - n*(k+1))^2, exact-int-valued double: the doubled,
    squared deviation of R_j from its null mean n(k+1)/2).  Without
    ties chi2_F = 3 * Sigma(chi2_term_x4) / (n*k*(k+1)); the tie
    correction needs the per-block tie profile and is deliberately out
    of scope (document in the face if needed).

    Shape: one complete-block semi-join (two bounded aggregates), one
    k-bounded window, one per-treatment fold + a broadcast 1-row k/n
    frame — output bounded by k.
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(block).alias("__b"),
        F.col(treatment).alias("__t"),
        F.col(value).alias("__x"),
    ).filter(
        F.col("__b").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__x").isNotNull()
    )
    kf = g.select(F.countDistinct("__t").alias("__k"))
    # complete blocks: exactly k rows AND k distinct treatments
    per_b = g.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__nr"),
        F.countDistinct("__t").alias("__nt"),
    )
    complete = (
        per_b.crossJoin(F.broadcast(kf))
        .where((F.col("__nr") == F.col("__k")) & (F.col("__nt") == F.col("__k")))
        .select("__b")
    )
    gc = g.join(complete, "__b", "left_semi")
    # strictly-prior / tie counts from a per-(block, value) collapse +
    # ROW-framed window over the distinct values, NOT a RANGE frame
    # ending at -1: the range form silently miscounts for any
    # non-integer-spaced value column (2.5 is not <= 3.0 - 1), found
    # by review — the collapse works for every orderable type
    vb = gc.groupBy("__b", "__x").agg(F.count(F.lit(1)).alias("__cx"))
    wv = Window.partitionBy("__b").orderBy("__x")
    pri = vb.select(
        "__b",
        "__x",
        "__cx",
        F.coalesce(
            F.sum("__cx").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__prior"),
    )
    ranked = gc.join(pri, ["__b", "__x"]).select(
        "__t",
        (F.lit(2) * F.col("__prior") + F.col("__cx") + F.lit(1)).alias("__mr2"),
    )
    per_t = ranked.groupBy("__t").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("__mr2").cast(_D38)).cast(_D38).alias("__r2"),
    )
    kn = gc.agg(
        F.countDistinct("__t").alias("k_treatments"),
        F.countDistinct("__b").alias("__n"),
    )
    r2d = F.col("__r2").cast("double")
    dev = (
        F.col("__r2")
        - (F.col("__n").cast(_D38) * (F.col("k_treatments") + 1).cast(_D38))
    ).cast(_D38)
    return (
        per_t.crossJoin(F.broadcast(kn))
        .select(
            F.col("__t").alias(treatment),
            "n_blocks",
            "k_treatments",
            r2d.alias("rank_sum_x2"),
            (r2d / (F.lit(2) * F.col("n_blocks")).cast("double")).alias(
                "mean_rank"
            ),
            (dev.cast("double") * dev.cast("double")).alias("chi2_term_x4"),
        )
        .orderBy(treatment)
    )


def brown_forsythe_cells(
    df: DataFrame, value: str, group: str
) -> DataFrame:
    """Brown–Forsythe variance-homogeneity decomposition, reported PER
    GROUP — Levene's test with the robust MEDIAN center (Brown &
    Forsythe 1974): one-way ANOVA on the absolute deviations from each
    group's median.  The k-sample spread question welch/kruskal/anova
    (location tests) cannot answer: did the new crawl widen a source's
    length distribution even if the mean held?

    Determinism contract: ``value`` must be integer-typed.  The group
    median is kept exact by DOUBLING (the :func:`rank_sum_test`
    identity): med2 = lower-median + upper-median is an integer, and
    z2 = |2x - med2| is an exact integer whose constant factor 2
    cancels in the F ratio.  The per-group median is found on the
    distinct-VALUE axis (one groupBy collapse, then a window
    PARTITIONED BY group over distinct values — bounded by the value
    domain, the :func:`kendall_tau_daily` contract; corpus-scale
    continuous axes should bucket first).  The ANOVA fold on z2 then
    follows :func:`anova_cells` exactly.

    Output per group: group, n_i, sum_i, mean_i, within_ss,
    between_term, n_total, grand_mean — all in z2 units; the
    Brown–Forsythe W = (Sigma between/(k-1)) / (Sigma within/(N-k)) is
    the same one-liner derivation as anova_cells' F.
    """
    from pyspark.sql import Window

    g = df.select(F.col(group).alias("__g"), F.col(value).alias("__x")).filter(
        F.col("__g").isNotNull() & F.col("__x").isNotNull()
    )
    vg = g.groupBy("__g", "__x").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy("__g").orderBy("__x")
    cum = F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, 0))
    with_cum = vg.select(
        "__g",
        "__x",
        "__c",
        cum.alias("__cum"),
        F.sum("__c").over(Window.partitionBy("__g")).alias("__n"),
    )
    # lower median at position floor((n+1)/2), upper at floor(n/2)+1:
    # the min value whose cumulative count reaches the position
    lo_pos = F.floor((F.col("__n") + 1) / 2)
    hi_pos = F.floor(F.col("__n") / 2) + 1
    med = with_cum.groupBy("__g").agg(
        F.min(F.when(F.col("__cum") >= lo_pos, F.col("__x"))).alias("__mlo"),
        F.min(F.when(F.col("__cum") >= hi_pos, F.col("__x"))).alias("__mhi"),
    )
    z = g.join(med, "__g").select(
        "__g",
        F.abs(
            F.lit(2) * F.col("__x").cast(_D38)
            - (F.col("__mlo").cast(_D38) + F.col("__mhi").cast(_D38))
        )
        .cast(_D38)
        .alias("__z2"),
    )
    return anova_cells(z, "__z2", "__g").withColumnRenamed("__g", group)


def jonckheere_cells(
    df: DataFrame, value: str, group_ord: str
) -> DataFrame:
    """Jonckheere–Terpstra ordered-trend decomposition, reported PER
    ORDERED GROUP PAIR — the k-sample trend test kruskal (unordered
    alternatives) and cochran_armitage (binary outcome) cannot give:
    does the measure INCREASE along an ordered factor (week number,
    quality tier, model size)?  JT = Sigma_{a<b} U_ab over all ordered
    group pairs, each U_ab the Mann–Whitney count for the pair.

    Exactness: U_ab doubled stays integer under midrank ties —
    u_x2 = Sigma_v c_b(v) * (2*prior_a(v) + ties_a(v)) with prior_a the
    count of group a strictly below v.  All reported columns are exact
    integers; JT itself (Sigma u_x2 / 2) is an exact-integer one-liner
    (integer sums are order-independent, unlike the float sums the
    cells contract exists to avoid).

    Shape: one (group, value) collapse; the distinct-value axis is
    crossed with the k groups (axis x k rows) so every group has a
    prefix row at every value — per-group prefixes via a window
    PARTITIONED BY group over the distinct-value axis (bounded by the
    value domain, the :func:`brown_forsythe_cells` contract), then a
    value-keyed self-join filtered to ordered pairs (axis x k^2 rows,
    k small) and one per-pair fold.  Output bounded by k*(k-1)/2.

    Output per pair: g_lo, g_hi, n_lo, n_hi, u_x2 (exact-int double).
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(group_ord).alias("__g"), F.col(value).alias("__x")
    ).filter(F.col("__g").isNotNull() & F.col("__x").isNotNull())
    vg = g.groupBy("__g", "__x").agg(F.count(F.lit(1)).alias("__c"))
    axis = vg.select("__x").distinct()
    groups = vg.select("__g").distinct()
    grid = (
        axis.crossJoin(F.broadcast(groups))
        .join(vg, ["__g", "__x"], "left")
        .select("__g", "__x", F.coalesce("__c", F.lit(0)).alias("__c"))
    )
    w = Window.partitionBy("__g").orderBy("__x")
    pri = grid.select(
        "__g",
        "__x",
        "__c",
        F.coalesce(
            F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__prior"),
        F.sum("__c").over(Window.partitionBy("__g")).alias("__n"),
    )
    a = pri.select(
        F.col("__g").alias("g_lo"),
        F.col("__x").alias("__x"),
        F.col("__c").alias("__ca"),
        F.col("__prior").alias("__pa"),
        F.col("__n").alias("n_lo"),
    )
    b = pri.select(
        F.col("__g").alias("g_hi"),
        F.col("__x").alias("__x"),
        F.col("__c").alias("__cb"),
        F.col("__n").alias("n_hi"),
    )
    pairs = a.join(b, "__x").where(F.col("g_lo") < F.col("g_hi"))
    term = F.col("__cb").cast(_D38) * (
        F.lit(2) * F.col("__pa") + F.col("__ca")
    ).cast(_D38)
    return (
        pairs.groupBy("g_lo", "g_hi", "n_lo", "n_hi")
        .agg(F.sum(term).cast(_D38).cast("double").alias("u_x2"))
        .orderBy("g_lo", "g_hi")
    )


def durbin_watson_by(
    df: DataFrame, group: str, order_col: str, value: str
) -> DataFrame:
    """Durbin–Watson first-order autocorrelation statistic per group
    over the mean-centered series — the residual-independence audit
    :func:`~npm_mirror_spark.operators.temporal.autocorr1_daily`'s
    lag-1 correlation complements (DW ~ 2(1-rho); DW is the form
    regression practice quotes and tables).

    Exactness via scale invariance: DW is invariant to scaling the
    centered series, so instead of e_t = x_t - S/n (a rational) we use
    n*e_t = n*x_t - S — an exact integer when ``value`` is
    integer-typed.  num = Sigma_t (ne_t - ne_{t-1})^2 and
    den = Sigma_t ne_t^2 accumulate as exact DECIMAL(38,0) (the n^2
    factor cancels in the ratio) and dw = num/den is ONE correctly-
    rounded IEEE division — the q_kappa contract.

    Ordering contract: ``order_col`` must be unique within each group
    (a day axis); the lag window orders by (order_col, value) so
    accidental duplicates stay deterministic, but the statistic's
    meaning requires the caller's axis to be a proper time series.
    The lag window sorts each group once — the :func:`q_lag` class.

    Output per group: group, n, num (double of exact), den, dw
    (NULL when the centered series is identically zero or n < 2).
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(group).alias("__g"),
        F.col(order_col).alias("__o"),
        F.col(value).alias("__x"),
    ).filter(
        F.col("__g").isNotNull()
        & F.col("__o").isNotNull()
        & F.col("__x").isNotNull()
    )
    tot = g.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__x").cast(_D38)).cast(_D38).alias("__s"),
    )
    j = g.join(tot, "__g")
    ne = (
        F.col("__n").cast(_D38) * F.col("__x").cast(_D38) - F.col("__s")
    ).cast(_D38)
    w = Window.partitionBy("__g").orderBy("__o", "__x")
    staged = j.select("__g", "__n", ne.alias("__ne"), F.col("__o"), F.col("__x"))
    lagged = staged.select(
        "__g",
        "__n",
        "__ne",
        F.lag("__ne").over(w).alias("__nep"),
    )
    d = (F.col("__ne") - F.col("__nep")).cast(_D38)
    out = lagged.groupBy("__g").agg(
        F.max("__n").alias("n"),
        F.sum(F.when(F.col("__nep").isNotNull(), d * d).otherwise(F.lit(0).cast(_D38)))
        .cast(_D38)
        .alias("__num"),
        F.sum(F.col("__ne") * F.col("__ne")).cast(_D38).alias("__den"),
    )
    return out.select(
        F.col("__g").alias(group),
        "n",
        F.col("__num").cast("double").alias("num"),
        F.col("__den").cast("double").alias("den"),
        F.when(
            (F.col("__den") > 0) & (F.col("n") > 1),
            F.col("__num").cast("double") / F.col("__den").cast("double"),
        ).alias("dw"),
    ).orderBy(group)


def mood_median_cells(df: DataFrame, value: str, group: str) -> DataFrame:
    """Mood's median test decomposition, reported PER GROUP — the
    k-sample location test that stays valid when kruskal's
    shift-alternative assumptions fail (heavy tails, wild outliers):
    classify every row as above/below/at the GLOBAL median and report
    the per-group 2x k contingency cells; the chi-square is the same
    one-liner consumers run on
    :func:`~npm_mirror_spark.operators.checks.chisq_independence_cells`
    output.

    Exactness: the global median is kept exact by DOUBLING (med2 =
    lower + upper median, integers when ``value`` is integer-typed),
    so the classification 2x <> med2 is pure integer comparison and
    every output column is an exact count.  The median is found on the
    distinct-value axis via
    :func:`~npm_mirror_spark.operators.classifier._with_prior_sums`
    (every window bounded by the range-bucket key — no global
    single-reducer sort at 100 TB, unlike a naive percentile window).

    Output per group: group, n_above, n_below, n_at, n_i, med2_x
    (the doubled global median, exact-int double) — ordered by group.
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = df.select(F.col(group).alias("__g"), F.col(value).alias("__x")).filter(
        F.col("__g").isNotNull() & F.col("__x").isNotNull()
    )
    vals = g.groupBy("__x").agg(F.count(F.lit(1)).alias("__c"))
    pri = _with_prior_sums(vals, "__x", ("__c",))
    cum = F.col("__prior___c") + F.col("__c")
    tot = vals.agg(F.sum("__c").alias("__n"))
    med = (
        pri.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(cum >= F.floor((F.col("__n") + 1) / 2), F.col("__x"))
            ).alias("__mlo"),
            F.min(
                F.when(cum >= F.floor(F.col("__n") / 2) + 1, F.col("__x"))
            ).alias("__mhi"),
        )
        .select(
            (F.col("__mlo").cast(_D38) + F.col("__mhi").cast(_D38))
            .cast(_D38)
            .alias("__med2")
        )
    )
    x2 = F.lit(2) * F.col("__x").cast(_D38)
    return (
        g.crossJoin(F.broadcast(med))
        .groupBy("__g")
        .agg(
            F.sum(F.when(x2 > F.col("__med2"), 1).otherwise(0)).alias("n_above"),
            F.sum(F.when(x2 < F.col("__med2"), 1).otherwise(0)).alias("n_below"),
            F.sum(F.when(x2 == F.col("__med2"), 1).otherwise(0)).alias("n_at"),
            F.count(F.lit(1)).alias("n_i"),
            F.max(F.col("__med2").cast("double")).alias("med2_x"),
        )
        .select(
            F.col("__g").alias(group),
            "n_above",
            "n_below",
            "n_at",
            "n_i",
            "med2_x",
        )
        .orderBy(group)
    )


def page_trend_cells(
    df: DataFrame, block: str, treatment: str, value: str
) -> DataFrame:
    """Page's L trend test decomposition, reported PER TREATMENT — the
    ORDERED-alternative companion to :func:`friedman_cells` (Friedman
    asks "did any treatment shift?"; Page asks "do treatments shift
    MONOTONICALLY with their natural order?") and the blocked companion
    to :func:`jonckheere_cells` (same ordered question, no blocks).
    Page, Biometrika 1963.

    Identical complete-block + within-block doubled-midrank machinery
    as :func:`friedman_cells` (rows with NULL block/treatment/value
    dropped, only blocks holding exactly one row per global treatment
    survive, ranks via the bounded per-block ROW-framed window).  The
    hypothesized order is the treatment column's natural ascending
    order; its index w (1..k) comes from a k-row broadcast frame.

    Output per treatment: treatment, w, n_blocks, k_treatments,
    rank_sum_x2 (= 2*R_j, exact-int-valued double), l_term_x2
    (= w * 2*R_j, exact-int-valued double).  L*2 = Sigma(l_term_x2) —
    a consumer one-liner (the terms are exact integers, so the sum is
    order-independent); under H0, E[2L] = n*k*(k+1)^2/2.

    Shape: friedman_cells' plan + one k-row broadcast rank frame —
    output bounded by k.
    """
    from pyspark.sql import Window

    base = friedman_cells(df, block, treatment, value)
    # k-row order frame: the treatment axis is bounded by contract, so
    # a global row_number over it is a single tiny partition.  Built
    # from the RAW (null-filtered) input, not from base — deriving it
    # from base would embed the whole friedman lineage (completeness
    # semi-join, midrank windows) a second time in the plan (review
    # finding).  Equivalent whenever base is non-empty: a complete
    # block contains every global treatment by definition, so base's
    # treatments = the input's distinct treatments; and when no
    # complete block exists, base is empty and the join result is
    # empty from either frame.
    wframe = (
        df.filter(
            # the same three-way NULL filter as friedman's projection:
            # a treatment appearing ONLY with NULL block/value is not
            # in the ranked set and must not shift the w indices
            F.col(block).isNotNull()
            & F.col(treatment).isNotNull()
            & F.col(value).isNotNull()
        )
        .select(F.col(treatment).alias("__wt"))
        .distinct()
        .select(
            F.col("__wt").alias(treatment),
            F.row_number().over(Window.orderBy("__wt")).alias("w"),
        )
    )
    return (
        base.join(F.broadcast(wframe), treatment)
        .select(
            treatment,
            "w",
            "n_blocks",
            "k_treatments",
            "rank_sum_x2",
            (F.col("w").cast("double") * F.col("rank_sum_x2")).alias(
                "l_term_x2"
            ),
        )
        .orderBy(treatment)
    )


def conover_scale_cells(df: DataFrame, value: str, group: str) -> DataFrame:
    """Conover squared-ranks scale test decomposition, reported PER
    GROUP (Conover & Iman 1981) — the RANK-based spread companion to
    :func:`brown_forsythe_cells` (same question: did a group's
    dispersion change? — but distribution-free in the heavy-tail case
    where BF's z-means lose power): ranks of the absolute deviations
    from each group's median, squared, summed per group.

    Everything stays exact the whole way down: the per-group center is
    the DOUBLED median (the :func:`brown_forsythe_cells` machinery), so
    z2 = |2x - med2_g| is an exact integer; the combined-sample ranks
    of z2 are DOUBLED midranks (exact integers via the
    ``_with_prior_sums`` two-level prefix — no global sort); and the
    squared/quartic rank sums are exact DECIMAL(38,0) folds cast to
    double ONCE at the end (both engines cast the same exact integer,
    so the doubles are bit-identical even past 2^53).

    Output per group: group, n_i, sum_sq_rank_x4 (= Sigma (2r_i)^2 =
    4*Sigma r_i^2), sum_quad_rank_x16 (= Sigma (2r_i)^4).  The Conover
    T = (S_g - n_g*Sbar)^2 / variance terms are consumer one-liners:
    Sbar and the fourth-moment variance derive from exact-integer sums
    of these cells (order-independent).  NULL group/value rows are
    dropped; ``value`` must be integer-typed (the BF contract).

    Shape: one (group,value) collapse + bounded per-group median
    windows, one z2-axis collapse + the two-level bucketed prefix, a
    z2-keyed equi join back, one per-group fold.  No BNLJ beyond
    _with_prior_sums' 1-row (min,max) stats broadcast.
    """
    from pyspark.sql import Window

    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = df.select(F.col(group).alias("__g"), F.col(value).alias("__x")).filter(
        F.col("__g").isNotNull() & F.col("__x").isNotNull()
    )
    vg = g.groupBy("__g", "__x").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy("__g").orderBy("__x")
    cum = F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, 0))
    with_cum = vg.select(
        "__g",
        "__x",
        "__c",
        cum.alias("__cum"),
        F.sum("__c").over(Window.partitionBy("__g")).alias("__n"),
    )
    lo_pos = F.floor((F.col("__n") + 1) / 2)
    hi_pos = F.floor(F.col("__n") / 2) + 1
    med = with_cum.groupBy("__g").agg(
        F.min(F.when(F.col("__cum") >= lo_pos, F.col("__x"))).alias("__mlo"),
        F.min(F.when(F.col("__cum") >= hi_pos, F.col("__x"))).alias("__mhi"),
    )
    z = g.join(med, "__g").select(
        "__g",
        F.abs(
            F.lit(2) * F.col("__x").cast(_D38)
            - (F.col("__mlo").cast(_D38) + F.col("__mhi").cast(_D38))
        )
        .cast(_D38)
        .alias("__z2"),
    )
    zg = z.groupBy("__g", "__z2").agg(F.count(F.lit(1)).alias("__cg"))
    vals = zg.groupBy("__z2").agg(F.sum("__cg").alias("__c"))
    pri = _with_prior_sums(vals, "__z2", ("__c",))
    j = zg.join(pri.select("__z2", "__c", "__prior___c"), "__z2")
    m = (
        F.lit(2) * F.col("__prior___c") + F.col("__c") + F.lit(1)
    ).cast(_D38)
    cgd = F.col("__cg").cast(_D38)
    return (
        j.groupBy("__g")
        .agg(
            F.sum("__cg").alias("n_i"),
            F.sum(cgd * m * m).cast(_D38).alias("__s2"),
            F.sum(cgd * m * m * m * m).cast(_D38).alias("__s4"),
        )
        .select(
            F.col("__g").alias(group),
            "n_i",
            F.col("__s2").cast("double").alias("sum_sq_rank_x4"),
            F.col("__s4").cast("double").alias("sum_quad_rank_x16"),
        )
        .orderBy(group)
    )


def quade_cells(
    df: DataFrame, block: str, treatment: str, value: str
) -> DataFrame:
    """Quade test decomposition, reported PER TREATMENT (Quade, JASA
    1979) — the BLOCK-WEIGHTED member of the blocked-rank family
    (:func:`friedman_cells` weights every block equally; Quade weights
    each block by the rank of its RANGE, so blocks where treatments
    actually differ count more — the more powerful test at small k):
    S_j = Sigma_b range_rank_b * (r_bj - (k+1)/2).

    Same complete-block + within-block doubled-midrank machinery as
    :func:`friedman_cells`; the block weights are doubled midranks of
    the per-block RANGE (max - min, exact for integer values) over the
    ACROSS-block range axis (a bounded collapse + prefix, the
    kendall_tau_daily bounded-axis contract).  Everything stays an
    exact integer on the x4 scale: term_bj = mrange2_b * (mr2_bj -
    (k+1)) = 4 * w_b * (r_bj - (k+1)/2).

    Output per treatment: treatment, n_blocks, k_treatments, s_x4
    (= Sigma_b term_bj = 4*S_j) and ss_x16 (= Sigma_b term_bj^2), both
    exact-int-valued doubles folded in DECIMAL(38,0).  The Quade
    F = (n-1)*B/(A-B) with A = Sigma ss_x16/16 and B =
    (Sigma s_x4^2/16)/n is the consumer one-liner (exact-integer
    inputs, order-independent sums).

    Shape: friedman's complete-block semi-join + k-bounded block
    windows, one range collapse + bounded prefix, one per-treatment
    fold + a 1-row k frame broadcast — output bounded by k.
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(block).alias("__b"),
        F.col(treatment).alias("__t"),
        F.col(value).alias("__x"),
    ).filter(
        F.col("__b").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__x").isNotNull()
    )
    kf = g.select(F.countDistinct("__t").alias("__k"))
    per_b = g.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__nr"),
        F.countDistinct("__t").alias("__nt"),
    )
    complete = (
        per_b.crossJoin(F.broadcast(kf))
        .where(
            (F.col("__nr") == F.col("__k")) & (F.col("__nt") == F.col("__k"))
        )
        .select("__b")
    )
    gc = g.join(complete, "__b", "left_semi")
    # within-block doubled midranks (the friedman_cells collapse)
    vb = gc.groupBy("__b", "__x").agg(F.count(F.lit(1)).alias("__cx"))
    wv = Window.partitionBy("__b").orderBy("__x")
    pri = vb.select(
        "__b",
        "__x",
        "__cx",
        F.coalesce(
            F.sum("__cx").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__prior"),
    )
    ranked = gc.join(pri, ["__b", "__x"]).select(
        "__b",
        "__t",
        (F.lit(2) * F.col("__prior") + F.col("__cx") + F.lit(1)).alias(
            "__mr2"
        ),
    )
    # per-block range, then doubled midranks of ranges across blocks
    rng = gc.groupBy("__b").agg(
        (F.max("__x") - F.min("__x")).alias("__rng")
    )
    rc = rng.groupBy("__rng").agg(F.count(F.lit(1)).alias("__cr"))
    wr = Window.orderBy("__rng")
    rpri = rc.select(
        "__rng",
        "__cr",
        F.coalesce(
            F.sum("__cr").over(wr.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__rprior"),
    )
    rrank = rng.join(rpri, "__rng").select(
        "__b",
        (F.lit(2) * F.col("__rprior") + F.col("__cr") + F.lit(1)).alias(
            "__mrange2"
        ),
    )
    kn = gc.agg(F.countDistinct("__t").alias("k_treatments"))
    term = (
        F.col("__mrange2").cast(_D38)
        * (F.col("__mr2") - (F.col("k_treatments") + 1)).cast(_D38)
    ).cast(_D38)
    cells = (
        ranked.join(rrank, "__b")
        .crossJoin(F.broadcast(kn))
        .select("__t", "k_treatments", term.alias("__term"))
    )
    return (
        cells.groupBy("__t", "k_treatments")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("__term").cast(_D38).alias("__s"),
            F.sum(F.col("__term") * F.col("__term")).cast(_D38).alias("__ss"),
        )
        .select(
            F.col("__t").alias(treatment),
            "n_blocks",
            "k_treatments",
            F.col("__s").cast("double").alias("s_x4"),
            F.col("__ss").cast("double").alias("ss_x16"),
        )
        .orderBy(treatment)
    )


def cliff_delta_cells(df: DataFrame, value: str, group: str) -> DataFrame:
    """Cliff's delta dominance census for every ordered group pair
    (Cliff, Psychological Bulletin 1993) — the ordinal EFFECT SIZE the
    rank tests (:func:`rank_sum_test`, :func:`kruskal_cells`) don't
    report: of all cross-group value pairs, how many has the higher
    group actually winning?  delta = (#gt - #lt) / (n_lo * n_hi), in
    [-1, 1], robust where Cohen's d is meaningless.

    Exact pair-census arithmetic with NO pair join over rows: per
    ordered group pair (g_lo < g_hi), gt = Sigma_v c_hi(v) *
    prior_lo(v) and ties = Sigma_v c_hi(v) * c_lo(v) come from the
    zero-filled (value-axis x group) grid with per-group bounded
    prefixes — the :func:`jonckheere_cells` machinery verbatim (and
    its ordinal-domain contract: the value axis must be bounded;
    bucket corpus-scale continuous axes first).  lt = n_lo*n_hi - gt -
    ties.  Counts fold in DECIMAL(38,0) and cast to double once.

    Output per pair: g_lo, g_hi, n_lo, n_hi, gt, lt, ties, delta (ONE
    fixed IEEE division).  NULL group/value rows are dropped.
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(group).alias("__g"), F.col(value).alias("__x")
    ).filter(F.col("__g").isNotNull() & F.col("__x").isNotNull())
    vg = g.groupBy("__g", "__x").agg(F.count(F.lit(1)).alias("__c"))
    axis = vg.select("__x").distinct()
    grps = vg.select("__g").distinct()
    grid = (
        axis.crossJoin(F.broadcast(grps))
        .join(vg, ["__g", "__x"], "left")
        .select("__g", "__x", F.coalesce("__c", F.lit(0)).alias("__c"))
    )
    w = Window.partitionBy("__g").orderBy("__x")
    pri = grid.select(
        "__g",
        "__x",
        "__c",
        F.coalesce(
            F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__p"),
        F.sum("__c").over(Window.partitionBy("__g")).alias("__n"),
    )
    a = pri.select(
        F.col("__g").alias("g_lo"),
        F.col("__x").alias("__xa"),
        F.col("__c").alias("__ca"),
        F.col("__p").alias("__pa"),
        F.col("__n").alias("__na"),
    )
    b = pri.select(
        F.col("__g").alias("g_hi"),
        F.col("__x").alias("__xb"),
        F.col("__c").alias("__cb"),
        F.col("__n").alias("__nb"),
    )
    cb = F.col("__cb").cast(_D38)
    per = (
        a.join(b, (a["__xa"] == b["__xb"]) & (a["g_lo"] < b["g_hi"]))
        .groupBy("g_lo", "g_hi")
        .agg(
            F.max("__na").alias("__nlo"),
            F.max("__nb").alias("__nhi"),
            F.sum(cb * F.col("__pa").cast(_D38)).cast(_D38).alias("__gt"),
            F.sum(cb * F.col("__ca").cast(_D38)).cast(_D38).alias("__ties"),
        )
    )
    nprod = F.col("__nlo").cast(_D38) * F.col("__nhi").cast(_D38)
    lt = (nprod - F.col("__gt") - F.col("__ties")).cast(_D38)
    return per.select(
        "g_lo",
        "g_hi",
        F.col("__nlo").alias("n_lo"),
        F.col("__nhi").alias("n_hi"),
        F.col("__gt").cast("double").alias("gt"),
        lt.cast("double").alias("lt"),
        F.col("__ties").cast("double").alias("ties"),
        (
            (F.col("__gt") - lt).cast(_D38).cast("double")
            / nprod.cast(_D38).cast("double")
        ).alias("delta"),
    ).orderBy("g_lo", "g_hi")


def signed_rank_cells(df: DataFrame, x: str, y: str) -> DataFrame:
    """Wilcoxon signed-rank cells over PAIRED integer columns — the
    paired-sample companion to :func:`rank_sum_test` (which compares
    two independent groups): per row d = x - y, zero differences
    dropped (the classic Wilcoxon convention — reported as n_zero so
    the caller sees the discard), |d| ranked with midranks across the
    whole sample, and the positive/negative rank sums reported
    DOUBLED so ties stay integer (the rank_sum_test identity: the t
    tied rows at an |d| value with strictly-prior count b each take
    doubled midrank 2b + t + 1).

    Exactness: w_plus_x2 + w_minus_x2 = 2 * n(n+1)/2 = n(n+1) is the
    structural identity tests pin; per-term products are cast to
    DECIMAL(38,0) before summing (the rank_sum_test overflow
    discipline).  The effect size reported is the rank-biserial
    correlation r = (W+ - W-)/(n(n+1)/2) — the doubling cancels, ONE
    IEEE division on exact operands.  The normal-approximation z needs
    a sqrt over a tie-corrected variance and stays a consumer
    one-liner.

    Shape: one |d|-axis collapse (distinct absolute differences) +
    the :func:`~npm_mirror_spark.operators.classifier._with_prior_sums`
    distributed prefix machinery + 1-row folds — no unbounded window,
    no join on raw rows.

    Output (one row): n_pairs, n_zero, n_nonzero, w_plus_x2,
    w_minus_x2, rank_biserial.
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = df.select(
        (F.col(x).cast("long") - F.col(y).cast("long")).alias("__d")
    ).filter(F.col("__d").isNotNull())
    n_all = g.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("__d") == 0).cast("long")).alias("n_zero"),
    )
    nz = g.where(F.col("__d") != 0).select(
        F.abs(F.col("__d")).alias("__ad"),
        (F.col("__d") > 0).alias("__pos"),
    )
    per_v = nz.groupBy("__ad").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("cnt_p"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("cnt_n"),
    )
    pri = _with_prior_sums(per_v, "__ad", ("cnt_p", "cnt_n"))
    below = F.col("__prior_cnt_p") + F.col("__prior_cnt_n")
    ties = F.col("cnt_p") + F.col("cnt_n")
    mr2 = (F.lit(2) * below + ties + F.lit(1)).cast(_D38)
    sums = pri.agg(
        F.sum(F.col("cnt_p").cast(_D38) * mr2).cast(_D38).alias("w_plus_x2"),
        F.sum(F.col("cnt_n").cast(_D38) * mr2).cast(_D38).alias("w_minus_x2"),
        F.sum(ties).alias("n_nonzero"),
    )
    zero = F.lit(0).cast(_D38)
    wp = F.coalesce(F.col("w_plus_x2"), zero)
    wm = F.coalesce(F.col("w_minus_x2"), zero)
    nn = F.coalesce(F.col("n_nonzero"), F.lit(0)).cast(_D38)
    return (
        n_all.crossJoin(F.broadcast(sums))
        .select(
            "n_pairs",
            "n_zero",
            F.coalesce(F.col("n_nonzero"), F.lit(0)).alias("n_nonzero"),
            wp.cast("double").alias("w_plus_x2"),
            wm.cast("double").alias("w_minus_x2"),
            F.when(
                nn > 0,
                (wp - wm).cast(_D38).cast("double")
                / (nn * (nn + 1)).cast(_D38).cast("double"),
            ).alias("rank_biserial"),
        )
    )


def cvm2_cells(df: DataFrame, value: str, in_a: Column) -> DataFrame:
    """Two-sample Cramér–von Mises cells between ``in_a`` rows and the
    rest, per distinct value — the WHOLE-CDF distance companion to
    :func:`ks_2samp` (KS reads only the single worst ecdf gap; CvM
    integrates the squared gap over the pooled sample, catching
    distributed shape differences a one-point statistic misses).

    Per distinct pooled value v (ascending): the group counts a, b at
    v, the inclusive cumulative counts cum_a, cum_b, the exact integer
    ecdf-gap numerator diff_num = cum_a*n2 - cum_b*n1 (the ks_2samp
    d_num operand — (F1 - F2)(v) times n1*n2), and the pooled weight
    w = a + b.  The statistic
    T = n1*n2/(n1+n2)^2 * Sigma_v w * (diff_num/(n1*n2))^2 is the
    consumer one-liner this table refuses (a float Sigma over the
    value axis); every emitted column is integer-VALUED, so consumer
    sums of diff_num or w are order-independent — with the caveat that
    the driver-hashable contract forces a double cast, which is exact
    only below 2^53: once cum*n products approach ~9e15 (corpora in
    the 10^8-rows-per-group range), downstream sums inherit ordinary
    IEEE rounding and the order-independence claim no longer holds
    bit-for-bit.

    Bounded-axis contract (the pettitt_cells discipline): the output
    is one row per DISTINCT value, so ``value`` must be a bounded
    integer/categorical axis (quantities, day counts, tiers) — bucket
    raw floats first.  NULL values and NULL ``in_a`` (coalesced to
    FALSE, the welch_t convention) follow the rank_sum_test handling.

    Output per value: value, cnt_a, cnt_b, cum_a, cum_b, diff_num, w
    — ordered by value.
    """
    from pyspark import StorageLevel

    from npm_mirror_spark.operators.classifier import _with_prior_sums

    src = df.select(
        F.col(value).alias("__v"),
        F.coalesce(in_a, F.lit(False)).alias("__in_a"),
    ).filter(F.col("__v").isNotNull())
    # bounded collapsed frame, two consumers (prefix machinery +
    # totals fold) — persist so the raw input is scanned once
    g = _ab_counts(src, "__v", F.col("__in_a")).persist(
        StorageLevel.MEMORY_AND_DISK
    )  # no paired unpersist by policy: docs/SCALE.md
    pri = _with_prior_sums(g, "__v", ("cnt_a", "cnt_b"))
    cum_a = (F.col("__prior_cnt_a") + F.col("cnt_a")).cast(_D38)
    cum_b = (F.col("__prior_cnt_b") + F.col("cnt_b")).cast(_D38)
    # group totals as a broadcast 1-row fold (the rank_sum_test shape),
    # not an unpartitioned window over the value axis
    tot = g.agg(
        F.sum("cnt_a").cast(_D38).alias("__n1"),
        F.sum("cnt_b").cast(_D38).alias("__n2"),
    )
    with_tot = pri.crossJoin(F.broadcast(tot)).select(
        "__v",
        "cnt_a",
        "cnt_b",
        cum_a.alias("__ca"),
        cum_b.alias("__cb"),
        "__n1",
        "__n2",
    )
    return with_tot.select(
        F.col("__v").alias(value),
        "cnt_a",
        "cnt_b",
        F.col("__ca").cast("long").alias("cum_a"),
        F.col("__cb").cast("long").alias("cum_b"),
        (F.col("__ca") * F.col("__n2") - F.col("__cb") * F.col("__n1"))
        .cast(_D38)
        .cast("double")
        .alias("diff_num"),
        (F.col("cnt_a") + F.col("cnt_b")).alias("w"),
    ).orderBy(value)


def kendall_w_cells(
    df: DataFrame, block: str, treatment: str, value: str
) -> DataFrame:
    """Kendall's coefficient of concordance W over a complete blocked
    design — the EFFECT-SIZE companion to :func:`friedman_cells` on the
    same within-block doubled midranks (Friedman asks DID any treatment
    shift; W asks how strongly the n blocks agree on the treatment
    ordering, 0..1), WITH the per-block tie correction friedman_cells
    deliberately leaves out.

    Exact-integer restatement: with R2_j = 2*R_j the doubled treatment
    rank sums, s_x4 = Sigma_j (R2_j - n(k+1))^2 (each term exact; the
    sum runs over the k-BOUNDED treatment axis, so even as a float sum
    it is an integer-valued sum of exact integers — order-independent)
    and tie_sum = Sigma_blocks Sigma_groups (t^3 - t),

        W = 3 * s_x4 / (n^2 * (k^3 - k) - n * tie_sum)

    — ONE IEEE division on exact DECIMAL(38,0) operands (denominator 0
    — every block fully tied — yields NULL).  The tie-corrected
    Friedman chi2 = n*(k-1)*W stays the consumer one-liner.

    Same complete-block contract, NULL handling and bounded-window
    shape as friedman_cells (rows with NULL block/treatment/value drop;
    only blocks with exactly one row per global treatment survive).

    1-row output: n_blocks, k_treatments, s_x4, tie_sum, w.
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(block).alias("__b"),
        F.col(treatment).alias("__t"),
        F.col(value).alias("__x"),
    ).filter(
        F.col("__b").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__x").isNotNull()
    )
    kf = g.select(F.countDistinct("__t").alias("__k"))
    per_b = g.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__nr"),
        F.countDistinct("__t").alias("__nt"),
    )
    complete = (
        per_b.crossJoin(F.broadcast(kf))
        .where((F.col("__nr") == F.col("__k")) & (F.col("__nt") == F.col("__k")))
        .select("__b")
    )
    gc = g.join(complete, "__b", "left_semi")
    vb = gc.groupBy("__b", "__x").agg(F.count(F.lit(1)).alias("__cx"))
    wv = Window.partitionBy("__b").orderBy("__x")
    pri = vb.select(
        "__b",
        "__x",
        "__cx",
        F.coalesce(
            F.sum("__cx").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__prior"),
    )
    # per-block tie correction Sigma (t^3 - t) from the same collapse
    ties = vb.agg(
        F.sum(
            (
                F.col("__cx").cast(_D38)
                * F.col("__cx").cast(_D38)
                * F.col("__cx").cast(_D38)
                - F.col("__cx").cast(_D38)
            ).cast(_D38)
        )
        .cast(_D38)
        .alias("tie_sum")
    )
    ranked = gc.join(pri, ["__b", "__x"]).select(
        "__t",
        (F.lit(2) * F.col("__prior") + F.col("__cx") + F.lit(1)).alias("__mr2"),
    )
    per_t = ranked.groupBy("__t").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__mr2").cast(_D38)).cast(_D38).alias("__r2"),
    )
    dev = (
        F.col("__r2")
        - F.col("__n").cast(_D38) * (F.col("__kk") + 1).cast(_D38)
    ).cast(_D38)
    folded = (
        per_t.crossJoin(
            F.broadcast(kf.select(F.col("__k").alias("__kk")))
        )
        .agg(
            F.max("__n").alias("n_blocks"),
            F.max("__kk").alias("k_treatments"),
            F.sum((dev * dev).cast(_D38)).cast(_D38).alias("s_x4"),
        )
    )
    one = folded.crossJoin(F.broadcast(ties))
    zero = F.lit(0).cast(_D38)
    n = F.col("n_blocks").cast(_D38)
    k = F.col("k_treatments").cast(_D38)
    s4 = F.coalesce(F.col("s_x4"), zero)
    ts = F.coalesce(F.col("tie_sum"), zero)
    den = (n * n * (k * k * k - k) - n * ts).cast(_D38)
    return one.select(
        "n_blocks",
        "k_treatments",
        s4.cast("double").alias("s_x4"),
        ts.cast("double").alias("tie_sum"),
        F.when(
            den > 0,
            (F.lit(3).cast(_D38) * s4).cast(_D38).cast("double")
            / den.cast("double"),
        ).alias("w"),
    )


def dixon_q_cells(daily: DataFrame, day: str, value: str) -> DataFrame:
    """Dixon's Q (r10 form) outlier cells over a bounded integer
    series: gap-to-range ratios at both extremes —
    q_low = (x(2) - x(1)) / (x(n) - x(1)) and
    q_high = (x(n) - x(n-1)) / (x(n) - x(1)) — the small-n suspicion
    gate next to the registered q_zscore_outliers / q_mad_outliers
    (which need a scale estimate; Dixon needs only order statistics).

    Tie convention: a duplicated extreme makes its gap 0 (x(2) is the
    second order STATISTIC, not the second distinct value), the
    standard reading; all values equal (range 0) yields NULL ratios.
    Every emitted count/extreme is an exact integer and each ratio is
    ONE IEEE division (the q_kappa contract).

    Shape: one min/max/count fold + one conditional second-extreme
    fold over the collapsed distinct-value axis (broadcast 1-row
    frames) — no window, no join on raw rows.

    1-row output: n_days, x_min, x_min2, x_max2, x_max, q_low, q_high.
    """
    g = daily.select(F.col(value).alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    # two-stage: extremes first, then the conditional second extremes
    ext = g.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("__x").alias("x_min"),
        F.max("__x").alias("x_max"),
    )
    sec = g.crossJoin(F.broadcast(ext)).agg(
        F.max("n_days").alias("n_days"),
        F.max("x_min").alias("x_min"),
        F.max("x_max").alias("x_max"),
        F.sum((F.col("__x") == F.col("x_min")).cast("long")).alias("__cmin"),
        F.sum((F.col("__x") == F.col("x_max")).cast("long")).alias("__cmax"),
        F.min(
            F.when(F.col("__x") > F.col("x_min"), F.col("__x"))
        ).alias("__above_min"),
        F.max(
            F.when(F.col("__x") < F.col("x_max"), F.col("__x"))
        ).alias("__below_max"),
    )
    x_min2 = F.when(F.col("__cmin") > 1, F.col("x_min")).otherwise(
        F.col("__above_min")
    )
    x_max2 = F.when(F.col("__cmax") > 1, F.col("x_max")).otherwise(
        F.col("__below_max")
    )
    rng = (F.col("x_max") - F.col("x_min")).cast("double")
    return sec.select(
        "n_days",
        "x_min",
        x_min2.alias("x_min2"),
        x_max2.alias("x_max2"),
        "x_max",
        F.when(
            F.col("x_max") > F.col("x_min"),
            (x_min2 - F.col("x_min")).cast("double") / rng,
        ).alias("q_low"),
        F.when(
            F.col("x_max") > F.col("x_min"),
            (F.col("x_max") - x_max2).cast("double") / rng,
        ).alias("q_high"),
    )


def grubbs_cells(daily: DataFrame, day: str, value: str) -> DataFrame:
    """Grubbs-style maximum-deviation cells over a per-day integer
    series, n-SCALED so every number is exact: the most extreme day is
    argmax |n*x_i - T| (T the series total — the mean never
    materializes), reported with the exact scaled deviation and the
    exact scaled variance pieces (n*Q - T^2 = n^2 * Sigma(x - mean)^2
    / ... with Q = Sigma x^2) so the studentized G =
    (max|x - mean|) / s is the consumer one-liner (it needs a sqrt
    over a cross-row-derived variance — the refused class).

    Deterministic argmax: ties on the deviation break toward the
    SMALLEST day (max-of-struct with inverted day, the q_ks_stat
    at_value convention).

    Shape: one fold for (n, T, Q) broadcast onto the day rows + one
    max-of-struct fold — no window, no join on raw rows.

    1-row output: n_days, total, sum_sq, max_dev_xn (= max|n*x - T|),
    at_day, dev_sign (+1 high outlier, -1 low, 0 exactly at the mean).
    """
    d38 = _D38
    g = daily.select(
        F.col(day).alias("__d"), F.col(value).alias("__x")
    ).filter(F.col("__d").isNotNull() & F.col("__x").isNotNull())
    tot = g.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("__x").cast(d38)).cast(d38).alias("__t"),
        F.sum((F.col("__x").cast(d38) * F.col("__x").cast(d38)).cast(d38))
        .cast(d38)
        .alias("__q"),
    )
    dev = (
        F.col("n_days").cast(d38) * F.col("__x").cast(d38) - F.col("__t")
    ).cast(d38)
    scored = g.crossJoin(F.broadcast(tot)).select(
        "__d",
        "n_days",
        F.col("__t").alias("total"),
        F.col("__q").alias("sum_sq"),
        F.abs(dev).alias("__adev"),
        F.signum(dev.cast("double")).cast("int").alias("__sign"),
    )
    # deterministic argmax via max(struct): biggest |dev|, then the
    # SMALLEST day (day sorts inverted through negative epoch-days).
    # n_days/total/sum_sq come from ``tot`` (not re-maxed over scored)
    # so an EMPTY series yields n_days = 0 with NULL pick columns —
    # the same degenerate row the DuckDB oracle's LEFT JOIN produces.
    pick = scored.agg(
        F.max(
            F.struct(
                F.col("__adev").alias("a"),
                (-F.datediff(F.col("__d"), F.lit("1970-01-01"))).alias("nd"),
                F.col("__d").alias("d"),
                F.col("__sign").alias("s"),
            )
        ).alias("__top"),
    )
    return tot.crossJoin(F.broadcast(pick)).select(
        "n_days",
        F.col("__t").cast("double").alias("total"),
        F.col("__q").cast("double").alias("sum_sq"),
        F.col("__top.a").cast("double").alias("max_dev_xn"),
        F.col("__top.d").alias("at_day"),
        F.col("__top.s").alias("dev_sign"),
    )


def rank_scale_cells(df: DataFrame, value: str, in_a: Column) -> DataFrame:
    """Joint location-scale rank cells between ``in_a`` rows and the
    rest, in ONE prior-sums pass: the Wilcoxon doubled rank sum
    (location), the Ansari–Bradley doubled score sum (scale — are A's
    values pushed toward the extremes?), and Cucconi's two quadratic
    rank sums (U for right-tail weight, V for left) — one operator, so
    the Lepage / Cucconi joint location-scale verdicts (both consumer
    one-liners with parity-dependent null moments) never pay three
    scans.

    Midrank convention throughout (documented, oracle-replayed): with
    mr2 = 2*midrank (exact int, the rank_sum_test identity) and
    N = n1 + n2,

        r_a_x2  = Sigma_A mr2                       (Wilcoxon, doubled)
        ab_a_x2 = Sigma_A (N + 1 - |mr2 - (N + 1)|) (Ansari, doubled)
        u_a_x4  = Sigma_A mr2^2                     (Cucconi U, x4)
        v_a_x4  = Sigma_A (2(N + 1) - mr2)^2        (Cucconi V, x4)

    — every per-term product cast to DECIMAL(38,0) before the sum (the
    rank_sum_test overflow discipline); ties take the midrank of the
    RANKS and the AB score of that midrank (the pragmatic tied-AB
    convention — state it when comparing against textbook tables).
    NULL ``in_a`` coalesces to FALSE (welch_t), NULL values drop.

    Shape: one distinct-value collapse + the
    :func:`~npm_mirror_spark.operators.classifier._with_prior_sums`
    distributed prefix machinery + a 1-row fold.

    1-row output: n1, n2, r_a_x2, ab_a_x2, u_a_x4, v_a_x4.
    """
    from pyspark import StorageLevel

    from npm_mirror_spark.operators.classifier import _with_prior_sums

    src = df.select(
        F.col(value).alias("__v"),
        F.coalesce(in_a, F.lit(False)).alias("__in_a"),
    ).filter(F.col("__v").isNotNull())
    # the collapsed value-axis frame (bounded by contract) feeds the
    # prefix machinery AND the totals fold — persist it so the raw
    # input is scanned once (the ordinal_assoc_cells plan-audit lesson)
    g = _ab_counts(src, "__v", F.col("__in_a")).persist(
        StorageLevel.MEMORY_AND_DISK
    )  # no paired unpersist by policy: docs/SCALE.md
    pri = _with_prior_sums(g, "__v", ("cnt_a", "cnt_b"))
    below = F.col("__prior_cnt_a") + F.col("__prior_cnt_b")
    ties = F.col("cnt_a") + F.col("cnt_b")
    mr2 = (F.lit(2) * below + ties + F.lit(1)).cast(_D38)
    tot = g.agg(
        F.sum("cnt_a").alias("n1"), F.sum("cnt_b").alias("n2")
    )
    np1 = (F.col("n1") + F.col("n2") + 1).cast(_D38)
    scored = pri.crossJoin(F.broadcast(tot))
    ca = F.col("cnt_a").cast(_D38)
    ab2 = (np1 - F.abs(mr2 - np1)).cast(_D38)
    v_base = (F.lit(2).cast(_D38) * np1 - mr2).cast(_D38)
    sums = scored.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum((ca * mr2).cast(_D38)).cast(_D38).alias("__r"),
        F.sum((ca * ab2).cast(_D38)).cast(_D38).alias("__ab"),
        F.sum((ca * (mr2 * mr2).cast(_D38)).cast(_D38)).cast(_D38).alias(
            "__u"
        ),
        F.sum((ca * (v_base * v_base).cast(_D38)).cast(_D38))
        .cast(_D38)
        .alias("__v2"),
    )
    zero = F.lit(0).cast(_D38)
    return sums.select(
        "n1",
        "n2",
        F.coalesce(F.col("__r"), zero).cast("double").alias("r_a_x2"),
        F.coalesce(F.col("__ab"), zero).cast("double").alias("ab_a_x2"),
        F.coalesce(F.col("__u"), zero).cast("double").alias("u_a_x4"),
        F.coalesce(F.col("__v2"), zero).cast("double").alias("v_a_x4"),
    )


def moments_jb_cells(df: DataFrame, value: str) -> DataFrame:
    """Jarque–Bera normality cells from exact integer power sums — the
    moment-based shape audit next to the rank-based location/scale
    tests: is the series' skewness/kurtosis consistent with a normal
    (the gate for z-score-based outlier rules like zscore_outliers,
    which silently misfire on heavy-tailed daily volumes)?

    Exactness: the four power sums S1..S4 fold as DECIMAL(38,0), and
    the n-scaled central moments are integer combinations —
    ``m2_xn = n*S2 - S1^2`` (= n^2 * m2), ``m3_xn2 = n^2*S3 -
    3n*S1*S2 + 2*S1^3`` (= n^3 * m3), ``m4_xn3 = n^3*S4 - 4n^2*S1*S3
    + 6n*S1^2*S2 - 3*S1^4`` (= n^4 * m4) — so the scale factors cancel
    exactly in the ratios: ``skew_sq = g1^2 = m3_xn2^2 / m2_xn^3`` and
    ``kurt_b2 = m4_xn3 / m2_xn^2`` (no root, no libm — pure IEEE
    * and /), and ``jb = n/6 * (skew_sq + (kurt_b2 - 3)^2 / 4)`` is
    ONE fixed IEEE expression on exact-int-valued inputs, bit-equal
    across engines.  Numeric-range contract: |x|^4 * n^4 must stay
    below 10^38 (|x| * n under ~3e9) — pre-scale gigantic counts
    (thousands) before calling, the quartic twin of the quade ss_x16
    bound.

    Shape: ONE global fold over the rows — no window, no join, no
    broadcast; the cheapest plan in the stats tier.

    1-row output: n_rows, s1, m2_xn, m3_xn2, m4_xn3 (exact-int
    doubles), skew_sq, kurt_b2, jb (NULL when m2 = 0 or n = 0).
    """
    x = F.col("__x").cast(_D38)
    g = df.select(F.col(value).alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    tot = g.agg(
        F.count(F.lit(1)).cast(_D38).alias("__n"),
        F.sum(x).cast(_D38).alias("__s1"),
        F.sum((x * x).cast(_D38)).cast(_D38).alias("__s2"),
        F.sum((x * x * x).cast(_D38)).cast(_D38).alias("__s3"),
        F.sum((x * x * x * x).cast(_D38)).cast(_D38).alias("__s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("__n", "__s1", "__s2", "__s3", "__s4"))
    m2 = (n * s2 - s1 * s1).cast(_D38)
    m3 = (n * n * s3 - F.lit(3).cast(_D38) * n * s1 * s2
          + F.lit(2).cast(_D38) * s1 * s1 * s1).cast(_D38)
    m4 = (n * n * n * s4 - F.lit(4).cast(_D38) * n * n * s1 * s3
          + F.lit(6).cast(_D38) * n * s1 * s1 * s2
          - F.lit(3).cast(_D38) * s1 * s1 * s1 * s1).cast(_D38)
    staged = tot.select(
        n.cast("long").alias("n_rows"),
        F.coalesce(s1, F.lit(0).cast(_D38)).cast("double").alias("s1"),
        m2.cast("double").alias("m2_xn"),
        m3.cast("double").alias("m3_xn2"),
        m4.cast("double").alias("m4_xn3"),
    )
    m2d, m3d, m4d = F.col("m2_xn"), F.col("m3_xn2"), F.col("m4_xn3")
    skew_sq = F.when(
        m2d > 0, (m3d * m3d) / (m2d * m2d * m2d)
    )
    kurt = F.when(m2d > 0, m4d / (m2d * m2d))
    return staged.select(
        "n_rows", "s1", "m2_xn", "m3_xn2", "m4_xn3",
        skew_sq.alias("skew_sq"),
        kurt.alias("kurt_b2"),
        F.when(
            m2d > 0,
            F.col("n_rows").cast("double") / F.lit(6.0)
            * (
                (m3d * m3d) / (m2d * m2d * m2d)
                + (m4d / (m2d * m2d) - F.lit(3.0))
                * (m4d / (m2d * m2d) - F.lit(3.0))
                / F.lit(4.0)
            ),
        ).alias("jb"),
    )


def kuiper_2samp_cells(df: DataFrame, value: str, in_a: Column) -> DataFrame:
    """Two-sample Kuiper statistic between ``in_a`` rows and the rest —
    the cyclic / tail-equitable reading of :func:`ks_2samp`: KS takes
    the single worst one-sided ECDF gap, Kuiper V = D+ + D- adds BOTH
    one-sided extremes, so shifts that push mass out of opposite tails
    (one group fatter on both ends) register even when the two
    one-sided gaps individually stay small.

    Same exact machinery as ks_2samp: per distinct value the signed
    integer gap ``diff = cum_a*n2 - cum_b*n1``; ``d_plus_num =
    max(0, max_v diff)`` and ``d_minus_num = max(0, max_v -diff)``
    are exact integers (the 0 clamp is the sup over the empty tail),
    and ``v = (d_plus_num + d_minus_num)/(n1*n2)`` is ONE division.

    Shape: one value-axis collapse + the bounded bucket prefix + a
    1-row (n1, n2) totals broadcast (the ks_2samp singleton-fold
    pattern) — no sort, no window over raw rows.

    1-row output: n1, n2, d_plus_num, d_minus_num (exact-int doubles),
    v_num (their sum), v (NULL when either group is empty).
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = _ab_counts(df, value, in_a)
    pri = _with_prior_sums(g, value, ("cnt_a", "cnt_b"))
    totals = g.agg(
        F.sum("cnt_a").alias("n1"), F.sum("cnt_b").alias("n2")
    )
    cum_a = (F.col("__prior_cnt_a") + F.col("cnt_a")).cast(_D38)
    cum_b = (F.col("__prior_cnt_b") + F.col("cnt_b")).cast(_D38)
    diff = (
        cum_a * F.col("n2").cast(_D38) - cum_b * F.col("n1").cast(_D38)
    ).cast(_D38)
    zero = F.lit(0).cast(_D38)
    folded = (
        pri.crossJoin(F.broadcast(totals))
        .agg(
            F.greatest(F.coalesce(F.max(diff), zero), zero)
            .cast(_D38)
            .alias("__dp"),
            F.greatest(F.coalesce(F.max(-diff), zero), zero)
            .cast(_D38)
            .alias("__dm"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
    )
    vnum = (F.col("__dp") + F.col("__dm")).cast(_D38)
    return folded.select(
        "n1",
        "n2",
        F.col("__dp").cast("double").alias("d_plus_num"),
        F.col("__dm").cast("double").alias("d_minus_num"),
        vnum.cast("double").alias("v_num"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            vnum.cast("double")
            / (F.col("n1").cast(_D38) * F.col("n2").cast(_D38)).cast(
                "double"
            ),
        ).alias("v"),
    )


def hodges_lehmann_2samp(df: DataFrame, value: str, in_a: Column) -> DataFrame:
    """Hodges–Lehmann two-sample shift estimator — the robust EFFECT
    SIZE companion to :func:`rank_sum_test` (which only answers "is
    there a shift?"): the median of all n1*n2 pairwise differences
    (a - b), the amount you'd subtract from group A to best align it
    with B, with 29% breakdown instead of the mean-difference's 0%.

    NOT the O(n1*n2) pair materialization: both samples collapse to
    their bounded distinct-value axes first (the cvm2_cells
    bounded-axis contract — bucket raw floats before calling), the
    difference grid is (dA x dB) counted pairs — O(distinct^2), not
    O(rows^2) — and the weighted median over the difference axis uses
    the exact DOUBLING trick (hl2 = lower + upper weighted median, an
    exact integer for integer values; the mood_median_cells
    convention) via the bounded bucket prefix.

    Shape: one value-axis collapse, a broadcast bounded-grid join
    (dA x dB), one diff-axis collapse + bucket prefix, 1-row folds.

    1-row output: n1, n2, n_pairs (= n1*n2, exact double), hl2_x
    (doubled HL estimate, exact-int double), hl (= hl2_x / 2, ONE
    division; NULL when either group is empty).
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = _ab_counts(df, value, in_a)
    totals = g.agg(
        F.sum("cnt_a").alias("n1"), F.sum("cnt_b").alias("n2")
    )
    a = g.filter(F.col("cnt_a") > 0).select(
        F.col(value).alias("__va"), "cnt_a"
    )
    b = g.filter(F.col("cnt_b") > 0).select(
        F.col(value).alias("__vb"), "cnt_b"
    )
    diffs = (
        a.crossJoin(F.broadcast(b))
        .groupBy((F.col("__va") - F.col("__vb")).alias("__d"))
        .agg(
            F.sum(F.col("cnt_a").cast(_D38) * F.col("cnt_b").cast(_D38))
            .cast(_D38)
            .alias("__w")
        )
    )
    pri = _with_prior_sums(diffs, "__d", ("__w",))
    cum = (F.col("__prior___w") + F.col("__w")).cast(_D38)
    npairs = diffs.agg(F.sum("__w").cast(_D38).alias("__np"))
    med = (
        pri.crossJoin(F.broadcast(npairs))
        .agg(
            F.min(
                F.when(
                    cum >= F.floor((F.col("__np") + 1) / 2), F.col("__d")
                )
            ).alias("__mlo"),
            F.min(
                F.when(
                    cum >= F.floor(F.col("__np") / 2) + 1, F.col("__d")
                )
            ).alias("__mhi"),
        )
        .select(
            (F.col("__mlo").cast(_D38) + F.col("__mhi").cast(_D38))
            .cast(_D38)
            .alias("__hl2")
        )
    )
    return (
        totals.crossJoin(F.broadcast(med))
        .select(
            "n1",
            "n2",
            (F.col("n1").cast(_D38) * F.col("n2").cast(_D38))
            .cast("double")
            .alias("n_pairs"),
            F.col("__hl2").cast("double").alias("hl2_x"),
            (F.col("__hl2").cast("double") / F.lit(2.0)).alias("hl"),
        )
    )


def cuzick_trend_cells(df: DataFrame, value: str, score: str) -> DataFrame:
    """Cuzick's Wilcoxon-type trend test cells (Cuzick 1985) — the
    UNBLOCKED ordered-groups trend reading that complements
    :func:`jonckheere_cells` (Jonckheere counts pairwise dominances
    between every group pair; Cuzick weights each row's pooled RANK by
    its group's ordinal score — cheaper, and its pieces reduce to one
    rank join + one fold).

    Exactness: pooled midranks doubled (``mr2 = 2*below + ties + 1``,
    the rank_sum_test identity), so ``t_x2 = Sigma score * mr2`` and
    its null expectation ``e_t_x2 = (N + 1) * Sigma score * n_g`` are
    exact integers; the tie-corrected variance is a consumer one-liner
    over the emitted exact pieces (it needs a final sqrt for z — the
    refused libm class).

    Shape: one (value, score) collapse, one value-axis collapse + the
    bounded bucket prefix, one value-keyed equi join back, one fold
    (+ the 1-row tie fold broadcast) — no window over raw rows.

    1-row output: n_rows, k_groups, t_x2, e_t_x2, sum_ln (Sigma l*n_g),
    sum_l2n (Sigma l^2*n_g), tie_cube_sum (Sigma t^3 - t) — all
    exact-int doubles.
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = df.select(
        F.col(value).alias("__x"), F.col(score).cast(_D38).alias("__l")
    ).filter(F.col("__x").isNotNull() & F.col("__l").isNotNull())
    gv = g.groupBy("__x", "__l").agg(F.count(F.lit(1)).alias("__c"))
    axis = gv.groupBy("__x").agg(F.sum("__c").alias("__ct"))
    pri = _with_prior_sums(axis, "__x", ("__ct",))
    mr2 = (
        F.lit(2).cast(_D38) * F.col("__prior___ct").cast(_D38)
        + F.col("__ct").cast(_D38)
        + F.lit(1).cast(_D38)
    ).cast(_D38)
    j = gv.join(
        pri.select("__x", mr2.alias("__mr2")), on="__x", how="inner"
    )
    c38 = F.col("__c").cast(_D38)
    folded = j.agg(
        F.sum("__c").alias("n_rows"),
        F.countDistinct("__l").alias("k_groups"),
        F.sum((c38 * F.col("__l") * F.col("__mr2")).cast(_D38))
        .cast(_D38)
        .alias("__t2"),
        F.sum((c38 * F.col("__l")).cast(_D38)).cast(_D38).alias("__ln"),
        F.sum((c38 * F.col("__l") * F.col("__l")).cast(_D38))
        .cast(_D38)
        .alias("__l2n"),
    )
    ct38 = F.col("__ct").cast(_D38)
    ties = axis.agg(
        F.coalesce(
            F.sum((ct38 * ct38 * ct38 - ct38).cast(_D38)).cast(_D38),
            F.lit(0).cast(_D38),
        ).alias("__tcube")
    )
    return (
        folded.crossJoin(F.broadcast(ties))
        .select(
            "n_rows",
            "k_groups",
            F.col("__t2").cast("double").alias("t_x2"),
            (
                (F.col("n_rows").cast(_D38) + F.lit(1).cast(_D38))
                * F.col("__ln")
            )
            .cast("double")
            .alias("e_t_x2"),
            F.col("__ln").cast("double").alias("sum_ln"),
            F.col("__l2n").cast("double").alias("sum_l2n"),
            F.col("__tcube").cast("double").alias("tie_cube_sum"),
        )
    )


def _type2_pick(cum, v, n, num: int, den: int):
    """(lo, hi) conditional-min pair for the doubled type-2 sample
    quantile at p = num/den over a prefix-summed value axis: with
    j = n*num // den and r = n*num % den, the doubled quantile is
    lo + hi when r == 0 (average the two straddling order statistics)
    else 2*hi — the mood_median_cells doubled-median convention
    generalized to any rational p (p = 1/2 reproduces it exactly)."""
    j = F.floor((n * num) / den)
    return (
        F.min(F.when(cum >= j, v)),
        F.min(F.when(cum >= j + 1, v)),
    )


def _e2(lo, hi, n, num: int, den: int):
    """Compose a _type2_pick pair into the doubled quantile."""
    r = (n * num) % den
    return F.when(
        r == 0, lo.cast(_D38) + hi.cast(_D38)
    ).otherwise(F.lit(2).cast(_D38) * hi.cast(_D38)).cast(_D38)


def robust_shape_cells(df: DataFrame, value: str) -> DataFrame:
    """Quantile-based shape cells — Bowley's quartile skewness and
    Moors' octile kurtosis, the ROBUST companions to
    :func:`moments_jb_cells` (whose moment-based g1/b2 a single wild
    day can saturate; the octile versions have positive breakdown and
    agree with the moment story only when the tails are honest —
    disagreement between the two faces IS the finding).

    Exactness: all seven doubled octiles e1_2..e7_2 (p = i/8, type-2
    averaging convention — ``_type2_pick``; e4_2 is exactly the
    mood_median_cells doubled median) are exact integers picked off
    the bounded bucket prefix; the doubling cancels in both ratios, so
    ``bowley = (e6_2 + e2_2 - 2*e4_2) / (e6_2 - e2_2)`` and
    ``moors = ((e7_2 - e5_2) + (e3_2 - e1_2)) / (e6_2 - e2_2)`` are
    each ONE fixed IEEE expression on exact-int-valued doubles.

    Shape: one value-axis collapse + the bucket prefix + a 1-row
    totals broadcast; ONE fold computes all 14 conditional mins.

    1-row output: n_rows, e1_2 .. e7_2 (exact-int doubles), bowley,
    moors (NULL when the octile IQR e6_2 - e2_2 is 0).
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = df.select(F.col(value).alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    vals = g.groupBy("__x").agg(F.count(F.lit(1)).alias("__c"))
    pri = _with_prior_sums(vals, "__x", ("__c",))
    cum = F.col("__prior___c") + F.col("__c")
    tot = vals.agg(F.sum("__c").alias("__n"))
    n = F.col("__n")
    aggs = [F.max("__n").alias("__nn")]
    for i in range(1, 8):
        lo, hi = _type2_pick(cum, F.col("__x"), n, i, 8)
        aggs += [lo.alias(f"__lo{i}"), hi.alias(f"__hi{i}")]
    picks = pri.crossJoin(F.broadcast(tot)).agg(*aggs)
    nn = F.col("__nn")
    es = {
        i: _e2(F.col(f"__lo{i}"), F.col(f"__hi{i}"), nn, i, 8)
        for i in range(1, 8)
    }
    staged = picks.select(
        nn.cast("long").alias("n_rows"),
        *[es[i].cast("double").alias(f"e{i}_2") for i in range(1, 8)],
    )
    e = {i: F.col(f"e{i}_2") for i in range(1, 8)}
    iqr = e[6] - e[2]
    return staged.select(
        "n_rows",
        *[f"e{i}_2" for i in range(1, 8)],
        F.when(
            iqr > 0, (e[6] + e[2] - F.lit(2.0) * e[4]) / (e[6] - e[2])
        ).alias("bowley"),
        F.when(
            iqr > 0,
            ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2]),
        ).alias("moors"),
    )


def tukey_fence_cells(df: DataFrame, value: str) -> DataFrame:
    """Tukey boxplot-fence outlier census — the quartile-rule
    companion to the z-score (q_zscore_outliers) and MAD
    (q_mad_outliers) gates: how many rows fall outside
    [Q1 - 1.5*IQR, Q3 + 1.5*IQR]?  The rule every boxplot draws,
    assumption-free and 25%-breakdown.

    Exactness: doubled type-2 quartiles q1_2/med2/q3_2 off the bucket
    prefix (``_type2_pick``), then the fences stay exact integers on
    the x4 scale — ``lo_fence_x4 = 5*q1_2 - 3*q3_2`` and
    ``hi_fence_x4 = 5*q3_2 - 3*q1_2`` (= 4*(Q1 - 1.5*IQR) and
    4*(Q3 + 1.5*IQR)) — so the census comparison ``4*x < lo_fence_x4``
    is pure integer arithmetic; out_rate is ONE division.

    Shape: one value-axis collapse + bucket prefix + 1-row quartile
    fold broadcast back onto the rows for the census fold.

    1-row output: n_rows, q1_2, med2, q3_2, lo_fence_x4, hi_fence_x4
    (exact-int doubles), n_low_out, n_high_out, out_rate.
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = df.select(F.col(value).alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    vals = g.groupBy("__x").agg(F.count(F.lit(1)).alias("__c"))
    pri = _with_prior_sums(vals, "__x", ("__c",))
    cum = F.col("__prior___c") + F.col("__c")
    tot = vals.agg(F.sum("__c").alias("__n"))
    n = F.col("__n")
    aggs = [F.max("__n").alias("__nn")]
    for i in (1, 2, 3):
        lo, hi = _type2_pick(cum, F.col("__x"), n, i, 4)
        aggs += [lo.alias(f"__lo{i}"), hi.alias(f"__hi{i}")]
    picks = pri.crossJoin(F.broadcast(tot)).agg(*aggs)
    nn = F.col("__nn")
    q1 = _e2(F.col("__lo1"), F.col("__hi1"), nn, 1, 4)
    q2 = _e2(F.col("__lo2"), F.col("__hi2"), nn, 2, 4)
    q3 = _e2(F.col("__lo3"), F.col("__hi3"), nn, 3, 4)
    quart = picks.select(
        q1.alias("__q1"),
        q2.alias("__q2"),
        q3.alias("__q3"),
        (F.lit(5).cast(_D38) * q1 - F.lit(3).cast(_D38) * q3)
        .cast(_D38)
        .alias("__lo4"),
        (F.lit(5).cast(_D38) * q3 - F.lit(3).cast(_D38) * q1)
        .cast(_D38)
        .alias("__hi4"),
    )
    x4 = F.lit(4).cast(_D38) * F.col("__x").cast(_D38)
    census = g.crossJoin(F.broadcast(quart)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(F.col("__q1").cast("double")).alias("q1_2"),
        F.max(F.col("__q2").cast("double")).alias("med2"),
        F.max(F.col("__q3").cast("double")).alias("q3_2"),
        F.max(F.col("__lo4").cast("double")).alias("lo_fence_x4"),
        F.max(F.col("__hi4").cast("double")).alias("hi_fence_x4"),
        F.sum(F.when(x4 < F.col("__lo4"), 1).otherwise(0)).alias(
            "n_low_out"
        ),
        F.sum(F.when(x4 > F.col("__hi4"), 1).otherwise(0)).alias(
            "n_high_out"
        ),
    )
    return census.select(
        "n_rows",
        "q1_2",
        "med2",
        "q3_2",
        "lo_fence_x4",
        "hi_fence_x4",
        "n_low_out",
        "n_high_out",
        F.when(
            F.col("n_rows") > 0,
            (F.col("n_low_out") + F.col("n_high_out")).cast("double")
            / F.col("n_rows").cast("double"),
        ).alias("out_rate"),
    )


def trimmed_cells(
    df: DataFrame,
    value: str,
    in_a: Column,
    trim_num: int = 1,
    trim_den: int = 5,
) -> DataFrame:
    """Per-group trimmed / winsorized sums for Yuen-style robust mean
    comparison — the heavy-tail-proof reading of the location question
    :func:`rank_sum_test` answers ordinally and welch_t answers
    parametrically: trim g = floor(n * trim_num/trim_den) rows off
    EACH end of each group, report exact trimmed and winsorized sums
    so Yuen's t (trimmed-mean difference over winsorized variance) is
    a consumer one-liner (it ends in sqrt).

    Exactness — no row ever materializes a rank: on the per-group
    value axis, rows of value v occupy ranks [prior+1, prior+cnt], so
    the trimmed overlap ``o_v = max(0, min(prior+cnt, n-g) -
    max(prior, g))`` is exact integer arithmetic, the trimmed sums
    fold as DECIMAL(38,0), and the winsorized sums add the clamped
    end contributions g*(v_(g+1) + v_(n-g)) from two order-statistic
    picks.  trim_mean is ONE division.

    Shape: one (group, value) collapse, a per-group bounded window
    over the value axis (partitioned by group — parallel), one equi
    join on group for totals, one fold per group — bounded 2-row
    output, no BNLJ.

    Output per group: in_a, n_i, g_trim, trim_n, trim_sum,
    win_sum, win_sumsq (exact-int doubles), trim_mean.
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(value).alias("__x"),
        F.coalesce(in_a, F.lit(False)).alias("__a"),
    ).filter(F.col("__x").isNotNull())
    gv = g.groupBy("__a", "__x").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy("__a").orderBy("__x")
    pri = gv.select(
        "__a",
        "__x",
        "__c",
        F.coalesce(
            F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__p"),
    )
    tot = gv.groupBy("__a").agg(F.sum("__c").alias("__n"))
    j = pri.join(tot, "__a")
    gtrim = F.floor((F.col("__n") * trim_num) / trim_den)
    lo_rank = gtrim + 1
    hi_rank = F.col("__n") - gtrim
    cum = F.col("__p") + F.col("__c")
    ov = F.greatest(
        F.lit(0).cast("long"),
        F.least(cum, hi_rank) - F.greatest(F.col("__p"), gtrim),
    )
    xd = F.col("__x").cast(_D38)
    per = j.groupBy("__a").agg(
        F.max("__n").alias("n_i"),
        F.max(gtrim).alias("g_trim"),
        F.coalesce(
            F.sum((ov.cast(_D38) * xd).cast(_D38)).cast(_D38),
            F.lit(0).cast(_D38),
        ).alias("__ts"),
        F.coalesce(
            F.sum((ov.cast(_D38) * xd * xd).cast(_D38)).cast(_D38),
            F.lit(0).cast(_D38),
        ).alias("__tq"),
        F.min(F.when(cum >= lo_rank, F.col("__x"))).alias("__vlo"),
        F.min(F.when(cum >= hi_rank, F.col("__x"))).alias("__vhi"),
    )
    gt = F.col("g_trim").cast(_D38)
    vlo = F.col("__vlo").cast(_D38)
    vhi = F.col("__vhi").cast(_D38)
    trim_n = (F.col("n_i") - 2 * F.col("g_trim")).cast("long")
    win_sum = (F.col("__ts") + gt * (vlo + vhi)).cast(_D38)
    win_sumsq = (F.col("__tq") + gt * (vlo * vlo + vhi * vhi)).cast(_D38)
    return (
        per.select(
            F.col("__a").alias("in_a"),
            "n_i",
            "g_trim",
            trim_n.alias("trim_n"),
            F.col("__ts").cast("double").alias("trim_sum"),
            win_sum.cast("double").alias("win_sum"),
            win_sumsq.cast("double").alias("win_sumsq"),
            F.when(
                trim_n > 0,
                F.col("__ts").cast("double") / trim_n.cast("double"),
            ).alias("trim_mean"),
        )
        .orderBy("in_a")
    )


def aligned_ranks_cells(
    df: DataFrame, block: str, treatment: str, value: str
) -> DataFrame:
    """Friedman aligned-ranks cells (Hodges & Lehmann 1962) — the
    blocked comparison that keeps CROSS-block magnitude information
    :func:`friedman_cells` throws away: align each block by its mean
    (exactly: ``a = k*x - block_sum``, the k-scaled deviation), rank
    ALL aligned values in one pooled ranking, then compare per-
    treatment rank sums.  More powerful than Friedman for small k.

    Same complete-block gate as friedman_cells (blocks with exactly
    one row per global treatment); doubled pooled midranks off the
    bounded bucket prefix over the aligned-value axis.  All emitted
    sums exact: per-treatment ``r_x2`` (Sigma mr2), global
    ``total_sq_x4`` (Sigma mr2^2) and ``block_sq_sum_x4``
    (Sigma_i B_i_x2^2) — the aligned-ranks statistic
    T = (k-1) * Sigma_j (R_j - (N+1)*n/2)^2 / (A - C) with
    A = Sigma r^2, C = Sigma_i B_i^2 / k is the consumer one-liner
    over these exact pieces (every term a ratio of the x2/x4 scales).

    Output per treatment: treatment, n_blocks, k_treatments, r_x2,
    total_sq_x4, block_sq_sum_x4 — ordered by treatment.
    """
    from pyspark.sql import Window

    from npm_mirror_spark.operators.classifier import _with_prior_sums

    g = df.select(
        F.col(block).alias("__b"),
        F.col(treatment).alias("__t"),
        F.col(value).alias("__x"),
    ).filter(
        F.col("__b").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__x").isNotNull()
    )
    kf = g.select(F.countDistinct("__t").alias("__k"))
    per_b = g.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__nr"),
        F.countDistinct("__t").alias("__nt"),
        F.sum(F.col("__x").cast(_D38)).cast(_D38).alias("__bs"),
    )
    complete = (
        per_b.crossJoin(F.broadcast(kf))
        .where(
            (F.col("__nr") == F.col("__k")) & (F.col("__nt") == F.col("__k"))
        )
        .select("__b", "__bs", "__k")
    )
    aligned = g.join(complete, "__b").select(
        "__b",
        "__t",
        (F.col("__k").cast(_D38) * F.col("__x").cast(_D38) - F.col("__bs"))
        .cast(_D38)
        .alias("__a"),
    )
    vals = aligned.groupBy("__a").agg(F.count(F.lit(1)).alias("__c"))
    pri = _with_prior_sums(vals, "__a", ("__c",))
    mr2 = (
        F.lit(2).cast(_D38) * F.col("__prior___c").cast(_D38)
        + F.col("__c").cast(_D38)
        + F.lit(1).cast(_D38)
    ).cast(_D38)
    ranked = aligned.join(
        pri.select("__a", mr2.alias("__mr2")), on="__a"
    )
    per_t = ranked.groupBy("__t").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("__mr2").cast(_D38).alias("__r2"),
    )
    meta = ranked.agg(
        F.sum((F.col("__mr2") * F.col("__mr2")).cast(_D38))
        .cast(_D38)
        .alias("__tsq"),
    )
    per_b_rank = ranked.groupBy("__b").agg(
        F.sum("__mr2").cast(_D38).alias("__bsum")
    )
    bsq = per_b_rank.agg(
        F.sum((F.col("__bsum") * F.col("__bsum")).cast(_D38))
        .cast(_D38)
        .alias("__bsq")
    )
    kmeta = aligned.agg(F.countDistinct("__t").alias("k_treatments"))
    return (
        per_t.crossJoin(F.broadcast(meta))
        .crossJoin(F.broadcast(bsq))
        .crossJoin(F.broadcast(kmeta))
        .select(
            F.col("__t").alias(treatment),
            "n_blocks",
            "k_treatments",
            F.col("__r2").cast("double").alias("r_x2"),
            F.col("__tsq").cast("double").alias("total_sq_x4"),
            F.col("__bsq").cast("double").alias("block_sq_sum_x4"),
        )
        .orderBy(treatment)
    )


def shift_function_cells(
    df: DataFrame, value: str, in_a: Column
) -> DataFrame:
    """Doksum shift-function cells at the octiles — WHERE does a
    two-sample difference live?  :func:`hodges_lehmann_2samp` reports
    ONE shift number and :func:`kuiper_2samp_cells` one dual-tail gap;
    the shift function reads the quantile-by-quantile difference, so a
    pair of groups that agree in the middle but diverge in the upper
    tail (the classic contaminated-corpus signature) shows a flat
    center and a growing tail row instead of averaging away.

    Exactness: each group's seven doubled type-2 octiles come off its
    OWN bounded value-axis prefix (``_type2_pick``, windows
    partitioned by group — parallel), and the per-octile difference
    ``diff_x2 = qa_2 - qb_2`` stays an exact integer on the doubled
    scale.  No division anywhere.

    Shape: one (group, value) collapse, per-group bounded windows, one
    conditional-pivot fold to a single row, exploded to the 7-row
    octile axis — the whole fold runs once (no per-octile re-scan).

    Output: octile (1-7), qa_2, qb_2, diff_x2 — ordered by octile;
    qa/qb NULL when that group is empty.
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(value).alias("__x"),
        F.coalesce(in_a, F.lit(False)).alias("__a"),
    ).filter(F.col("__x").isNotNull())
    gv = g.groupBy("__a", "__x").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy("__a").orderBy("__x")
    pri = gv.select(
        "__a",
        "__x",
        "__c",
        F.coalesce(
            F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__p"),
    )
    tot = gv.groupBy("__a").agg(F.sum("__c").alias("__n"))
    j = pri.join(tot, "__a")
    cum = F.col("__p") + F.col("__c")
    aggs = [F.max("__n").alias("__nn")]
    for i in range(1, 8):
        lo, hi = _type2_pick(cum, F.col("__x"), F.col("__n"), i, 8)
        aggs += [lo.alias(f"__lo{i}"), hi.alias(f"__hi{i}")]
    per = j.groupBy("__a").agg(*aggs)
    es = {
        i: _e2(F.col(f"__lo{i}"), F.col(f"__hi{i}"), F.col("__nn"), i, 8)
        for i in range(1, 8)
    }
    staged = per.select(
        "__a", *[es[i].alias(f"__e{i}") for i in range(1, 8)]
    )
    one = staged.agg(
        *[
            F.max(F.when(F.col("__a"), F.col(f"__e{i}"))).alias(f"__a{i}")
            for i in range(1, 8)
        ],
        *[
            F.max(F.when(~F.col("__a"), F.col(f"__e{i}"))).alias(f"__b{i}")
            for i in range(1, 8)
        ],
    )
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("octile"),
                F.col(f"__a{i}").cast("double").alias("qa_2"),
                F.col(f"__b{i}").cast("double").alias("qb_2"),
                (F.col(f"__a{i}") - F.col(f"__b{i}"))
                .cast(_D38)
                .cast("double")
                .alias("diff_x2"),
            )
            for i in range(1, 8)
        ]
    )
    return (
        one.select(F.explode(arr).alias("__o"))
        .select("__o.octile", "__o.qa_2", "__o.qb_2", "__o.diff_x2")
        .orderBy("octile")
    )


def foster_stuart_cells(
    daily: DataFrame, group: str, day: str, cnt: str
) -> DataFrame:
    """Foster–Stuart records test for trend, per group: count the days
    whose value strictly exceeds every earlier day (upper records) and
    the days strictly below every earlier day (lower records); a
    trendless exchangeable series has E[U] = E[L] = H_n - 1 (harmonic),
    so d = U - L signals monotone trend and s = U + L signals widening
    range (Foster & Stuart '54).  The record-counting complement to
    q_mann_kendall (pairwise dominance) and q_cox_stuart (paired
    halves): records read only the running extremes, so a single
    late-series spike flips d by at most 1.

    All cells are exact integers: a day is an upper record iff
    ``cnt > max(cnt) OVER (PARTITION BY group ORDER BY day ROWS
    UNBOUNDED PRECEDING TO 1 PRECEDING)`` — strict, so ties never
    count, and the first day is no record by convention (t >= 2).

    Shape: ONE window pair per group over the bounded calendar-day
    axis (the q_drift_weekly contract — days per group are bounded by
    the retention horizon, not the corpus), then a per-group
    aggregate.  No self-join, no sort beyond the windows' own.

    Output per group: n_days, upper_records, lower_records,
    d_stat = U - L, s_stat = U + L — ordered by group.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group)
        .orderBy(day)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        daily.filter(F.col(day).isNotNull() & F.col(cnt).isNotNull())
        .select(
            F.col(group).alias("__g"),
            F.col(cnt).alias("__x"),
            F.max(cnt).over(w).alias("__pmax"),
            F.min(cnt).over(w).alias("__pmin"),
        )
        .select(
        "__g",
        F.when(
            F.col("__pmax").isNotNull() & (F.col("__x") > F.col("__pmax")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__up"),
        F.when(
            F.col("__pmin").isNotNull() & (F.col("__x") < F.col("__pmin")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__lo"),
        )
    )
    return (
        flagged.groupBy(F.col("__g").alias(group))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("__up").cast("long").alias("upper_records"),
            F.sum("__lo").cast("long").alias("lower_records"),
            (F.sum("__up") - F.sum("__lo")).cast("long").alias("d_stat"),
            (F.sum("__up") + F.sum("__lo")).cast("long").alias("s_stat"),
        )
        .orderBy(group)
    )


def longest_run_cells(
    daily: DataFrame, group: str, day: str, cnt: str
) -> DataFrame:
    """Longest same-sign run census per group — the extreme-value twin
    of :func:`runs_test_daily` (which counts runs; a series can have
    the expected NUMBER of runs yet hide one pathological streak).
    Each group's daily values are signed against that group's exact
    lower median (rank ceil(n/2) off the distinct-value prefix — no
    sort), exact-median days are dropped (the runs-test convention),
    and maximal same-sign streaks become gaps-and-islands groups:
    ``row_number() - row_number() PARTITION BY sign`` is constant
    exactly within a streak.

    All cells are exact integers; there is nothing to divide.

    Shape: one (group, value) groupBy for the per-group median (prior
    sums via a group-partitioned window over the distinct-value axis),
    an equi join of the median back onto the days (no broadcast fold —
    the median frame is keyed by group), then two row_number windows
    over the bounded calendar-day axis and one (group, sign, island)
    groupBy.  No self-join.

    Output per group: n_signed (days off the median), n_runs,
    longest_run, longest_plus, longest_minus — ordered by group.
    """
    from pyspark.sql import Window

    g = daily.filter(
        F.col(day).isNotNull() & F.col(cnt).isNotNull()
    ).select(
        F.col(group).alias("__g"),
        F.col(day).alias("__d"),
        F.col(cnt).alias("__x"),
    )
    vals = g.groupBy("__g", "__x").agg(F.count(F.lit(1)).alias("__c"))
    wv = Window.partitionBy("__g").orderBy("__x")
    pri = vals.select(
        "__g",
        "__x",
        "__c",
        F.coalesce(
            F.sum("__c").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__p"),
    )
    tot = vals.groupBy("__g").agg(F.sum("__c").alias("__n"))
    med = (
        pri.join(tot, "__g")
        .filter(
            (F.col("__p") + F.col("__c"))
            >= F.ceil(F.col("__n") / 2).cast("long")
        )
        .groupBy("__g")
        .agg(F.min("__x").alias("__med"))
    )
    signed = (
        g.join(med, "__g")
        .filter(F.col("__x") != F.col("__med"))
        .select(
            "__g",
            "__d",
            F.when(F.col("__x") > F.col("__med"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("__s"),
        )
    )
    wall = Window.partitionBy("__g").orderBy("__d")
    wsgn = Window.partitionBy("__g", "__s").orderBy("__d")
    islands = signed.select(
        "__g",
        "__s",
        (F.row_number().over(wall) - F.row_number().over(wsgn)).alias(
            "__i"
        ),
    )
    runs = islands.groupBy("__g", "__s", "__i").agg(
        F.count(F.lit(1)).alias("__len")
    )
    return (
        runs.groupBy(F.col("__g").alias(group))
        .agg(
            F.sum("__len").cast("long").alias("n_signed"),
            F.count(F.lit(1)).alias("n_runs"),
            F.max("__len").cast("long").alias("longest_run"),
            F.coalesce(
                F.max(F.when(F.col("__s") == 1, F.col("__len"))), F.lit(0)
            )
            .cast("long")
            .alias("longest_plus"),
            F.coalesce(
                F.max(F.when(F.col("__s") == -1, F.col("__len"))), F.lit(0)
            )
            .cast("long")
            .alias("longest_minus"),
        )
        .orderBy(group)
    )


def gk_tau_cells(df: DataFrame, x: str, y: str) -> DataFrame:
    """Goodman–Kruskal tau cells — the variation-based PRE companion to
    the error-based :func:`~npm_mirror_spark.operators.checks.gk_lambda`
    (modal guessing) and the ordinal gamma: how much of the Gini
    variation of the column variable ``y`` is explained by knowing the
    row variable ``x``?  tau = (N * Sigma_x q_x / n_x - Sigma_y n_y^2)
    / (N^2 - Sigma_y n_y^2) with q_x = Sigma_y n_xy^2 (Goodman &
    Kruskal '54).

    One row per x-category with exact integer cells (n_x, q_x, and the
    flat-repeated N / Sigma_y n_y^2) plus ``pre_term = (N * q_x) /
    n_x`` — ONE IEEE division per row on exact-cast doubles.  The
    scalar tau is the consumer one-liner this face refuses: summing
    the per-category terms is a float sum in data-dependent order
    (exact only when the caller fixes the bounded category order, as
    the oracle-facing faces do by emitting the rows themselves).
    Products stay exact below 2^53 (N * q_x here is ~1e14 at sf0.1;
    at larger scales the doubles round identically in both engines —
    the q_corr_moments determinism class).

    Shape: one (x, y) groupBy to the contingency cells — bounded by
    the category domain, the caller's contract — a per-x re-aggregate,
    a per-y re-aggregate collapsed to ONE row, and a broadcast 1-row
    fold (the q_anova_cells shape).
    """
    cont = (
        df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
        .groupBy(F.col(x).alias("__x"), F.col(y).alias("__y"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_x = cont.groupBy("__x").agg(
        F.sum("__n").cast("long").alias("n_x"),
        F.sum(F.col("__n").cast(_D38) * F.col("__n"))
        .cast("double")
        .alias("q_x"),
    )
    per_y = cont.groupBy("__y").agg(F.sum("__n").alias("__ny"))
    glob = per_y.agg(
        F.sum("__ny").cast("double").alias("n_total"),
        F.sum(F.col("__ny").cast(_D38) * F.col("__ny"))
        .cast("double")
        .alias("sum_col_sq"),
    )
    return (
        per_x.crossJoin(F.broadcast(glob))
        .select(
            F.col("__x").alias(x),
            "n_x",
            "q_x",
            "n_total",
            "sum_col_sq",
            (
                (F.col("n_total") * F.col("q_x"))
                / F.col("n_x").cast("double")
            ).alias("pre_term"),
        )
        .orderBy(x)
    )


def variance_ratio_cells(
    df: DataFrame, group: str, value: str
) -> DataFrame:
    """Variance-homogeneity census across groups — Hartley's Fmax
    (max s^2 / min s^2, Hartley '50) over per-group sample variances
    computed from EXACT integer moment cells: 2-dp inputs scale x100
    to integers (floor(v*100+0.5) — exact, tie-free), the three sums
    accumulate in DECIMAL(38,0), and each group's variance is ONE
    division ``(n*sumsq - sum^2) / (n*(n-1))`` on exact-cast doubles
    (the q_corr_moments determinism class).  The rank-free parametric
    complement to q_conover_scale / q_rank_scale (rank dispersion) and
    q_brown_forsythe (median deviations): those resist outliers, Fmax
    reads raw second moments, so disagreement between the two families
    localizes heavy tails.

    Fmax repeats flat on every row (the kanonymity_report pattern):
    max/min over the per-group s^2 doubles are order-independent
    aggregates, then one more division.  Cochran's C (max s^2 /
    SUM s^2) is the consumer one-liner this face refuses — its
    denominator is a float sum in data-dependent group order.

    Shape: one groupBy to the per-group moment cells — bounded by the
    group domain, the caller's contract — then a 1-row (s2_max,
    s2_min) broadcast fold.
    """
    cents = F.floor(F.col(value) * 100 + 0.5).cast("bigint")
    m = (
        df.select(F.col(group).alias("__g"), cents.alias("__v"))
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(F.col("__v").cast(_D38)).cast("double").alias("sum_c"),
            F.sum(F.col("__v").cast(_D38) * F.col("__v"))
            .cast("double")
            .alias("sumsq_c"),
        )
    )
    s2 = F.when(
        F.col("n_g") >= 2,
        (
            F.col("n_g").cast("double") * F.col("sumsq_c")
            - F.col("sum_c") * F.col("sum_c")
        )
        / (
            F.col("n_g").cast("double")
            * (F.col("n_g").cast("double") - F.lit(1.0))
        ),
    )
    cells = m.select("__g", "n_g", "sum_c", "sumsq_c", s2.alias("s2"))
    fold = cells.agg(
        F.max("s2").alias("s2_max"), F.min("s2").alias("s2_min")
    )
    return (
        cells.crossJoin(F.broadcast(fold))
        .select(
            F.col("__g").alias(group),
            "n_g",
            "sum_c",
            "sumsq_c",
            "s2",
            "s2_max",
            "s2_min",
            F.when(
                F.col("s2_min") > 0, F.col("s2_max") / F.col("s2_min")
            ).alias("fmax"),
        )
        .orderBy(group)
    )


def dunn_pairs_cells(df: DataFrame, value: str, group: str) -> DataFrame:
    """Dunn's post-hoc pairwise mean-rank comparison — the follow-up
    :func:`kruskal_cells` points at but cannot answer: WHICH groups
    differ once the omnibus H flags the family (Dunn '64)?  Reuses the
    pooled doubled midrank sums kruskal_cells already emits, so the
    pairwise layer adds NO new rank pass: for each ordered group pair
    (a < b), ``mean_rank_diff = R̄_a - R̄_b = (r2_a*n_b - r2_b*n_a)
    / (2*n_a*n_b)`` — the numerator is an exact-int-valued double
    (doubled rank sums times counts), the division is ONE IEEE op.
    The z denominator (needs a sqrt of N(N+1)/12 terms) is
    deliberately not computed, matching :func:`rank_sum_test`.

    Shape: the k-row kruskal_cells frame self-paired on a bounded
    inequality grid (k groups -> k(k-1)/2 rows; broadcast, the
    caller's bounded-domain contract) — no second pass over the data.

    Output per pair: {group}_a, {group}_b, n_a, n_b, r2_a, r2_b,
    diff_num_x2, mean_rank_diff — ordered by the pair.
    """
    k = kruskal_cells(df, value, group).select(
        F.col(group), "n_i", "rank_sum_x2"
    )
    a = k.select(
        F.col(group).alias(f"{group}_a"),
        F.col("n_i").alias("n_a"),
        F.col("rank_sum_x2").alias("r2_a"),
    )
    b = k.select(
        F.col(group).alias(f"{group}_b"),
        F.col("n_i").alias("n_b"),
        F.col("rank_sum_x2").alias("r2_b"),
    )
    p = a.join(
        F.broadcast(b), F.col(f"{group}_a") < F.col(f"{group}_b")
    )
    diff = F.col("r2_a") * F.col("n_b").cast("double") - F.col(
        "r2_b"
    ) * F.col("n_a").cast("double")
    return p.select(
        f"{group}_a",
        f"{group}_b",
        "n_a",
        "n_b",
        "r2_a",
        "r2_b",
        diff.alias("diff_num_x2"),
        (
            diff
            / (
                F.lit(2.0)
                * F.col("n_a").cast("double")
                * F.col("n_b").cast("double")
            )
        ).alias("mean_rank_diff"),
    ).orderBy(f"{group}_a", f"{group}_b")


def durbin_rank_cells(
    df: DataFrame, block: str, treatment: str, value: str
) -> DataFrame:
    """Incomplete-block rank deviation cells (the Durbin '51 /
    Skillings–Mack family) — :func:`friedman_cells` without the
    complete-block gate: treatments are ranked WITHIN each block they
    appear in (doubled midranks off the per-block distinct-value
    collapse, the friedman idiom), and each treatment reports its
    doubled rank sum against its own null mean ``Sigma_{b∋j}(k_b+1)``
    (the doubled expectation of a within-block rank when block b holds
    k_b rows).  ``dev_x2 = rank_sum_x2 - null_mean_x2`` is therefore
    an EXACT integer-valued double with no division anywhere — the
    chi-square normalization (which needs per-block variance weights,
    and in the unequal-block general case sqrt weights) is the
    consumer's affair.

    Shape: one (block, value) collapse + ROW-framed prior window
    partitioned by block (bounded by the per-block treatment domain),
    one block-size aggregate joined back by block (equi), one
    per-treatment fold.  No completeness semi-join, no broadcast.

    Caller contract: ONE row per (block, treatment) — duplicate
    observations of a treatment inside a block would inflate k_b and
    the within-block midranks (collapse upstream, as the daily-count
    faces do); blocks_present counts DISTINCT blocks either way.

    Output per treatment: treatment, blocks_present, rank_sum_x2,
    null_mean_x2, dev_x2 — ordered by treatment.
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(block).alias("__b"),
        F.col(treatment).alias("__t"),
        F.col(value).alias("__x"),
    ).filter(
        F.col("__b").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__x").isNotNull()
    )
    vb = g.groupBy("__b", "__x").agg(F.count(F.lit(1)).alias("__cx"))
    wv = Window.partitionBy("__b").orderBy("__x")
    pri = vb.select(
        "__b",
        "__x",
        "__cx",
        F.coalesce(
            F.sum("__cx").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__prior"),
    )
    sizes = g.groupBy("__b").agg(F.count(F.lit(1)).alias("__kb"))
    ranked = (
        g.join(pri, ["__b", "__x"])
        .join(sizes, "__b")
        .select(
            "__b",
            "__t",
            (
                F.lit(2) * F.col("__prior") + F.col("__cx") + F.lit(1)
            ).alias("__r2"),
            (F.col("__kb") + F.lit(1)).alias("__kb1"),
        )
    )
    return (
        ranked.groupBy(F.col("__t").alias(treatment))
        .agg(
            F.countDistinct("__b").cast("long").alias("blocks_present"),
            F.sum(F.col("__r2").cast(_D38)).cast("double").alias(
                "rank_sum_x2"
            ),
            F.sum(F.col("__kb1").cast(_D38)).cast("double").alias(
                "null_mean_x2"
            ),
            (
                F.sum(F.col("__r2").cast(_D38)).cast("double")
                - F.sum(F.col("__kb1").cast(_D38)).cast("double")
            ).alias("dev_x2"),
        )
        .orderBy(treatment)
    )
