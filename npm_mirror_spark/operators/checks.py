"""Data-quality constraint checking: declarative table contracts
evaluated in ONE pass (the Deequ/Great-Expectations pattern, Spark-first).

A 100 TB ingest needs its gate BEFORE downstream jobs consume bad data,
and the gate must not cost a scan per rule: every constraint here
compiles to an aggregate expression over the SAME single scan — Spark
computes all of them in one job with map-side partial aggregation
(uniqueness adds the one count_distinct shuffle Spark plans for it).
The reference validates per-record shape inline
(data_pipeline/npm-mirror/app/changes_consumer.py checks doc fields as
it consumes); table-level contracts are extension surface for the
analytics store.

Exactness contract: every metric is a ratio of exact counts (or an
exact min/max), so the DuckDB oracle reproduces each value and verdict
bit-for-bit — no sampling, no sketches.

Constraint kinds (each a (name, kind, column, threshold) row in the
report, metric semantics in [0, 1] unless noted):

- ``completeness``   fraction of rows with col NOT NULL  >= threshold
- ``uniqueness``     distinct(col) / count(col non-null) >= threshold
- ``in_set``         fraction of NON-NULL values in the allowed set
                     >= threshold (vacuously 1.0 on all-null)
- ``matches``        fraction of NON-NULL values matching a Java/RE2
                     common-subset regex >= threshold
- ``min_value``      min(col) >= threshold (metric = the min itself)
- ``max_value``      max(col) <= threshold (metric = the max itself)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _metric(kind: str, column: str, arg) -> F.Column:
    c = F.col(column)
    n = F.count(F.lit(1)).cast("double")
    nn = F.count(c).cast("double")  # count() skips NULLs
    if kind == "completeness":
        # vacuously complete on an empty table (0/0 would be NaN)
        return F.when(F.count(F.lit(1)) > 0, nn / n).otherwise(F.lit(1.0))
    if kind == "uniqueness":
        return F.when(
            F.count(c) > 0, F.count_distinct(c).cast("double") / nn
        ).otherwise(F.lit(1.0))
    if kind == "in_set":
        hits = F.sum(c.isin(list(arg)).cast("long")).cast("double")
        return F.when(F.count(c) > 0, hits / nn).otherwise(F.lit(1.0))
    if kind == "matches":
        hits = F.sum(
            c.cast("string").rlike(arg).cast("long")
        ).cast("double")
        return F.when(F.count(c) > 0, hits / nn).otherwise(F.lit(1.0))
    if kind == "min_value":
        return F.min(c).cast("double")
    if kind == "max_value":
        return F.max(c).cast("double")
    raise ValueError(f"unknown constraint kind: {kind}")


def constraint_report(
    df: DataFrame,
    constraints: list[tuple],
) -> DataFrame:
    """Evaluate ``constraints`` — tuples of
    ``(name, kind, column, threshold)`` or
    ``(name, kind, column, threshold, arg)`` where ``arg`` is the
    allowed-value set (``in_set``) or the regex (``matches``) — and
    return one row per constraint:
    (name, kind, column, metric, threshold, ok).

    One aggregation job over one scan: each metric is an aggregate
    expression; the single result row explodes back into per-constraint
    rows via ``inline`` (a driver-free pivot — the report stays a
    DataFrame a gate can join or a sink can persist).
    """
    if not constraints:
        raise ValueError("need at least one constraint")
    metric_cols = []
    for i, spec in enumerate(constraints):
        name, kind, column, threshold = spec[:4]
        arg = spec[4] if len(spec) > 4 else None
        metric_cols.append(_metric(kind, column, arg).alias(f"__m_{i}"))
    agg = df.agg(*metric_cols)
    structs = []
    for i, spec in enumerate(constraints):
        name, kind, column, threshold = spec[:4]
        m = F.col(f"__m_{i}")
        ok = (
            m <= F.lit(float(threshold))
            if kind == "max_value"
            else m >= F.lit(float(threshold))
        )
        structs.append(
            F.struct(
                F.lit(name).alias("name"),
                F.lit(kind).alias("kind"),
                F.lit(column).alias("column"),
                m.alias("metric"),
                F.lit(float(threshold)).alias("threshold"),
                ok.alias("ok"),
            )
        )
    return agg.select(F.inline(F.array(*structs)))


def grouped_constraint_report(
    df: DataFrame,
    group_col: str,
    constraints: list[tuple],
) -> DataFrame:
    """Per-group contract evaluation — the batch face of the
    ValidatedAppend gate (r7 verdict item 5): evaluate every constraint
    WITHIN each ``group_col`` partition (a batch id, an ingest day, a
    source) and return one row per (group, constraint):
    (group_col, name, kind, column, metric, threshold, ok, group_ok,
    route) where ``group_ok`` is the all-constraints conjunction and
    ``route`` is the gate's verdict ('main' / 'quarantine') — exactly
    the all-or-nothing decision ValidatedAppend.process_batch makes per
    micro-batch, expressed as one relational job over many batches at
    once.

    Cost: ONE aggregation job — every metric is an aggregate expression
    over the same (group)-keyed shuffle with map-side partials
    (count_distinct adds its usual expand); the per-group single rows
    then explode via ``inline``, driver-free.  Same exactness contract
    as constraint_report: every metric is a ratio of exact counts or an
    exact min/max, so a DuckDB oracle replays values and verdicts
    bit-for-bit.
    """
    if not constraints:
        raise ValueError("need at least one constraint")
    metric_cols = []
    for i, spec in enumerate(constraints):
        name, kind, column, threshold = spec[:4]
        arg = spec[4] if len(spec) > 4 else None
        metric_cols.append(_metric(kind, column, arg).alias(f"__m_{i}"))
    agg = df.groupBy(group_col).agg(*metric_cols)
    oks = []
    for i, spec in enumerate(constraints):
        _, kind, _, threshold = spec[:4]
        m = F.col(f"__m_{i}")
        ok = (
            m <= F.lit(float(threshold))
            if kind == "max_value"
            else m >= F.lit(float(threshold))
        )
        oks.append(ok)
    group_ok = oks[0]
    for o in oks[1:]:
        group_ok = group_ok & o
    structs = []
    for i, spec in enumerate(constraints):
        name, kind, column, threshold = spec[:4]
        structs.append(
            F.struct(
                F.lit(name).alias("name"),
                F.lit(kind).alias("kind"),
                F.lit(column).alias("column"),
                F.col(f"__m_{i}").alias("metric"),
                F.lit(float(threshold)).alias("threshold"),
                oks[i].alias("ok"),
            )
        )
    return agg.select(
        group_col,
        F.inline(F.array(*structs)),
        group_ok.alias("group_ok"),
        F.when(group_ok, F.lit("main"))
        .otherwise(F.lit("quarantine"))
        .alias("route"),
    )


_NUMERIC_TYPES = {
    "byte", "short", "integer", "long", "float", "double", "decimal",
}


def drift_report(
    a: DataFrame,
    b: DataFrame,
    cols: list[str],
    null_rate_tol: float = 0.02,
    distinct_rel_tol: float = 0.10,
    mean_rel_tol: float = 0.05,
) -> DataFrame:
    """Column-level DRIFT between two versions of a table (this week's
    batch vs last week's, release N vs N-1) — the data-validation twin
    of :func:`constraint_report`: contracts catch absolute breakage,
    drift catches the silent distribution shift that still poisons
    models downstream.

    ONE aggregation job per side computes every column's metrics from a
    single scan (map-side partials; the per-column count_distinct is
    the one expensive term — Spark plans an expand, so the ``cols``
    list is the cost knob).  Both 1-row results cross-join (broadcast)
    and unpivot into one row per column:

        (column, n_a, n_b, null_rate_a/b, distinct_a/b, mean_a/b,
         null_drift, distinct_drift, mean_drift, drifted)

    Verdicts (exact arithmetic, so the oracle replays them):
    - null_drift:     |null_rate_a - null_rate_b| > null_rate_tol
    - distinct_drift: |distinct_a - distinct_b|
                        > distinct_rel_tol * greatest(d_a, d_b, 1)
    - mean_drift:     numeric columns only — means via exact DECIMAL
                      sums; |mean_a - mean_b|
                        > mean_rel_tol * greatest(|mean_a|, |mean_b|)
    - drifted: any of the above.

    Empty side => null rates 0.0 and means NULL (vacuous, not NaN).
    """
    if not cols:
        raise ValueError("need at least one column")
    numeric = {
        f.name
        for f in a.schema.fields
        if f.dataType.typeName().split("(")[0] in _NUMERIC_TYPES
    }

    def _side(df: DataFrame, tag: str):
        aggs = [F.count(F.lit(1)).alias(f"n_{tag}")]
        for c in cols:
            aggs.append(F.count(F.col(c)).alias(f"nn_{c}_{tag}"))
            aggs.append(F.count_distinct(F.col(c)).alias(f"d_{c}_{tag}"))
            if c in numeric:
                # scale-0 decimal (value pre-scaled by 10^4, exact):
                # a scale-4 decimal above 2^53 converts to double by two
                # roundings in DuckDB vs one in Spark — the 1-ulp
                # divergence the r7 sf0.1 sweep caught in linear_trend
                aggs.append(
                    F.sum(
                        (F.col(c).cast("decimal(28,4)") * F.lit(10000)).cast(
                            "decimal(32,0)"
                        )
                    ).alias(f"s_{c}_{tag}")
                )
        return df.agg(*aggs)

    j = _side(a, "a").crossJoin(F.broadcast(_side(b, "b")))

    def _null_rate(c: str, tag: str):
        n = F.col(f"n_{tag}")
        return F.when(
            n > 0, (n - F.col(f"nn_{c}_{tag}")).cast("double") / n.cast("double")
        ).otherwise(F.lit(0.0))

    def _mean(c: str, tag: str):
        if c not in numeric:
            return F.lit(None).cast("double")
        return F.when(
            F.col(f"nn_{c}_{tag}") > 0,
            (F.col(f"s_{c}_{tag}").cast("double") / F.lit(10000.0))
            / F.col(f"nn_{c}_{tag}").cast("double"),
        )

    structs = []
    for c in cols:
        nr_a, nr_b = _null_rate(c, "a"), _null_rate(c, "b")
        d_a, d_b = F.col(f"d_{c}_a"), F.col(f"d_{c}_b")
        m_a, m_b = _mean(c, "a"), _mean(c, "b")
        null_drift = F.abs(nr_a - nr_b) > F.lit(float(null_rate_tol))
        distinct_drift = F.abs(d_a - d_b).cast("double") > F.lit(
            float(distinct_rel_tol)
        ) * F.greatest(d_a, d_b, F.lit(1)).cast("double")
        if c in numeric:
            mean_drift = F.coalesce(
                F.abs(m_a - m_b)
                > F.lit(float(mean_rel_tol)) * F.greatest(F.abs(m_a), F.abs(m_b)),
                F.lit(False),
            )
        else:
            mean_drift = F.lit(False)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_a").alias("n_a"),
                F.col("n_b").alias("n_b"),
                nr_a.alias("null_rate_a"),
                nr_b.alias("null_rate_b"),
                d_a.alias("distinct_a"),
                d_b.alias("distinct_b"),
                m_a.alias("mean_a"),
                m_b.alias("mean_b"),
                null_drift.alias("null_drift"),
                distinct_drift.alias("distinct_drift"),
                mean_drift.alias("mean_drift"),
                (null_drift | distinct_drift | mean_drift).alias("drifted"),
            )
        )
    return j.select(F.inline(F.array(*structs)))


def kanonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: str,
    ks: tuple[int, ...] = (2, 5, 10),
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier set (the
    privacy complement to the PII scanners q_redact_pii/q_luhn_scan):
    rows sharing a quasi-identifier combination form an equivalence
    class; a class smaller than k re-identifies its members, and a
    class with fewer than l distinct SENSITIVE values leaks the
    attribute even at size >= k (Sweeney '02; Machanavajjhala '07).

    One row per requested k: (k, n_classes, min_class_size,
    classes_below_k, rows_below_k, classes_low_ldiv, rows_low_ldiv) —
    the last two are k-independent (repeated per row for a flat,
    oracle-friendly schema).

    Shape: ONE (quasi-cols) groupBy producing the class table — sized
    by the quasi-identifier domain, bounded when callers coarsen
    continuous columns into bands (the caller's contract, and the
    whole point of generalization in the k-anonymity literature) — then
    a ks-literal explode cross-joined onto per-class rows and one
    re-aggregation per k.  No window, no self-join.
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__sz"),
        F.countDistinct(sensitive).alias("__ldiv"),
    )
    kdf = classes.crossJoin(
        F.broadcast(
            classes.sparkSession.createDataFrame(
                [(int(k),) for k in sorted(ks)], "k int"
            )
        )
    )
    return (
        kdf.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.min("__sz").alias("min_class_size"),
            F.sum(
                F.when(F.col("__sz") < F.col("k"), 1).otherwise(0)
            ).alias("classes_below_k"),
            F.sum(
                F.when(F.col("__sz") < F.col("k"), F.col("__sz")).otherwise(
                    F.lit(0)
                )
            ).alias("rows_below_k"),
            F.sum(
                F.when(F.col("__ldiv") < F.lit(int(l_div)), 1).otherwise(0)
            ).alias("classes_low_ldiv"),
            F.sum(
                F.when(
                    F.col("__ldiv") < F.lit(int(l_div)), F.col("__sz")
                ).otherwise(F.lit(0))
            ).alias("rows_low_ldiv"),
        )
        .orderBy("k")
    )


def chisq_independence_cells(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Chi-square independence audit between two categoricals, reported
    PER CELL so every number is exact or single-division — never an
    order-dependent float total (the cross-engine summation trap the
    scale-0 decimal contract exists to dodge; consumers that want the
    chi2 scalar sum the bounded cell table themselves).

    Per (row, col) cell: observed count, row margin, column margin, N,
    ``dev_num = |obs*N - row_m*col_m|`` in exact DECIMAL(38,0) (obs*N
    overflows int64 at ~1e10 rows), and the cell's chi-square
    contribution ``dev_num^2 / (row_m*col_m*N)`` — per-cell independent
    IEEE ops on exact integers, deterministic in both engines.

    Shape: one (row,col) groupBy + two margin groupBys (bounded by the
    category domains, broadcast) + the 1-row N fold — all map-side
    combinable; output bounded by |rows| x |cols|.
    """
    obs = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("obs"))
    rm = df.groupBy(row_col).agg(F.count(F.lit(1)).alias("row_m"))
    cm = df.groupBy(col_col).agg(F.count(F.lit(1)).alias("col_m"))
    n = df.agg(F.count(F.lit(1)).alias("n_total"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")
    dev = F.abs(
        d38("obs") * d38("n_total") - d38("row_m") * d38("col_m")
    ).cast("decimal(38,0)")
    den = (d38("row_m") * d38("col_m") * d38("n_total")).cast(
        "decimal(38,0)"
    )
    return (
        obs.join(F.broadcast(rm), row_col)
        .join(F.broadcast(cm), col_col)
        .crossJoin(F.broadcast(n))
        .select(
            row_col,
            col_col,
            "obs",
            "row_m",
            "col_m",
            "n_total",
            dev.alias("dev_num"),
            (
                (dev.cast("double") / den.cast("double"))
                * dev.cast("double")
            ).alias("chi2_cell"),
        )
        .orderBy(row_col, col_col)
    )


def cohens_kappa(
    df: DataFrame, rater_a: str, rater_b: str
) -> DataFrame:
    """Cohen's kappa between two categorical label columns — the
    chance-corrected agreement audit (Cohen '60) a labeling pipeline
    runs between a cheap heuristic and the recorded gold label (or two
    annotators) before trusting either.  kappa = (po - pe)/(1 - pe)
    restated over exact integers as
    ``(n_agree*N - pe_num) / (N*N - pe_num)`` with
    ``pe_num = Σ_c row_m(c) * col_m(c)`` — one IEEE division of two
    exact DECIMAL(38,0) operands (N*N overflows int64 at ~4e9 rows;
    the face casts the reported exact columns to double per the
    decimal-face contract).

    Shape: one (a,b) pair groupBy for the agreement diagonal + two
    margin groupBys (bounded by the label domains, broadcast joined on
    the category key) + 1-row folds — all map-side combinable; no
    window, no raw-row join.

    1-row output: n, n_agree, pe_num, po, kappa.
    """
    d38 = "decimal(38,0)"
    pair = df.select(
        F.col(rater_a).alias("__a"), F.col(rater_b).alias("__b")
    )
    agree = pair.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("__a") == F.col("__b")).cast("long")).alias("n_agree"),
    )
    rm = pair.groupBy(F.col("__a").alias("__c")).agg(
        F.count(F.lit(1)).alias("__rm")
    )
    cm = pair.groupBy(F.col("__b").alias("__c")).agg(
        F.count(F.lit(1)).alias("__cm")
    )
    pe = (
        rm.join(cm, "__c")  # inner: categories absent from either side
        .agg(                # contribute zero to pe by definition
            F.sum(
                (F.col("__rm").cast(d38) * F.col("__cm").cast(d38)).cast(d38)
            )
            .cast(d38)
            .alias("pe_num")
        )
    )
    nn = F.col("n").cast(d38) * F.col("n").cast(d38)
    return (
        agree.crossJoin(F.broadcast(pe))
        .select(
            "n",
            "n_agree",
            F.coalesce(F.col("pe_num"), F.lit(0).cast(d38)).alias("pe_num"),
        )
        .select(
            "n",
            "n_agree",
            "pe_num",
            (
                F.col("n_agree").cast("double") / F.col("n").cast("double")
            ).alias("po"),
            (
                (
                    F.col("n_agree").cast(d38) * F.col("n").cast(d38)
                    - F.col("pe_num")
                ).cast("double")
                / (nn - F.col("pe_num")).cast("double")
            ).alias("kappa"),
        )
    )


def cochran_armitage(
    df: DataFrame, success: Column, score: Column
) -> DataFrame:
    """Cochran–Armitage trend-in-proportions statistic: does the success
    rate trend monotonically across ORDERED categories (integer
    ``score``)?  The dose-response audit chi-square independence cannot
    see (chisq treats categories as unordered; CA spends its single
    degree of freedom on the linear trend).

    T = Σ_i s_i * (r_i * N - R * n_i) over groups i, with r_i =
    successes, n_i = group size, R = Σ r_i, N = Σ n_i — exact
    DECIMAL(38,0) throughout (r_i*N crosses int64 at ~1e10 rows); the
    variance term needs moments times cubes of N (sqrt territory), so
    per the rank_sum discipline the report is the exact numerator plus
    the scale-free effect ``t_over_n2 = T / N^2`` — one IEEE division.

    Shape: one bounded groupBy on the score axis + a broadcast 1-row
    totals fold; output is 1 row.

    Output: n, r_total, n_groups, t_num, t_over_n2.
    """
    d38 = "decimal(38,0)"
    g = df.select(
        score.cast("long").alias("__s"),
        success.cast("long").alias("__y"),
    )
    per = g.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__n_i"),
        F.sum("__y").alias("__r_i"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("n"), F.sum("__y").alias("r_total")
    )
    term = (
        F.col("__s").cast(d38)
        * (
            F.col("__r_i").cast(d38) * F.col("n").cast(d38)
            - F.col("r_total").cast(d38) * F.col("__n_i").cast(d38)
        ).cast(d38)
    ).cast(d38)
    agg = (
        per.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("n"),
            F.max("r_total").alias("r_total"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(term).cast(d38).alias("t_num"),
        )
    )
    return agg.select(
        "n",
        "r_total",
        "n_groups",
        "t_num",
        (
            F.col("t_num").cast("double")
            / (F.col("n").cast(d38) * F.col("n").cast(d38)).cast("double")
        ).alias("t_over_n2"),
    )


def mcnemar_paired(
    df: DataFrame,
    gold,
    pred_a,
    pred_b,
) -> DataFrame:
    """McNemar's paired test (McNemar 1947) between two binary
    classifiers evaluated on the SAME rows — the eval question kappa
    cannot answer: do A and B have different error rates, judged only
    on the rows where they DISAGREE about correctness?  The off-diagonal
    cells are b (A right, B wrong) and c (A wrong, B right); the
    statistic is the plain (uncorrected) chi^2 = (b - c)^2 / (b + c),
    NULL when b + c = 0 (no discordant pair — the test is undefined, not
    zero).  This is the standard paired comparison for two labelers /
    two model versions scored against one gold column (classifier-eval
    practice; complements :func:`cohens_kappa`, which measures agreement
    rather than relative accuracy).

    ``gold``, ``pred_a``, ``pred_b`` are boolean Column expressions
    evaluated per row.  Exactness: b, c and the counts are exact
    integers; (b-c)^2 and (b+c) stay far inside int64 (both <= n^2 only
    after the square of a COUNT DIFFERENCE bounded by n <= 2^31 rows per
    face contract), and the statistic is ONE IEEE division of exact
    longs — both engines round identically, so the DuckDB oracle
    replays bit-for-bit.  No decimal output (driver-hashable by
    construction).

    Shape: ONE scan — two correctness flags in a projection, one
    map-side-combinable aggregate; no join, no window, no shuffle wider
    than the 1-row fold.  The 100 TB cost is the scan it shares with
    any other single-pass audit.

    1-row output: n, a_correct, b_correct, b_discordant, c_discordant,
    mcnemar_x2 (double, NULL when no discordant pairs).
    """
    ca = (pred_a == gold).cast("long")
    cb = (pred_b == gold).cast("long")
    flagged = df.select(ca.alias("__ca"), cb.alias("__cb"))
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__ca").alias("a_correct"),
        F.sum("__cb").alias("b_correct"),
        F.sum(
            (F.col("__ca") == 1).cast("long")
            * (F.col("__cb") == 0).cast("long")
        ).alias("b_discordant"),
        F.sum(
            (F.col("__ca") == 0).cast("long")
            * (F.col("__cb") == 1).cast("long")
        ).alias("c_discordant"),
    )
    diff = F.col("b_discordant") - F.col("c_discordant")
    disc = F.col("b_discordant") + F.col("c_discordant")
    return agg.select(
        "n",
        "a_correct",
        "b_correct",
        "b_discordant",
        "c_discordant",
        F.when(
            disc > 0,
            (diff * diff).cast("double") / disc.cast("double"),
        ).alias("mcnemar_x2"),
    )


def _grid_dominance_tot(cells: DataFrame) -> DataFrame:
    """Concordant/discordant pair totals over a (__x, __y, __c) cell
    table by 2-D dominance counting — the O(grid) core :func:`gk_gamma`
    documents (zero-filled domain grid + two nested strictly-prior
    prefix windows, every window PARTITIONED by the opposing axis),
    factored out so :func:`ordinal_assoc_cells` reuses it verbatim.
    Returns a 1-row frame: __cc (concordant), __dd (discordant), both
    exact DECIMAL(38,0) (NULL on an empty/degenerate grid — callers
    coalesce)."""
    from pyspark.sql import Window

    xs = cells.select("__x").distinct()
    ys = cells.select("__y").distinct()
    grid = (
        xs.crossJoin(ys)
        .join(cells, ["__x", "__y"], "left")
        .select("__x", "__y", F.coalesce("__c", F.lit(0)).alias("__c"))
    )
    d38 = "decimal(38,0)"
    wx = Window.partitionBy("__y").orderBy("__x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # G1(x,y) = count with x' < x at this exact y
    g1 = grid.select(
        "__x",
        "__y",
        "__c",
        F.coalesce(F.sum(F.col("__c").cast(d38)).over(wx), F.lit(0).cast(d38))
        .cast(d38)
        .alias("__below_x"),
    )
    wy_lt = Window.partitionBy("__x").orderBy("__y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wy_gt = Window.partitionBy("__x").orderBy(F.col("__y").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    dom = g1.select(
        "__x",
        "__y",
        "__c",
        F.coalesce(F.sum("__below_x").over(wy_lt), F.lit(0).cast(d38))
        .cast(d38)
        .alias("__conc_mates"),
        F.coalesce(F.sum("__below_x").over(wy_gt), F.lit(0).cast(d38))
        .cast(d38)
        .alias("__disc_mates"),
    )
    return dom.agg(
        F.sum(F.col("__c").cast(d38) * F.col("__conc_mates"))
        .cast("decimal(38,0)")
        .alias("__cc"),
        F.sum(F.col("__c").cast(d38) * F.col("__disc_mates"))
        .cast("decimal(38,0)")
        .alias("__dd"),
    )


def gk_gamma(df: DataFrame, x: str, y: str) -> DataFrame:
    """Goodman–Kruskal gamma between two ORDINAL columns — the
    association direction :func:`chisq_independence_cells` (which is
    sign-blind) cannot give: do higher quality tiers come with higher
    dedup survival, and how strongly?  gamma = (C - D) / (C + D) over
    concordant/discordant pairs, the ordinal analogue of Kendall's tau
    that ignores ties entirely.

    Exactness: C and D are EXACT integers (products and sums of cell
    counts — order-independent, no float accumulation anywhere), and
    gamma is ONE correctly-rounded IEEE division — the q_kappa
    contract.

    Shape — 2-D DOMINANCE COUNTING, not a cell self-join: the naive
    pair join on x-order is |cells|² AND a non-equi join (the
    BroadcastNestedLoopJoin the registry plan lint bans).  Instead the
    cell table zero-fills to the (x-domain × y-domain) grid and two
    nested strictly-prior prefix windows compute, per cell,
    A(x,y) = Σ_{x'<x, y'<y} c (concordant mates) and
    B(x,y) = Σ_{x'<x, y'>y} c (discordant mates):
    C = Σ c·A and D = Σ c·B.  Every window is PARTITIONED (by y for
    the x-prefix, by x for the y-prefix) — bounded by the opposing
    domain, no single-reducer axis — and total work is O(grid), not
    O(cells²).

    Bounded-domain contract (the :func:`chisq_independence_cells`
    assumption): both columns must have small categorical/ordinal
    domains — the zero-filled grid is |x-domain|·|y-domain| rows, fine
    for tier x bucket tables and wrong for raw continuous axes (bucket
    first).  NULLs in either column are excluded (no ordinal
    position).

    Output (one row): n_rows, n_cells, concordant, discordant, gamma
    (NULL when every pair is tied, e.g. a single cell).
    """
    g = df.select(F.col(x).alias("__x"), F.col(y).alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    cells = g.groupBy("__x", "__y").agg(F.count(F.lit(1)).alias("__c"))
    tot = _grid_dominance_tot(cells)
    d38 = "decimal(38,0)"
    zero = F.lit(0).cast("decimal(38,0)")
    meta = g.agg(F.count(F.lit(1)).alias("n_rows"))
    ncells = cells.agg(F.count(F.lit(1)).alias("n_cells"))
    cc = F.coalesce(F.col("__cc"), zero)
    dd = F.coalesce(F.col("__dd"), zero)
    return (
        tot.crossJoin(F.broadcast(meta))
        .crossJoin(F.broadcast(ncells))
        .select(
            "n_rows",
            "n_cells",
            cc.cast("double").alias("concordant"),
            dd.cast("double").alias("discordant"),
            F.when(
                (cc + dd) > 0,
                (cc - dd).cast("double") / (cc + dd).cast("double"),
            ).alias("gamma"),
        )
    )


def cochran_q_cells(
    df: DataFrame, block: str, treatment: str, success: str
) -> DataFrame:
    """Cochran's Q for k paired BINARY outcomes, reported per treatment
    plus derivation columns — the k-treatment generalization of
    :func:`mcnemar_paired` (k=2 reduces to McNemar without the
    continuity correction): did any of k pipeline variants change a
    binary pass-rate on the SAME blocks (documents, days)?

    Complete-block contract (the :func:`friedman_cells` design): rows
    with NULL block/treatment/success are dropped, then only blocks
    with exactly one row for every one of the k global treatments
    survive.  ``success`` must be 0/1-valued (int or boolean; booleans
    are cast).

    Exactness: T_j (per-treatment successes), B_i (per-block
    successes), Sigma B_i and Sigma B_i^2 are all exact integers;
    Q = (k-1) * (k*Sigma T_j^2 - G^2) / (k*Sigma B_i - Sigma B_i^2)
    with G = Sigma T_j is exact-int numerator over exact-int
    denominator — reported per treatment as t_j plus the broadcast
    block-side sums, so Q itself is ONE division away (and emitted as
    ``q_stat`` on every row, NULL when the denominator is zero —
    every block all-success or all-failure).

    Output per treatment: treatment, t_j, k_treatments, n_blocks,
    sum_b, sum_b2, q_stat.
    """
    # contract guard, the edit2_join staged-raise pattern: a success
    # value outside {0,1} would silently corrupt every T_j/B_i sum
    # (sum(1-e) goes negative), so fail loudly instead.  Validated on
    # the DOUBLE view, before the int cast — a float 0.9 truncates to
    # 0 and would sail through an after-cast check (review finding)
    sd = F.col(success).cast("double")
    s = F.when(
        sd.isNotNull() & ~sd.isin(0.0, 1.0),
        F.raise_error(
            F.concat(
                F.lit(f"cochran_q_cells: {success} must be 0/1, got "),
                sd.cast("string"),
            )
        ).cast("int"),
    ).otherwise(sd.cast("int"))
    g = df.select(
        F.col(block).alias("__b"),
        F.col(treatment).alias("__t"),
        s.alias("__s"),
    ).filter(
        F.col("__b").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__s").isNotNull()
    )
    kf = g.select(F.countDistinct("__t").alias("__k"))
    per_b = g.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__nr"),
        F.countDistinct("__t").alias("__nt"),
        F.sum("__s").alias("__bs"),
    )
    complete = (
        per_b.crossJoin(F.broadcast(kf))
        .where((F.col("__nr") == F.col("__k")) & (F.col("__nt") == F.col("__k")))
        .select("__b", "__bs")
    )
    gc = g.join(complete.select("__b"), "__b", "left_semi")
    d38 = "decimal(38,0)"
    per_t = gc.groupBy("__t").agg(
        F.sum("__s").cast(d38).alias("__tj"),
    )
    bsums = complete.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("__bs").cast(d38)).cast(d38).alias("__sb"),
        F.sum(F.col("__bs").cast(d38) * F.col("__bs").cast(d38))
        .cast(d38)
        .alias("__sb2"),
    )
    tsums = per_t.agg(
        F.count(F.lit(1)).alias("k_treatments"),
        F.sum("__tj").cast(d38).alias("__g"),
        F.sum(F.col("__tj") * F.col("__tj")).cast(d38).alias("__t2"),
    )
    kd = F.col("k_treatments").cast(d38)
    num = (
        (kd - 1)
        * (kd * F.col("__t2") - F.col("__g") * F.col("__g"))
    ).cast(d38)
    den = (kd * F.col("__sb") - F.col("__sb2")).cast(d38)
    return (
        per_t.crossJoin(F.broadcast(bsums))
        .crossJoin(F.broadcast(tsums))
        .select(
            F.col("__t").alias(treatment),
            F.col("__tj").cast("double").alias("t_j"),
            "k_treatments",
            "n_blocks",
            F.col("__sb").cast("double").alias("sum_b"),
            F.col("__sb2").cast("double").alias("sum_b2"),
            F.when(
                den > 0, num.cast("double") / den.cast("double")
            ).alias("q_stat"),
        )
        .orderBy(treatment)
    )


def capture_recapture(
    pairs_a: DataFrame,
    pairs_b: DataFrame,
    keys: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Chapman capture–recapture estimate of a TOTAL population from two
    independent partial detectors — the dedup-QA question no single
    method can answer: MinHash found n_a near-dup pairs and SimHash
    found n_b, so how many near-dup pairs exist in the corpus INCLUDING
    the ones both methods missed?  Classic mark-recapture (Chapman
    1951, the bias-corrected Lincoln–Petersen): treat method A's pairs
    as the marked sample, method B's as the recapture, and the overlap
    m as the recaptured marks.

    chapman_est = (n_a + 1)(n_b + 1)/(m + 1) - 1 — exact-integer
    counts into one fixed IEEE division (the q_kappa contract; the +1s
    also make the estimator total, no division by zero when the
    methods are disjoint).  The independence assumption is honest for
    MinHash vs SimHash (shingle-set vs token-hash geometry); correlated
    detectors bias the estimate down — document per face.

    Shape: two distinct-collapses + one equi inner join on the pair
    key + three 1-row folds; output one row:
    n_a, n_b, overlap, chapman_est.  Each canonicalized pair set is
    consumed TWICE (its own count fold + the overlap join), and Spark
    does not dedupe common subplans across those branches — so both
    sets are persisted (MEMORY_AND_DISK; they are collapsed pair keys,
    two ints per row, orders of magnitude smaller than the corpus the
    detectors scanned to produce them), which runs each detector
    pipeline once instead of twice (r12 verdict item 4).
    """
    from pyspark import StorageLevel
    ka, kb = keys
    # canonicalize orientation (least/greatest) so a caller feeding
    # (b, a) for one detector and (a, b) for the other still overlaps:
    # both in-house detectors emit id_a < id_b already, making this a
    # no-op there, but the audit must not silently undercount m on
    # un-canonical input
    def _canon(p: DataFrame) -> DataFrame:
        # NULL ids out FIRST: least/greatest skip NULLs, so (NULL, 5)
        # would otherwise collapse to the degenerate pair (5, 5) and
        # inflate the counts (review finding)
        return (
            p.filter(F.col(ka).isNotNull() & F.col(kb).isNotNull())
            .select(
                F.least(F.col(ka), F.col(kb)).alias(ka),
                F.greatest(F.col(ka), F.col(kb)).alias(kb),
            )
            .distinct()
        )

    # no paired unpersist by policy: docs/SCALE.md 'Persist policy'
    a = _canon(pairs_a).persist(StorageLevel.MEMORY_AND_DISK)
    b = _canon(pairs_b).persist(StorageLevel.MEMORY_AND_DISK)
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    m = a.join(b, [ka, kb]).agg(F.count(F.lit(1)).alias("overlap"))
    d38 = "decimal(38,0)"
    est = (
        (
            (F.col("n_a").cast(d38) + 1) * (F.col("n_b").cast(d38) + 1)
        ).cast(d38).cast("double")
        / (F.col("overlap") + 1).cast("double")
        - F.lit(1.0)
    )
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(m))
        .select("n_a", "n_b", "overlap", est.alias("chapman_est"))
    )


def mantel_haenszel_cells(
    df: DataFrame,
    stratum: str,
    exposed: Column,
    outcome: Column,
) -> DataFrame:
    """Mantel–Haenszel stratified 2x2 decomposition, reported PER
    STRATUM — the confounder-adjusted association audit
    :func:`chisq_independence_cells` (which pools strata, Simpson's
    paradox bait) cannot give: does exposure associate with outcome
    WITHIN strata, combined across them?  The classic MH common odds
    ratio OR_MH = Σ(a_i·d_i/n_i) / Σ(b_i·c_i/n_i) and the CMH
    chi-square are one-liner derivations over this bounded table; the
    two Σ are the only ops the face refuses to perform (data-dependent
    float summation order — the cells contract).

    Per stratum: a (exposed & outcome), b (exposed only), c (outcome
    only), d (neither), n — exact counts — plus mh_num = a·d/n and
    mh_den = b·c/n, each ONE fixed IEEE sequence on exact-int-valued
    doubles (the q_kappa contract).  Strata with n = 0 cannot occur
    (a stratum only exists through its rows).

    NULL handling (the welch_t three-valued convention): NULL
    ``exposed``/``outcome`` predicates coalesce to FALSE; NULL stratum
    rows are dropped.

    Shape: one scan, one per-stratum 4-column fold — map-side
    combinable, output bounded by |strata|.

    Output: stratum, a, b, c, d, n, mh_num, mh_den.
    """
    g = df.select(
        F.col(stratum).alias("__s"),
        F.coalesce(exposed, F.lit(False)).alias("__x"),
        F.coalesce(outcome, F.lit(False)).alias("__y"),
    ).filter(F.col("__s").isNotNull())
    per = g.groupBy("__s").agg(
        F.sum(F.when(F.col("__x") & F.col("__y"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("__x") & ~F.col("__y"), 1).otherwise(0)).alias("b"),
        F.sum(F.when(~F.col("__x") & F.col("__y"), 1).otherwise(0)).alias("c"),
        F.sum(F.when(~F.col("__x") & ~F.col("__y"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )
    nd = F.col("n").cast("double")
    return per.select(
        F.col("__s").alias(stratum),
        "a",
        "b",
        "c",
        "d",
        "n",
        (F.col("a").cast("double") * F.col("d").cast("double") / nd).alias(
            "mh_num"
        ),
        (F.col("b").cast("double") * F.col("c").cast("double") / nd).alias(
            "mh_den"
        ),
    ).orderBy(stratum)


def digit_preference_cells(df: DataFrame, value: str) -> DataFrame:
    """Last-digit preference audit — the terminal-digit companion to
    the Benford first-digit face (q_benford): the LAST digit of an
    organically measured amount should be ~uniform; rounding habits,
    price-point anchoring ($x.99) and fabricated data all show up as
    digit spikes (Preece 1981's classic "digit preference" screen).

    ALWAYS 10 rows, digits 0-9, zero-filled: a digit NO amount ever
    ends in is the strongest preference signal there is (its
    (10*0 - N)^2 term dominates the chi-square), so an output keyed
    only on PRESENT digits would understate chi2 exactly when the
    screen matters most (review finding — e.g. every amount ending in
    0 or 5 must produce eight n=0 rows, not two rows).  Per digit:
    n_d (exact count), dev_x10 = 10*n_d - N (the deviation from
    uniform, scaled integer — exact), sq_dev_x100 = dev_x10^2 (exact).
    chi2 = Sigma(sq_dev_x100) / (10*N) is the consumer one-liner over
    all 10 rows (exact integers, order-independent), and
    Sigma(dev_x10) = 0 is its structural check.  NULL values are
    dropped; the digit comes from the TRUNCATED integer part (trunc,
    not a bare cast — DuckDB CAST rounds where Spark truncates, the
    q_jonckheere guard).

    Shape: one scan, one <=10-row fold left-joined onto the literal
    10-row digit axis + a 1-row total broadcast.
    """
    d = df.select(
        # cast('long') truncates toward zero in Spark = DuckDB's
        # trunc-then-cast; a decimal cast would ROUND and disagree
        (F.abs(F.col(value).cast("long")) % 10)
        .cast("int")
        .alias("digit")
    ).filter(F.col("digit").isNotNull())
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("__n"))
    total = d.agg(F.count(F.lit(1)).alias("__t"))
    axis = total.select(
        # explode first, cast second: a generator cannot be nested
        # inside another expression
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("__dg"),
        "__t",
    ).select(F.col("__dg").cast("int").alias("digit"), "__t")
    filled = axis.join(counts, "digit", "left").select(
        "digit",
        F.coalesce("__n", F.lit(0).cast("long")).alias("n"),
        "__t",
    )
    dev = F.lit(10) * F.col("n") - F.col("__t")
    return filled.select(
        "digit",
        "n",
        dev.alias("dev_x10"),
        (dev * dev).alias("sq_dev_x100"),
    ).orderBy("digit")


def hoeffding_d_cells(df: DataFrame, x: str, y: str) -> DataFrame:
    """Hoeffding's D independence decomposition (Hoeffding 1948),
    reported PER DISTINCT (x, y) CELL — the nonparametric dependence
    test that catches what correlation families miss entirely:
    chi-square needs categories, Spearman/Kendall only see MONOTONE
    association, but D is consistent against ANY dependence (a U-shape
    scores 0 on rho/tau and positive on D).

    Per cell: c (exact count), r2 (doubled x-axis midrank of the cell's
    x value), s2 (doubled y-axis midrank), q4 (QUADRUPLED bivariate
    rank) — all exact integers.  q4 follows the phi convention (the one
    SAS PROC CORR documents for ties): for a point i, Q_i = Sigma_j
    phi(x_j, x_i) * phi(y_j, y_i) over ALL j including i, with
    phi(a, b) = 1 if a < b, 1/2 if a = b, 0 otherwise — so q4 =
    4*LL + 2*LE + 2*EL + EE with LL = #{x_j < x_i & y_j < y_i},
    LE = #{x_j < x_i & y_j = y_i}, EL = #{x_j = x_i & y_j < y_i},
    EE = #{x_j = x_i & y_j = y_i} (self included: Q_i = (q4 - 1)/4 + ...
    reduces to the classical strict count when there are no ties).
    The D1/D2/D3 sums and the final 30*(...) normalization are consumer
    one-liners over these cells (exact-integer inputs, order-
    independent); the face refuses the cross-row float sums per the
    cells contract.

    NOT the O(n^2) pair loop the definition suggests: everything reads
    off the zero-filled (x-domain x y-domain) grid — the
    :func:`gk_gamma` 2-D dominance machinery — with LL as a nested
    strictly-prior prefix (per-row prefix over y, then per-column
    prefix over x of those partials), LE/EL as single-axis strictly-
    prior prefixes, EE as the cell count itself.  Cost O(grid) under
    the documented ordinal-domain contract (both axes bounded; bucket
    corpus-scale continuous axes first).  NULL x/y rows are dropped.

    Output: x, y, c, r2, s2, q4 — ordered by (x, y).
    """
    from pyspark.sql import Window

    g = df.select(F.col(x).alias("__x"), F.col(y).alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    cells = g.groupBy("__x", "__y").agg(F.count(F.lit(1)).alias("__c"))
    xaxis = cells.select("__x").distinct()
    yaxis = cells.select("__y").distinct()
    grid = (
        xaxis.crossJoin(F.broadcast(yaxis))
        .join(cells, ["__x", "__y"], "left")
        .select("__x", "__y", F.coalesce("__c", F.lit(0)).alias("__c"))
    )
    wy = Window.partitionBy("__x").orderBy("__y")
    wx = Window.partitionBy("__y").orderBy("__x")
    pre = grid.select(
        "__x",
        "__y",
        "__c",
        # EL: points in this x-row with strictly smaller y
        F.coalesce(
            F.sum("__c").over(wy.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__el"),
        # LE: points in this y-column with strictly smaller x
        F.coalesce(
            F.sum("__c").over(wx.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__le"),
    )
    # LL: per-column strictly-prior prefix of the per-row partials
    ll = F.coalesce(
        F.sum("__el").over(wx.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    q4 = (
        F.lit(4) * ll
        + F.lit(2) * F.col("__le")
        + F.lit(2) * F.col("__el")
        + F.col("__c")
    )
    full = pre.select("__x", "__y", "__c", q4.alias("q4"))
    # axis midranks (doubled): strictly-prior + ties + 1 per axis
    xm = (
        cells.groupBy("__x")
        .agg(F.sum("__c").alias("__cx"))
        .select(
            "__x",
            "__cx",
            F.coalesce(
                F.sum("__cx").over(
                    Window.orderBy("__x").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__px"),
        )
        .select(
            "__x",
            (F.lit(2) * F.col("__px") + F.col("__cx") + F.lit(1)).alias("r2"),
        )
    )
    ym = (
        cells.groupBy("__y")
        .agg(F.sum("__c").alias("__cy"))
        .select(
            "__y",
            "__cy",
            F.coalesce(
                F.sum("__cy").over(
                    Window.orderBy("__y").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__py"),
        )
        .select(
            "__y",
            (F.lit(2) * F.col("__py") + F.col("__cy") + F.lit(1)).alias("s2"),
        )
    )
    return (
        full.where(F.col("__c") > 0)
        .join(F.broadcast(xm), "__x")
        .join(F.broadcast(ym), "__y")
        .select(
            F.col("__x").alias(x),
            F.col("__y").alias(y),
            F.col("__c").alias("c"),
            "r2",
            "s2",
            "q4",
        )
        .orderBy(x, y)
    )


def ordinal_assoc_cells(
    df: DataFrame, x: str, y: str, weight: str | None = None
) -> DataFrame:
    """The full concordance family between two ORDINAL columns in one
    pass — Somers' D (both directions), Kendall's tau-b, Stuart's
    tau-c and gamma — from the same exact pair decomposition
    :func:`gk_gamma` computes, plus the tie counts gamma deliberately
    ignores.  Gamma drops every tied pair (it overstates association
    on tie-heavy grids); Somers' D penalizes ties on the DEPENDENT
    variable only (the right measure when one column predicts the
    other); tau-b penalizes ties on both axes symmetrically; tau-c
    corrects tau for rectangular (dx != dy) tables.  One operator, so
    an audit never re-derives C and D four times.

    Exactness: every pair count is an exact DECIMAL(38,0) —
    C/D by the O(grid) dominance counting of :func:`_grid_dominance_tot`,
    tie counts by margin folds (pairs tied on x = Sigma_x nx*(nx-1)/2,
    both-tied = Sigma_cells c*(c-1)/2) — and each reported coefficient
    is ONE fixed IEEE sequence on those exact operands (the q_kappa
    contract; tau_b's denominator uses sqrt, IEEE-correctly-rounded —
    the srp scaling precedent in curation.py).  The structural
    identity C + D + tied_x_only + tied_y_only + tied_xy =
    n*(n-1)/2 is what tests pin.

    Bounded-domain contract as gk_gamma: both columns small
    ordinal/categorical domains (the zero-filled grid is dx*dy rows);
    NULLs in either column are excluded.  tau_b's radicand
    (P - Tx)*(P - Ty) <= (n^2/2)^2 needs n <~ 2e9 to stay inside
    DECIMAL(38,0); beyond that, pre-aggregate.

    ``weight``: optional pre-aggregation count column — pass a frame
    already collapsed to (x, y, weight) cells (or any coarser grid)
    and the operator sums weights instead of counting rows, producing
    IDENTICAL output to the raw-row form.  This is the 100 TB lever
    for multi-pass compositions (:func:`partial_tau_cells` collapses
    the corpus to its 3-D grid ONCE and derives all three pairwise
    analyses from it — one corpus shuffle instead of three).

    Output (one row): n_rows, n_cells, dx, dy, pairs_total,
    concordant, discordant, tied_x_only, tied_y_only, tied_xy,
    gamma, somers_dyx (y dependent), somers_dxy, tau_b, tau_c.
    """
    from pyspark import StorageLevel

    d38 = "decimal(38,0)"
    zero = F.lit(0).cast(d38)
    cols = [F.col(x).alias("__x"), F.col(y).alias("__y")]
    if weight is not None:
        cols.append(F.col(weight).alias("__w"))
    g = df.select(*cols).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    cnt = F.count(F.lit(1)) if weight is None else F.sum("__w")
    # the cell table is consumed by FIVE independent fold branches
    # (dominance grid, both tie margins, the both-tied fold, the dims
    # fold) and Spark does not dedupe the shared subplan across them
    # (plan audit: ~7 full input scans without this) — persist it; it
    # is bounded by the dx*dy grid contract, so the cache is tiny and
    # the raw input is scanned ONCE at any scale.  n_rows still folds
    # from the cells (sum of counts), not the raw rows.
    cells = (
        g.groupBy("__x", "__y")
        .agg(cnt.alias("__c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # no paired unpersist by policy: docs/SCALE.md 'Persist policy'
    )
    tot = _grid_dominance_tot(cells)

    def _pairs(c: Column) -> Column:
        # c*(c-1)/2 exactly: one of c, c-1 is even, but decimal division
        # by 2 keeps scale 0 only via floor — use (c*(c-1))/2 as decimal
        # after the product, exact because the product is even
        return (c.cast(d38) * (c - 1).cast(d38) / 2).cast(d38)

    tx = (
        cells.groupBy("__x")
        .agg(F.sum("__c").alias("__nx"))
        .agg(F.sum(_pairs(F.col("__nx"))).cast(d38).alias("__tx"))
    )
    ty = (
        cells.groupBy("__y")
        .agg(F.sum("__c").alias("__ny"))
        .agg(F.sum(_pairs(F.col("__ny"))).cast(d38).alias("__ty"))
    )
    txy = cells.agg(
        F.sum(_pairs(F.col("__c"))).cast(d38).alias("__txy"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    dims = cells.agg(
        F.countDistinct("__x").alias("dx"), F.countDistinct("__y").alias("dy")
    )
    meta = cells.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_rows")
    )
    one = (
        meta.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(txy))
        .crossJoin(F.broadcast(dims))
    )
    n = F.col("n_rows").cast(d38)
    p = ((n * (n - 1)).cast(d38) / 2).cast(d38)
    cc = F.coalesce(F.col("__cc"), zero)
    dd = F.coalesce(F.col("__dd"), zero)
    txc = F.coalesce(F.col("__tx"), zero)
    tyc = F.coalesce(F.col("__ty"), zero)
    txyc = F.coalesce(F.col("__txy"), zero)
    s = (cc - dd).cast(d38)
    denx = (p - txc).cast(d38)
    deny = (p - tyc).cast(d38)
    m = F.least(F.col("dx"), F.col("dy")).cast(d38)
    taucden = (n * n * (m - 1)).cast(d38)
    return one.select(
        "n_rows",
        "n_cells",
        "dx",
        "dy",
        p.cast("double").alias("pairs_total"),
        cc.cast("double").alias("concordant"),
        dd.cast("double").alias("discordant"),
        (txc - txyc).cast(d38).cast("double").alias("tied_x_only"),
        (tyc - txyc).cast(d38).cast("double").alias("tied_y_only"),
        txyc.cast("double").alias("tied_xy"),
        F.when(
            (cc + dd) > 0, s.cast("double") / (cc + dd).cast("double")
        ).alias("gamma"),
        F.when(denx > 0, s.cast("double") / denx.cast("double")).alias(
            "somers_dyx"
        ),
        F.when(deny > 0, s.cast("double") / deny.cast("double")).alias(
            "somers_dxy"
        ),
        F.when(
            (denx > 0) & (deny > 0),
            s.cast("double") / F.sqrt((denx * deny).cast(d38).cast("double")),
        ).alias("tau_b"),
        F.when(
            (m > 1) & (n > 0),
            (F.lit(2).cast(d38) * m * s).cast(d38).cast("double")
            / taucden.cast("double"),
        ).alias("tau_c"),
    )


def fleiss_kappa_cells(
    df: DataFrame, subject: str, category: str, n_raters: int
) -> DataFrame:
    """Fleiss' kappa over MULTI-rater nominal labels — the k-rater
    generalization of :func:`cohens_kappa` (Fleiss 1971): given one
    row per (subject, assigned category) from exactly ``n_raters``
    ratings per subject, how much do the raters agree beyond chance?
    The labeling-pipeline audit when three heuristics (or annotators)
    vote on every document.

    Exact-integer restatement: with t = N*n (N subjects, n raters),
    Q = Sigma_{i,j} n_ij^2 (n_ij = raters giving subject i category j)
    and S = Sigma_j c_j^2 (c_j = category marginal),

        kappa = ((Q - t)*t - S*(n - 1)) / ((n - 1) * (t^2 - S))

    — every operand an exact DECIMAL(38,0), ONE IEEE division (the
    q_kappa contract); p_bar and p_e are each one further division on
    the same operands.

    Completeness contract (the friedman_cells discipline): subjects
    whose rating count != ``n_raters`` are DROPPED, not guessed at —
    Fleiss is undefined for unequal panel sizes (report n_dropped so
    the caller sees the loss); NULL subject/category rows are dropped
    first.

    Shape: one (subject, category) collapse + one per-subject fold +
    one per-category fold + 1-row folds — all map-side combinable,
    no window, no raw-row join.

    Output (one row): n_subjects, n_raters, n_categories, n_dropped,
    q_sum, s_sum, p_bar, p_e, kappa.
    """
    if n_raters < 2:
        raise ValueError("fleiss_kappa_cells: n_raters must be >= 2")
    d38 = "decimal(38,0)"
    g = df.select(
        F.col(subject).alias("__s"), F.col(category).alias("__k")
    ).filter(F.col("__s").isNotNull() & F.col("__k").isNotNull())
    nij = g.groupBy("__s", "__k").agg(F.count(F.lit(1)).alias("__nij"))
    per_subj = nij.groupBy("__s").agg(
        F.sum("__nij").alias("__cnt"),
        F.sum(F.col("__nij").cast(d38) * F.col("__nij").cast(d38))
        .cast(d38)
        .alias("__q"),
    )
    complete = per_subj.where(F.col("__cnt") == n_raters)
    dropped = per_subj.where(F.col("__cnt") != n_raters).agg(
        F.count(F.lit(1)).alias("n_dropped")
    )
    qn = complete.agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("__q").cast(d38).alias("q_sum"),
    )
    cj = (
        nij.join(complete.select("__s"), "__s")
        .groupBy("__k")
        .agg(F.sum("__nij").alias("__cj"))
    )
    ssum = cj.agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(F.col("__cj").cast(d38) * F.col("__cj").cast(d38))
        .cast(d38)
        .alias("s_sum"),
    )
    one = qn.crossJoin(F.broadcast(ssum)).crossJoin(F.broadcast(dropped))
    zero = F.lit(0).cast(d38)
    nsub = F.col("n_subjects").cast(d38)
    t = (nsub * n_raters).cast(d38)
    q = F.coalesce(F.col("q_sum"), zero)
    s = F.coalesce(F.col("s_sum"), zero)
    nm1 = F.lit(n_raters - 1).cast(d38)
    kden = (nm1 * (t * t - s).cast(d38)).cast(d38)
    return one.select(
        "n_subjects",
        F.lit(n_raters).alias("n_raters"),
        "n_categories",
        F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
        q.cast("double").alias("q_sum"),
        s.cast("double").alias("s_sum"),
        F.when(
            (nsub > 0),
            ((q - t).cast(d38)).cast("double") / (t * nm1).cast("double"),
        ).alias("p_bar"),
        F.when(nsub > 0, s.cast("double") / (t * t).cast("double")).alias(
            "p_e"
        ),
        F.when(
            kden != 0,
            ((q - t) * t - s * nm1).cast(d38).cast("double")
            / kden.cast("double"),
        ).alias("kappa"),
    )


def weighted_kappa_cells(
    df: DataFrame, rater_a: str, rater_b: str
) -> DataFrame:
    """Linearly-weighted Cohen's kappa between two ORDINAL INTEGER
    rating columns — :func:`cohens_kappa` counts a near-miss (tier 2
    vs tier 3) exactly as wrong as a blunder (tier 0 vs tier 4);
    weighted kappa charges disagreements by their ordinal distance
    |i - j| (Cohen 1968, linear weights), the right agreement audit
    between two ordinal scorers.

    Exact-integer restatement: with observed disagreement
    D_o = Sigma_{ij} |i-j| * x_ij and expected-disagreement numerator
    D_e = Sigma_{ij} |i-j| * row_i * col_j (the N division never
    performed),

        kappa_w = 1 - D_o * N / D_e

    — every operand an exact DECIMAL(38,0), ONE IEEE division (the
    q_kappa contract).  Reported alongside as exact columns so the
    identity kappa_w = 1 - do*n/de_num is consumer-checkable.

    Shape: one (a, b) pair collapse for x_ij + two margin folds + the
    bounded (k x k) margin cross product (the gk_gamma bounded-grid
    class — category domains are rating tiers, not raw values) + 1-row
    folds.  NULL ratings are dropped pairwise.

    Output (one row): n, n_cells, d_o, d_e_num, kappa_w.
    """
    d38 = "decimal(38,0)"
    from pyspark import StorageLevel

    pair = df.select(
        F.col(rater_a).cast("long").alias("__a"),
        F.col(rater_b).cast("long").alias("__b"),
    ).filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    # persist the (k x k)-bounded cell table and derive BOTH margins
    # from it (not from the raw pairs) — one corpus scan total instead
    # of three (the ordinal_assoc_cells plan-audit lesson)
    cells = (
        pair.groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # no paired unpersist by policy: docs/SCALE.md 'Persist policy'
    )
    do = cells.agg(
        F.sum(
            F.abs(F.col("__a") - F.col("__b")).cast(d38)
            * F.col("__c").cast(d38)
        )
        .cast(d38)
        .alias("d_o"),
        F.sum("__c").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    rm = cells.groupBy(F.col("__a").alias("__i")).agg(
        F.sum("__c").alias("__rm")
    )
    cm = cells.groupBy(F.col("__b").alias("__j")).agg(
        F.sum("__c").alias("__cm")
    )
    de = (
        rm.crossJoin(F.broadcast(cm))
        .agg(
            F.sum(
                F.abs(F.col("__i") - F.col("__j")).cast(d38)
                * (F.col("__rm").cast(d38) * F.col("__cm").cast(d38)).cast(
                    d38
                )
            )
            .cast(d38)
            .alias("d_e_num")
        )
    )
    zero = F.lit(0).cast(d38)
    one = do.crossJoin(F.broadcast(de))
    dov = F.coalesce(F.col("d_o"), zero)
    dev = F.coalesce(F.col("d_e_num"), zero)
    return one.select(
        "n",
        "n_cells",
        dov.cast("double").alias("d_o"),
        dev.cast("double").alias("d_e_num"),
        F.when(
            dev > 0,
            F.lit(1.0)
            - (dov * F.col("n").cast(d38)).cast(d38).cast("double")
            / dev.cast("double"),
        ).alias("kappa_w"),
    )


def bowker_cells(df: DataFrame, rater_a: str, rater_b: str) -> DataFrame:
    """Bowker symmetry-test cells between two categorical columns over
    the same scale — the k-category generalization of McNemar (Bowker
    1948): for every unordered category pair {i, j}, are i->j
    transitions as common as j->i?  The drift audit for paired labels
    (last year's priority vs this year's, heuristic A vs B) that
    :func:`cohens_kappa` cannot see — kappa measures agreement, Bowker
    the DIRECTION of the disagreements.

    Per unordered pair (cat_lo < cat_hi): n_lo_hi (rows with
    a = lo, b = hi), n_hi_lo, and the chi-square term
    (n_lo_hi - n_hi_lo)^2 / (n_lo_hi + n_hi_lo) — exact-integer
    numerator, ONE IEEE division (the q_kappa contract); pairs with
    both counts 0 contribute nothing and are omitted (the standard
    convention — their term is 0/0).  The Bowker statistic
    Sigma chi_term with df = pairs emitted is the consumer one-liner
    this table refuses (float Sigma), but both integer counts sum
    safely anywhere.

    Shape: one (a, b) cell collapse + ONE equi self-join on the
    canonicalized (lo, hi) key (full outer, zero-filled) — bounded by
    the category-domain grid; no window, no non-equi join.  NULL
    ratings are dropped pairwise; diagonal cells (a = b) never enter.

    Output per pair: cat_lo, cat_hi, n_lo_hi, n_hi_lo, chi_term —
    ordered by (cat_lo, cat_hi).
    """
    pair = df.select(
        F.col(rater_a).alias("__a"), F.col(rater_b).alias("__b")
    ).filter(
        F.col("__a").isNotNull()
        & F.col("__b").isNotNull()
        & (F.col("__a") != F.col("__b"))
    )
    cells = pair.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__c"))
    up = cells.where(F.col("__a") < F.col("__b")).select(
        F.col("__a").alias("cat_lo"),
        F.col("__b").alias("cat_hi"),
        F.col("__c").alias("n_lo_hi"),
    )
    down = cells.where(F.col("__a") > F.col("__b")).select(
        F.col("__b").alias("cat_lo"),
        F.col("__a").alias("cat_hi"),
        F.col("__c").alias("n_hi_lo"),
    )
    j = up.join(down, ["cat_lo", "cat_hi"], "full_outer").select(
        "cat_lo",
        "cat_hi",
        F.coalesce("n_lo_hi", F.lit(0)).alias("n_lo_hi"),
        F.coalesce("n_hi_lo", F.lit(0)).alias("n_hi_lo"),
    )
    diff = (F.col("n_lo_hi") - F.col("n_hi_lo")).cast("double")
    tot = (F.col("n_lo_hi") + F.col("n_hi_lo")).cast("double")
    return j.select(
        "cat_lo",
        "cat_hi",
        "n_lo_hi",
        "n_hi_lo",
        (diff * diff / tot).alias("chi_term"),
    ).orderBy("cat_lo", "cat_hi")


def icc_cells(
    df: DataFrame, subject: str, value: str, k_ratings: int
) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1,1) over
    integer ratings — the RELIABILITY face of the agreement tier
    (:func:`fleiss_kappa_cells` treats ratings as nominal; ICC asks
    how much of the rating VARIANCE is between subjects vs between
    raters, the right audit when the scale is numeric).

    Exact-integer restatement (Shrout & Fleiss ICC(1,1) =
    (MSB - MSW)/(MSB + (k-1) MSW)): with per-subject sums s_i, squares
    q_i, S = Sigma s_i, n complete subjects and k ratings each,

        ssb = n*k*SSB = n * Sigma s_i^2 - S^2
        ssw =   k*SSW = k * Sigma q_i  - Sigma s_i^2
        icc = (ssb*(k-1) - ssw*(n-1))
              / (ssb*(k-1) + (k-1)*(n-1)*ssw)

    — every operand an exact DECIMAL(38,0), ONE IEEE division (the
    q_kappa contract; both scaled sums are also reported so MSB/MSW
    replay as consumer one-liners).  Degenerate denominator (a single
    subject, or zero total variance) yields NULL.

    Completeness contract exactly as :func:`fleiss_kappa_cells`:
    subjects with a rating count != ``k_ratings`` are dropped and
    counted in n_dropped; NULL subject/value rows drop first.

    Shape: one per-subject fold + 1-row folds — map-side combinable,
    no window, no join on raw rows.

    1-row output: n_subjects, k_ratings, n_dropped, ssb_xnk, ssw_xk,
    icc.
    """
    if k_ratings < 2:
        raise ValueError("icc_cells: k_ratings must be >= 2")
    d38 = "decimal(38,0)"
    g = df.select(
        F.col(subject).alias("__s"), F.col(value).cast("long").alias("__x")
    ).filter(F.col("__s").isNotNull() & F.col("__x").isNotNull())
    per_s = g.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.col("__x").cast(d38)).cast(d38).alias("__si"),
        F.sum((F.col("__x").cast(d38) * F.col("__x").cast(d38)).cast(d38))
        .cast(d38)
        .alias("__qi"),
    )
    complete = per_s.where(F.col("__cnt") == k_ratings)
    dropped = per_s.where(F.col("__cnt") != k_ratings).agg(
        F.count(F.lit(1)).alias("n_dropped")
    )
    folds = complete.agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("__si").cast(d38).alias("__S"),
        F.sum((F.col("__si") * F.col("__si")).cast(d38)).cast(d38).alias(
            "__s2"
        ),
        F.sum("__qi").cast(d38).alias("__Q"),
    )
    one = folds.crossJoin(F.broadcast(dropped))
    zero = F.lit(0).cast(d38)
    n = F.col("n_subjects").cast(d38)
    kk = F.lit(k_ratings).cast(d38)
    s = F.coalesce(F.col("__S"), zero)
    s2 = F.coalesce(F.col("__s2"), zero)
    q = F.coalesce(F.col("__Q"), zero)
    ssb = (n * s2 - s * s).cast(d38)
    ssw = (kk * q - s2).cast(d38)
    km1 = (kk - 1).cast(d38)
    nm1 = (n - 1).cast(d38)
    num = (ssb * km1 - ssw * nm1).cast(d38)
    den = (ssb * km1 + km1 * nm1 * ssw).cast(d38)
    return one.select(
        "n_subjects",
        F.lit(k_ratings).alias("k_ratings"),
        F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
        ssb.cast("double").alias("ssb_xnk"),
        ssw.cast("double").alias("ssw_xk"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "icc"
        ),
    )


def gk_lambda(df: DataFrame, x: str, y: str) -> DataFrame:
    """Goodman–Kruskal lambda between two NOMINAL columns — the
    proportional-reduction-in-error association for unordered
    categories, where :func:`gk_gamma` (ordinal) and
    :func:`chisq_independence_cells` (sign-blind magnitude) don't fit:
    how much better does knowing x predict y's MODE than guessing the
    global mode (lambda_yx), and vice versa?

    Exact-integer restatement: with cell counts n_xy,

        lambda_yx = (Sigma_x max_y n_xy - max_y n_.y)
                    / (n - max_y n_.y)

    (and symmetrically for lambda_xy) — exact counts into ONE IEEE
    division each (the q_kappa contract); a degenerate denominator
    (the global mode covers every row) yields NULL.

    Shape: one (x, y) cell collapse + two per-axis max folds + two
    margin-max 1-row folds — bounded by the category domains, no
    window, no join on raw rows.  NULLs in either column drop.

    1-row output: n_rows, n_cells, sum_max_y_given_x, max_y_margin,
    sum_max_x_given_y, max_x_margin, lambda_yx, lambda_xy.
    """
    from pyspark import StorageLevel

    d38 = "decimal(38,0)"
    g = df.select(F.col(x).alias("__x"), F.col(y).alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    # four independent fold branches consume the cell table; persist it
    # (bounded by the category-domain grid) so the raw input is scanned
    # once — the ordinal_assoc_cells plan-audit lesson
    cells = (
        g.groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # no paired unpersist by policy: docs/SCALE.md 'Persist policy'
    )
    per_x = cells.groupBy("__x").agg(F.max("__c").alias("__mx"))
    per_y = cells.groupBy("__y").agg(
        F.max("__c").alias("__my"), F.sum("__c").alias("__ny")
    )
    per_x2 = cells.groupBy("__x").agg(F.sum("__c").alias("__nx"))
    folds = (
        per_x.agg(F.sum(F.col("__mx").cast(d38)).cast(d38).alias("__smx"))
        .crossJoin(
            F.broadcast(
                per_y.agg(
                    F.sum(F.col("__my").cast(d38)).cast(d38).alias("__smy"),
                    F.max("__ny").alias("__maxny"),
                )
            )
        )
        .crossJoin(
            F.broadcast(per_x2.agg(F.max("__nx").alias("__maxnx")))
        )
        .crossJoin(
            F.broadcast(
                cells.agg(
                    F.sum("__c").alias("n_rows"),
                    F.count(F.lit(1)).alias("n_cells"),
                )
            )
        )
    )
    zero = F.lit(0).cast(d38)
    n = F.col("n_rows").cast(d38)
    smx = F.coalesce(F.col("__smx"), zero)
    smy = F.coalesce(F.col("__smy"), zero)
    mny = F.coalesce(F.col("__maxny"), F.lit(0)).cast(d38)
    mnx = F.coalesce(F.col("__maxnx"), F.lit(0)).cast(d38)
    return folds.select(
        "n_rows",
        "n_cells",
        smx.cast("long").alias("sum_max_y_given_x"),
        mny.cast("long").alias("max_y_margin"),
        smy.cast("long").alias("sum_max_x_given_y"),
        mnx.cast("long").alias("max_x_margin"),
        F.when(
            (n - mny) > 0,
            (smx - mny).cast(d38).cast("double") / (n - mny).cast("double"),
        ).alias("lambda_yx"),
        F.when(
            (n - mnx) > 0,
            (smy - mnx).cast(d38).cast("double") / (n - mnx).cast("double"),
        ).alias("lambda_xy"),
    )


def blomqvist_beta_cells(df: DataFrame, x: str, y: str) -> DataFrame:
    """Blomqvist's beta (medial correlation, Blomqvist 1950) — the
    quadrant-count dependence audit: split the plane at the two exact
    medians and ask how much mass sits in the concordant quadrants.
    The 50%-breakdown companion to the registered q_spearman /
    q_kendall_tau (whose statistics every row influences): beta reads
    ONLY which side of the median each value falls, so it survives
    arbitrarily wild tails — the dependence check to trust when the
    marginals are as dirty as crawl metadata gets.

    Exactness: both medians are kept exact by DOUBLING (med2 = lower +
    upper median over the distinct-value axis, the mood_median_cells
    convention, each via the bounded bucket prefix), so the quadrant
    classification ``2x <> med2_x`` is pure integer comparison; rows
    ON either median are counted out (``n_on``, the classical
    convention) and beta = (n_pp + n_mm - n_pm - n_mp) / n_off is ONE
    division.

    Shape: two value-axis collapses + bucket prefixes (one per
    marginal), two 1-row median folds broadcast onto the rows, one
    quadrant fold.  NULL x/y rows are dropped (pairwise-complete).

    1-row output: n_rows, n_on, n_pp, n_pm, n_mp, n_mm, med2_x,
    med2_y (exact-int doubles), beta (NULL when every row ties a
    median).
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    d38 = "decimal(38,0)"
    g = df.select(F.col(x).alias("__x"), F.col(y).alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )

    def med2(col: str, alias: str) -> DataFrame:
        vals = g.groupBy(col).agg(F.count(F.lit(1)).alias("__c"))
        pri = _with_prior_sums(vals, col, ("__c",))
        cum = F.col("__prior___c") + F.col("__c")
        tot = vals.agg(F.sum("__c").alias("__n"))
        return (
            pri.crossJoin(F.broadcast(tot))
            .agg(
                F.min(
                    F.when(
                        cum >= F.floor((F.col("__n") + 1) / 2), F.col(col)
                    )
                ).alias("__mlo"),
                F.min(
                    F.when(
                        cum >= F.floor(F.col("__n") / 2) + 1, F.col(col)
                    )
                ).alias("__mhi"),
            )
            .select(
                (F.col("__mlo").cast(d38) + F.col("__mhi").cast(d38))
                .cast(d38)
                .alias(alias)
            )
        )

    mx = med2("__x", "__mx2")
    my = med2("__y", "__my2")
    x2 = F.lit(2).cast(d38) * F.col("__x").cast(d38)
    y2 = F.lit(2).cast(d38) * F.col("__y").cast(d38)
    on_med = (x2 == F.col("__mx2")) | (y2 == F.col("__my2"))
    q = (
        g.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(my))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(on_med, 1).otherwise(0)).alias("n_on"),
            F.sum(
                F.when(
                    ~on_med & (x2 > F.col("__mx2")) & (y2 > F.col("__my2")),
                    1,
                ).otherwise(0)
            ).alias("n_pp"),
            F.sum(
                F.when(
                    ~on_med & (x2 > F.col("__mx2")) & (y2 < F.col("__my2")),
                    1,
                ).otherwise(0)
            ).alias("n_pm"),
            F.sum(
                F.when(
                    ~on_med & (x2 < F.col("__mx2")) & (y2 > F.col("__my2")),
                    1,
                ).otherwise(0)
            ).alias("n_mp"),
            F.sum(
                F.when(
                    ~on_med & (x2 < F.col("__mx2")) & (y2 < F.col("__my2")),
                    1,
                ).otherwise(0)
            ).alias("n_mm"),
            F.max(F.col("__mx2").cast("double")).alias("med2_x"),
            F.max(F.col("__my2").cast("double")).alias("med2_y"),
        )
    )
    n_off = (
        F.col("n_pp") + F.col("n_pm") + F.col("n_mp") + F.col("n_mm")
    ).cast("long")
    return q.select(
        "n_rows",
        "n_on",
        "n_pp",
        "n_pm",
        "n_mp",
        "n_mm",
        "med2_x",
        "med2_y",
        F.when(
            n_off > 0,
            (
                F.col("n_pp") + F.col("n_mm") - F.col("n_pm") - F.col("n_mp")
            ).cast("double")
            / n_off.cast("double"),
        ).alias("beta"),
    )


def krippendorff_alpha_cells(
    ratings: DataFrame, unit: str, value: str
) -> DataFrame:
    """Krippendorff's alpha (nominal) agreement cells — the
    missing-data-tolerant reliability coefficient next to
    :func:`fleiss_kappa_cells` (Fleiss requires complete panels and
    measures chance agreement from rater-pooled margins; alpha's
    coincidence-matrix chance model stays defined when units carry 2
    ratings instead of 3, so partially-missing panels keep their
    evidence instead of being dropped).

    Exactness: units with m ratings contribute their disagreeing
    ordered pairs with weight 1/(m-1); on the DOUBLED scale
    (``disagree_x2``) that weight is the exact integer 2/(m-1) for
    m in {2, 3} — panels wider than 3 raise (a staged-raise guard;
    the general-m extension needs an LCM scale).  Margins n_c and
    n.. are plain integer counts, so
    ``alpha = 1 - (n.. - 1) * disagree_x2 / (2 * (n..^2 - Sigma
    n_c^2))`` is ONE fixed IEEE expression on exact-int inputs.
    Units with a single rating join the dropped count (they pair with
    nothing).

    Shape: one (unit, value) collapse, one per-unit fold, two 1-row
    folds broadcast (pair sums + margins) — no pair join at all; the
    per-unit disagreeing-pair count folds from the within-unit value
    spectrum (m*(m-1) - Sigma m_c*(m_c-1)).

    1-row output: n_units (m >= 2), n_dropped (m < 2), n_ratings
    (n..), disagree_x2, margin_sq_sum (Sigma n_c^2) — exact-int
    doubles — and alpha (NULL when the chance denominator is 0).
    """
    d38 = "decimal(38,0)"
    g = ratings.select(
        F.col(unit).alias("__u"), F.col(value).alias("__v")
    ).filter(F.col("__u").isNotNull() & F.col("__v").isNotNull())
    uv = g.groupBy("__u", "__v").agg(F.count(F.lit(1)).alias("__muc"))
    per_u = uv.groupBy("__u").agg(
        F.sum("__muc").alias("__m"),
        F.sum(F.col("__muc") * (F.col("__muc") - 1)).alias("__agree"),
    )
    too_wide = F.when(
        F.col("__m") > 3,
        F.raise_error(
            F.concat(
                F.lit("krippendorff_alpha_cells: unit with "),
                F.col("__m").cast("string"),
                F.lit(" ratings; only m <= 3 keeps the x2 scale exact"),
            )
        ).cast("long"),
    ).otherwise(F.col("__m"))
    per_u = per_u.select(
        "__u", too_wide.alias("__m"), "__agree"
    )
    # disagreeing ordered pairs = m(m-1) - agree; weight 2/(m-1) is the
    # exact integer 2 (m=2) or 1 (m=3) on the doubled scale
    disag2 = (
        (F.col("__m") * (F.col("__m") - 1) - F.col("__agree")).cast(d38)
        * F.when(F.col("__m") == 2, F.lit(2))
        .otherwise(F.lit(1))
        .cast(d38)
    ).cast(d38)
    pairable = per_u.filter(F.col("__m") >= 2)
    folds = pairable.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.coalesce(F.sum("__m"), F.lit(0)).alias("__nr"),
        F.coalesce(
            F.sum(disag2).cast(d38), F.lit(0).cast(d38)
        ).alias("__d2"),
    )
    dropped = per_u.filter(F.col("__m") < 2).agg(
        F.count(F.lit(1)).alias("n_dropped")
    )
    margins = (
        uv.join(
            pairable.select("__u"), on="__u", how="inner"
        )
        .groupBy("__v")
        .agg(F.sum("__muc").alias("__nc"))
        .agg(
            F.coalesce(
                F.sum((F.col("__nc").cast(d38) * F.col("__nc").cast(d38)).cast(d38))
                .cast(d38),
                F.lit(0).cast(d38),
            ).alias("__msq")
        )
    )
    nr = F.col("__nr").cast(d38)
    den = (F.lit(2).cast(d38) * (nr * nr - F.col("__msq")).cast(d38)).cast(
        d38
    )
    return (
        folds.crossJoin(F.broadcast(dropped))
        .crossJoin(F.broadcast(margins))
        .select(
            "n_units",
            "n_dropped",
            F.col("__nr").cast("long").alias("n_ratings"),
            F.col("__d2").cast("double").alias("disagree_x2"),
            F.col("__msq").cast("double").alias("margin_sq_sum"),
            F.when(
                den > 0,
                F.lit(1.0)
                - (nr - F.lit(1).cast(d38)).cast("double")
                * F.col("__d2").cast("double")
                / den.cast("double"),
            ).alias("alpha"),
        )
    )


def cronbach_alpha_cells(
    ratings: DataFrame, subject: str, item: str, value: str
) -> DataFrame:
    """Cronbach's alpha internal-consistency cells — the NUMERIC
    reliability companion to :func:`icc_cells` on the same panel
    shape: do the k items (heuristic raters, quality sub-scores) move
    together enough to be read as one scale?  alpha = k/(k-1) *
    (1 - Sigma var_i / var_total).

    Exactness: only COMPLETE subjects (one rating per global item —
    the friedman gate) enter; per-item and per-subject-total moments
    fold as DECIMAL(38,0), each n-scaled variance is the exact integer
    ``A = n*Q - S^2``, the item-variance sum runs over the bounded
    item axis (integer Sigma — order-independent), and alpha is ONE
    fixed IEEE expression on the two exact operands.

    Shape: one (subject, item) scan, per-item fold + per-subject
    totals fold + two 1-row folds broadcast — no window, no pair join.

    1-row output: n_subjects, k_items, n_dropped, item_var_sum_xn2
    (Sigma_i n*Q_i - S_i^2), total_var_xn2 (n*Q_T - S_T^2), alpha
    (NULL when k < 2 or total variance is 0).  k_items counts items
    among COMPLETE subjects: when no subject is complete it reads 0
    (alpha is NULL either way).
    """
    d38 = "decimal(38,0)"
    g = ratings.select(
        F.col(subject).alias("__u"),
        F.col(item).alias("__i"),
        F.col(value).alias("__v"),
    ).filter(
        F.col("__u").isNotNull()
        & F.col("__i").isNotNull()
        & F.col("__v").isNotNull()
    )
    kf = g.select(F.countDistinct("__i").alias("__k"))
    per_u = g.groupBy("__u").agg(
        F.count(F.lit(1)).alias("__nr"),
        F.countDistinct("__i").alias("__ni"),
        F.sum(F.col("__v").cast(d38)).cast(d38).alias("__tu"),
    )
    complete = (
        per_u.crossJoin(F.broadcast(kf))
        .where(
            (F.col("__nr") == F.col("__k")) & (F.col("__ni") == F.col("__k"))
        )
        .select("__u", "__tu")
    )
    dropped = (
        per_u.crossJoin(F.broadcast(kf))
        .where(
            (F.col("__nr") != F.col("__k")) | (F.col("__ni") != F.col("__k"))
        )
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    gc = g.join(complete.select("__u"), "__u", "left_semi")
    vd = F.col("__v").cast(d38)
    items = (
        gc.groupBy("__i")
        .agg(
            F.count(F.lit(1)).cast(d38).alias("__n"),
            F.sum(vd).cast(d38).alias("__s"),
            F.sum((vd * vd).cast(d38)).cast(d38).alias("__q"),
        )
        .agg(
            F.count(F.lit(1)).alias("k_items"),
            F.coalesce(
                F.sum(
                    (F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s"))
                    .cast(d38)
                ).cast(d38),
                F.lit(0).cast(d38),
            ).alias("__ia"),
        )
    )
    td = F.col("__tu").cast(d38)
    totals = complete.agg(
        F.count(F.lit(1)).cast(d38).alias("__n"),
        F.coalesce(F.sum(td).cast(d38), F.lit(0).cast(d38)).alias("__st"),
        F.coalesce(
            F.sum((td * td).cast(d38)).cast(d38), F.lit(0).cast(d38)
        ).alias("__qt"),
    )
    at = (F.col("__n") * F.col("__qt") - F.col("__st") * F.col("__st")).cast(
        d38
    )
    kd = F.col("k_items").cast("double")
    return (
        totals.crossJoin(F.broadcast(items))
        .crossJoin(F.broadcast(dropped))
        .select(
            F.col("__n").cast("long").alias("n_subjects"),
            "k_items",
            "n_dropped",
            F.col("__ia").cast("double").alias("item_var_sum_xn2"),
            at.cast("double").alias("total_var_xn2"),
            F.when(
                (F.col("k_items") >= 2) & (at > 0),
                kd / (kd - F.lit(1.0))
                * (
                    F.lit(1.0)
                    - F.col("__ia").cast("double") / at.cast("double")
                ),
            ).alias("alpha"),
        )
    )


def gwet_ac1_cells(
    ratings: DataFrame, unit: str, value: str, k_raters: int
) -> DataFrame:
    """Gwet's AC1 agreement cells — the prevalence-robust alternative
    to :func:`fleiss_kappa_cells` on the same complete-panel fixture:
    when one category dominates, kappa's margin-based chance model
    collapses toward 0 however well raters agree (the kappa paradox);
    AC1's chance model pi_c*(1-pi_c)/(K-1) stays calibrated.

    Exactness: over complete units (exactly ``k_raters`` ratings),
    ``agree_pairs = Sigma_u Sigma_c m_uc*(m_uc - 1)`` and the margin
    spectrum Sigma n_c^2 are exact integers, so
    ``pa = agree_pairs / (n*m*(m-1))`` and
    ``pe = (m^2 n^2 - Sigma n_c^2) / ((K-1) * m^2 n^2)`` and
    ``ac1 = (pa - pe) / (1 - pe)`` are fixed IEEE expressions.

    Shape: one (unit, value) collapse, per-unit fold, three 1-row
    folds broadcast — no pair join (the krippendorff_alpha_cells
    spectrum trick).

    1-row output: n_units, n_dropped, k_categories, agree_pairs,
    margin_sq_sum (exact-int doubles), pa, pe, ac1 (NULL when
    K < 2 or pe = 1).
    """
    d38 = "decimal(38,0)"
    m = k_raters
    g = ratings.select(
        F.col(unit).alias("__u"), F.col(value).alias("__v")
    ).filter(F.col("__u").isNotNull() & F.col("__v").isNotNull())
    uv = g.groupBy("__u", "__v").agg(F.count(F.lit(1)).alias("__muc"))
    per_u = uv.groupBy("__u").agg(
        F.sum("__muc").alias("__m"),
        F.sum(F.col("__muc") * (F.col("__muc") - 1)).alias("__agree"),
    )
    complete = per_u.filter(F.col("__m") == m)
    dropped = per_u.filter(F.col("__m") != m).agg(
        F.count(F.lit(1)).alias("n_dropped")
    )
    folds = complete.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.coalesce(F.sum("__agree"), F.lit(0)).alias("__ag"),
    )
    margins = (
        uv.join(complete.select("__u"), "__u", "left_semi")
        .groupBy("__v")
        .agg(F.sum("__muc").alias("__nc"))
        .agg(
            F.count(F.lit(1)).alias("k_categories"),
            F.coalesce(
                F.sum(
                    (F.col("__nc").cast(d38) * F.col("__nc").cast(d38)).cast(
                        d38
                    )
                ).cast(d38),
                F.lit(0).cast(d38),
            ).alias("__msq"),
        )
    )
    one = folds.crossJoin(F.broadcast(dropped)).crossJoin(
        F.broadcast(margins)
    )
    nd = F.col("n_units").cast(d38)
    m2n2 = (F.lit(m * m).cast(d38) * nd * nd).cast(d38)
    pa = F.col("__ag").cast("double") / (
        nd * F.lit(m * (m - 1)).cast(d38)
    ).cast("double")
    pe = (m2n2 - F.col("__msq")).cast(d38).cast("double") / (
        (F.col("k_categories") - 1).cast("double") * m2n2.cast("double")
    )
    return one.select(
        "n_units",
        "n_dropped",
        "k_categories",
        F.col("__ag").cast("double").alias("agree_pairs"),
        F.col("__msq").cast("double").alias("margin_sq_sum"),
        F.when(F.col("n_units") > 0, pa).alias("pa"),
        F.when(
            (F.col("n_units") > 0) & (F.col("k_categories") >= 2), pe
        ).alias("pe"),
        F.when(
            (F.col("n_units") > 0)
            & (F.col("k_categories") >= 2)
            & (pe != 1.0),
            (pa - pe) / (F.lit(1.0) - pe),
        ).alias("ac1"),
    )


def footrule_cells(df: DataFrame, x: str, y: str) -> DataFrame:
    """Spearman's footrule cells — the L1 rank distance companion to
    :func:`~npm_mirror_spark.operators.stats.spearman_rho` (L2): how
    far do the two rankings move rows on average?  Footrule is the
    metric of choice when single large displacements should NOT
    dominate (rho squares them).

    Exactness: both axes take doubled midranks off the bounded bucket
    prefix (the spearman_rho machinery), so ``footrule_x2 =
    Sigma |mrx2 - mry2|`` and ``sq_diff_x4 = Sigma (mrx2 - mry2)^2``
    fold as exact DECIMAL(38,0) — the normalized statistic (the max
    depends on the tie structure) is left to consumers.

    Shape: two value-axis collapses + bucket prefixes, two value-keyed
    equi joins back onto the rows, one fold — no window over raw rows.

    1-row output: n_rows, footrule_x2, sq_diff_x4 (exact-int doubles).
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    d38 = "decimal(38,0)"
    g = df.select(F.col(x).alias("__x"), F.col(y).alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )

    def mr2_map(col: str, out: str) -> DataFrame:
        vals = g.groupBy(col).agg(F.count(F.lit(1)).alias("__c"))
        pri = _with_prior_sums(vals, col, ("__c",))
        return pri.select(
            col,
            (
                F.lit(2).cast(d38) * F.col("__prior___c").cast(d38)
                + F.col("__c").cast(d38)
                + F.lit(1).cast(d38)
            )
            .cast(d38)
            .alias(out),
        )

    j = g.join(mr2_map("__x", "__rx2"), "__x").join(
        mr2_map("__y", "__ry2"), "__y"
    )
    diff = (F.col("__rx2") - F.col("__ry2")).cast(d38)
    zero = F.lit(0).cast(d38)
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(F.abs(diff).cast(d38)).cast(d38), zero)
        .cast("double")
        .alias("footrule_x2"),
        F.coalesce(F.sum((diff * diff).cast(d38)).cast(d38), zero)
        .cast("double")
        .alias("sq_diff_x4"),
    )


def partial_tau_cells(df: DataFrame, x: str, y: str, z: str) -> DataFrame:
    """Partial Kendall's tau cells — does the (x, y) ordinal
    association survive controlling for z?  tau_xy.z = (tau_xy -
    tau_xz * tau_yz) / sqrt((1 - tau_xz^2) * (1 - tau_yz^2)) — the
    confounder screen for the concordance family
    (:func:`ordinal_assoc_cells` measures raw association; a large
    tau_xy that vanishes partially is the Simpson's-paradox tell the
    stratified q_mantel_haenszel reads for binary outcomes).

    Composition operator, 100 TB-shaped: the corpus collapses to its
    3-D (x, y, z) cell grid ONCE (one shuffle, bounded by the
    ordinal-domain contract, persisted — the grid-bounded class), and
    the three pairwise ordinal_assoc_cells folds run in WEIGHTED mode
    off that grid — no second or third corpus scan.  Each fold is the
    documented exact pair decomposition ending in the
    correctly-rounded IEEE sqrt, cross-joined broadcast; the partial
    is ONE further fixed IEEE sequence on the three tau_b doubles
    in the documented order.  Rows with a NULL in ANY of the three
    columns are dropped up front (listwise completeness, so all three
    taus read the same n).

    1-row output: n_rows, tau_xy, tau_xz, tau_yz, tau_partial (NULL
    when any tau is NULL or a radicand factor is <= 0).
    """
    from pyspark import StorageLevel

    grid = (
        df.select(
            F.col(x).alias("__px"),
            F.col(y).alias("__py"),
            F.col(z).alias("__pz"),
        )
        .filter(
            F.col("__px").isNotNull()
            & F.col("__py").isNotNull()
            & F.col("__pz").isNotNull()
        )
        .groupBy("__px", "__py", "__pz")
        .agg(F.count(F.lit(1)).alias("__w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # no paired unpersist by policy: docs/SCALE.md 'Persist policy'
    )
    xy = ordinal_assoc_cells(grid, "__px", "__py", weight="__w").select(
        "n_rows", F.col("tau_b").alias("tau_xy")
    )
    xz = ordinal_assoc_cells(grid, "__px", "__pz", weight="__w").select(
        F.col("tau_b").alias("tau_xz")
    )
    yz = ordinal_assoc_cells(grid, "__py", "__pz", weight="__w").select(
        F.col("tau_b").alias("tau_yz")
    )
    one = xy.crossJoin(F.broadcast(xz)).crossJoin(F.broadcast(yz))
    txy, txz, tyz = F.col("tau_xy"), F.col("tau_xz"), F.col("tau_yz")
    rad = (F.lit(1.0) - txz * txz) * (F.lit(1.0) - tyz * tyz)
    return one.select(
        "n_rows",
        "tau_xy",
        "tau_xz",
        "tau_yz",
        F.when(
            txy.isNotNull()
            & txz.isNotNull()
            & tyz.isNotNull()
            & (rad > 0),
            (txy - txz * tyz) / F.sqrt(rad),
        ).alias("tau_partial"),
    )


def t_closeness_report(
    df: DataFrame, quasi_cols: list[str], sensitive: str
) -> DataFrame:
    """t-closeness audit over a quasi-identifier set — the third leg of
    the privacy tier after :func:`kanonymity_report`'s k-anonymity and
    l-diversity columns: a class can be large (k ok) and diverse
    (l ok) yet still leak when its SENSITIVE distribution differs
    sharply from the table-wide one (Li, Li & Venkatasubramanian '07).
    For a categorical sensitive attribute the prescribed distance is
    variational: tvd_g = Sigma_v |P_g(v) - P(v)| / 2.

    Exactness: the numerator clears denominators —
    ``tvd_num = Sigma_v |n_gv * N - n_v * n_g|`` is an exact integer
    (DECIMAL(38,0) accumulation), and ``tvd = tvd_num / (2 * n_g * N)``
    is ONE IEEE division on exact-cast doubles.  Missing (class,
    value) combinations MUST contribute |0 - n_v * n_g|, so the class
    axis is expanded against the full sensitive domain before the
    fold.

    Shape: one (quasi, sensitive) groupBy to the class-value cells —
    bounded by the identifier x sensitive domain, the caller's
    generalization contract — then a bounded-domain grid (classes
    crossJoin the |V|-row sensitive-domain frame, broadcast) with the
    observed cells LEFT-joined on, and one per-class re-aggregate.
    No window, no self-join.

    Output per class: *quasi_cols, n_class, tvd_num, tvd — ordered by
    the quasi columns.
    """
    cv = (
        df.filter(F.col(sensitive).isNotNull())
        .groupBy(*quasi_cols, F.col(sensitive).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__ngv"))
    )
    classes = cv.groupBy(*quasi_cols).agg(F.sum("__ngv").alias("__ng"))
    vals = cv.groupBy("__v").agg(F.sum("__ngv").alias("__nv"))
    tot = vals.agg(F.sum("__nv").alias("__nn"))
    dom = vals.crossJoin(F.broadcast(tot))
    grid = classes.crossJoin(F.broadcast(dom))
    filled = grid.join(cv, [*quasi_cols, "__v"], "left").select(
        *quasi_cols,
        "__ng",
        "__nv",
        "__nn",
        F.coalesce("__ngv", F.lit(0)).alias("__ngv"),
    )
    dev = F.abs(
        F.col("__ngv").cast("decimal(38,0)") * F.col("__nn")
        - F.col("__nv").cast("decimal(38,0)") * F.col("__ng")
    )
    return (
        filled.groupBy(*quasi_cols)
        .agg(
            F.max("__ng").cast("long").alias("n_class"),
            F.sum(dev).cast("double").alias("tvd_num"),
            (
                F.sum(dev).cast("double")
                / (
                    F.lit(2.0)
                    * F.max("__ng").cast("double")
                    * F.max("__nn").cast("double")
                )
            ).alias("tvd"),
        )
        .orderBy(*quasi_cols)
    )


def ari_cells(df: DataFrame, a: str, b: str) -> DataFrame:
    """Adjusted Rand Index cells between two partitions of the same
    rows (columns ``a`` and ``b`` hold the two cluster/label ids) —
    the chance-corrected pair-counting agreement the clustering tier
    (q_kmeans / q_cluster_split) has no verdict for: raw accuracy is
    meaningless across arbitrary label permutations; ARI is
    permutation-invariant and 0 in expectation under independent
    labelings (Hubert & Arabie '85).

    Exactness: every cell is a DOUBLED pair count — ``pairs2 =
    Sigma n*(n-1)`` over contingency / row-margin / column-margin
    counts and the total — so no halving ever happens and the
    identity ARI = 2*(C2*S2ij - S2a*S2b) / (C2*(S2a+S2b) - 2*S2a*S2b)
    (the halved form with all /2 factors cancelled) evaluates with
    ONE final IEEE division on exact-cast doubles.  Products exceed
    2^53 only beyond ~1e8 items; above that the doubles round
    identically in both engines (the q_corr_moments class).

    Shape: one (a, b) groupBy to the contingency cells — bounded by
    the label-domain product — then three 1-row aggregates (cells,
    row margins, column margins) combined by broadcast 1-row folds.
    No window, no self-join.

    1-row output: n_items, n_a_classes, n_b_classes, pairs2_cells,
    pairs2_a, pairs2_b, pairs2_total, ari.
    """
    cont = (
        df.filter(F.col(a).isNotNull() & F.col(b).isNotNull())
        .groupBy(F.col(a).alias("__a"), F.col(b).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    p2 = lambda c: F.sum(
        c.cast("decimal(38,0)") * (c - F.lit(1))
    ).cast("double")
    cells = cont.agg(
        F.sum("__n").cast("long").alias("n_items"),
        p2(F.col("__n")).alias("pairs2_cells"),
    )
    ra = (
        cont.groupBy("__a")
        .agg(F.sum("__n").alias("__na"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_a_classes"),
            p2(F.col("__na")).alias("pairs2_a"),
        )
    )
    rb = (
        cont.groupBy("__b")
        .agg(F.sum("__n").alias("__nb"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b_classes"),
            p2(F.col("__nb")).alias("pairs2_b"),
        )
    )
    one = cells.crossJoin(F.broadcast(ra)).crossJoin(F.broadcast(rb))
    c2 = F.col("n_items").cast("double") * (
        F.col("n_items").cast("double") - F.lit(1.0)
    )
    num = F.lit(2.0) * (
        c2 * F.col("pairs2_cells") - F.col("pairs2_a") * F.col("pairs2_b")
    )
    den = c2 * (F.col("pairs2_a") + F.col("pairs2_b")) - F.lit(2.0) * F.col(
        "pairs2_a"
    ) * F.col("pairs2_b")
    return one.select(
        "n_items",
        "n_a_classes",
        "n_b_classes",
        "pairs2_cells",
        "pairs2_a",
        "pairs2_b",
        c2.alias("pairs2_total"),
        F.when(den != 0, num / den).alias("ari"),
    )


def lin_ccc_cells(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """Lin's concordance correlation coefficient from exact integer
    moment cells — agreement of two measurements of the SAME quantity
    on the 45-degree line, the reconciliation verdict Pearson r cannot
    give (r is scale/shift-blind; CCC penalizes both).  Unlike r, CCC
    needs NO square root: multiplying through by n^2,
    ``ccc = 2*(n*sxy - sx*sy) / ((n*sxx - sx^2) + (n*syy - sy^2)
    + (sx - sy)^2)`` (Lin '89) — ONE IEEE division on exact-cast
    doubles, the sqrt-free sibling of q_corr_moments.

    Callers pass exact-integer Columns (e.g. cents-scaled money); the
    five sums accumulate in DECIMAL(38,0), fully order-independent.
    The n* products round above 2^53 identically in both engines (the
    q_corr_moments determinism class, documented there).

    Shape: ONE global aggregate — map-side combined, one shuffle of
    six numbers.  1-row output: n_pairs, sx, sy, sxx, syy, sxy,
    ccc_num, ccc_den, ccc.
    """
    d38 = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")
    dx = F.col("__x").cast("decimal(38,0)")
    dy = F.col("__y").cast("decimal(38,0)")
    m = df.select(x.alias("__x"), y.alias("__y")).agg(
        F.count(F.lit(1)).cast("double").alias("n_pairs"),
        d38(F.col("__x")).alias("sx"),
        d38(F.col("__y")).alias("sy"),
        F.sum(dx * F.col("__x")).cast("double").alias("sxx"),
        F.sum(dy * F.col("__y")).cast("double").alias("syy"),
        F.sum(dx * F.col("__y")).cast("double").alias("sxy"),
    )
    num = F.lit(2.0) * (
        F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    )
    den = (
        (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx"))
        + (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy"))
        + (F.col("sx") - F.col("sy")) * (F.col("sx") - F.col("sy"))
    )
    return m.select(
        "n_pairs",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        num.alias("ccc_num"),
        den.alias("ccc_den"),
        F.when(den != 0, num / den).alias("ccc"),
    )


def hoover_cells(df: DataFrame, value: Column) -> DataFrame:
    """Hoover (Robin Hood) index over one-row-per-unit exact-integer
    values: the fraction of the total that would have to move between
    units to equalize them — ``H = Sigma_i |n*x_i - T| / (2*n*T)``.
    The L1 inequality verdict beside the L2-flavored Gini faces
    (q_source_gini) and the share-concentration q_hhi: Hoover reads
    ONE number straight off the Lorenz diagram (its maximum vertical
    gap), so a transfer between two units on the same side of the
    mean provably cannot move it, which Gini cannot promise.

    Exactness: with ``n`` and the total ``T`` broadcast as a 1-row
    fold, ``|n*x_i - T|`` is an exact integer per unit (DECIMAL(38,0)
    products — no bigint overflow at any realistic scale) and the
    deviation sum accumulates in DECIMAL(38,0); the index is ONE IEEE
    division on exact-cast doubles (2*n*T rounds above 2^53
    identically in both engines — the q_corr_moments class).

    Shape: one global 1-row aggregate, one broadcast 1-row fold over
    the units, one deviation re-aggregate.  The units frame is
    already aggregated by the caller (e.g. per-customer revenue), so
    both scans are over the unit axis, not the raw corpus.

    1-row output: n_units, total_value, abs_dev_sum, hoover.
    """
    u = df.select(value.cast("decimal(38,0)").alias("__x"))
    tot = u.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").alias("__t"),
    )
    dev = F.abs(
        F.col("__x") * F.col("__n").cast("decimal(38,0)") - F.col("__t")
    )
    return (
        u.crossJoin(F.broadcast(tot))
        .agg(
            F.max("__n").alias("n_units"),
            F.max("__t").cast("double").alias("total_value"),
            F.sum(dev).cast("double").alias("abs_dev_sum"),
            (
                F.sum(dev).cast("double")
                / (
                    F.lit(2.0)
                    * F.max("__n").cast("double")
                    * F.max("__t").cast("double")
                )
            ).alias("hoover"),
        )
    )


def lorenz_cells(df: DataFrame, value: Column, k: int = 10) -> DataFrame:
    """Lorenz-curve decile points over one-row-per-unit exact-integer
    values — the WHOLE concentration curve whose single numbers the
    inequality faces already report (:func:`hoover_cells` reads its
    maximum vertical gap, the Gini faces twice the area under it):
    after the poorest d/k of units, what share of the total do they
    hold?

    Tie-safe deterministic bucketing on the ASCENDING distinct-value
    axis (the :func:`lift_gains_cells` mirror image): strictly-prior
    unit counts from the bucketed two-level prefix, whole tie-groups
    into ``bucket = (prior * k) DIV N`` — pure integer arithmetic,
    never splitting ties, so buckets can be uneven and n_u says so.
    Value masses accumulate as DECIMAL(38,0) (value * count per
    distinct value), the cumulative window runs over the <= k bucket
    rows, and each share is ONE IEEE division on exact-cast doubles.

    Output per bucket: bucket, n_u, v_sum, cum_n, cum_v, n_total,
    v_total, pop_share, value_share — ordered by bucket (0 = poorest).
    """
    from pyspark.sql import Window

    from npm_mirror_spark.operators.classifier import _with_prior_sums

    u = df.select(value.cast("long").alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    vals = u.groupBy("__x").agg(F.count(F.lit(1)).alias("__c"))
    masses = vals.withColumn(
        "__m",
        (F.col("__x").cast("decimal(38,0)") * F.col("__c")).cast(
            "decimal(38,0)"
        ),
    )
    pri = _with_prior_sums(masses, "__x", ("__c",))
    tot = masses.agg(
        F.sum("__c").cast("long").alias("__n"),
        F.sum("__m").cast("decimal(38,0)").alias("__t"),
    )
    bucketed = (
        pri.crossJoin(F.broadcast(tot))
        .withColumn(
            "__bk",
            F.expr(f"CAST(__prior___c * {int(k)} AS BIGINT) DIV __n"),
        )
        .groupBy("__bk")
        .agg(
            F.sum("__c").cast("long").alias("n_u"),
            F.sum("__m").cast("decimal(38,0)").alias("__vs"),
            F.max("__n").alias("n_total"),
            F.max("__t").alias("__tt"),
        )
    )
    w = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, 0)
    cum = bucketed.select(
        F.col("__bk").alias("bucket"),
        "n_u",
        F.col("__vs").cast("double").alias("v_sum"),
        F.sum("n_u").over(w).cast("long").alias("cum_n"),
        F.sum("__vs").over(w).cast("decimal(38,0)").cast("double").alias(
            "cum_v"
        ),
        "n_total",
        F.col("__tt").cast("double").alias("v_total"),
    )
    return cum.select(
        "bucket",
        "n_u",
        "v_sum",
        "cum_n",
        "cum_v",
        "n_total",
        "v_total",
        (F.col("cum_n").cast("double") / F.col("n_total").cast("double")).alias(
            "pop_share"
        ),
        F.when(
            F.col("v_total") != 0, F.col("cum_v") / F.col("v_total")
        ).alias("value_share"),
    ).orderBy("bucket")


def ess_cells(df: DataFrame, group: str, weight: Column) -> DataFrame:
    """Kish effective sample size per group over one-row-per-unit
    integer weights — the weighted-sampling audit the mix faces
    (q_temperature_mix / q_temperature_sample) point at: when units
    are drawn proportionally to ``weight``, how many EQUALLY-weighted
    units is the sample actually worth?  ``ess = (Sigma w)^2 /
    Sigma w^2`` (Kish '65) — n for uniform weights, 1 when one unit
    carries all the mass; ``ess_ratio = ess / n_units`` is the
    design-effect inverse (1 = no efficiency loss).

    Exactness: the two sums accumulate in DECIMAL(38,0) with the
    square's operand cast FIRST (no bigint overflow before the
    decimal); ess is ONE IEEE division of the fixed (s*s)/s2 sequence
    on exact-cast doubles, and ess_ratio one more on the already-
    reported ess.

    Shape: ONE map-side-combined aggregate per group — nothing else
    moves.  Output per group: n_units, sum_w, sum_w2, ess, ess_ratio
    — ordered by group.
    """
    d38 = "decimal(38,0)"
    g = df.select(
        F.col(group).alias("__g"), weight.cast("long").alias("__w")
    ).filter(F.col("__w").isNotNull())
    m = g.groupBy(F.col("__g").alias(group)).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(F.col("__w").cast(d38)).cast("double").alias("sum_w"),
        F.sum(F.col("__w").cast(d38) * F.col("__w"))
        .cast("double")
        .alias("sum_w2"),
    )
    ess = F.when(
        F.col("sum_w2") > 0,
        (F.col("sum_w") * F.col("sum_w")) / F.col("sum_w2"),
    )
    return m.select(
        group,
        "n_units",
        "sum_w",
        "sum_w2",
        ess.alias("ess"),
        (ess / F.col("n_units").cast("double")).alias("ess_ratio"),
    ).orderBy(group)
