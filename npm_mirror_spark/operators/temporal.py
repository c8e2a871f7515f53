"""Temporal joins Spark has no native operator for: as-of and range.

Two implementations each, per the standard playbook:

- **Composition form** (default): equi-join on the key with the temporal
  predicate, then argmax-per-left-row. Correct everywhere; the fan-out is
  bounded by rows-per-key. The 100 TB refinement is a per-(key,
  time-bucket) latest-right rollup joined on the bucket (turns O(history)
  candidates per left row into O(1)) — same results, extra equi keys.
- **Arrow kernel form**: cogrouped ``applyInPandas`` running
  ``pd.merge_asof`` per key — for when groups fit in memory and the
  composition's candidate fan-out dominates.

The DuckDB oracle uses the explicit window formulation (not DuckDB's
native ASOF JOIN) so tie-breaking is pinned identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, the latest right row with
    ``right_ts <= left_ts`` on the same key (left join: no match -> NULLs).

    ``right_cols``: right columns carried to the output (``right_ts``
    itself may be included). ``tiebreak``: right columns ordering equal
    timestamps — pass a unique key for deterministic (oracle-checkable)
    output.
    """
    l = left.withColumn("__lid", F.monotonically_increasing_id())
    r = right.select(on, *dict.fromkeys([right_ts, *right_cols]))
    joined = l.join(r, (l[on] == r[on]) & (r[right_ts] <= l[left_ts]), "left")
    order = [F.desc_nulls_last(right_ts)] + [
        F.desc_nulls_last(c) for c in (tiebreak or [])
    ]
    w = Window.partitionBy("__lid").orderBy(*order)
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__lid")
        .drop(r[on])
    )
    if right_ts not in right_cols:
        out = out.drop(r[right_ts])
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """merge_asof form: cogroup per key, sort, pd.merge_asof (backward).
    Same semantics as ``asof_join`` up to tie handling (merge_asof keeps
    the last right row in sort order at equal timestamps); per-key data
    must fit one worker. ``right_cols`` must not contain ``right_ts``."""
    lfields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    rmap = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_schema = ", ".join(lfields + [f"{c} {rmap[c]}" for c in right_cols])
    rsel = right.select(on, right_ts, *right_cols)
    lcols = [f.name for f in left.schema.fields]

    def kernel(l_pdf, r_pdf):
        import pandas as _pd

        l_sorted = l_pdf.sort_values(left_ts)
        if len(r_pdf) == 0:
            for c in right_cols:
                l_sorted[c] = None
            return l_sorted[lcols + right_cols]
        r_sorted = r_pdf.sort_values(right_ts)[[right_ts, *right_cols]]
        merged = _pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            suffixes=("", "__r"),
        )
        return merged[lcols + right_cols]

    return left.groupBy(on).cogroup(rsel.groupBy(on)).applyInPandas(kernel, out_schema)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """Exact as-of join with BOUNDED fan-out — the 100 TB form.

    The plain composition joins every left row to its key's whole right
    history. Here each left row meets only (a) rights in its own time
    bucket and (b) ONE pre-aggregated 'latest right before this bucket'
    row, so the fan-out is O(bucket density), independent of history
    length. The prev-latest is computed by threading marker rows for the
    left buckets through a running ``max(struct)`` window per key —
    markers sort before same-bucket rights, so each marker sees exactly
    the strictly-earlier history. Results are identical to ``asof_join``
    (asserted in tests); only the join topology changes.
    """
    from pyspark.sql.types import StructField, StructType

    B = int(bucket_seconds) * 1_000_000
    pay_cols = list(dict.fromkeys([right_ts, *tiebreak, *right_cols]))
    r = right.select(on, *pay_cols)
    pay_schema = StructType(
        [StructField(c, r.schema[c].dataType) for c in pay_cols]
    )
    pay = F.struct(*pay_cols)  # ordered: ts, tiebreaks, payload -> max = argmax

    l = (
        left.withColumn("__lid", F.monotonically_increasing_id())
        .withColumn("__lb", F.floor(F.unix_micros(F.col(left_ts).cast("timestamp")) / B))
    )
    rr = r.withColumn(
        "__rb", F.floor(F.unix_micros(F.col(right_ts).cast("timestamp")) / B)
    ).select(
        F.col(on).alias("__rk"), F.col("__rb"), pay.alias("__pay")
    )

    # (a) same-bucket candidates, fan-out bounded by bucket occupancy
    same = (
        l.join(
            rr,
            (l[on] == rr["__rk"]) & (l["__lb"] == rr["__rb"]),
            "left",
        )
        .withColumn(
            "__cand",
            F.when(F.col("__pay")[right_ts] <= F.col(left_ts), F.col("__pay")),
        )
        .select("__lid", "__cand")
    )

    # (b) latest right strictly before each needed bucket: markers (flag 0)
    # sort before same-bucket rights (flag 1) in the running-max window
    markers = (
        l.select(F.col(on).alias("__rk"), F.col("__lb").alias("__rb"))
        .distinct()
        .withColumn("__flag", F.lit(0))
        .withColumn("__pay", F.lit(None).cast(pay_schema))
    )
    rights_flagged = rr.withColumn("__flag", F.lit(1))
    w = (
        Window.partitionBy("__rk")
        .orderBy("__rb", "__flag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = (
        markers.unionByName(rights_flagged)
        .withColumn("__run", F.max("__pay").over(w))
        .filter(F.col("__flag") == 0)
        .select("__rk", "__rb", F.col("__run").alias("__cand"))
    )
    via_prev = l.join(
        prev, (l[on] == prev["__rk"]) & (l["__lb"] == prev["__rb"]), "left"
    ).select("__lid", "__cand")

    best = (
        same.unionByName(via_prev)
        .groupBy("__lid")
        .agg(F.max("__cand").alias("__best"))
    )
    out = l.join(best, "__lid", "left")
    for c in pay_cols:
        if c in right_cols:
            out = out.withColumn(c, F.col("__best")[c])
    return out.drop("__lid", "__lb", "__best")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
) -> DataFrame:
    """All (left, right) pairs on the same key with
    ``left_ts + lower <= right_ts <= left_ts + upper`` — the interval
    join. Declared as equi-join + range predicates: the pairs are
    co-partitioned by the key and the range evaluates as a post-join
    filter. At scale, bucketize the time axis into extra equi keys to
    bound the per-key fan-out."""
    cond = (
        (left[on] == right[on])
        & (right[right_ts] >= left[left_ts] + lower)
        & (right[right_ts] <= left[left_ts] + upper)
    )
    return left.join(right, cond, "inner").drop(right[on])


def interval_coverage_days(
    df: DataFrame,
    key: str,
    start_day: Column,
    n_days: Column,
    max_days: int = 366,
) -> DataFrame:
    """Merge overlapping day-grain intervals per key and report the
    union: covered-day count, island (maximal merged run) count, first
    and last covered day — the gaps-and-islands union as a BOUNDARY
    SWEEP, not a day-grain explode and not the classic per-key
    ordered-row window (which puts one key's whole interval HISTORY on
    one reducer; per-key rows grow with SF).

    Shape: each interval emits exactly TWO delta rows — (+1 at start,
    -1 one past its end, ends clamped by ``max_days``: a visible cap,
    not a silent one) — which a (key, day) groupBy collapses to at most
    2x the distinct boundary days per key.  A per-key window ordered by
    the DAY axis (bounded by construction: calendar days, ~3k per
    decade — the q_drift_weekly contract) turns the running delta sum
    into coverage: between consecutive boundaries b_i < b_{i+1} the
    union covers b_{i+1}-b_i days iff the running count after b_i is
    positive, and an island starts wherever the count steps 0 -> +.
    One map-side-combinable int-sum shuffle plus one bounded-axis
    window — the 2-rows-per-interval sweep is SF-proof where the old
    day-grain explode (O(days) rows per interval, three recomputed
    consumers) was the sf0.1 bench tail.  Days are integer epoch days
    (``datediff`` from 1970-01-01) so the output is timezone-proof.
    """
    d0 = F.datediff(start_day, F.lit("1970-01-01"))
    dlen = F.least(n_days.cast("int"), F.lit(int(max_days)))
    deltas = df.select(
        F.col(key),
        F.explode(
            F.array(
                F.struct(d0.alias("__day"), F.lit(1).alias("__delta")),
                F.struct(
                    (d0 + dlen + 1).alias("__day"),
                    F.lit(-1).alias("__delta"),
                ),
            )
        ).alias("__b"),
    ).select(key, "__b.__day", "__b.__delta")
    bounds = deltas.groupBy(key, "__day").agg(
        F.sum("__delta").alias("__delta")
    )
    w = Window.partitionBy(key).orderBy("__day")
    run = F.sum("__delta").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = bounds.select(
        F.col(key),
        F.col("__day"),
        F.col("__delta"),
        run.alias("__run"),
        F.lead("__day").over(w).alias("__next"),
    ).withColumn("__prevrun", F.col("__run") - F.col("__delta"))
    return swept.groupBy(key).agg(
        F.sum(
            F.when(
                F.col("__run") > 0, F.col("__next") - F.col("__day")
            ).otherwise(F.lit(0))
        ).alias("covered_days"),
        F.sum(
            F.when(
                (F.col("__run") > 0)
                & (
                    F.col("__prevrun").isNull()
                    | (F.col("__prevrun") <= 0)
                ),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_islands"),
        F.min("__day").alias("first_day"),
        (F.max("__day") - F.lit(1)).alias("last_day"),
    )


def cusum_changepoint(daily: DataFrame, day: str, cnt: str) -> DataFrame:
    """CUSUM change-point over a DAILY count series: the split day k*
    maximizing the deviation of the prefix sum from the uniform-rate
    line, |m*S_k - k*S_m|, in EXACT integer arithmetic (the per-day
    counts are integers; cross-multiplication replaces the usual
    division by m).  1-row output: m (days), total, day_star (epoch
    day, smallest attaining the max), dev_num (the integer max), and
    dev_frac = dev_num/(m*total) — the one IEEE division.

    The prefix window orders the DAY axis — bounded by construction
    (calendar days, ~3k per decade), the same contract as
    q_drift_weekly's week axis; the 1-row (m, total) frame is a
    broadcast singleton fold (allowlisted)."""
    from pyspark.sql import Window

    g = daily.select(
        F.datediff(F.col(day).cast("date"), F.lit("1970-01-01")).alias(
            "__day"
        ),
        F.col(cnt).alias("__x"),
    )
    w = Window.orderBy("__day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = g.select(
        "__day",
        F.sum("__x").over(w).alias("__s"),
        F.row_number().over(Window.orderBy("__day")).alias("__k"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("m"), F.sum("__x").alias("total")
    )
    dev = F.abs(
        F.col("m").cast("decimal(38,0)") * F.col("__s").cast("decimal(38,0)")
        - F.col("__k").cast("decimal(38,0)")
        * F.col("total").cast("decimal(38,0)")
    ).cast("decimal(38,0)")
    best = (
        pre.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.struct(dev.alias("dev"), (-F.col("__day")).alias("negd"))
            ).alias("b"),
            F.max("m").alias("m"),
            F.max("total").alias("total"),
        )
    )
    return best.select(
        "m",
        "total",
        (-F.col("b.negd")).alias("day_star"),
        F.col("b.dev").alias("dev_num"),
        (
            F.col("b.dev").cast("double")
            / (
                F.col("m").cast("decimal(38,0)")
                * F.col("total").cast("decimal(38,0)")
            ).cast("double")
        ).alias("dev_frac"),
    )


def autocorr1_daily(daily: DataFrame, day: str, cnt: str) -> DataFrame:
    """Lag-1 autocorrelation of a daily count series, sqrt-free: pairs
    (x_t, x_{t+1}) come from a self-EQUI-join on day+1 (no window at
    all), the five Pearson moments accumulate as exact DECIMAL(38,0)
    (counts are integers), and instead of r (whose denominator needs a
    sqrt) the report carries the exact integer moments plus
    ``r2 = (num/d1)*(num/d2)`` and ``r_sign`` — the same information,
    three IEEE ops on scale-0 decimal casts, bit-for-bit portable.
    1-row output: m_pairs, s_x, s_y, s_xx, s_yy, s_xy, r_num, d1, d2,
    r2, r_sign."""
    g = daily.select(
        F.datediff(F.col(day).cast("date"), F.lit("1970-01-01")).alias(
            "__day"
        ),
        F.col(cnt).alias("__x"),
    )
    nxt = g.select(
        (F.col("__day") - 1).alias("__day"), F.col("__x").alias("__y")
    )
    d38 = lambda c: F.sum(F.col(c).cast("decimal(38,0)")).cast(
        "decimal(38,0)"
    )
    pairs = g.join(nxt, "__day")
    m = pairs.agg(
        F.count(F.lit(1)).alias("m_pairs"),
        d38("__x").alias("s_x"),
        d38("__y").alias("s_y"),
        # cast BEFORE multiplying (the rank_sum_test/cusum discipline):
        # daily counts >= ~3.04e9 would wrap an int64 product and silently
        # diverge from the oracle's HUGEINT moments
        F.sum(
            F.col("__x").cast("decimal(38,0)") * F.col("__x").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("s_xx"),
        F.sum(
            F.col("__y").cast("decimal(38,0)") * F.col("__y").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("s_yy"),
        F.sum(
            F.col("__x").cast("decimal(38,0)") * F.col("__y").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("s_xy"),
    )
    mm = F.col("m_pairs").cast("decimal(38,0)")
    num = (mm * F.col("s_xy") - F.col("s_x") * F.col("s_y")).cast(
        "decimal(38,0)"
    )
    d1 = (mm * F.col("s_xx") - F.col("s_x") * F.col("s_x")).cast(
        "decimal(38,0)"
    )
    d2 = (mm * F.col("s_yy") - F.col("s_y") * F.col("s_y")).cast(
        "decimal(38,0)"
    )
    return m.select(
        "m_pairs",
        "s_x",
        "s_y",
        "s_xx",
        "s_yy",
        "s_xy",
        num.alias("r_num"),
        d1.alias("d1"),
        d2.alias("d2"),
        (
            (num.cast("double") / d1.cast("double"))
            * (num.cast("double") / d2.cast("double"))
        ).alias("r2"),
        F.signum(num.cast("double")).cast("int").alias("r_sign"),
    )


def binseg_changepoint(daily: DataFrame, day: str, cnt: str) -> DataFrame:
    """Binary-segmentation change-point over a DAILY count series: the
    split day minimizing SSE_left + SSE_right (Scott & Knott '74 — the
    first round of binary segmentation, the classical mean-shift
    locator).  :func:`cusum_changepoint` asks WHETHER the prefix mass
    deviates from the uniform line; this reports the least-squares
    BEST split and the variance it explains (``gain = sse_total −
    sse_split``), the quantity a segmentation recursion thresholds on.

    Exactness: with integer daily counts, each segment's SSE numerator
    ``n·Q − S²`` is exact DECIMAL(38,0) off cumulative (S, Q) prefix
    sums; every candidate's cost is the same fixed two-division IEEE
    sequence in any engine, so the (cost, day) struct-min argmin is
    deterministic (the gini_best_split pattern on the time axis).

    The prefix window orders the DAY axis — bounded by construction
    (calendar days, ~3k/decade; the cusum contract) — and the 1-row
    totals frame broadcasts.  1-row output: n_days, split_day (epoch
    day, smallest attaining the min), n_left, mean_left, mean_right,
    sse_split, sse_total, gain.
    """
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    g = daily.select(
        F.datediff(F.col(day).cast("date"), F.lit("1970-01-01")).alias(
            "__day"
        ),
        F.col(cnt).alias("__x"),
    )
    xd = F.col("__x").cast(d38)
    w = Window.orderBy("__day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = g.select(
        "__day",
        F.row_number().over(Window.orderBy("__day")).alias("__k"),
        F.sum(xd).over(w).cast(d38).alias("__sl"),
        F.sum(xd * xd).over(w).cast(d38).alias("__ql"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(xd).cast(d38).alias("__s"),
        F.sum(xd * xd).cast(d38).alias("__q"),
    )
    j = pre.crossJoin(F.broadcast(tot)).filter(F.col("__k") < F.col("n_days"))
    nl = F.col("__k").cast(d38)
    nr = (F.col("n_days") - F.col("__k")).cast(d38)
    sl, ql = F.col("__sl"), F.col("__ql")
    sr = (F.col("__s") - sl).cast(d38)
    qr = (F.col("__q") - ql).cast(d38)
    cost = (nl * ql - sl * sl).cast(d38).cast("double") / nl.cast("double") + (
        nr * qr - sr * sr
    ).cast(d38).cast("double") / nr.cast("double")
    scored = j.select(
        F.struct(
            cost.alias("sse_split"),
            F.col("__day").alias("split_day"),
            F.col("__k").alias("n_left"),
            (sl.cast("double") / nl.cast("double")).alias("mean_left"),
            (sr.cast("double") / nr.cast("double")).alias("mean_right"),
            F.col("n_days"),
            (
                (F.col("n_days").cast(d38) * F.col("__q") - F.col("__s") * F.col("__s"))
                .cast(d38)
                .cast("double")
                / F.col("n_days").cast("double")
            ).alias("sse_total"),
        ).alias("__b")
    )
    # empty/degenerate input (0- or 1-day series: no __k < n_days
    # candidate) leaves agg(min(struct)) with ONE all-NULL row while
    # the oracle's ORDER BY ... LIMIT 1 returns ZERO — filter the NULL
    # struct so both engines agree (advisor finding, the
    # gini_best_split twin)
    best = scored.agg(F.min("__b").alias("b")).where(F.col("b").isNotNull())
    return best.select(
        F.col("b.n_days").alias("n_days"),
        F.col("b.split_day").alias("split_day"),
        F.col("b.n_left").alias("n_left"),
        F.col("b.mean_left").alias("mean_left"),
        F.col("b.mean_right").alias("mean_right"),
        F.col("b.sse_split").alias("sse_split"),
        F.col("b.sse_total").alias("sse_total"),
        (F.col("b.sse_total") - F.col("b.sse_split")).alias("gain"),
    )


def km_cells(
    df: DataFrame,
    group: str,
    duration: str,
    event: str,
) -> DataFrame:
    """Kaplan–Meier product-limit EVENT TABLE per group — the
    time-to-event surface (how long until a document is superseded, a
    user churns, an order ships) reported as exact integers so the
    oracle replays bit-for-bit: one row per (group, distinct duration)
    with the at-risk count, events and censorings AT that time.

    The survival curve itself is S(t) = prod_{u<=t} (1 - d_u/n_u) — a
    cumulative FLOAT product whose per-group evaluation order two
    engines may round differently, so (like the chi2 scalar in
    :func:`~npm_mirror_spark.operators.checks.chisq_independence_cells`)
    it is deliberately left as a consumer one-liner over this bounded
    table; every emitted number here is an exact integer.

    Semantics: ``event`` is 0/1 (1 = the event happened at
    ``duration``, 0 = censored at ``duration``); rows with NULL
    group/duration/event are dropped.  n_risk(t) = subjects with
    duration >= t = group total minus all subjects with duration < t —
    a strictly-prior cumulative over the per-group distinct-duration
    axis (window PARTITIONED BY group over distinct durations — the
    :func:`~npm_mirror_spark.operators.stats.brown_forsythe_cells`
    bounded-by-domain contract: duration axes are days/weeks, not raw
    floats).

    Output: group, t (the duration value), n_risk, d (events), c
    (censored) — ordered by (group, t).
    """
    # contract guard (the cochran_q_cells pattern): an event value
    # outside {0,1} silently corrupts the censored count c = sum(1-e).
    # Validated on the DOUBLE view, before the int cast — a float 0.9
    # truncates to 0 and would sail through an after-cast check
    ed = F.col(event).cast("double")
    e = F.when(
        ed.isNotNull() & ~ed.isin(0.0, 1.0),
        F.raise_error(
            F.concat(
                F.lit(f"km_cells: {event} must be 0/1, got "),
                ed.cast("string"),
            )
        ).cast("int"),
    ).otherwise(ed.cast("int"))
    g = df.select(
        F.col(group).alias("__g"),
        F.col(duration).alias("__t"),
        e.alias("__e"),
    ).filter(
        F.col("__g").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__e").isNotNull()
    )
    per_t = g.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__e").alias("d"),
        F.sum(F.lit(1) - F.col("__e")).alias("c"),
    )
    w = Window.partitionBy("__g").orderBy("__t")
    prior = F.coalesce(
        F.sum("__n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    total = F.sum("__n").over(Window.partitionBy("__g"))
    return per_t.select(
        F.col("__g").alias(group),
        F.col("__t").alias("t"),
        (total - prior).alias("n_risk"),
        "d",
        "c",
    ).orderBy(group, "t")


def logrank_cells(
    df: DataFrame,
    group: str,
    duration: str,
    event: str,
    in_a: Column,
) -> DataFrame:
    """Log-rank test decomposition between the rows where ``in_a``
    holds (arm A) and the rest — the hypothesis-test companion to
    :func:`km_cells` (are two survival curves the same?), reported PER
    DISTINCT EVENT TIME in the cells style: the chi-square
    (Σ o_minus_e_a)² / (Σ var_term) is a one-liner derivation, and the
    two sums are the only ops this face refuses to perform (a float Σ
    over data-dependent time order is the cross-engine trap; every
    emitted column is either an exact integer or ONE fixed IEEE
    sequence on exact-int-valued doubles — the q_kappa contract).

    Standard Mantel–Haenszel/log-rank arithmetic per event time t:
    o_minus_e_a = d_a − n_a·d/n (observed minus expected arm-A events
    under the null), var_term = d·(n_a/n)·(1 − n_a/n)·(n − d)/(n − 1)
    (hypergeometric variance; 0 when n = 1).  Censored rows leave the
    risk sets between event times but contribute no row of their own
    (rows with d = 0 are omitted — they add 0 to both sums).

    NULL handling follows :func:`~npm_mirror_spark.operators.stats.welch_t`:
    the ``in_a`` predicate is coalesced to FALSE (three-valued-false →
    arm B); NULL duration/event rows are dropped; ``event`` rides the
    same 0/1 staged-raise guard as km_cells.  ``group`` is carried
    through untouched so one call prices many strata (per-group curves
    compare within the group).

    Shape: one per-(group, t) collapse + the bounded strictly-prior
    window of km_cells, twice (once per arm, fused into one grouped
    fold) — output bounded by |groups| × |distinct durations|.

    Output: group, t, n, d, n_a, d_a, o_minus_e_a, var_term.
    """
    ed0 = F.col(event).cast("double")
    e = F.when(
        ed0.isNotNull() & ~ed0.isin(0.0, 1.0),
        F.raise_error(
            F.concat(
                F.lit(f"logrank_cells: {event} must be 0/1, got "),
                ed0.cast("string"),
            )
        ).cast("int"),
    ).otherwise(ed0.cast("int"))
    g = df.select(
        F.col(group).alias("__g"),
        F.col(duration).alias("__t"),
        e.alias("__e"),
        F.coalesce(in_a, F.lit(False)).alias("__a"),
    ).filter(
        F.col("__g").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__e").isNotNull()
    )
    per_t = g.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__e").alias("__d"),
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("__na"),
        F.sum(F.when(F.col("__a"), F.col("__e")).otherwise(0)).alias("__da"),
    )
    w = Window.partitionBy("__g").orderBy("__t")
    prior_n = F.coalesce(
        F.sum("__n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    prior_na = F.coalesce(
        F.sum("__na").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    tot = Window.partitionBy("__g")
    risk = per_t.select(
        "__g",
        "__t",
        "__d",
        "__da",
        (F.sum("__n").over(tot) - prior_n).alias("__nr"),
        (F.sum("__na").over(tot) - prior_na).alias("__nra"),
    ).where(F.col("__d") > 0)
    nrd = F.col("__nr").cast("double")
    nrad = F.col("__nra").cast("double")
    dd = F.col("__d").cast("double")
    frac_a = nrad / nrd
    return risk.select(
        F.col("__g").alias(group),
        F.col("__t").alias("t"),
        F.col("__nr").alias("n"),
        F.col("__d").alias("d"),
        F.col("__nra").alias("n_a"),
        F.col("__da").alias("d_a"),
        (F.col("__da").cast("double") - nrad * dd / nrd).alias("o_minus_e_a"),
        F.when(
            F.col("__nr") > 1,
            dd
            * frac_a
            * (F.lit(1.0) - frac_a)
            * (nrd - dd)
            / (nrd - F.lit(1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("var_term"),
    ).orderBy(group, "t")


def pettitt_cells(daily: DataFrame, day: str, value: str) -> DataFrame:
    """Pettitt (1979) rank-based changepoint cells over a per-day
    series — the NONPARAMETRIC companion to :func:`binseg_changepoint`
    (binseg minimizes SSE and is mean/outlier-sensitive; Pettitt is a
    Mann-Whitney-style shift test, distribution-free): for every
    prospective split day t, U_t = Sigma_{i<=t} Sigma_{j>t}
    sgn(x_i - x_j).  The change point is argmax |U_t| and
    K = max |U_t| feeds the classical p approximation — both consumer
    one-liners over this bounded table (every emitted number is an
    exact integer, so even the sums a consumer might take are
    order-independent).

    NOT the O(days^2) pair join the definition suggests: by the
    identity U_t = U_{t-1} + V_t with V_t = Sigma_j sgn(x_t - x_j) =
    2*below(x_t) + ties(x_t) - n, the whole decomposition is one
    per-value collapse + two bounded prefix windows (value axis, then
    day axis) — the same bounded-axis windowing contract as
    :func:`~npm_mirror_spark.operators.stats.mann_kendall_daily`, with
    no non-equi join at all.  Rows with NULL day/value are dropped.

    Output per day: day, n_days, u_t (exact integers; u at the last
    day is 0 by construction — the suffix set is empty).
    """
    g = daily.select(
        F.col(day).alias("__d"), F.col(value).alias("__x")
    ).filter(F.col("__d").isNotNull() & F.col("__x").isNotNull())
    vc = g.groupBy("__x").agg(F.count(F.lit(1)).alias("__cd"))
    wv = Window.orderBy("__x")
    pri = vc.select(
        "__x",
        "__cd",
        F.coalesce(
            F.sum("__cd").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__below"),
        F.sum("__cd")
        .over(
            wv.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__n"),
    )
    v = pri.select(
        "__x",
        (F.lit(2) * F.col("__below") + F.col("__cd") - F.col("__n")).alias(
            "__v"
        ),
        "__n",
    )
    wd = Window.orderBy("__d")
    return (
        g.join(v, "__x")
        .select(
            F.col("__d").alias(day),
            F.col("__n").alias("n_days"),
            F.sum("__v")
            .over(wd.rowsBetween(Window.unboundedPreceding, 0))
            .alias("u_t"),
        )
        .orderBy(day)
    )


def aalen_johansen_cells(
    df: DataFrame,
    group: str,
    duration: str,
    event: str,
    cause: str,
) -> DataFrame:
    """Aalen–Johansen competing-risks event table, reported PER
    (group, event time, cause) — the third member of the survival tier
    (:func:`km_cells` one-cause curves, :func:`logrank_cells` two-arm
    comparison, this one CAUSE-SPECIFIC incidence): when a subject can
    exit for more than one reason, per-cause Kaplan–Meier curves
    overestimate every cause's incidence (they censor the competing
    events away); the Aalen–Johansen estimator needs exactly these
    cells — the shared risk set plus per-cause event counts.

    Semantics: ``event`` is 0/1 with the km_cells staged-raise guard
    (validated on the double view before the int cast); ``cause`` is
    read ONLY on event rows (its value on censored rows is ignored,
    so callers need not blank it); rows with NULL
    group/duration/event — or an event row with NULL cause — are
    dropped.  Rows are emitted only for (group, t, cause) with
    d_cause > 0; censor-only times leave the risk set between event
    times without a row of their own (the logrank_cells convention —
    they contribute nothing to any cause's increment).

    Output per (group, t, cause): group, t, cause, d_cause, d (all
    causes at t), c (censored at t), n_risk — every column an exact
    integer.  The cumulative incidence
    CIF_k(t) = Sigma_{s<=t} S(s-) * d_k(s)/n_risk(s) with S the
    all-cause KM survival is the consumer derivation this face refuses
    (a float product-sum over data-dependent time order — the same
    cross-engine trap km_cells documents); Sigma_k d_cause = d per
    (group, t) is the structural identity tests pin.

    Shape: one per-(group, t) collapse + the bounded strictly-prior
    km window, one per-(group, t, cause) collapse, one (group, t)
    equi join — output bounded by |groups| x |distinct durations| x
    |causes|.
    """
    ed = F.col(event).cast("double")
    e = F.when(
        ed.isNotNull() & ~ed.isin(0.0, 1.0),
        F.raise_error(
            F.concat(
                F.lit(f"aalen_johansen_cells: {event} must be 0/1, got "),
                ed.cast("string"),
            )
        ).cast("int"),
    ).otherwise(ed.cast("int"))
    g = df.select(
        F.col(group).alias("__g"),
        F.col(duration).alias("__t"),
        e.alias("__e"),
        F.col(cause).alias("__k"),
    ).filter(
        F.col("__g").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__e").isNotNull()
        & ((F.col("__e") == 0) | F.col("__k").isNotNull())
    )
    per_t = g.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__e").alias("__d"),
        F.sum(F.lit(1) - F.col("__e")).alias("__c"),
    )
    w = Window.partitionBy("__g").orderBy("__t")
    prior = F.coalesce(
        F.sum("__n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    total = F.sum("__n").over(Window.partitionBy("__g"))
    risk = per_t.select(
        "__g",
        "__t",
        "__d",
        "__c",
        (total - prior).alias("__nr"),
    )
    per_cause = (
        g.where(F.col("__e") == 1)
        .groupBy("__g", "__t", "__k")
        .agg(F.count(F.lit(1)).alias("__dk"))
    )
    return (
        per_cause.join(risk, ["__g", "__t"])
        .select(
            F.col("__g").alias(group),
            F.col("__t").alias("t"),
            F.col("__k").alias(cause),
            F.col("__dk").alias("d_cause"),
            F.col("__d").alias("d"),
            F.col("__c").alias("c"),
            F.col("__nr").alias("n_risk"),
        )
        .orderBy(group, "t", cause)
    )


def nelson_aalen_cells(
    df: DataFrame,
    group: str,
    duration: str,
    event: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard EVENT TABLE per group — the
    hazard-scale sibling of :func:`km_cells` (KM estimates survival
    S(t) multiplicatively; Nelson–Aalen estimates the cumulative hazard
    H(t) = Sigma_{u<=t} d_u/n_u additively, the preferred estimator
    when curves are later smoothed or compared on the hazard scale).

    Built ON km_cells (same risk-set windowing, same 0/1 staged-raise
    guard and NULL handling), restricted to event times (d > 0 — a
    censor-only time adds 0 to every sum), with two per-row derived
    columns, each ONE fixed IEEE division on exact integers (the
    q_kappa contract): ``na_term`` = d/n_risk (the hazard increment)
    and ``var_term`` = d*(n_risk - d)/n_risk^3 (the standard
    counting-process variance increment, Klein & Moeschberger form).
    The cumulative sums H(t) and Var(H(t)) are float Sigmas over
    data-dependent time order — refused to consumers exactly as
    km_cells refuses S(t).

    Output per (group, event time): group, t, n_risk, d, c, na_term,
    var_term — ordered by (group, t).
    """
    base = km_cells(df, group, duration, event).where(F.col("d") > 0)
    nr = F.col("n_risk").cast("double")
    dd = F.col("d").cast("double")
    return base.select(
        group,
        "t",
        "n_risk",
        "d",
        "c",
        (dd / nr).alias("na_term"),
        (dd * (nr - dd) / (nr * nr * nr)).alias("var_term"),
    ).orderBy(group, "t")


def gehan_cells(
    df: DataFrame,
    group: str,
    duration: str,
    event: str,
    in_a: Column,
) -> DataFrame:
    """Gehan–Breslow–Wilcoxon cells: the n-weighted log-rank — weights
    each event time by the at-risk count, so EARLY survival differences
    dominate (the classic complement to :func:`logrank_cells`, which
    weights all times equally and is most sensitive to LATE,
    proportional-hazards differences; run both and compare).

    The weighting buys back exactness the plain log-rank loses: the
    weighted observed-minus-expected per time is
    ``w_o_minus_e_a = n*d_a - n_a*d`` — integer-valued (the n weight
    cancels the d/n division), so the statistic's numerator
    Sigma w_o_minus_e_a is order-independent in any engine while the
    double-cast values stay below 2^53 (the driver-hashable contract
    forces the cast; n*d products past ~9e15 would reintroduce IEEE
    rounding into consumer sums).  The
    weighted variance term keeps one division:
    ``w2_var_term = n^2 * var_term = d*n_a*(n-n_a)*(n-d)/(n-1)``
    (0 when n = 1) — exact-integer numerator, ONE IEEE division.
    Chi-square = (Sigma w_o_minus_e_a)^2 / Sigma w2_var_term stays a
    consumer one-liner (the float Sigma of w2_var_term is the only
    refused op; the integer Sigma of w_o_minus_e_a is safe anywhere).

    Same semantics as logrank_cells: ``in_a`` coalesced to FALSE, NULL
    group/duration/event dropped, ``event`` 0/1 staged-raise-guarded,
    rows emitted only at event times (d > 0), ``group`` carried through
    as strata.

    Output: group, t, n, d, n_a, d_a, w_o_minus_e_a (exact int),
    w2_var_term — ordered by (group, t).
    """
    ed0 = F.col(event).cast("double")
    e = F.when(
        ed0.isNotNull() & ~ed0.isin(0.0, 1.0),
        F.raise_error(
            F.concat(
                F.lit(f"gehan_cells: {event} must be 0/1, got "),
                ed0.cast("string"),
            )
        ).cast("int"),
    ).otherwise(ed0.cast("int"))
    g = df.select(
        F.col(group).alias("__g"),
        F.col(duration).alias("__t"),
        e.alias("__e"),
        F.coalesce(in_a, F.lit(False)).alias("__a"),
    ).filter(
        F.col("__g").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__e").isNotNull()
    )
    per_t = g.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__e").alias("__d"),
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("__na"),
        F.sum(F.when(F.col("__a"), F.col("__e")).otherwise(0)).alias("__da"),
    )
    w = Window.partitionBy("__g").orderBy("__t")
    prior_n = F.coalesce(
        F.sum("__n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    prior_na = F.coalesce(
        F.sum("__na").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    tot = Window.partitionBy("__g")
    risk = per_t.select(
        "__g",
        "__t",
        "__d",
        "__da",
        (F.sum("__n").over(tot) - prior_n).alias("__nr"),
        (F.sum("__na").over(tot) - prior_na).alias("__nra"),
    ).where(F.col("__d") > 0)
    d38 = "decimal(38,0)"
    nr, nra = F.col("__nr"), F.col("__nra")
    d, da = F.col("__d"), F.col("__da")
    # exact: n*d_a - n_a*d (per-term decimal casts before the subtract —
    # the rank_sum_test overflow discipline)
    w_ome = (nr.cast(d38) * da.cast(d38) - nra.cast(d38) * d.cast(d38)).cast(
        d38
    )
    var_num = (
        d.cast(d38) * nra.cast(d38) * (nr - nra).cast(d38) * (nr - d).cast(d38)
    ).cast(d38)
    return risk.select(
        F.col("__g").alias(group),
        F.col("__t").alias("t"),
        nr.alias("n"),
        d.alias("d"),
        nra.alias("n_a"),
        da.alias("d_a"),
        w_ome.cast("double").alias("w_o_minus_e_a"),
        F.when(
            nr > 1,
            var_num.cast("double") / (nr - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("w2_var_term"),
    ).orderBy(group, "t")


def cox_stuart_cells(daily: DataFrame, day: str, value: str) -> DataFrame:
    """Cox–Stuart trend test cells over a per-day series — the sign
    test applied to (first half, second half) pairs (Cox & Stuart
    1955): pair day i with day i + h (h = floor(n/2); the middle day
    of an odd-length series is unpaired), count pairs where the later
    value is higher/lower/tied.  The distribution-free "is the series
    drifting at all" gate that is cheaper and blunter than
    :func:`~npm_mirror_spark.operators.stats.mann_kendall_daily` (MK
    weighs ALL O(n^2) pairs; Cox–Stuart only the n/2 half-spaced ones).

    Shape — caller contract: ``daily`` must already hold ONE
    (day, value) row per day (pre-collapse with a groupBy; duplicate
    day rows are not detected here and would shift the half-pairing).
    Index the bounded day axis with a row_number (unpartitioned window
    over ~3k rows — the pettitt_cells bounded-axis contract), then ONE
    equi self-join on ``idx = idx + h`` — no non-equi join, no BNLJ.
    NULL day/value rows are dropped.

    1-row output: n_days, n_pairs, n_pos (later > earlier), n_neg,
    n_tie, pos_share (= n_pos / n_pairs when pairs exist — ONE IEEE
    division; the sign-test S = min(n_pos, n_neg) and its binomial
    p-value stay consumer one-liners).
    """
    g = daily.select(
        F.col(day).alias("__d"), F.col(value).alias("__x")
    ).filter(F.col("__d").isNotNull() & F.col("__x").isNotNull())
    idx = g.select(
        "__d",
        "__x",
        F.row_number().over(Window.orderBy("__d")).alias("__i"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__n"),
    )
    h = F.floor(F.col("__n") / 2).cast("int")
    first = idx.select(
        F.col("__i").alias("__ia"),
        F.col("__x").alias("__xa"),
        h.alias("__h"),
        F.col("__n").alias("__na"),
    ).where(F.col("__ia") <= F.col("__h"))
    second = idx.select(
        (F.col("__i") - (F.col("__n") - h)).alias("__ib"),
        F.col("__x").alias("__xb"),
    ).where(F.col("__ib") >= 1)
    pairs = first.join(second, first["__ia"] == second["__ib"])
    return pairs.agg(
        F.max("__na").alias("n_days"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("__xb") > F.col("__xa"), 1).otherwise(0)).alias(
            "n_pos"
        ),
        F.sum(F.when(F.col("__xb") < F.col("__xa"), 1).otherwise(0)).alias(
            "n_neg"
        ),
        F.sum(F.when(F.col("__xb") == F.col("__xa"), 1).otherwise(0)).alias(
            "n_tie"
        ),
    ).select(
        "n_days",
        "n_pairs",
        "n_pos",
        "n_neg",
        "n_tie",
        F.when(
            F.col("n_pairs") > 0,
            F.col("n_pos").cast("double") / F.col("n_pairs").cast("double"),
        ).alias("pos_share"),
    )


def seasonal_mk_cells(
    daily: DataFrame, day: str, value: str, season: Column | None = None
) -> DataFrame:
    """Seasonal Mann–Kendall cells (Hirsch–Slack): the MK trend
    statistic computed WITHIN each season and reported per season —
    the deseasonalized trend audit for series where a raw
    :func:`~npm_mirror_spark.operators.stats.mann_kendall_daily` would
    read the seasonal cycle itself as trend (weekday traffic dips,
    month-end batch spikes).  Cross-season pairs are never compared;
    the overall statistic S' = Sigma_m S_m is an integer Sigma over
    this bounded table — order-independent, left to consumers with the
    per-season variance pieces they need.

    ``season`` defaults to day-of-week (``dayofweek`` — 7 seasons);
    pass any bounded categorical Column over the day for months etc.

    Shape — caller contract: ``daily`` must already hold ONE
    (day, value) row per day (pre-collapse with a groupBy; this
    operator does NOT dedupe, and duplicate day rows would silently
    inflate per-season pair counts).  On that frame it runs the
    mann_kendall_daily wedge PER SEASON: self-join with an EQUI key on
    season plus the in-season ``day_b > day_a`` residual — a hash join
    on season, never a cartesian; pair count per season is bounded by
    the per-season day-axis (the q_drift_weekly contract).  NULL
    day/value rows are dropped.

    Output per season: season, n_days, n_pairs, s_stat, n_concordant,
    n_discordant, n_ties — all exact integers, ordered by season.
    """
    s = season if season is not None else F.dayofweek(F.col(day))
    g = (
        daily.select(
            s.alias("__s"),
            F.col(day).alias("__d"),
            F.col(value).alias("__x"),
        )
        .filter(
            F.col("__s").isNotNull()
            & F.col("__d").isNotNull()
            & F.col("__x").isNotNull()
        )
    )
    a = g.select(
        F.col("__s").alias("__sa"),
        F.col("__d").alias("__da"),
        F.col("__x").alias("__xa"),
    )
    b = g.select(
        F.col("__s").alias("__sb"),
        F.col("__d").alias("__db"),
        F.col("__x").alias("__xb"),
    )
    pairs = a.join(
        b, (F.col("__sa") == F.col("__sb")) & (F.col("__db") > F.col("__da"))
    )
    per_season = pairs.groupBy(F.col("__sa").alias("season")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("__xb") > F.col("__xa"), 1).otherwise(0)).alias(
            "n_concordant"
        ),
        F.sum(F.when(F.col("__xb") < F.col("__xa"), 1).otherwise(0)).alias(
            "n_discordant"
        ),
        F.sum(F.when(F.col("__xb") == F.col("__xa"), 1).otherwise(0)).alias(
            "n_ties"
        ),
    )
    days = g.groupBy(F.col("__s").alias("season")).agg(
        F.count(F.lit(1)).alias("n_days")
    )
    return (
        days.join(per_season, "season", "left")
        .select(
            "season",
            "n_days",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            (
                F.coalesce("n_concordant", F.lit(0))
                - F.coalesce("n_discordant", F.lit(0))
            ).alias("s_stat"),
            F.coalesce("n_concordant", F.lit(0)).alias("n_concordant"),
            F.coalesce("n_discordant", F.lit(0)).alias("n_discordant"),
            F.coalesce("n_ties", F.lit(0)).alias("n_ties"),
        )
        .orderBy("season")
    )


def buishand_cells(daily: DataFrame, day: str, value: str) -> DataFrame:
    """Buishand range-test cells over a per-day INTEGER series: the
    adjusted partial sums S_k = Sigma_{i<=k} (x_i - xbar), k = 1..n,
    reported n-SCALED so every number stays an exact integer —
    ``n * S_k = n * P_k - k * T`` with P_k the prefix sum and T the
    series total (the mean never materializes as a float).  The
    homogeneity verdict R/sqrt(n) = (max_k S_k - min_k S_k)/(sd *
    sqrt(n)) is the consumer one-liner this table refuses (sd is a
    cross-row float), but max/min of the exact scaled sums — the
    change-point location — is order-independent and safe anywhere.

    The mean-level companion to :func:`pettitt_cells` (rank-based) and
    :func:`binseg_changepoint` (SSE-based): Buishand is the classical
    fixed-break homogeneity test on the ORIGINAL scale, most sensitive
    to a single mean shift mid-series.

    Shape — caller contract: ``daily`` must already hold ONE
    (day, value) row per day (pre-collapse with a groupBy; duplicate
    day rows are not detected here and would corrupt the prefix sums).
    Then two bounded prefix windows over the day axis (the
    pettitt_cells contract: the axis is calendar days, ~3k/decade).
    NULL day/value rows are dropped.

    Output per day: day, k (1-based index), x (the value), p_k,
    n_days, total, n_sk_scaled (all exact integers), ordered by day.
    """
    d38 = "decimal(38,0)"
    g = daily.select(
        F.col(day).alias("__d"), F.col(value).alias("__x")
    ).filter(F.col("__d").isNotNull() & F.col("__x").isNotNull())
    wd = Window.orderBy("__d")
    pre = g.select(
        "__d",
        "__x",
        F.row_number().over(wd).alias("k"),
        F.sum("__x").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "p_k"
        ),
        F.count(F.lit(1))
        .over(
            wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("n_days"),
        F.sum("__x")
        .over(
            wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("total"),
    )
    return pre.select(
        F.col("__d").alias(day),
        "k",
        F.col("__x").alias("x"),
        "p_k",
        "n_days",
        "total",
        (
            F.col("n_days").cast(d38) * F.col("p_k").cast(d38)
            - F.col("k").cast(d38) * F.col("total").cast(d38)
        )
        .cast(d38)
        .cast("double")
        .alias("n_sk_scaled"),
    ).orderBy(day)


def turning_point_cells(daily: DataFrame, day: str, value: str) -> DataFrame:
    """Turning-point randomness cells over a per-day series: how many
    interior days are a strict local max or min?  A series with trend
    turns too RARELY, an oscillating/seasonal one too OFTEN — the
    third independence lens next to the registered q_runs_test
    (sign-of-deviation runs) and q_autocorr (linear lag dependence);
    turning points see non-monotone structure both of those miss.

    Convention pinned for the oracle: a turning point needs BOTH
    strict inequalities (x_{i-1} < x_i > x_{i+1} or the mirror); any
    tie with a neighbor disqualifies the day (the conservative classic
    convention).  Under H0 (exchangeable, tie-free) E[T] = 2(n-2)/3 —
    reported as one fixed IEEE division; the variance (16n-29)/90 and
    the z stay consumer one-liners.

    Shape: one (day, value) collapse + ONE lag/lead window over the
    bounded day axis (the pettitt_cells contract) + a 1-row fold.
    NULL day/value rows are dropped.

    1-row output: n_days, n_interior, n_turning, expected_turning,
    turning_rate (= n_turning/n_interior when interior days exist).
    """
    g = daily.select(
        F.col(day).alias("__d"), F.col(value).alias("__x")
    ).filter(F.col("__d").isNotNull() & F.col("__x").isNotNull())
    wd = Window.orderBy("__d")
    tri = g.select(
        "__x",
        F.lag("__x").over(wd).alias("__prev"),
        F.lead("__x").over(wd).alias("__next"),
    )
    is_turn = (
        F.col("__prev").isNotNull()
        & F.col("__next").isNotNull()
        & (
            ((F.col("__prev") < F.col("__x")) & (F.col("__next") < F.col("__x")))
            | ((F.col("__prev") > F.col("__x")) & (F.col("__next") > F.col("__x")))
        )
    )
    agg = tri.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            (F.col("__prev").isNotNull() & F.col("__next").isNotNull()).cast(
                "long"
            )
        ).alias("n_interior"),
        F.sum(is_turn.cast("long")).alias("n_turning"),
    )
    return agg.select(
        "n_days",
        "n_interior",
        "n_turning",
        F.when(
            F.col("n_days") >= 2,
            F.lit(2.0)
            * (F.col("n_days") - 2).cast("double")
            / F.lit(3.0),
        ).alias("expected_turning"),
        F.when(
            F.col("n_interior") > 0,
            F.col("n_turning").cast("double")
            / F.col("n_interior").cast("double"),
        ).alias("turning_rate"),
    )


def bartels_rvn_cells(daily: DataFrame, day: str, value: str) -> DataFrame:
    """Bartels' rank von Neumann ratio cells over a per-day series —
    the RANK (outlier-proof) version of the registered q_durbin_watson
    lag-1 independence test (Bartels 1982): successive-difference mass
    on the ranks instead of the raw values, so one spike day cannot
    dominate the statistic.

    Exactness via DOUBLED MIDRANKS (the rank_sum_test identity): with
    2r_i integer, the mean doubled rank is exactly n + 1, so both
    sums are exact integers —

        nm_x4 = Sigma_{i<n} (2r_i - 2r_{i+1})^2
        d_x4  = Sigma_i     (2r_i - (n+1))^2

    and rvn = nm_x4 / d_x4 is ONE IEEE division (the x4 scaling
    cancels; under H0 E[rvn] = 2, trend pushes it below, oscillation
    above).  d_x4 = 0 (all values tied) yields NULL.

    Shape: one value-axis collapse for midranks (the pettitt_cells
    bounded prefix window) + an equi join back to the day rows + one
    lead window over the bounded day axis + a 1-row fold.  NULL
    day/value rows are dropped; per-term products go through
    DECIMAL(38,0) before summing (the rank_sum_test discipline).

    1-row output: n_days, nm_x4, d_x4, rvn.
    """
    d38 = "decimal(38,0)"
    g = daily.select(
        F.col(day).alias("__d"), F.col(value).alias("__x")
    ).filter(F.col("__d").isNotNull() & F.col("__x").isNotNull())
    vc = g.groupBy("__x").agg(F.count(F.lit(1)).alias("__cd"))
    wv = Window.orderBy("__x")
    mr = vc.select(
        "__x",
        (
            F.lit(2)
            * F.coalesce(
                F.sum("__cd").over(
                    wv.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + F.col("__cd")
            + F.lit(1)
        ).alias("__mr2"),
    )
    wd = Window.orderBy("__d")
    seq = (
        g.join(mr, "__x")
        .select(
            "__d",
            "__mr2",
            F.lead("__mr2").over(wd).alias("__next2"),
            F.count(F.lit(1))
            .over(
                wd.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("__n"),
        )
    )
    diff = (F.col("__mr2") - F.col("__next2")).cast(d38)
    dev = (F.col("__mr2") - (F.col("__n") + 1)).cast(d38)
    agg = seq.agg(
        F.max("__n").alias("n_days"),
        F.sum(F.when(F.col("__next2").isNotNull(), diff * diff)).cast(d38).alias(
            "__nm"
        ),
        F.sum(dev * dev).cast(d38).alias("__dd"),
    )
    zero = F.lit(0).cast(d38)
    nm = F.coalesce(F.col("__nm"), zero)
    dd = F.coalesce(F.col("__dd"), zero)
    return agg.select(
        "n_days",
        nm.cast("double").alias("nm_x4"),
        dd.cast("double").alias("d_x4"),
        F.when(dd > 0, nm.cast("double") / dd.cast("double")).alias("rvn"),
    )


def morans_lag_cells(
    daily: DataFrame, day: str, value: str, lag_days: int = 7
) -> DataFrame:
    """Moran's I / Geary's C cells at a fixed day lag — the
    WEIGHT-STRUCTURE autocorrelation pair (Moran 1950, Geary 1954)
    specialized to the "neighbor = ``lag_days`` apart" graph: at
    ``lag_days=7`` it asks "does this weekday's volume co-move with the
    SAME weekday one week over?", the seasonal-memory question
    :func:`seasonal_mk_cells` (within-season trend) and the registered
    lag-1 q_autocorr / q_durbin_watson (adjacent-day memory) both
    leave open.

    Exactness: with the 1-row (n, S1, S2) totals broadcast, each
    centered term is the exact integer ``n*x - S1``; the operator
    emits ``pair_prod_xn2 = Sigma (n*x_i - S1)(n*x_j - S1)`` over the
    lag pairs, ``sq_diff_sum = Sigma (x_j - x_i)^2`` (unscaled exact),
    and ``m2_xn = n*S2 - S1^2`` (= n * Sigma z^2 * n ... the n-scaled
    second moment), so both statistics reduce to fixed IEEE
    expressions whose scale factors cancel exactly:
    ``morans_i = pair_prod_xn2 / (n_pairs * m2_xn)`` and
    ``gearys_c = n*(n-1) * sq_diff_sum / (2 * n_pairs * m2_xn)``.

    Shape — caller contract: ``daily`` must already hold ONE
    (day, value) row per day (pre-collapse with a groupBy; duplicate
    day rows would double-count pairs).  The lag pairing is ONE equi
    self-join on ``day_b = day_a + lag_days`` over the bounded day
    axis (missing days simply contribute no pair — the graph shrinks,
    W adjusts), plus the 1-row totals broadcast.  NULL day/value rows
    are dropped.

    1-row output: n_days, lag_days, n_pairs, pair_prod_xn2,
    sq_diff_sum, m2_xn (exact-int doubles), morans_i, gearys_c (NULL
    when no pairs or zero variance).
    """
    d38 = "decimal(38,0)"
    g = daily.select(
        F.col(day).alias("__d"), F.col(value).alias("__x")
    ).filter(F.col("__d").isNotNull() & F.col("__x").isNotNull())
    x = F.col("__x").cast(d38)
    tot = g.agg(
        F.count(F.lit(1)).cast(d38).alias("__n"),
        F.sum(x).cast(d38).alias("__s1"),
        F.sum((x * x).cast(d38)).cast(d38).alias("__s2"),
    )
    a = g.select(F.col("__d").alias("__da"), F.col("__x").alias("__xa"))
    b = g.select(
        F.date_add(F.col("__d"), -lag_days).alias("__da"),
        F.col("__x").alias("__xb"),
    )
    za = F.col("__n") * F.col("__xa").cast(d38) - F.col("__s1")
    zb = F.col("__n") * F.col("__xb").cast(d38) - F.col("__s1")
    dx = F.col("__xb").cast(d38) - F.col("__xa").cast(d38)
    pairs = (
        a.join(b, on="__da", how="inner")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.coalesce(
                F.sum((za * zb).cast(d38)).cast(d38), F.lit(0).cast(d38)
            ).alias("__pp"),
            F.coalesce(
                F.sum((dx * dx).cast(d38)).cast(d38), F.lit(0).cast(d38)
            ).alias("__sd"),
        )
    )
    m2 = (F.col("__n") * F.col("__s2") - F.col("__s1") * F.col("__s1")).cast(
        d38
    )
    staged = tot.crossJoin(F.broadcast(pairs)).select(
        F.col("__n").cast("long").alias("n_days"),
        F.lit(lag_days).alias("lag_days"),
        "n_pairs",
        F.col("__pp").cast("double").alias("pair_prod_xn2"),
        F.col("__sd").cast("double").alias("sq_diff_sum"),
        m2.cast("double").alias("m2_xn"),
    )
    ok = (F.col("n_pairs") > 0) & (F.col("m2_xn") > 0)
    return staged.select(
        "n_days",
        "lag_days",
        "n_pairs",
        "pair_prod_xn2",
        "sq_diff_sum",
        "m2_xn",
        F.when(
            ok,
            F.col("pair_prod_xn2")
            / (F.col("n_pairs").cast("double") * F.col("m2_xn")),
        ).alias("morans_i"),
        F.when(
            ok,
            F.col("n_days").cast("double")
            * (F.col("n_days").cast("double") - F.lit(1.0))
            * F.col("sq_diff_sum")
            / (
                F.lit(2.0)
                * F.col("n_pairs").cast("double")
                * F.col("m2_xn")
            ),
        ).alias("gearys_c"),
    )


def pacf_cells(
    daily: DataFrame, day: str, cnt: str, lags: tuple[int, ...] = (1, 2, 3)
) -> DataFrame:
    """Autocorrelation + partial autocorrelation cells to lag 3 — the
    AR-order diagnostic beside :func:`autocorr1_daily` (which reports
    the lag-1 signal only, as a squared dodge): ACF says HOW FAR
    memory reaches, PACF says how much lag k explains once lags < k
    are regressed away (the Box–Jenkins order-picking pair).

    No sqrt anywhere: the ACF here is the covariance RATIO r_k =
    C_k / C_0 with denominators cleared to exact integers —
    ``C_k = n^2*Sigma x_a x_b - n*S*(A_k + B_k) + m_k*S^2`` over the
    calendar-pairwise lag pairs (an equi join on day+k, so gap days
    simply contribute no pair — the autocorr1_daily semantics), and
    ``C_0 = n^2*Sxx - n*S^2``.  PACF is the UNROLLED Durbin–Levinson
    recursion on r_1..r_3: phi11 = r1; phi22 = (r2 - r1*r1)/(1 -
    r1*r1); phi21 = r1*(1 - phi22); phi33 = (r3 - phi21*r2 -
    phi22*r1)/(1 - phi21*r1 - phi22*r2) — a FIXED IEEE sequence on
    the already-reported ratios, identical in any engine.  Cells stay
    exact below 2^53 (n^2*Sigma x_a x_b at daily-count scale); above
    that both engines round the same decimal→double cast (the
    q_corr_moments class).

    Shape: one (lag-literal explode) equi self-join of the bounded
    calendar frame, one per-lag fold, a conditional pivot over the
    literal lag axis to ONE row, and a broadcast 1-row totals fold.

    1-row output: n_days, c0, c1, c2, c3, r1, r2, r3, pacf1, pacf2,
    pacf3.
    """
    d38 = "decimal(38,0)"
    g = daily.filter(
        F.col(day).isNotNull() & F.col(cnt).isNotNull()
    ).select(
        F.datediff(F.col(day).cast("date"), F.lit("1970-01-01")).alias(
            "__d"
        ),
        F.col(cnt).cast("long").alias("__x"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__x").cast(d38)).cast("double").alias("__s"),
        F.sum(F.col("__x").cast(d38) * F.col("__x"))
        .cast("double")
        .alias("__sxx"),
    )
    ks = g.sparkSession.createDataFrame(
        [(int(k),) for k in lags], "k int"
    )
    left = g.crossJoin(F.broadcast(ks)).select(
        "k",
        (F.col("__d") + F.col("k")).alias("__dk"),
        F.col("__x").alias("__xa"),
    )
    right = g.select(F.col("__d").alias("__dk"), F.col("__x").alias("__xb"))
    per = (
        left.join(right, "__dk")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__m"),
            F.sum(F.col("__xa").cast(d38) * F.col("__xb"))
            .cast("double")
            .alias("__sab"),
            F.sum(F.col("__xa").cast(d38)).cast("double").alias("__a"),
            F.sum(F.col("__xb").cast(d38)).cast("double").alias("__b"),
        )
    )
    # pivot the per-lag rows FIRST (a global agg always yields one
    # row, even when no lag has any pair — e.g. all days > max(lags)
    # apart), then fold the totals on: anchoring on `per` would
    # return an all-NULL row for pair-free series
    pvt = per.groupBy().agg(
        *[
            F.max(F.when(F.col("k") == k, F.col("__m"))).alias(f"__m{k}")
            for k in lags
        ],
        *[
            F.max(F.when(F.col("k") == k, F.col("__sab"))).alias(
                f"__sab{k}"
            )
            for k in lags
        ],
        *[
            F.max(F.when(F.col("k") == k, F.col("__a"))).alias(f"__a{k}")
            for k in lags
        ],
        *[
            F.max(F.when(F.col("k") == k, F.col("__b"))).alias(f"__b{k}")
            for k in lags
        ],
    )
    one = tot.select(
        F.col("__n").alias("n_days"),
        F.col("__n").cast("double").alias("__nn"),
        F.col("__s").alias("__ss"),
        F.col("__sxx").alias("__sxx"),
    ).crossJoin(F.broadcast(pvt))
    for k in lags:
        ck_k = (
            F.col("__nn") * F.col("__nn") * F.col(f"__sab{k}")
            - F.col("__nn")
            * F.col("__ss")
            * (F.col(f"__a{k}") + F.col(f"__b{k}"))
            + F.col(f"__m{k}").cast("double")
            * F.col("__ss")
            * F.col("__ss")
        )
        one = one.withColumn(f"__c{k}", ck_k)
    c0 = F.col("__nn") * F.col("__nn") * F.col("__sxx") - F.col(
        "__nn"
    ) * F.col("__ss") * F.col("__ss")
    staged = one.select(
        "n_days",
        c0.alias("c0"),
        *[
            F.coalesce(F.col(f"__c{k}"), F.lit(0.0)).alias(f"c{k}")
            for k in lags
        ],
    )
    r = {
        k: F.when(F.col("c0") > 0, F.col(f"c{k}") / F.col("c0"))
        for k in lags
    }
    staged2 = staged.select(
        "n_days",
        "c0",
        *[F.col(f"c{k}") for k in lags],
        *[r[k].alias(f"r{k}") for k in lags],
    )
    phi22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        F.lit(1.0) - F.col("r1") * F.col("r1")
    )
    staged3 = staged2.select(
        "*",
        F.col("r1").alias("pacf1"),
        F.when(
            F.lit(1.0) - F.col("r1") * F.col("r1") != 0, phi22
        ).alias("pacf2"),
    )
    phi21 = F.col("r1") * (F.lit(1.0) - F.col("pacf2"))
    den3 = (
        F.lit(1.0)
        - phi21 * F.col("r1")
        - F.col("pacf2") * F.col("r2")
    )
    phi33 = (
        F.col("r3") - phi21 * F.col("r2") - F.col("pacf2") * F.col("r1")
    ) / den3
    return staged3.select(
        "*",
        F.when(den3 != 0, phi33).alias("pacf3"),
    )
