"""Early-staged registry faces for the r15 driver-window tail.

The r14 tail is already FULL (the 13 staging_r14.py faces + the last
10 r03-era staleness re-checks — see docs/DRIVER_WINDOW.md), so the
faces for r13's two late library operators
(:func:`~npm_mirror_spark.operators.temporal.turning_point_cells`,
:func:`~npm_mirror_spark.operators.temporal.bartels_rvn_cells`) stage
here for the r15 rotation — written and harness-verified in the same
round as their operators (the r11 logrank precedent, one round
earlier this time).  r14's own new operators append to this module.

Same contracts as every staged batch: face-shaped callables, DuckDB
oracles, driver-hashable types, bounded plans, exact-integer cells.
q_turning_point / q_bartels_rvn plan no BNLJ (one day-axis collapse +
bounded windows + a 1-row fold).  The reliability/outlier additions
plan the allowlisted 1-row-fold class; their ALLOWED_BNLJ entries at
registration:

    "q_kendall_w": "1-row k-frame broadcast onto the per-treatment
        fold + the 1-row tie-sum fold (the q_friedman shape)",
    "q_icc": "two 1-row folds (subject moments, dropped count)
        broadcast (the q_kappa shape)",
    "q_dixon": "1-row extremes frame broadcast back onto the day rows
        for the conditional second-extreme fold (the q_benford
        1-row-fold class)",
    "q_grubbs": "1-row (n, T, Q) totals broadcast onto the day rows
        (the q_decay_counts anchor shape)",
    "q_rank_scale": "1-row (n1, n2) totals broadcast onto the bounded
        quantity axis + _with_prior_sums' (min,max) stats row (the
        q_quantile_norm shape)",
    "q_gk_lambda": "four 1-row margin/meta folds broadcast (the
        q_kappa shape)",

(the r14-staged additions' six further entries are pre-documented in
the module comment before q_jarque_bera below.)

The r15 WINDOW_TAIL to paste at rotation (the 15 staged in this
module, registration order, + the 8 oldest r04-era ledger rows —
docs/DRIVER_WINDOW.md pre-plan)::

    WINDOW_TAIL: tuple[str, ...] = (
        "q_turning_point", "q_bartels_rvn", "q_kendall_w", "q_icc",
        "q_dixon", "q_grubbs", "q_rank_scale", "q_gk_lambda",
        "q_jarque_bera", "q_morans_i", "q_blomqvist_beta", "q_kuiper",
        "q_krippendorff", "q_hodges_lehmann", "q_cuzick",
        "q_user_event_history", "q_sessionize", "q_range_join",
        "q_gopher_rules", "q_decontaminate", "q_redact_pii",
        "q_pack_sequences", "q_gap_fill",
    )
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q_turning_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point randomness cells over the daily event-count
    series — the non-monotone-structure lens next to the registered
    q_runs_test / q_autocorr and the staged q_cox_stuart on the same
    kind of axis.  (operators/temporal.py turning_point_cells.)"""
    from npm_mirror_spark.operators.temporal import turning_point_cells

    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return turning_point_cells(daily, "day", "n")


_TURNING_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events
  WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
tri AS (
  SELECT n AS x,
    lag(n) OVER (ORDER BY day) AS prev,
    lead(n) OVER (ORDER BY day) AS nxt
  FROM daily
)
SELECT count(*) AS n_days,
  CAST(coalesce(sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_interior,
  CAST(coalesce(sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                          AND ((prev < x AND nxt < x)
                               OR (prev > x AND nxt > x))
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_turning,
  CASE WHEN count(*) >= 2
       THEN 2.0 * CAST(count(*) - 2 AS DOUBLE) / 3.0 END
    AS expected_turning,
  CASE WHEN sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                     THEN 1 ELSE 0 END) > 0
       THEN CAST(sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                           AND ((prev < x AND nxt < x)
                                OR (prev > x AND nxt > x))
                          THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                            THEN 1 ELSE 0 END) AS DOUBLE)
       END AS turning_rate
FROM tri
"""


def q_bartels_rvn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels' rank von Neumann ratio over the daily ORDER-count
    series — the rank-based (outlier-proof) reading of the registered
    q_durbin_watson's lag-1 independence question, on the q_buishand
    fixture.  (operators/temporal.py bartels_rvn_cells.)"""
    from npm_mirror_spark.operators.temporal import bartels_rvn_cells

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return bartels_rvn_cells(daily, "day", "n")


_BARTELS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders
  WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
),
vc AS (SELECT n AS x, count(*) AS cd FROM daily GROUP BY n),
mr AS (
  SELECT x,
    2 * coalesce(sum(cd) OVER (ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cd + 1 AS mr2
  FROM vc
),
seq AS (
  SELECT mr.mr2,
    lead(mr.mr2) OVER (ORDER BY daily.day) AS next2,
    count(*) OVER () AS nn
  FROM daily JOIN mr ON daily.n = mr.x
),
agg AS (
  SELECT max(nn) AS n_days,
    coalesce(sum(CASE WHEN next2 IS NOT NULL
      THEN CAST(mr2 - next2 AS HUGEINT) * (mr2 - next2) END), 0) AS nm,
    coalesce(sum(CAST(mr2 - (nn + 1) AS HUGEINT) * (mr2 - (nn + 1))), 0)
      AS dd
  FROM seq
)
SELECT CAST(n_days AS BIGINT) AS n_days,
  CAST(nm AS DOUBLE) AS nm_x4,
  CAST(dd AS DOUBLE) AS d_x4,
  CASE WHEN dd > 0 THEN CAST(nm AS DOUBLE) / CAST(dd AS DOUBLE) END AS rvn
FROM agg
"""


STAGED_QUERIES = {
    "q_turning_point": q_turning_point,
    "q_bartels_rvn": q_bartels_rvn,
}

STAGED_ORACLES = {
    "q_turning_point": _TURNING_SQL,
    "q_bartels_rvn": _BARTELS_SQL,
}


def q_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance over the daily
    (day-block x event-type) count design — the tie-corrected
    effect-size reading of the registered q_friedman's fixture: how
    strongly do the days agree on the event-type ordering?
    (operators/stats.py kendall_w_cells.)"""
    from npm_mirror_spark.operators.stats import kendall_w_cells

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.col("event_type").alias("t"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return kendall_w_cells(daily, "d", "t", "n")


_KENDALL_W_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, event_type AS t, count(*) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY date_trunc('day', ts), event_type
),
k AS (SELECT count(DISTINCT t) AS k FROM daily),
blocks AS (
  SELECT d FROM daily GROUP BY d
  HAVING count(*) = (SELECT k FROM k)
     AND count(DISTINCT t) = (SELECT k FROM k)
),
gc AS (SELECT daily.* FROM daily JOIN blocks USING (d)),
vb AS (SELECT d, n, count(*) AS cx FROM gc GROUP BY d, n),
pri AS (
  SELECT d, n, cx,
    coalesce(sum(cx) OVER (PARTITION BY d ORDER BY n
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM vb
),
ranked AS (
  SELECT gc.t, 2 * pri.prior + pri.cx + 1 AS mr2
  FROM gc JOIN pri ON gc.d = pri.d AND gc.n = pri.n
),
ties AS (
  SELECT coalesce(sum(CAST(cx AS HUGEINT) * cx * cx - cx), 0) AS tie_sum
  FROM vb
),
per_t AS (
  SELECT t, count(*) AS nb, sum(CAST(mr2 AS HUGEINT)) AS r2
  FROM ranked GROUP BY t
),
folded AS (
  SELECT max(nb) AS n_blocks, (SELECT k FROM k) AS k_treatments,
    coalesce(sum(
      (r2 - CAST(nb AS HUGEINT) * ((SELECT k FROM k) + 1))
      * (r2 - CAST(nb AS HUGEINT) * ((SELECT k FROM k) + 1))
    ), 0) AS s_x4
  FROM per_t
),
one AS (
  SELECT n_blocks, k_treatments, s_x4, tie_sum,
    CAST(n_blocks AS HUGEINT) * n_blocks
      * (CAST(k_treatments AS HUGEINT) * k_treatments * k_treatments
         - k_treatments)
      - CAST(n_blocks AS HUGEINT) * tie_sum AS den
  FROM folded, ties
)
SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
  CAST(k_treatments AS BIGINT) AS k_treatments,
  CAST(s_x4 AS DOUBLE) AS s_x4,
  CAST(tie_sum AS DOUBLE) AS tie_sum,
  CASE WHEN den > 0
       THEN CAST(3 * s_x4 AS DOUBLE) / CAST(den AS DOUBLE) END AS w
FROM one
"""


def q_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1,1) reliability of the three heuristic document-quality
    raters (the q_fleiss_kappa panel read as NUMERIC tiers): how much
    of the tier variance is between documents rather than between
    heuristics?  (operators/checks.py icc_cells.)"""
    from npm_mirror_spark.operators.checks import icc_cells
    from npm_mirror_spark.staging_r14 import _doc_raters

    return icc_cells(_doc_raters(spark, sf_dir), "doc_id", "tier", 3)


def _icc_oracle() -> str:
    # replay the q_fleiss_kappa rater panel (staging_r14._RATERS_SQL)
    # as integer values through the exact scaled-sum restatement
    from npm_mirror_spark.staging_r14 import _RATERS_SQL

    return f"""
WITH {_RATERS_SQL},
per_s AS (
  SELECT doc_id, count(*) AS cnt,
    sum(CAST(tier AS HUGEINT)) AS si,
    sum(CAST(tier AS HUGEINT) * tier) AS qi
  FROM ratings GROUP BY doc_id
),
complete AS (SELECT * FROM per_s WHERE cnt = 3),
dropped AS (SELECT count(*) AS n_dropped FROM per_s WHERE cnt != 3),
folds AS (
  SELECT count(*) AS n_subjects,
    coalesce(sum(si), 0) AS s,
    coalesce(sum(si * si), 0) AS s2,
    coalesce(sum(qi), 0) AS q
  FROM complete
),
one AS (
  SELECT n_subjects, n_dropped,
    CAST(n_subjects AS HUGEINT) * s2 - s * s AS ssb,
    3 * q - s2 AS ssw
  FROM folds, dropped
)
SELECT CAST(n_subjects AS BIGINT) AS n_subjects,
  3 AS k_ratings,
  CAST(n_dropped AS BIGINT) AS n_dropped,
  CAST(ssb AS DOUBLE) AS ssb_xnk,
  CAST(ssw AS DOUBLE) AS ssw_xk,
  CASE WHEN ssb * 2 + 2 * (n_subjects - 1) * ssw != 0
       THEN CAST(ssb * 2 - ssw * (n_subjects - 1) AS DOUBLE)
            / CAST(ssb * 2 + 2 * (n_subjects - 1) * ssw AS DOUBLE)
       END AS icc
FROM one
"""


def q_dixon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q gap-to-range outlier cells over the daily order-count
    series — the order-statistic suspicion gate on the q_buishand
    fixture.  (operators/stats.py dixon_q_cells.)"""
    from npm_mirror_spark.operators.stats import dixon_q_cells

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return dixon_q_cells(daily, "day", "n")


_DIXON_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders
  WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
),
ext AS (
  SELECT count(*) AS n_days, min(n) AS x_min, max(n) AS x_max FROM daily
),
sec AS (
  SELECT max(ext.n_days) AS n_days, max(ext.x_min) AS x_min,
    max(ext.x_max) AS x_max,
    sum(CASE WHEN n = ext.x_min THEN 1 ELSE 0 END) AS cmin,
    sum(CASE WHEN n = ext.x_max THEN 1 ELSE 0 END) AS cmax,
    min(CASE WHEN n > ext.x_min THEN n END) AS above_min,
    max(CASE WHEN n < ext.x_max THEN n END) AS below_max
  FROM daily CROSS JOIN ext
),
one AS (
  SELECT n_days, x_min, x_max,
    CASE WHEN cmin > 1 THEN x_min ELSE above_min END AS x_min2,
    CASE WHEN cmax > 1 THEN x_max ELSE below_max END AS x_max2
  FROM sec
)
SELECT CAST(n_days AS BIGINT) AS n_days,
  CAST(x_min AS BIGINT) AS x_min,
  CAST(x_min2 AS BIGINT) AS x_min2,
  CAST(x_max2 AS BIGINT) AS x_max2,
  CAST(x_max AS BIGINT) AS x_max,
  CASE WHEN x_max > x_min
       THEN CAST(x_min2 - x_min AS DOUBLE) / CAST(x_max - x_min AS DOUBLE)
       END AS q_low,
  CASE WHEN x_max > x_min
       THEN CAST(x_max - x_max2 AS DOUBLE) / CAST(x_max - x_min AS DOUBLE)
       END AS q_high
FROM one
"""


def q_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs-style most-extreme-day cells over the daily event-count
    series (n-scaled exact deviations; the studentized G is the
    consumer one-liner) — which day's volume sits furthest from the
    mean, and which side?  (operators/stats.py grubbs_cells.)"""
    from npm_mirror_spark.operators.stats import grubbs_cells

    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return grubbs_cells(daily, "day", "n")


_GRUBBS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events
  WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
tot AS (
  SELECT count(*) AS n_days,
    sum(CAST(n AS HUGEINT)) AS t,
    sum(CAST(n AS HUGEINT) * n) AS q
  FROM daily
),
scored AS (
  SELECT day,
    abs(CAST(tot.n_days AS HUGEINT) * n - tot.t) AS adev,
    CASE WHEN CAST(tot.n_days AS HUGEINT) * n - tot.t > 0 THEN 1
         WHEN CAST(tot.n_days AS HUGEINT) * n - tot.t < 0 THEN -1
         ELSE 0 END AS sgn
  FROM daily CROSS JOIN tot
),
pick AS (
  SELECT day, adev, sgn FROM scored
  ORDER BY adev DESC, day ASC LIMIT 1
)
SELECT CAST(tot.n_days AS BIGINT) AS n_days,
  CAST(tot.t AS DOUBLE) AS total,
  CAST(tot.q AS DOUBLE) AS sum_sq,
  CAST(pick.adev AS DOUBLE) AS max_dev_xn,
  pick.day AS at_day,
  CAST(pick.sgn AS INTEGER) AS dev_sign
FROM tot LEFT JOIN pick ON TRUE
"""


STAGED_QUERIES.update(
    {
        "q_kendall_w": q_kendall_w,
        "q_icc": q_icc,
        "q_dixon": q_dixon,
        "q_grubbs": q_grubbs,
    }
)

STAGED_ORACLES.update(
    {
        "q_kendall_w": _KENDALL_W_SQL,
        "q_icc": _icc_oracle(),
        "q_dixon": _DIXON_SQL,
        "q_grubbs": _GRUBBS_SQL,
    }
)


def q_rank_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint location-scale rank cells for returned lines vs the rest
    over the integral quantity axis — the Wilcoxon / Ansari-Bradley /
    Cucconi reading of the exact fixture q_cvm2 reads as a whole-CDF
    distance (and q_rank_sum reads as location only).
    (operators/stats.py rank_scale_cells.)"""
    from npm_mirror_spark.operators.stats import rank_scale_cells

    li = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    return rank_scale_cells(li, "qty", F.col("ret"))


_RANK_SCALE_SQL = """
WITH src AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS v,
    coalesce(l_returnflag = 'R', FALSE) AS ret
  FROM lineitem WHERE l_quantity IS NOT NULL
),
g AS (
  SELECT v,
    sum(CASE WHEN ret THEN 1 ELSE 0 END) AS cnt_a,
    sum(CASE WHEN ret THEN 0 ELSE 1 END) AS cnt_b
  FROM src GROUP BY v
),
tot AS (SELECT sum(cnt_a) AS n1, sum(cnt_b) AS n2 FROM g),
pri AS (
  SELECT cnt_a, cnt_b,
    coalesce(sum(cnt_a + cnt_b) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM g
),
scored AS (
  SELECT cnt_a,
    CAST(2 * below + cnt_a + cnt_b + 1 AS HUGEINT) AS mr2,
    CAST(tot.n1 + tot.n2 + 1 AS HUGEINT) AS np1
  FROM pri CROSS JOIN tot
),
sums AS (
  SELECT
    coalesce(sum(CAST(cnt_a AS HUGEINT) * mr2), 0) AS r,
    coalesce(sum(CAST(cnt_a AS HUGEINT)
                 * (np1 - abs(mr2 - np1))), 0) AS ab,
    coalesce(sum(CAST(cnt_a AS HUGEINT) * (mr2 * mr2)), 0) AS u,
    coalesce(sum(CAST(cnt_a AS HUGEINT)
                 * ((2 * np1 - mr2) * (2 * np1 - mr2))), 0) AS v2
  FROM scored
)
SELECT CAST(tot.n1 AS BIGINT) AS n1, CAST(tot.n2 AS BIGINT) AS n2,
  CAST(r AS DOUBLE) AS r_a_x2,
  CAST(ab AS DOUBLE) AS ab_a_x2,
  CAST(u AS DOUBLE) AS u_a_x4,
  CAST(v2 AS DOUBLE) AS v_a_x4
FROM tot CROSS JOIN sums
"""


def q_gk_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman–Kruskal lambda between document source and language —
    the nominal (unordered) association the registered q_gk_gamma
    cannot express: how much better does knowing the source predict
    the language's mode (and vice versa)?  (operators/checks.py
    gk_lambda.)"""
    from npm_mirror_spark.operators.checks import gk_lambda

    d = _t(spark, sf_dir, "documents").select("source", "lang")
    return gk_lambda(d, "source", "lang")


_GK_LAMBDA_SQL = """
WITH g AS (
  SELECT source AS x, lang AS y FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
),
cells AS (SELECT x, y, count(*) AS c FROM g GROUP BY x, y),
per_x AS (SELECT x, max(c) AS mx FROM cells GROUP BY x),
per_y AS (SELECT y, max(c) AS my, sum(c) AS ny FROM cells GROUP BY y),
per_x2 AS (SELECT x, sum(c) AS nx FROM cells GROUP BY x),
folds AS (
  SELECT
    (SELECT coalesce(sum(CAST(mx AS HUGEINT)), 0) FROM per_x) AS smx,
    (SELECT coalesce(sum(CAST(my AS HUGEINT)), 0) FROM per_y) AS smy,
    (SELECT coalesce(max(ny), 0) FROM per_y) AS maxny,
    (SELECT coalesce(max(nx), 0) FROM per_x2) AS maxnx,
    (SELECT sum(c) FROM cells) AS n_rows,
    (SELECT count(*) FROM cells) AS n_cells
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
  CAST(n_cells AS BIGINT) AS n_cells,
  CAST(smx AS BIGINT) AS sum_max_y_given_x,
  CAST(maxny AS BIGINT) AS max_y_margin,
  CAST(smy AS BIGINT) AS sum_max_x_given_y,
  CAST(maxnx AS BIGINT) AS max_x_margin,
  CASE WHEN n_rows - maxny > 0
       THEN CAST(smx - maxny AS DOUBLE) / CAST(n_rows - maxny AS DOUBLE)
       END AS lambda_yx,
  CASE WHEN n_rows - maxnx > 0
       THEN CAST(smy - maxnx AS DOUBLE) / CAST(n_rows - maxnx AS DOUBLE)
       END AS lambda_xy
FROM folds
"""


STAGED_QUERIES.update(
    {
        "q_rank_scale": q_rank_scale,
        "q_gk_lambda": q_gk_lambda,
    }
)

STAGED_ORACLES.update(
    {
        "q_rank_scale": _RANK_SCALE_SQL,
        "q_gk_lambda": _GK_LAMBDA_SQL,
    }
)


# --- r14 additions: the moment/dependence/agreement batch -----------------
# Staged by r14 for the r15 tail (the r14 window froze with all 23
# slots taken).  Six of the seven plan the allowlisted 1-row-fold /
# bounded-grid BNLJ classes; their ALLOWED_BNLJ entries at
# registration:
#
#     "q_morans_i": "1-row (n, S1, S2) totals broadcast onto the
#         lag-joined day pairs + the 1-row pair fold (the
#         q_decay_counts anchor shape)",
#     "q_blomqvist_beta": "two 1-row doubled-median folds broadcast
#         onto the rows (the q_mood_median shape)",
#     "q_kuiper": "1-row (n1, n2) totals broadcast onto the bounded
#         value axis + _with_prior_sums' (min,max) stats row (the
#         q_ks_stat shape)",
#     "q_krippendorff": "three 1-row folds (pair sums, dropped count,
#         margin spectrum) broadcast (the q_kappa shape)",
#     "q_hodges_lehmann": "bounded (dA x dB) distinct-value difference
#         grid + 1-row pair-count/median folds (the q_gk_gamma
#         bounded-grid class)",
#     "q_cuzick": "1-row tie fold broadcast onto the rank fold +
#         _with_prior_sums' (min,max) stats row (the q_quantile_norm
#         shape)",
#
# (q_jarque_bera plans ONE global fold — no join, no BNLJ.)


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality cells over the daily event-count series —
    the moment-based shape gate for the z-score-flavored faces
    (q_zscore_outliers, q_grubbs) that silently assume normal daily
    volume.  (operators/stats.py moments_jb_cells.)"""
    from npm_mirror_spark.operators.stats import moments_jb_cells

    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return moments_jb_cells(daily, "n")


_JB_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events
  WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    sum(CAST(n AS HUGEINT)) AS s1,
    sum(CAST(n AS HUGEINT) * n) AS s2,
    sum(CAST(n AS HUGEINT) * n * n) AS s3,
    sum(CAST(n AS HUGEINT) * n * n * n) AS s4
  FROM daily
),
staged AS (
  SELECT CAST(n AS BIGINT) AS n_rows,
    CAST(coalesce(s1, 0) AS DOUBLE) AS s1,
    CAST(n * s2 - s1 * s1 AS DOUBLE) AS m2_xn,
    CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS DOUBLE)
      AS m3_xn2,
    CAST(n * n * n * s4 - 4 * n * n * s1 * s3
         + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS DOUBLE)
      AS m4_xn3
  FROM tot
)
SELECT n_rows, s1, m2_xn, m3_xn2, m4_xn3,
  CASE WHEN m2_xn > 0
       THEN (m3_xn2 * m3_xn2) / (m2_xn * m2_xn * m2_xn) END AS skew_sq,
  CASE WHEN m2_xn > 0 THEN m4_xn3 / (m2_xn * m2_xn) END AS kurt_b2,
  CASE WHEN m2_xn > 0
       THEN CAST(n_rows AS DOUBLE) / 6.0
            * ((m3_xn2 * m3_xn2) / (m2_xn * m2_xn * m2_xn)
               + (m4_xn3 / (m2_xn * m2_xn) - 3.0)
                 * (m4_xn3 / (m2_xn * m2_xn) - 3.0) / 4.0)
       END AS jb
FROM staged
"""


def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I / Geary's C at lag 7 over the daily order-count
    series — the weekly seasonal-memory audit: does this weekday's
    volume co-move with the same weekday one week over?  Complements
    the lag-1 q_autocorr / q_durbin_watson and the within-weekday
    q_seasonal_mk on the same fixture family.  (operators/temporal.py
    morans_lag_cells.)"""
    from npm_mirror_spark.operators.temporal import morans_lag_cells

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return morans_lag_cells(daily, "day", "n", lag_days=7)


_MORANS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders
  WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    sum(CAST(n AS HUGEINT)) AS s1,
    sum(CAST(n AS HUGEINT) * n) AS s2
  FROM daily
),
pairs AS (
  SELECT count(*) AS n_pairs,
    coalesce(sum((tot.n * a.n - tot.s1) * (tot.n * b.n - tot.s1)), 0)
      AS pp,
    coalesce(sum(CAST(b.n - a.n AS HUGEINT) * (b.n - a.n)), 0) AS sd
  FROM daily a
  JOIN daily b ON b.day = a.day + INTERVAL 7 DAY
  CROSS JOIN tot
)
SELECT CAST(tot.n AS BIGINT) AS n_days,
  7 AS lag_days,
  CAST(pairs.n_pairs AS BIGINT) AS n_pairs,
  CAST(pairs.pp AS DOUBLE) AS pair_prod_xn2,
  CAST(pairs.sd AS DOUBLE) AS sq_diff_sum,
  CAST(tot.n * tot.s2 - tot.s1 * tot.s1 AS DOUBLE) AS m2_xn,
  CASE WHEN pairs.n_pairs > 0 AND tot.n * tot.s2 - tot.s1 * tot.s1 > 0
       THEN CAST(pairs.pp AS DOUBLE)
            / (CAST(pairs.n_pairs AS DOUBLE)
               * CAST(tot.n * tot.s2 - tot.s1 * tot.s1 AS DOUBLE))
       END AS morans_i,
  CASE WHEN pairs.n_pairs > 0 AND tot.n * tot.s2 - tot.s1 * tot.s1 > 0
       THEN CAST(tot.n AS DOUBLE) * (CAST(tot.n AS DOUBLE) - 1.0)
            * CAST(pairs.sd AS DOUBLE)
            / (2.0 * CAST(pairs.n_pairs AS DOUBLE)
               * CAST(tot.n * tot.s2 - tot.s1 * tot.s1 AS DOUBLE))
       END AS gearys_c
FROM tot CROSS JOIN pairs
"""


def q_blomqvist_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blomqvist's quadrant correlation between an order's lineitem
    count and its total price — the median-split dependence audit on
    the q_somers_d fixture axes, robust where q_spearman's full-rank
    machinery weighs every tail row.  (operators/checks.py
    blomqvist_beta_cells.)"""
    from npm_mirror_spark.operators.checks import blomqvist_beta_cells

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.floor(F.col("o_totalprice")).cast("long").alias("price")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    nl = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("nlines"))
    j = o.join(nl, o["o_orderkey"] == nl["l_orderkey"]).select(
        "nlines", "price"
    )
    return blomqvist_beta_cells(j, "nlines", "price")


_BLOMQVIST_SQL = """
WITH j AS (
  SELECT nl.nlines, CAST(floor(o.o_totalprice) AS BIGINT) AS price
  FROM orders o
  JOIN (SELECT l_orderkey, count(*) AS nlines FROM lineitem
        GROUP BY l_orderkey) nl
    ON o.o_orderkey = nl.l_orderkey
),
vx AS (SELECT nlines AS v, count(*) AS c FROM j GROUP BY nlines),
cx AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n FROM vx
),
mx AS (
  SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
       + min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS med2
  FROM cx
),
vy AS (SELECT price AS v, count(*) AS c FROM j GROUP BY price),
cy AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n FROM vy
),
my AS (
  SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
       + min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS med2
  FROM cy
),
q AS (
  SELECT count(*) AS n_rows,
    sum(CASE WHEN 2 * CAST(nlines AS HUGEINT) = mx.med2
              OR 2 * CAST(price AS HUGEINT) = my.med2
             THEN 1 ELSE 0 END) AS n_on,
    sum(CASE WHEN 2 * CAST(nlines AS HUGEINT) > mx.med2
              AND 2 * CAST(price AS HUGEINT) > my.med2
             THEN 1 ELSE 0 END) AS n_pp,
    sum(CASE WHEN 2 * CAST(nlines AS HUGEINT) > mx.med2
              AND 2 * CAST(price AS HUGEINT) < my.med2
             THEN 1 ELSE 0 END) AS n_pm,
    sum(CASE WHEN 2 * CAST(nlines AS HUGEINT) < mx.med2
              AND 2 * CAST(price AS HUGEINT) > my.med2
             THEN 1 ELSE 0 END) AS n_mp,
    sum(CASE WHEN 2 * CAST(nlines AS HUGEINT) < mx.med2
              AND 2 * CAST(price AS HUGEINT) < my.med2
             THEN 1 ELSE 0 END) AS n_mm,
    max(CAST(mx.med2 AS DOUBLE)) AS med2_x,
    max(CAST(my.med2 AS DOUBLE)) AS med2_y
  FROM j CROSS JOIN mx CROSS JOIN my
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
  CAST(n_on AS BIGINT) AS n_on,
  CAST(n_pp AS BIGINT) AS n_pp,
  CAST(n_pm AS BIGINT) AS n_pm,
  CAST(n_mp AS BIGINT) AS n_mp,
  CAST(n_mm AS BIGINT) AS n_mm,
  med2_x, med2_y,
  CASE WHEN n_pp + n_pm + n_mp + n_mm > 0
       THEN CAST(n_pp + n_mm - n_pm - n_mp AS DOUBLE)
            / CAST(n_pp + n_pm + n_mp + n_mm AS DOUBLE)
       END AS beta
FROM q
"""


def q_kuiper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper V between urgent-priority orders (1-URGENT / 2-HIGH) and
    the rest over the total-price kilobucket axis — the dual-tail
    companion to the registered q_ks_stat: do urgent orders push price
    mass out of BOTH ends?  (operators/stats.py kuiper_2samp_cells.)"""
    from npm_mirror_spark.operators.stats import kuiper_2samp_cells

    o = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("kp"),
        F.substring("o_orderpriority", 1, 1).isin("1", "2").alias("urgent"),
    )
    return kuiper_2samp_cells(o, "kp", F.col("urgent"))


_KUIPER_SQL = """
WITH src AS (
  SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS v,
    substr(o_orderpriority, 1, 1) IN ('1', '2') AS a
  FROM orders
),
g AS (
  SELECT v,
    sum(CASE WHEN a THEN 1 ELSE 0 END) AS cnt_a,
    sum(CASE WHEN a THEN 0 ELSE 1 END) AS cnt_b
  FROM src GROUP BY v
),
tot AS (SELECT sum(cnt_a) AS n1, sum(cnt_b) AS n2 FROM g),
pri AS (
  SELECT
    sum(cnt_a) OVER (ORDER BY v) AS cum_a,
    sum(cnt_b) OVER (ORDER BY v) AS cum_b
  FROM g
),
folded AS (
  SELECT
    greatest(coalesce(max(CAST(cum_a AS HUGEINT) * tot.n2
                          - CAST(cum_b AS HUGEINT) * tot.n1), 0), 0)
      AS dp,
    greatest(coalesce(max(-(CAST(cum_a AS HUGEINT) * tot.n2
                            - CAST(cum_b AS HUGEINT) * tot.n1)), 0), 0)
      AS dm,
    max(tot.n1) AS n1, max(tot.n2) AS n2
  FROM pri CROSS JOIN tot
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  CAST(dp AS DOUBLE) AS d_plus_num,
  CAST(dm AS DOUBLE) AS d_minus_num,
  CAST(dp + dm AS DOUBLE) AS v_num,
  CASE WHEN n1 > 0 AND n2 > 0
       THEN CAST(dp + dm AS DOUBLE)
            / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
       END AS v
FROM folded
"""


def _raters_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staging_r14 _doc_raters panel with DETERMINISTIC missingness:
    the sentence-period rater skips every doc_id % 5 == 0 — the
    partial-panel fixture Krippendorff's alpha exists for (Fleiss
    would have to drop those units wholesale).  Tier thresholds are
    byte-identical to staging_r14._doc_raters / _RATERS_SQL."""
    from npm_mirror_spark.operators.text import ws_token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    ).filter(F.col("text").isNotNull() & F.col("n_chars").isNotNull())
    tier_l = (
        F.when(F.col("n_chars") < 200, 0)
        .when(F.col("n_chars") < 1000, 1)
        .otherwise(2)
    )
    ntok = ws_token_count("text")
    tier_t = F.when(ntok < 40, 0).when(ntok < 200, 1).otherwise(2)
    nper = F.length("text") - F.length(F.regexp_replace("text", r"\.", ""))
    tier_p = F.when(nper < 2, 0).when(nper < 10, 1).otherwise(2)
    base = d.select("doc_id", tier_l.alias("__l"), tier_t.alias("__t"),
                    tier_p.alias("__p"))
    return (
        base.select("doc_id", F.col("__l").alias("tier"))
        .unionByName(base.select("doc_id", F.col("__t").alias("tier")))
        .unionByName(
            base.filter(F.col("doc_id") % 5 != 0)
            .select("doc_id", F.col("__p").alias("tier"))
        )
    )


def q_krippendorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's nominal alpha over the heuristic quality-rater
    panel WITH missing ratings (the sentence rater skips every fifth
    doc) — the agreement audit q_fleiss_kappa cannot run without
    dropping those documents entirely.  (operators/checks.py
    krippendorff_alpha_cells.)"""
    from npm_mirror_spark.operators.checks import krippendorff_alpha_cells

    return krippendorff_alpha_cells(
        _raters_partial(spark, sf_dir), "doc_id", "tier"
    )


def _krippendorff_oracle() -> str:
    # replay the staging_r14 rater tiers, with the sentence rater
    # skipping doc_id % 5 == 0 (the partial-panel fixture)
    from npm_mirror_spark.staging_r14 import _RATERS_SQL

    return f"""
WITH {_RATERS_SQL},
partial AS (
  SELECT doc_id, tl AS tier FROM tiers
  UNION ALL SELECT doc_id, tt FROM tiers
  UNION ALL SELECT doc_id, tp FROM tiers WHERE doc_id % 5 != 0
),
uv AS (
  SELECT doc_id, tier, count(*) AS muc FROM partial
  GROUP BY doc_id, tier
),
per_u AS (
  SELECT doc_id, sum(muc) AS m,
    sum(muc * (muc - 1)) AS agree
  FROM uv GROUP BY doc_id
),
pairable AS (SELECT * FROM per_u WHERE m >= 2),
folds AS (
  SELECT count(*) AS n_units,
    coalesce(sum(m), 0) AS nr,
    coalesce(sum(CAST(m * (m - 1) - agree AS HUGEINT)
                 * (CASE WHEN m = 2 THEN 2 ELSE 1 END)), 0) AS d2
  FROM pairable
),
dropped AS (SELECT count(*) AS n_dropped FROM per_u WHERE m < 2),
margins AS (
  SELECT coalesce(sum(CAST(nc AS HUGEINT) * nc), 0) AS msq
  FROM (
    SELECT uv.tier, sum(uv.muc) AS nc
    FROM uv JOIN pairable ON uv.doc_id = pairable.doc_id
    GROUP BY uv.tier
  )
)
SELECT CAST(n_units AS BIGINT) AS n_units,
  CAST(n_dropped AS BIGINT) AS n_dropped,
  CAST(nr AS BIGINT) AS n_ratings,
  CAST(d2 AS DOUBLE) AS disagree_x2,
  CAST(msq AS DOUBLE) AS margin_sq_sum,
  CASE WHEN 2 * (CAST(nr AS HUGEINT) * nr - msq) > 0
       THEN 1.0 - CAST(CAST(nr AS HUGEINT) - 1 AS DOUBLE)
            * CAST(d2 AS DOUBLE)
            / CAST(2 * (CAST(nr AS HUGEINT) * nr - msq) AS DOUBLE)
       END AS alpha
FROM folds CROSS JOIN dropped CROSS JOIN margins
"""


def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann shift estimate between returned-line and
    kept-line quantities — the robust effect size for the location
    question q_rank_sum answers with a yes/no, on the same fixture.
    (operators/stats.py hodges_lehmann_2samp.)"""
    from npm_mirror_spark.operators.stats import hodges_lehmann_2samp

    li = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    return hodges_lehmann_2samp(li, "qty", F.col("ret"))


_HL_SQL = """
WITH src AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS v,
    coalesce(l_returnflag = 'R', FALSE) AS ret
  FROM lineitem WHERE l_quantity IS NOT NULL
),
g AS (
  SELECT v,
    sum(CASE WHEN ret THEN 1 ELSE 0 END) AS cnt_a,
    sum(CASE WHEN ret THEN 0 ELSE 1 END) AS cnt_b
  FROM src GROUP BY v
),
tot AS (SELECT sum(cnt_a) AS n1, sum(cnt_b) AS n2 FROM g),
diffs AS (
  SELECT a.v - b.v AS d,
    sum(CAST(a.cnt_a AS HUGEINT) * b.cnt_b) AS w
  FROM (SELECT v, cnt_a FROM g WHERE cnt_a > 0) a
  CROSS JOIN (SELECT v, cnt_b FROM g WHERE cnt_b > 0) b
  GROUP BY a.v - b.v
),
cum AS (
  SELECT d, sum(w) OVER (ORDER BY d) AS cum, sum(w) OVER () AS np
  FROM diffs
),
med AS (
  SELECT min(CASE WHEN cum >= (np + 1) // 2 THEN d END)
       + min(CASE WHEN cum >= np // 2 + 1 THEN d END) AS hl2
  FROM cum
)
SELECT CAST(tot.n1 AS BIGINT) AS n1, CAST(tot.n2 AS BIGINT) AS n2,
  CAST(CAST(tot.n1 AS HUGEINT) * tot.n2 AS DOUBLE) AS n_pairs,
  CAST(med.hl2 AS DOUBLE) AS hl2_x,
  CAST(med.hl2 AS DOUBLE) / 2.0 AS hl
FROM tot CROSS JOIN med
"""


def q_cuzick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuzick's trend test across the five ordered order priorities on
    the floored total-price axis — does price drift monotonically with
    urgency?  The unblocked rank-trend companion to the registered
    q_jonckheere (pairwise dominances) and the staged q_somers_d
    (grid concordance) on the priority axis.  (operators/stats.py
    cuzick_trend_cells.)"""
    from npm_mirror_spark.operators.stats import cuzick_trend_cells

    o = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice")).cast("long").alias("price"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("prio"),
    )
    return cuzick_trend_cells(o, "price", "prio")


_CUZICK_SQL = """
WITH src AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v,
    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS l
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
),
gv AS (SELECT v, l, count(*) AS c FROM src GROUP BY v, l),
axis AS (SELECT v, sum(c) AS ct FROM gv GROUP BY v),
pri AS (
  SELECT v,
    2 * coalesce(sum(ct) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + ct + 1
      AS mr2
  FROM axis
),
folded AS (
  SELECT sum(gv.c) AS n_rows,
    count(DISTINCT gv.l) AS k_groups,
    coalesce(sum(CAST(gv.c AS HUGEINT) * gv.l * pri.mr2), 0) AS t2,
    coalesce(sum(CAST(gv.c AS HUGEINT) * gv.l), 0) AS lsum,
    coalesce(sum(CAST(gv.c AS HUGEINT) * gv.l * gv.l), 0) AS l2n
  FROM gv JOIN pri ON gv.v = pri.v
),
ties AS (
  SELECT coalesce(sum(CAST(ct AS HUGEINT) * ct * ct - ct), 0) AS tcube
  FROM axis
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
  CAST(k_groups AS BIGINT) AS k_groups,
  CAST(t2 AS DOUBLE) AS t_x2,
  CAST((CAST(n_rows AS HUGEINT) + 1) * lsum AS DOUBLE) AS e_t_x2,
  CAST(lsum AS DOUBLE) AS sum_ln,
  CAST(l2n AS DOUBLE) AS sum_l2n,
  CAST(tcube AS DOUBLE) AS tie_cube_sum
FROM folded CROSS JOIN ties
"""


STAGED_QUERIES.update(
    {
        "q_jarque_bera": q_jarque_bera,
        "q_morans_i": q_morans_i,
        "q_blomqvist_beta": q_blomqvist_beta,
        "q_kuiper": q_kuiper,
        "q_krippendorff": q_krippendorff,
        "q_hodges_lehmann": q_hodges_lehmann,
        "q_cuzick": q_cuzick,
    }
)

STAGED_ORACLES.update(
    {
        "q_jarque_bera": _JB_SQL,
        "q_morans_i": _MORANS_SQL,
        "q_blomqvist_beta": _BLOMQVIST_SQL,
        "q_kuiper": _KUIPER_SQL,
        "q_krippendorff": _krippendorff_oracle(),
        "q_hodges_lehmann": _HL_SQL,
        "q_cuzick": _CUZICK_SQL,
    }
)
