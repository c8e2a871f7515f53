"""Early-staged registry faces for the r16 driver-window tail.

The r15 tail is already fully pre-planned (the 15 staging_r15.py faces
+ 8 r04-era staleness re-checks — docs/DRIVER_WINDOW.md), so r14's
SECOND operator wave stages here for the r16 rotation: face-shaped
callables with self-contained DuckDB oracles, driven by the SAME
harness comparison as the registry (tests/test_r14_ops.py's staged-r16
sweep), NOT in ``queries.QUERIES``.

Same contracts as every staged batch: driver-hashable output types,
aliased columns matching the oracle exactly, bounded plans,
exact-integer cells with fixed-IEEE-expression outputs.  The
BNLJ-planning faces' ALLOWED_BNLJ entries to add at registration (all
the allowlisted 1-row-fold / bounded-grid classes):

    "q_cronbach": "1-row global-item-count frame broadcast for the
        completeness gate + three 1-row moment folds (the q_kappa
        shape)",
    "q_gwet_ac1": "three 1-row folds (pair sums, dropped count,
        margin spectrum) broadcast (the q_krippendorff shape)",
    "q_tau_partial": "three ordinal_assoc_cells compositions — the
        q_somers_d bounded-grid dominance class, x3, plus the final
        1-row tau folds",
    "q_aligned_ranks": "1-row global-treatment-count frame broadcast
        for the completeness gate + 1-row meta folds (the q_friedman
        shape) + _with_prior_sums' (min,max) stats row",
    "q_robust_shape": "1-row totals broadcast onto the bounded value
        axis + _with_prior_sums' (min,max) stats row (the
        q_quantile_norm shape)",
    "q_tukey_fences": "1-row quartile frame broadcast back onto the
        rows for the census fold (the q_mood_median shape)",
    "q_footrule": "_with_prior_sums' (min,max) stats rows, one per
        axis (the q_spearman shape)",

(q_yuen_trim plans per-group windows + equi joins only — no BNLJ.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- weekday-profile reliability ------------------------------------------


def _week_weekday_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts keyed (ISO week start, weekday index 0-6 Monday) —
    the subjects-x-items panel for the weekday-profile reliability
    faces: weeks are subjects, weekdays are items.  Spark's weekday()
    (0 = Monday) replays in DuckDB as isodow - 1; date_trunc('week')
    is Monday-start in both engines."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    return o.groupBy(
        F.date_trunc("week", F.col("day")).cast("date").alias("wk"),
        F.weekday(F.col("day")).alias("wd"),
    ).agg(F.count(F.lit(1)).alias("n"))


def q_cronbach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha of the weekly weekday-volume profile — do
    weeks agree on how the 7 weekdays rank (a reliable seasonal
    pattern), read as internal consistency of the 7 'weekday items'
    across week 'subjects'?  The numeric-reliability companion to the
    lag-7 q_morans_i on the same calendar structure.  Incomplete weeks
    (fewer than 7 distinct weekdays with orders) are dropped by the
    completeness gate.  (operators/checks.py cronbach_alpha_cells.)"""
    from npm_mirror_spark.operators.checks import cronbach_alpha_cells

    return cronbach_alpha_cells(
        _week_weekday_counts(spark, sf_dir), "wk", "wd", "n"
    )


_WEEK_SQL = """
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders
  WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
),
panel AS (
  SELECT CAST(date_trunc('week', day) AS DATE) AS wk,
    isodow(day) - 1 AS wd, n
  FROM daily
)
"""


_CRONBACH_SQL = f"""
WITH {_WEEK_SQL},
kf AS (SELECT count(DISTINCT wd) AS k FROM panel),
per_u AS (
  SELECT wk, count(*) AS nr, count(DISTINCT wd) AS ni,
    sum(CAST(n AS HUGEINT)) AS tu
  FROM panel GROUP BY wk
),
complete AS (
  SELECT per_u.* FROM per_u, kf WHERE nr = k AND ni = k
),
dropped AS (
  SELECT count(*) AS n_dropped FROM per_u, kf
  WHERE nr != k OR ni != k
),
gc AS (SELECT panel.* FROM panel JOIN complete USING (wk)),
items AS (
  SELECT count(*) AS k_items,
    coalesce(sum(nn * q - s * s), 0) AS ia
  FROM (
    SELECT CAST(count(*) AS HUGEINT) AS nn,
      sum(CAST(n AS HUGEINT)) AS s,
      sum(CAST(n AS HUGEINT) * n) AS q
    FROM gc GROUP BY wd
  )
),
totals AS (
  SELECT CAST(count(*) AS HUGEINT) AS nn,
    coalesce(sum(tu), 0) AS st,
    coalesce(sum(tu * tu), 0) AS qt
  FROM complete
)
SELECT CAST(totals.nn AS BIGINT) AS n_subjects,
  CAST(items.k_items AS BIGINT) AS k_items,
  CAST(dropped.n_dropped AS BIGINT) AS n_dropped,
  CAST(items.ia AS DOUBLE) AS item_var_sum_xn2,
  CAST(totals.nn * totals.qt - totals.st * totals.st AS DOUBLE)
    AS total_var_xn2,
  CASE WHEN items.k_items >= 2
        AND totals.nn * totals.qt - totals.st * totals.st > 0
       THEN CAST(items.k_items AS DOUBLE)
            / (CAST(items.k_items AS DOUBLE) - 1.0)
            * (1.0 - CAST(items.ia AS DOUBLE)
               / CAST(totals.nn * totals.qt - totals.st * totals.st
                      AS DOUBLE))
       END AS alpha
FROM totals, items, dropped
"""


def q_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 over the three heuristic quality raters — the
    prevalence-robust reading of the q_fleiss_kappa panel: when most
    documents share one tier, kappa's chance model collapses (the
    kappa paradox) while AC1 stays calibrated.  (operators/checks.py
    gwet_ac1_cells.)"""
    from npm_mirror_spark.operators.checks import gwet_ac1_cells
    from npm_mirror_spark.staging_r14 import _doc_raters

    return gwet_ac1_cells(_doc_raters(spark, sf_dir), "doc_id", "tier", 3)


def _gwet_oracle() -> str:
    from npm_mirror_spark.staging_r14 import _RATERS_SQL

    return f"""
WITH {_RATERS_SQL},
uv AS (
  SELECT doc_id, tier, count(*) AS muc FROM ratings
  GROUP BY doc_id, tier
),
per_u AS (
  SELECT doc_id, sum(muc) AS m,
    sum(muc * (muc - 1)) AS agree
  FROM uv GROUP BY doc_id
),
complete AS (SELECT * FROM per_u WHERE m = 3),
dropped AS (SELECT count(*) AS n_dropped FROM per_u WHERE m != 3),
folds AS (
  SELECT CAST(count(*) AS HUGEINT) AS n_units,
    coalesce(sum(CAST(agree AS HUGEINT)), 0) AS ag
  FROM complete
),
margins AS (
  SELECT count(*) AS k_categories,
    coalesce(sum(CAST(nc AS HUGEINT) * nc), 0) AS msq
  FROM (
    SELECT uv.tier, sum(uv.muc) AS nc
    FROM uv JOIN complete ON uv.doc_id = complete.doc_id
    GROUP BY uv.tier
  )
)
SELECT CAST(folds.n_units AS BIGINT) AS n_units,
  CAST(dropped.n_dropped AS BIGINT) AS n_dropped,
  CAST(margins.k_categories AS BIGINT) AS k_categories,
  CAST(folds.ag AS DOUBLE) AS agree_pairs,
  CAST(margins.msq AS DOUBLE) AS margin_sq_sum,
  CASE WHEN folds.n_units > 0
       THEN CAST(folds.ag AS DOUBLE)
            / CAST(folds.n_units * 6 AS DOUBLE) END AS pa,
  CASE WHEN folds.n_units > 0 AND margins.k_categories >= 2
       THEN CAST(9 * folds.n_units * folds.n_units - margins.msq
                 AS DOUBLE)
            / (CAST(margins.k_categories - 1 AS DOUBLE)
               * CAST(9 * folds.n_units * folds.n_units AS DOUBLE))
       END AS pe,
  CASE WHEN folds.n_units > 0 AND margins.k_categories >= 2
        AND CAST(9 * folds.n_units * folds.n_units - margins.msq
                 AS DOUBLE)
            / (CAST(margins.k_categories - 1 AS DOUBLE)
               * CAST(9 * folds.n_units * folds.n_units AS DOUBLE))
            != 1.0
       THEN (CAST(folds.ag AS DOUBLE)
             / CAST(folds.n_units * 6 AS DOUBLE)
             - CAST(9 * folds.n_units * folds.n_units - margins.msq
                    AS DOUBLE)
               / (CAST(margins.k_categories - 1 AS DOUBLE)
                  * CAST(9 * folds.n_units * folds.n_units AS DOUBLE)))
            / (1.0
               - CAST(9 * folds.n_units * folds.n_units - margins.msq
                      AS DOUBLE)
                 / (CAST(margins.k_categories - 1 AS DOUBLE)
                    * CAST(9 * folds.n_units * folds.n_units
                           AS DOUBLE)))
       END AS ac1
FROM folds, dropped, margins
"""


# --- partial Kendall tau ---------------------------------------------------


def q_tau_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial Kendall's tau: does the priority-to-lineitem-count
    association (the q_somers_d question) survive controlling for the
    order's price decade?  A tau_xy that collapses partially would be
    the Simpson's-paradox tell.  (operators/checks.py
    partial_tau_cells.)"""
    from npm_mirror_spark.operators.checks import partial_tau_cells

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).cast("long").alias("prio"),
        F.floor(F.col("o_totalprice") / 10000).cast("long").alias("decade"),
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    nl = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("nlines"))
    j = o.join(nl, o["o_orderkey"] == nl["l_orderkey"]).select(
        "prio", "nlines", "decade"
    )
    return partial_tau_cells(j, "prio", "nlines", "decade")


def _tau_b_block(p: str, xc: str, yc: str) -> str:
    """CTE block computing tau_b between two columns of ``g`` under
    the prefix ``p`` — the _assoc_sql pair decomposition reduced to
    the tau_b output (same HUGEINT counts, same final sqrt
    expression)."""
    return f"""
{p}cells AS (
  SELECT {xc} AS x, {yc} AS y, count(*) AS c FROM g GROUP BY {xc}, {yc}
),
{p}tot AS (
  SELECT
    coalesce(sum(CASE WHEN a.y < b.y
                      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END), 0)
      AS cc,
    coalesce(sum(CASE WHEN a.y > b.y
                      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END), 0)
      AS dd
  FROM {p}cells a JOIN {p}cells b ON a.x < b.x
),
{p}tx AS (
  SELECT coalesce(sum((CAST(nx AS HUGEINT) * (nx - 1)) // 2), 0) AS t
  FROM (SELECT sum(c) AS nx FROM {p}cells GROUP BY x)
),
{p}ty AS (
  SELECT coalesce(sum((CAST(ny AS HUGEINT) * (ny - 1)) // 2), 0) AS t
  FROM (SELECT sum(c) AS ny FROM {p}cells GROUP BY y)
),
{p}tau AS (
  SELECT CASE WHEN p - {p}tx.t > 0 AND p - {p}ty.t > 0
              THEN CAST(cc - dd AS DOUBLE)
                   / sqrt(CAST((p - {p}tx.t) * (p - {p}ty.t) AS DOUBLE))
         END AS tau
  FROM {p}tot, {p}tx, {p}ty,
    (SELECT (CAST(count(*) AS HUGEINT) * (count(*) - 1)) // 2 AS p
     FROM g) {p}meta
)"""


_TAU_PARTIAL_SQL = f"""
WITH g AS (
  SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS px,
    nl.nlines AS py,
    CAST(floor(o.o_totalprice / 10000) AS BIGINT) AS pz
  FROM orders o
  JOIN (SELECT l_orderkey, count(*) AS nlines
        FROM lineitem GROUP BY l_orderkey) nl
    ON o.o_orderkey = nl.l_orderkey
  WHERE o.o_orderpriority IS NOT NULL AND o.o_totalprice IS NOT NULL
),
{_tau_b_block("xy", "px", "py")},
{_tau_b_block("xz", "px", "pz")},
{_tau_b_block("yz", "py", "pz")}
SELECT (SELECT count(*) FROM g) AS n_rows,
  xytau.tau AS tau_xy, xztau.tau AS tau_xz, yztau.tau AS tau_yz,
  CASE WHEN xytau.tau IS NOT NULL AND xztau.tau IS NOT NULL
        AND yztau.tau IS NOT NULL
        AND (1.0 - xztau.tau * xztau.tau)
            * (1.0 - yztau.tau * yztau.tau) > 0
       THEN (xytau.tau - xztau.tau * yztau.tau)
            / sqrt((1.0 - xztau.tau * xztau.tau)
                   * (1.0 - yztau.tau * yztau.tau))
       END AS tau_partial
FROM xytau, xztau, yztau
"""


# --- aligned ranks ----------------------------------------------------------


def q_aligned_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman aligned-ranks over the (day-block x event-type) count
    design — the cross-block-magnitude-aware reading of the registered
    q_friedman / staged q_kendall_w question: do event types rank
    consistently once each day's overall volume is aligned out?
    (operators/stats.py aligned_ranks_cells.)"""
    from npm_mirror_spark.operators.stats import aligned_ranks_cells

    ev = _t(spark, sf_dir, "events")
    daily = ev.filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.col("event_type").alias("t"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return aligned_ranks_cells(daily, "d", "t", "n")


_ALIGNED_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, event_type AS t, count(*) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY date_trunc('day', ts), event_type
),
kf AS (SELECT count(DISTINCT t) AS k FROM daily),
per_b AS (
  SELECT d, count(*) AS nr, count(DISTINCT t) AS nt,
    sum(CAST(n AS HUGEINT)) AS bs
  FROM daily GROUP BY d
),
complete AS (
  SELECT per_b.d, per_b.bs, kf.k FROM per_b, kf
  WHERE nr = k AND nt = k
),
aligned AS (
  SELECT daily.d, daily.t,
    CAST(complete.k AS HUGEINT) * daily.n - complete.bs AS a
  FROM daily JOIN complete ON daily.d = complete.d
),
vc AS (SELECT a, count(*) AS c FROM aligned GROUP BY a),
mr AS (
  SELECT a,
    2 * coalesce(sum(c) OVER (ORDER BY a
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
      AS mr2
  FROM vc
),
ranked AS (
  SELECT aligned.d, aligned.t, CAST(mr.mr2 AS HUGEINT) AS mr2
  FROM aligned JOIN mr ON aligned.a = mr.a
),
per_t AS (
  SELECT t, count(*) AS n_blocks, sum(mr2) AS r2
  FROM ranked GROUP BY t
),
meta AS (SELECT coalesce(sum(mr2 * mr2), 0) AS tsq FROM ranked),
bsq AS (
  SELECT coalesce(sum(bsum * bsum), 0) AS v
  FROM (SELECT sum(mr2) AS bsum FROM ranked GROUP BY d)
),
kmeta AS (SELECT count(DISTINCT t) AS k_treatments FROM aligned)
SELECT per_t.t,
  CAST(per_t.n_blocks AS BIGINT) AS n_blocks,
  CAST(kmeta.k_treatments AS BIGINT) AS k_treatments,
  CAST(per_t.r2 AS DOUBLE) AS r_x2,
  CAST(meta.tsq AS DOUBLE) AS total_sq_x4,
  CAST(bsq.v AS DOUBLE) AS block_sq_sum_x4
FROM per_t, meta, bsq, kmeta
ORDER BY per_t.t
"""


# --- robust two-sample / shape / outlier tier -------------------------------


def q_yuen_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen trimmed/winsorized cells between returned-line and
    kept-line quantities — the tail-proof reading of the location
    question q_rank_sum answers ordinally and q_hodges_lehmann
    answers as a shift estimate, on the same fixture.
    (operators/stats.py trimmed_cells.)"""
    from npm_mirror_spark.operators.stats import trimmed_cells

    li = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    return trimmed_cells(li, "qty", F.col("ret"))


_YUEN_SQL = """
WITH src AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS v,
    coalesce(l_returnflag = 'R', FALSE) AS a
  FROM lineitem WHERE l_quantity IS NOT NULL
),
g AS (SELECT a, v, count(*) AS c FROM src GROUP BY a, v),
pri AS (
  SELECT a, v, c,
    coalesce(sum(c) OVER (PARTITION BY a ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p,
    sum(c) OVER (PARTITION BY a) AS n
  FROM g
),
per AS (
  SELECT a, max(n) AS n_i, max(n // 5) AS g_trim,
    coalesce(sum(greatest(0, least(p + c, n - n // 5)
                             - greatest(p, n // 5))
                 * CAST(v AS HUGEINT)), 0) AS ts,
    coalesce(sum(greatest(0, least(p + c, n - n // 5)
                             - greatest(p, n // 5))
                 * CAST(v AS HUGEINT) * v), 0) AS tq,
    min(CASE WHEN p + c >= n // 5 + 1 THEN v END) AS vlo,
    min(CASE WHEN p + c >= n - n // 5 THEN v END) AS vhi
  FROM pri GROUP BY a
)
SELECT a AS in_a,
  CAST(n_i AS BIGINT) AS n_i,
  CAST(g_trim AS BIGINT) AS g_trim,
  CAST(n_i - 2 * g_trim AS BIGINT) AS trim_n,
  CAST(ts AS DOUBLE) AS trim_sum,
  CAST(ts + CAST(g_trim AS HUGEINT) * (CAST(vlo AS HUGEINT) + vhi)
       AS DOUBLE) AS win_sum,
  CAST(tq + CAST(g_trim AS HUGEINT)
            * (CAST(vlo AS HUGEINT) * vlo + CAST(vhi AS HUGEINT) * vhi)
       AS DOUBLE) AS win_sumsq,
  CASE WHEN n_i - 2 * g_trim > 0
       THEN CAST(ts AS DOUBLE) / CAST(n_i - 2 * g_trim AS DOUBLE)
       END AS trim_mean
FROM per ORDER BY in_a
"""


def q_robust_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley quartile skew + Moors octile kurtosis of the daily
    event-count series — the robust shape reading next to
    q_jarque_bera's moment-based one on the SAME series: when the two
    disagree, the tails are lying to the moments.
    (operators/stats.py robust_shape_cells.)"""
    from npm_mirror_spark.operators.stats import robust_shape_cells

    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return robust_shape_cells(daily, "n")


def _octile_sql(num: int) -> str:
    return f"""
    CASE WHEN (n * {num}) % 8 = 0
         THEN min(CASE WHEN cum >= (n * {num}) // 8 THEN v END)
              + min(CASE WHEN cum >= (n * {num}) // 8 + 1 THEN v END)
         ELSE 2 * min(CASE WHEN cum >= (n * {num}) // 8 + 1 THEN v END)
    END AS e{num}_2"""


_ROBUST_SHAPE_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS nn FROM events
  WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
vals AS (SELECT nn AS v, count(*) AS c FROM daily GROUP BY nn),
pri AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
  FROM vals
),
picks AS (
  SELECT max(n) AS n_rows,
{",".join(_octile_sql(i) for i in range(1, 8))}
  FROM pri GROUP BY n
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
  {", ".join(f"CAST(e{i}_2 AS DOUBLE) AS e{i}_2" for i in range(1, 8))},
  CASE WHEN e6_2 - e2_2 > 0
       THEN (CAST(e6_2 AS DOUBLE) + CAST(e2_2 AS DOUBLE)
             - 2.0 * CAST(e4_2 AS DOUBLE))
            / (CAST(e6_2 AS DOUBLE) - CAST(e2_2 AS DOUBLE))
       END AS bowley,
  CASE WHEN e6_2 - e2_2 > 0
       THEN ((CAST(e7_2 AS DOUBLE) - CAST(e5_2 AS DOUBLE))
             + (CAST(e3_2 AS DOUBLE) - CAST(e1_2 AS DOUBLE)))
            / (CAST(e6_2 AS DOUBLE) - CAST(e2_2 AS DOUBLE))
       END AS moors
FROM picks
"""


def q_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot-fence outlier census over floored order total
    price — the quartile-rule outlier gate next to the z-score and
    MAD gates (q_zscore_outliers / q_mad_outliers), assumption-free
    where those need symmetric or light tails.  (operators/stats.py
    tukey_fence_cells.)"""
    from npm_mirror_spark.operators.stats import tukey_fence_cells

    o = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice")).cast("long").alias("price")
    )
    return tukey_fence_cells(o, "price")


def _quartile_sql(num: int, alias: str) -> str:
    return f"""
    CASE WHEN (n * {num}) % 4 = 0
         THEN min(CASE WHEN cum >= (n * {num}) // 4 THEN v END)
              + min(CASE WHEN cum >= (n * {num}) // 4 + 1 THEN v END)
         ELSE 2 * min(CASE WHEN cum >= (n * {num}) // 4 + 1 THEN v END)
    END AS {alias}"""


_TUKEY_SQL = f"""
WITH src AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders
  WHERE o_totalprice IS NOT NULL
),
vals AS (SELECT v, count(*) AS c FROM src GROUP BY v),
pri AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
  FROM vals
),
quart AS (
  SELECT
{_quartile_sql(1, "q1")},
{_quartile_sql(2, "q2")},
{_quartile_sql(3, "q3")}
  FROM pri GROUP BY n
),
fences AS (
  SELECT q1, q2, q3,
    5 * CAST(q1 AS HUGEINT) - 3 * q3 AS lo4,
    5 * CAST(q3 AS HUGEINT) - 3 * q1 AS hi4
  FROM quart
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  max(CAST(q1 AS DOUBLE)) AS q1_2,
  max(CAST(q2 AS DOUBLE)) AS med2,
  max(CAST(q3 AS DOUBLE)) AS q3_2,
  max(CAST(lo4 AS DOUBLE)) AS lo_fence_x4,
  max(CAST(hi4 AS DOUBLE)) AS hi_fence_x4,
  CAST(sum(CASE WHEN 4 * CAST(v AS HUGEINT) < lo4 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_low_out,
  CAST(sum(CASE WHEN 4 * CAST(v AS HUGEINT) > hi4 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_high_out,
  CASE WHEN count(*) > 0
       THEN CAST(sum(CASE WHEN 4 * CAST(v AS HUGEINT) < lo4
                           OR 4 * CAST(v AS HUGEINT) > hi4
                          THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)
       END AS out_rate
FROM src CROSS JOIN fences
"""


def q_footrule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman's footrule between the quantity and price-hectobucket
    rankings of lineitems — the L1 companion to the registered
    q_spearman (L2) on a related fixture: do the two orderings move
    rows far apart on average?  (operators/checks.py footrule_cells.)"""
    from npm_mirror_spark.operators.checks import footrule_cells

    li = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") / 100).cast("long").alias("hecto"),
    )
    return footrule_cells(li, "qty", "hecto")


_FOOTRULE_SQL = """
WITH g AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS x,
    CAST(floor(l_extendedprice / 100) AS BIGINT) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
vx AS (SELECT x, count(*) AS c FROM g GROUP BY x),
mx AS (
  SELECT x,
    2 * coalesce(sum(c) OVER (ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
      AS rx2
  FROM vx
),
vy AS (SELECT y, count(*) AS c FROM g GROUP BY y),
my AS (
  SELECT y,
    2 * coalesce(sum(c) OVER (ORDER BY y
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
      AS ry2
  FROM vy
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum(abs(CAST(mx.rx2 AS HUGEINT) - my.ry2)), 0)
       AS DOUBLE) AS footrule_x2,
  CAST(coalesce(sum((CAST(mx.rx2 AS HUGEINT) - my.ry2)
                    * (CAST(mx.rx2 AS HUGEINT) - my.ry2)), 0)
       AS DOUBLE) AS sq_diff_x4
FROM g JOIN mx ON g.x = mx.x JOIN my ON g.y = my.y
"""


STAGED_QUERIES = {
    "q_cronbach": q_cronbach,
    "q_gwet_ac1": q_gwet_ac1,
    "q_tau_partial": q_tau_partial,
    "q_aligned_ranks": q_aligned_ranks,
    "q_yuen_trim": q_yuen_trim,
    "q_robust_shape": q_robust_shape,
    "q_tukey_fences": q_tukey_fences,
    "q_footrule": q_footrule,
}

STAGED_ORACLES = {
    "q_cronbach": _CRONBACH_SQL,
    "q_gwet_ac1": _gwet_oracle(),
    "q_tau_partial": _TAU_PARTIAL_SQL,
    "q_aligned_ranks": _ALIGNED_SQL,
    "q_yuen_trim": _YUEN_SQL,
    "q_robust_shape": _ROBUST_SHAPE_SQL,
    "q_tukey_fences": _TUKEY_SQL,
    "q_footrule": _FOOTRULE_SQL,
}
