"""Staged registry faces for the r14 driver-window tail.

The r13 window froze with all 23 tail slots taken (the 12 lifted
staging_r13.py registrations + 11 staleness re-checks), and the hard
rule since r11 is that new faces land ONLY in free tail slots of the
round that registers them (docs/DRIVER_WINDOW.md) — so r13's new
operators ship here: fully face-shaped (each callable takes
(spark, sf_dir) and returns a DataFrame) with their DuckDB oracles,
driven by the SAME harness comparison as the registry
(tests/test_r13_ops.py), but NOT in ``queries.QUERIES``.  The r14
rotation lifts these dicts into the registry exactly the way the r13
rotation lifted staging_r13.py; the pre-planned r14 tail
(docs/DRIVER_WINDOW.md) = these 13 + the 10 remaining r03-era rows.

Every face follows the registry contracts: driver-hashable output
types only (no decimal/array/map), aliased columns matching the oracle
exactly, bounded plans (no unguarded cross products), and the
exact-integer / fixed-IEEE-expression determinism the stats tier pins
(floats only as ONE fixed IEEE op sequence on exact-int-valued inputs;
cross-row float sums are refused and left to consumers).

Plan-lint note: 6 of the 13 faces plan a BroadcastNestedLoopJoin;
their `tests/test_plans.py::ALLOWED_BNLJ` entries (to be added with
the r14 registration) are pre-documented here — all the allowlisted
1-row-fold and bounded-grid classes:

    "q_somers_d": "zero-filled (prio x line-count) grid build +
        1-row tie/meta folds (the q_gk_gamma bounded-grid class)",
    "q_tau_c": "zero-filled (p_size x price-decade) grid build +
        1-row tie/meta folds (the q_gk_gamma bounded-grid class)",
    "q_fleiss_kappa": "three 1-row folds (subject spectrum, category
        spectrum, dropped count) broadcast (the q_kappa shape)",
    "q_weighted_kappa": "bounded (k x k) rating-margin cross product +
        two 1-row folds (the q_gk_gamma bounded-grid class)",
    "q_signed_rank": "1-row rank-sum fold broadcast onto the 1-row
        pair-count fold (the q_kappa shape)",
    "q_cvm2": "1-row group-total fold broadcast onto the bounded
        quantity axis + _with_prior_sums' (min,max) stats row (the
        q_quantile_norm shape)",

(q_bowker plans only an equi self-join on the canonical pair key;
q_cox_stuart an equi index join over the bounded day axis;
q_seasonal_mk an equi-on-season join with an in-season day residual;
q_buishand / q_nelson_aalen / q_gehan only bounded prefix windows;
q_yule_k a single spectrum fold — no BNLJ in any of the seven.)

The r14 WINDOW_TAIL to paste at rotation (the 13 staged below + the
last 10 r03-era ledger rows, registration order)::

    WINDOW_TAIL: tuple[str, ...] = (
        "q_somers_d", "q_tau_c", "q_fleiss_kappa", "q_weighted_kappa",
        "q_bowker", "q_signed_rank", "q_cvm2", "q_cox_stuart",
        "q_seasonal_mk", "q_buishand", "q_nelson_aalen", "q_gehan",
        "q_yule_k",
        "q_nation_volume", "q_market_share", "q_priority_lines",
        "q_promo_revenue", "q_supplier_part_count",
        "q_disjunctive_revenue", "q_idle_rich_customers",
        "q_cube_counts", "q_rank_family", "q_set_ops",
    )
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# the registry's shared normalization (queries.py _NORM — duplicated
# as a literal here exactly like faces_r12.py, so this module imports
# standalone)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def q_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D / tau-b / gamma with the full tie decomposition: does
    a MORE urgent order priority come with MORE lineitems?  x = the
    o_orderpriority string (ordinal by its leading digit = its
    lexicographic order, the q_order_priority_check convention), y =
    the order's lineitem count (1..7 by construction) — orders with no
    lineitems drop with the inner join.  (operators/checks.py
    ordinal_assoc_cells; somers_dyx here reads "does priority predict
    line count".)"""
    from npm_mirror_spark.operators.checks import ordinal_assoc_cells

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    nl = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("nlines"))
    j = o.join(nl, o["o_orderkey"] == nl["l_orderkey"]).select(
        F.col("o_orderpriority").alias("prio"), "nlines"
    )
    return ordinal_assoc_cells(j, "prio", "nlines")


def q_tau_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuart's tau-c (with the rest of the concordance family) on a
    deliberately RECTANGULAR grid — part size (1..50) vs retail-price
    decade (floor(p_retailprice/10), ~10 buckets): tau-b cannot reach
    +/-1 on a 50x10 table; tau-c's 2m/(n^2(m-1)) scaling corrects for
    exactly that, which is what this face demonstrates next to
    q_somers_d's near-square grid.  (operators/checks.py
    ordinal_assoc_cells.)"""
    from npm_mirror_spark.operators.checks import ordinal_assoc_cells

    p = _t(spark, sf_dir, "part").select(
        F.col("p_size").alias("size"),
        F.floor(F.col("p_retailprice") / 10).cast("long").alias("decade"),
    )
    return ordinal_assoc_cells(p, "size", "decade")


# shared SQL: the exact dominance + tie decomposition replay (the
# q_gk_gamma oracle's cells-level pair join, extended with margins)
def _assoc_sql(src: str) -> str:
    return f"""
WITH g AS ({src}),
cells AS (SELECT x, y, count(*) AS c FROM g GROUP BY x, y),
pairs AS (
  SELECT CAST(a.c AS HUGEINT) * b.c AS p,
    a.y < b.y AS conc, a.y > b.y AS disc
  FROM cells a JOIN cells b ON a.x < b.x
),
tot AS (
  SELECT coalesce(sum(CASE WHEN conc THEN p ELSE 0 END), 0) AS cc,
         coalesce(sum(CASE WHEN disc THEN p ELSE 0 END), 0) AS dd
  FROM pairs
),
tx AS (
  SELECT coalesce(sum((CAST(nx AS HUGEINT) * (nx - 1)) // 2), 0) AS t
  FROM (SELECT sum(c) AS nx FROM cells GROUP BY x)
),
ty AS (
  SELECT coalesce(sum((CAST(ny AS HUGEINT) * (ny - 1)) // 2), 0) AS t
  FROM (SELECT sum(c) AS ny FROM cells GROUP BY y)
),
txy AS (
  SELECT coalesce(sum((CAST(c AS HUGEINT) * (c - 1)) // 2), 0) AS t,
         count(*) AS n_cells
  FROM cells
),
dims AS (
  SELECT count(DISTINCT x) AS dx, count(DISTINCT y) AS dy FROM cells
),
meta AS (SELECT count(*) AS n_rows FROM g),
one AS (
  SELECT n_rows, n_cells, dx, dy, cc, dd,
    tx.t AS txv, ty.t AS tyv, txy.t AS txyv,
    (CAST(n_rows AS HUGEINT) * (n_rows - 1)) // 2 AS p,
    cc - dd AS s,
    least(dx, dy) AS m
  FROM meta, tot, tx, ty, txy, dims
)
SELECT n_rows, CAST(n_cells AS BIGINT) AS n_cells,
  CAST(dx AS BIGINT) AS dx, CAST(dy AS BIGINT) AS dy,
  CAST(p AS DOUBLE) AS pairs_total,
  CAST(cc AS DOUBLE) AS concordant,
  CAST(dd AS DOUBLE) AS discordant,
  CAST(txv - txyv AS DOUBLE) AS tied_x_only,
  CAST(tyv - txyv AS DOUBLE) AS tied_y_only,
  CAST(txyv AS DOUBLE) AS tied_xy,
  CASE WHEN cc + dd > 0
       THEN CAST(s AS DOUBLE) / CAST(cc + dd AS DOUBLE) END AS gamma,
  CASE WHEN p - txv > 0
       THEN CAST(s AS DOUBLE) / CAST(p - txv AS DOUBLE) END AS somers_dyx,
  CASE WHEN p - tyv > 0
       THEN CAST(s AS DOUBLE) / CAST(p - tyv AS DOUBLE) END AS somers_dxy,
  CASE WHEN p - txv > 0 AND p - tyv > 0
       THEN CAST(s AS DOUBLE) / sqrt(CAST((p - txv) * (p - tyv) AS DOUBLE))
       END AS tau_b,
  CASE WHEN m > 1 AND n_rows > 0
       THEN CAST(2 * CAST(m AS HUGEINT) * s AS DOUBLE)
            / CAST(CAST(n_rows AS HUGEINT) * n_rows * (m - 1) AS DOUBLE)
       END AS tau_c
FROM one
"""


_SOMERS_SQL = _assoc_sql(
    """
  SELECT o.o_orderpriority AS x, nl.nlines AS y
  FROM orders o
  JOIN (SELECT l_orderkey, count(*) AS nlines
        FROM lineitem GROUP BY l_orderkey) nl
    ON o.o_orderkey = nl.l_orderkey
  WHERE o.o_orderpriority IS NOT NULL
"""
)

_TAUC_SQL = _assoc_sql(
    """
  SELECT p_size AS x, CAST(floor(p_retailprice / 10) AS BIGINT) AS y
  FROM part WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
"""
)


def _doc_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic heuristic 'raters' each assigning every
    document a quality tier in {0, 1, 2} — the multi-rater fixture
    q_fleiss_kappa audits (how much do cheap heuristics agree beyond
    chance?): L = character-length tier, T = whitespace-token tier,
    P = sentence-period tier.  Fixed integer thresholds; docs with
    NULL text or n_chars are excluded up front so every kept doc has
    exactly 3 ratings."""
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
        .unionByName(base.select("doc_id", F.col("__p").alias("tier")))
    )


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across three deterministic quality heuristics
    (length / token / sentence tiers, :func:`_doc_raters`) voting on
    every document — the multi-rater labeling-pipeline audit
    :func:`~npm_mirror_spark.operators.checks.cohens_kappa` (two
    raters) cannot express.  (operators/checks.py
    fleiss_kappa_cells.)"""
    from npm_mirror_spark.operators.checks import fleiss_kappa_cells

    return fleiss_kappa_cells(_doc_raters(spark, sf_dir), "doc_id", "tier", 3)


# the three raters replayed in SQL.  Token count replays ws_token_count
# = size(split(norm, ' ')) — COUNTING empty-string tokens like Spark's
# split on an empty normalized string (len('') -> ['']) -- len of
# str_split is identical in DuckDB.
_RATERS_SQL = f"""
src AS (
  SELECT doc_id, text, n_chars, {_NORM} AS norm,
    length(text) - length(replace(text, '.', '')) AS nper
  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
),
tiers AS (
  SELECT doc_id,
    CASE WHEN n_chars < 200 THEN 0
         WHEN n_chars < 1000 THEN 1 ELSE 2 END AS tl,
    CASE WHEN len(str_split(norm, ' ')) < 40 THEN 0
         WHEN len(str_split(norm, ' ')) < 200 THEN 1 ELSE 2 END AS tt,
    CASE WHEN nper < 2 THEN 0
         WHEN nper < 10 THEN 1 ELSE 2 END AS tp
  FROM src
),
ratings AS (
  SELECT doc_id, tl AS tier FROM tiers
  UNION ALL SELECT doc_id, tt FROM tiers
  UNION ALL SELECT doc_id, tp FROM tiers
)
"""

_FLEISS_SQL = f"""
WITH {_RATERS_SQL},
nij AS (
  SELECT doc_id, tier, count(*) AS nij FROM ratings GROUP BY doc_id, tier
),
per_subj AS (
  SELECT doc_id, sum(nij) AS cnt,
         sum(CAST(nij AS HUGEINT) * nij) AS q
  FROM nij GROUP BY doc_id
),
complete AS (SELECT * FROM per_subj WHERE cnt = 3),
dropped AS (
  SELECT count(*) AS n_dropped FROM per_subj WHERE cnt != 3
),
qn AS (
  SELECT count(*) AS n_subjects, coalesce(sum(q), 0) AS q_sum FROM complete
),
cj AS (
  SELECT tier, sum(nij.nij) AS cj
  FROM nij JOIN complete USING (doc_id) GROUP BY tier
),
ssum AS (
  SELECT count(*) AS n_categories,
         coalesce(sum(CAST(cj AS HUGEINT) * cj), 0) AS s_sum
  FROM cj
),
one AS (
  SELECT n_subjects, n_categories, n_dropped, q_sum, s_sum,
    CAST(n_subjects AS HUGEINT) * 3 AS t
  FROM qn, ssum, dropped
)
SELECT CAST(n_subjects AS BIGINT) AS n_subjects,
  3 AS n_raters,
  CAST(n_categories AS BIGINT) AS n_categories,
  CAST(n_dropped AS BIGINT) AS n_dropped,
  CAST(q_sum AS DOUBLE) AS q_sum,
  CAST(s_sum AS DOUBLE) AS s_sum,
  CASE WHEN n_subjects > 0
       THEN CAST(q_sum - t AS DOUBLE) / CAST(t * 2 AS DOUBLE) END AS p_bar,
  CASE WHEN n_subjects > 0
       THEN CAST(s_sum AS DOUBLE) / CAST(t * t AS DOUBLE) END AS p_e,
  CASE WHEN 2 * (t * t - s_sum) != 0
       THEN CAST((q_sum - t) * t - s_sum * 2 AS DOUBLE)
            / CAST(2 * (t * t - s_sum) AS DOUBLE) END AS kappa
FROM one
"""


def q_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted Cohen's kappa between two ordinal document
    tiers on the SAME 0-3 scale — character-length tier (from the
    n_chars column) vs whitespace-token tier: near-miss disagreements
    (adjacent tiers) charged 1, opposite-end blunders 3.
    (operators/checks.py weighted_kappa_cells.)"""
    from npm_mirror_spark.operators.checks import weighted_kappa_cells
    from npm_mirror_spark.operators.text import ws_token_count

    d = _t(spark, sf_dir, "documents").select("text", "n_chars").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    tier_a = (
        F.when(F.col("n_chars") < 200, 0)
        .when(F.col("n_chars") < 500, 1)
        .when(F.col("n_chars") < 1000, 2)
        .otherwise(3)
    )
    ntok = ws_token_count("text")
    tier_b = (
        F.when(ntok < 40, 0)
        .when(ntok < 100, 1)
        .when(ntok < 200, 2)
        .otherwise(3)
    )
    pair = d.select(tier_a.alias("a"), tier_b.alias("b"))
    return weighted_kappa_cells(pair, "a", "b")


_WKAPPA_SQL = f"""
WITH src AS (
  SELECT n_chars, {_NORM} AS norm FROM documents
  WHERE text IS NOT NULL AND n_chars IS NOT NULL
),
pair AS (
  SELECT
    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 500 THEN 1
         WHEN n_chars < 1000 THEN 2 ELSE 3 END AS a,
    CASE WHEN len(str_split(norm, ' ')) < 40 THEN 0
         WHEN len(str_split(norm, ' ')) < 100 THEN 1
         WHEN len(str_split(norm, ' ')) < 200 THEN 2 ELSE 3 END AS b
  FROM src
),
cells AS (SELECT a, b, count(*) AS c FROM pair GROUP BY a, b),
do_ AS (
  SELECT coalesce(sum(CAST(abs(a - b) AS HUGEINT) * c), 0) AS d_o,
         coalesce(sum(c), 0) AS n, count(*) AS n_cells
  FROM cells
),
rm AS (SELECT a AS i, count(*) AS rm FROM pair GROUP BY a),
cm AS (SELECT b AS j, count(*) AS cm FROM pair GROUP BY b),
de AS (
  SELECT coalesce(sum(CAST(abs(i - j) AS HUGEINT)
                      * (CAST(rm AS HUGEINT) * cm)), 0) AS d_e_num
  FROM rm CROSS JOIN cm
)
SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
  CAST(d_o AS DOUBLE) AS d_o,
  CAST(d_e_num AS DOUBLE) AS d_e_num,
  CASE WHEN d_e_num > 0
       THEN 1.0 - CAST(d_o * n AS DOUBLE) / CAST(d_e_num AS DOUBLE)
       END AS kappa_w
FROM do_, de
"""


def q_bowker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker symmetry cells over customer priority drift: each
    customer's FIRST order priority (by order date, orderkey
    tie-break) vs their LAST — are 'URGENT -> LOW' transitions as
    common as 'LOW -> URGENT'?  Single-order customers pair with
    themselves and drop with the diagonal; the per-pair chi terms sum
    (consumer-side) to Bowker's statistic.  (operators/checks.py
    bowker_cells.)"""
    from npm_mirror_spark.operators.checks import bowker_cells

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    ).filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderpriority").isNotNull()
    )
    w_first = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    w_last = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked = o.select(
        "o_custkey",
        "o_orderpriority",
        F.row_number().over(w_first).alias("__rf"),
        F.row_number().over(w_last).alias("__rl"),
    )
    first = ranked.where(F.col("__rf") == 1).select(
        "o_custkey", F.col("o_orderpriority").alias("first_prio")
    )
    last = ranked.where(F.col("__rl") == 1).select(
        "o_custkey", F.col("o_orderpriority").alias("last_prio")
    )
    pair = first.join(last, "o_custkey")
    return bowker_cells(pair, "first_prio", "last_prio")


_BOWKER_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
),
ranked AS (
  SELECT o_custkey, o_orderpriority,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rf,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl
  FROM o
),
pair AS (
  SELECT f.o_custkey, f.o_orderpriority AS a, l.o_orderpriority AS b
  FROM (SELECT * FROM ranked WHERE rf = 1) f
  JOIN (SELECT * FROM ranked WHERE rl = 1) l USING (o_custkey)
),
offd AS (SELECT a, b, count(*) AS c FROM pair WHERE a != b GROUP BY a, b),
up AS (SELECT a AS cat_lo, b AS cat_hi, c AS n_lo_hi FROM offd WHERE a < b),
down AS (SELECT b AS cat_lo, a AS cat_hi, c AS n_hi_lo FROM offd WHERE a > b),
j AS (
  SELECT coalesce(up.cat_lo, down.cat_lo) AS cat_lo,
         coalesce(up.cat_hi, down.cat_hi) AS cat_hi,
         coalesce(n_lo_hi, 0) AS n_lo_hi,
         coalesce(n_hi_lo, 0) AS n_hi_lo
  FROM up FULL OUTER JOIN down
    ON up.cat_lo = down.cat_lo AND up.cat_hi = down.cat_hi
)
SELECT cat_lo, cat_hi,
  CAST(n_lo_hi AS BIGINT) AS n_lo_hi,
  CAST(n_hi_lo AS BIGINT) AS n_hi_lo,
  CAST(n_lo_hi - n_hi_lo AS DOUBLE) * CAST(n_lo_hi - n_hi_lo AS DOUBLE)
    / CAST(n_lo_hi + n_hi_lo AS DOUBLE) AS chi_term
FROM j ORDER BY cat_lo, cat_hi
"""


def q_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank over paired per-user activity: each user's
    event count in the FIRST half of the observed window vs the
    SECOND half (halves split at the integer-midpoint day of the
    global [min, max] ts range — data-derived, deterministic).  The
    paired companion to q_rank_sum: same user, two periods — did
    activity shift?  (operators/stats.py signed_rank_cells.)"""
    from npm_mirror_spark.operators.stats import signed_rank_cells

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("ts").cast("date").alias("__day")
    ).filter(F.col("user_id").isNotNull() & F.col("__day").isNotNull())
    bounds = ev.agg(
        F.min("__day").alias("__lo"), F.max("__day").alias("__hi")
    )
    mid = F.date_add(
        F.col("__lo"),
        F.floor(F.datediff(F.col("__hi"), F.col("__lo")) / 2).cast("int"),
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .select("user_id", (F.col("__day") < mid).alias("__in_first"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("__in_first"), 1).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("__in_first"), 0).otherwise(1)).alias("y"),
        )
    )
    return signed_rank_cells(per_user, "x", "y")


_SIGNED_RANK_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
bounds AS (
  SELECT min(day) AS lo,
    min(day) + INTERVAL 1 DAY
      * CAST(floor(date_diff('day', min(day), max(day)) / 2) AS BIGINT)
      AS mid
  FROM ev
),
per_user AS (
  SELECT user_id,
    sum(CASE WHEN day < (SELECT mid FROM bounds) THEN 1 ELSE 0 END) AS x,
    sum(CASE WHEN day < (SELECT mid FROM bounds) THEN 0 ELSE 1 END) AS y
  FROM ev GROUP BY user_id
),
d AS (SELECT CAST(x AS BIGINT) - CAST(y AS BIGINT) AS d FROM per_user),
alln AS (
  SELECT count(*) AS n_pairs,
    sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS n_zero
  FROM d
),
per_v AS (
  SELECT abs(d) AS ad,
    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cnt_p,
    sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS cnt_n
  FROM d WHERE d != 0 GROUP BY abs(d)
),
pri AS (
  SELECT ad, cnt_p, cnt_n,
    coalesce(sum(cnt_p + cnt_n) OVER (ORDER BY ad
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM per_v
),
sums AS (
  SELECT
    coalesce(sum(CAST(cnt_p AS HUGEINT)
                 * (2 * below + cnt_p + cnt_n + 1)), 0) AS w_plus_x2,
    coalesce(sum(CAST(cnt_n AS HUGEINT)
                 * (2 * below + cnt_p + cnt_n + 1)), 0) AS w_minus_x2,
    coalesce(sum(cnt_p + cnt_n), 0) AS n_nonzero
  FROM pri
)
SELECT n_pairs, CAST(n_zero AS BIGINT) AS n_zero,
  CAST(n_nonzero AS BIGINT) AS n_nonzero,
  CAST(w_plus_x2 AS DOUBLE) AS w_plus_x2,
  CAST(w_minus_x2 AS DOUBLE) AS w_minus_x2,
  CASE WHEN n_nonzero > 0
       THEN CAST(w_plus_x2 - w_minus_x2 AS DOUBLE)
            / CAST(CAST(n_nonzero AS HUGEINT) * (n_nonzero + 1) AS DOUBLE)
       END AS rank_biserial
FROM alln, sums
"""


def q_cvm2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises cells: returned lines
    (l_returnflag = 'R') vs the rest over the integral quantity axis
    (floor(l_quantity), 1..50 — bounded by construction).  The
    whole-CDF companion to the registered q_ks_stat; the statistic is
    the consumer Sigma over these 50 rows.  (operators/stats.py
    cvm2_cells.)"""
    from npm_mirror_spark.operators.stats import cvm2_cells

    li = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    return cvm2_cells(li, "qty", F.col("ret"))


_CVM2_SQL = """
WITH src AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS qty,
    coalesce(l_returnflag = 'R', FALSE) AS ret
  FROM lineitem WHERE l_quantity IS NOT NULL
),
g AS (
  SELECT qty,
    sum(CASE WHEN ret THEN 1 ELSE 0 END) AS cnt_a,
    sum(CASE WHEN ret THEN 0 ELSE 1 END) AS cnt_b
  FROM src GROUP BY qty
),
tot AS (
  SELECT sum(cnt_a) AS n1, sum(cnt_b) AS n2 FROM g
),
pri AS (
  SELECT qty, cnt_a, cnt_b,
    sum(cnt_a) OVER (ORDER BY qty
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
    sum(cnt_b) OVER (ORDER BY qty
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
  FROM g
)
SELECT qty, CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
  CAST(ca AS BIGINT) AS cum_a, CAST(cb AS BIGINT) AS cum_b,
  CAST(CAST(ca AS HUGEINT) * tot.n2
       - CAST(cb AS HUGEINT) * tot.n1 AS DOUBLE) AS diff_num,
  CAST(cnt_a + cnt_b AS BIGINT) AS w
FROM pri, tot ORDER BY qty
"""


def q_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox–Stuart trend cells over the daily event-count series: pair
    each of the first h days with its half-spaced partner and count
    sign directions — the cheap is-the-volume-drifting gate next to
    the registered q_mann_kendall (which weighs all O(n^2) day
    pairs).  (operators/temporal.py cox_stuart_cells.)"""
    from npm_mirror_spark.operators.temporal import cox_stuart_cells

    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return cox_stuart_cells(daily, "day", "n")


_COX_STUART_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events
  WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
idx AS (
  SELECT n AS x, row_number() OVER (ORDER BY day) AS i,
    count(*) OVER () AS nn
  FROM daily
),
pairs AS (
  SELECT a.x AS xa, b.x AS xb, a.nn
  FROM (SELECT * FROM idx WHERE i <= nn // 2) a
  JOIN idx b ON b.i = a.i + (a.nn - a.nn // 2)
)
SELECT max(nn) AS n_days,
  count(*) AS n_pairs,
  CAST(coalesce(sum(CASE WHEN xb > xa THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_pos,
  CAST(coalesce(sum(CASE WHEN xb < xa THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_neg,
  CAST(coalesce(sum(CASE WHEN xb = xa THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_tie,
  CASE WHEN count(*) > 0
       THEN CAST(sum(CASE WHEN xb > xa THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(count(*) AS DOUBLE) END AS pos_share
FROM pairs
"""


def q_seasonal_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hirsch–Slack seasonal Mann–Kendall over daily ORDER counts,
    seasons = day-of-week: weekday cycles read as trend by a raw MK;
    comparing Mondays only with Mondays removes them.  Day-of-week
    convention pinned to Spark's dayofweek (Sunday = 1); the oracle
    replays it as EXTRACT(dow) + 1.  (operators/temporal.py
    seasonal_mk_cells.)"""
    from npm_mirror_spark.operators.temporal import seasonal_mk_cells

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return seasonal_mk_cells(daily, "day", "n")


_SEASONAL_MK_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders
  WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
),
g AS (
  SELECT CAST(EXTRACT(dow FROM day) + 1 AS INTEGER) AS season, day, n
  FROM daily
),
pairs AS (
  SELECT a.season,
    CASE WHEN b.n > a.n THEN 1 ELSE 0 END AS conc,
    CASE WHEN b.n < a.n THEN 1 ELSE 0 END AS disc,
    CASE WHEN b.n = a.n THEN 1 ELSE 0 END AS tie
  FROM g a JOIN g b ON a.season = b.season AND b.day > a.day
),
per_season AS (
  SELECT season, count(*) AS n_pairs, sum(conc) AS conc,
    sum(disc) AS disc, sum(tie) AS ties
  FROM pairs GROUP BY season
),
days AS (SELECT season, count(*) AS n_days FROM g GROUP BY season)
SELECT d.season, d.n_days,
  CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
  CAST(coalesce(p.conc, 0) - coalesce(p.disc, 0) AS BIGINT) AS s_stat,
  CAST(coalesce(p.conc, 0) AS BIGINT) AS n_concordant,
  CAST(coalesce(p.disc, 0) AS BIGINT) AS n_discordant,
  CAST(coalesce(p.ties, 0) AS BIGINT) AS n_ties
FROM days d LEFT JOIN per_season p USING (season)
ORDER BY d.season
"""


def q_buishand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buishand adjusted-partial-sum cells over the daily order-count
    series (n-scaled so every number is an exact integer) — the
    mean-shift homogeneity companion to the registered q_pettitt
    (rank-based) and q_changepoint (SSE-based) on the same kind of
    axis.  (operators/temporal.py buishand_cells.)"""
    from npm_mirror_spark.operators.temporal import buishand_cells

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return buishand_cells(daily, "day", "n")


_BUISHAND_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders
  WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
),
pre AS (
  SELECT day, n AS x,
    row_number() OVER (ORDER BY day) AS k,
    sum(n) OVER (ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_k,
    count(*) OVER () AS n_days,
    sum(n) OVER () AS total
  FROM daily
)
SELECT day, CAST(k AS BIGINT) AS k, CAST(x AS BIGINT) AS x,
  CAST(p_k AS BIGINT) AS p_k,
  CAST(n_days AS BIGINT) AS n_days,
  CAST(total AS BIGINT) AS total,
  CAST(CAST(n_days AS HUGEINT) * p_k
       - CAST(k AS HUGEINT) * total AS DOUBLE) AS n_sk_scaled
FROM pre ORDER BY day
"""


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard event table on the q_km_events
    fixture (time from order date to line shipment by return flag,
    open-status lines censored) — the hazard-scale reading of the same
    curves, with the per-time increment and its variance term as the
    two fixed IEEE divisions.  (operators/temporal.py
    nelson_aalen_cells.)"""
    from npm_mirror_spark.operators.temporal import nelson_aalen_cells

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_linestatus", "l_returnflag"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_returnflag").alias("flag"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("dur"),
        (F.col("l_linestatus") == "F").cast("int").alias("ev"),
    )
    return nelson_aalen_cells(j, "flag", "dur", "ev")


_NELSON_AALEN_SQL = """
WITH j AS (
  SELECT l.l_returnflag AS flag,
    date_diff('day', o.o_orderdate, l.l_shipdate) AS dur,
    CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END AS ev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_linestatus IS NOT NULL AND l.l_returnflag IS NOT NULL
    AND l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
),
per_t AS (
  SELECT flag, dur AS t, count(*) AS nn,
    sum(ev) AS d, sum(1 - ev) AS c
  FROM j GROUP BY flag, dur
),
cum AS (
  SELECT flag, t, nn, d, c,
    coalesce(sum(nn) OVER (PARTITION BY flag ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior,
    sum(nn) OVER (PARTITION BY flag) AS total
  FROM per_t
)
SELECT flag, CAST(t AS INTEGER) AS t,
  CAST(total - prior AS BIGINT) AS n_risk,
  CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
  CAST(d AS DOUBLE) / CAST(total - prior AS DOUBLE) AS na_term,
  CAST(d AS DOUBLE) * (CAST(total - prior AS DOUBLE) - CAST(d AS DOUBLE))
    / (CAST(total - prior AS DOUBLE) * CAST(total - prior AS DOUBLE)
       * CAST(total - prior AS DOUBLE)) AS var_term
FROM cum WHERE d > 0 ORDER BY flag, t
"""


def q_gehan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gehan–Breslow–Wilcoxon cells on the q_logrank fixture (returned
    lines vs the rest, stratified by order priority): the n-weighted
    log-rank whose weighting makes the per-time observed-minus-expected
    an EXACT integer — early shipping differences dominate, the
    deliberate contrast with the equally-weighted q_logrank on the
    same strata.  (operators/temporal.py gehan_cells.)"""
    from npm_mirror_spark.operators.temporal import gehan_cells

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_linestatus", "l_returnflag"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("dur"),
        (F.col("l_linestatus") == "F").cast("int").alias("ev"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    return gehan_cells(j, "prio", "dur", "ev", in_a=F.col("ret"))


_GEHAN_SQL = """
WITH src AS (
  SELECT o.o_orderpriority AS g,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS t,
         CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END AS e,
         coalesce(l.l_returnflag = 'R', FALSE) AS a
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority IS NOT NULL AND l.l_linestatus IS NOT NULL
    AND l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
),
per_t AS (
  SELECT g, t, count(*) AS n, sum(e) AS d,
         sum(CASE WHEN a THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN a THEN e ELSE 0 END) AS da
  FROM src GROUP BY g, t
),
risk AS (
  SELECT g, t, d, da,
    sum(n) OVER (PARTITION BY g)
      - coalesce(sum(n) OVER (PARTITION BY g ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nr,
    sum(na) OVER (PARTITION BY g)
      - coalesce(sum(na) OVER (PARTITION BY g ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nra
  FROM per_t
)
SELECT g AS prio, CAST(t AS INTEGER) AS t,
  CAST(nr AS BIGINT) AS n, CAST(d AS BIGINT) AS d,
  CAST(nra AS BIGINT) AS n_a, CAST(da AS BIGINT) AS d_a,
  CAST(CAST(nr AS HUGEINT) * da - CAST(nra AS HUGEINT) * d AS DOUBLE)
    AS w_o_minus_e_a,
  CASE WHEN nr > 1 THEN
    CAST(CAST(d AS HUGEINT) * nra * (nr - nra) * (nr - d) AS DOUBLE)
      / CAST(nr - 1 AS DOUBLE)
  ELSE 0.0 END AS w2_var_term
FROM risk WHERE d > 0 ORDER BY prio, t
"""


def q_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K / Simpson's D / Sichel's S over the documents corpus —
    the repetitiveness reading of the token frequency spectrum, next
    to the registered q_vocab_richness (missing-mass reading) and
    q_vocab_coverage (count-class reading) on the same tokenization.
    (operators/text.py yule_k_cells.)"""
    from npm_mirror_spark.operators.text import yule_k_cells

    return yule_k_cells(_t(spark, sf_dir, "documents"), "text")


_YULE_SQL = f"""
WITH n AS (SELECT {_NORM} AS t FROM documents),
toks AS (SELECT unnest(str_split(t, ' ')) AS tok FROM n),
tf AS (SELECT tok, count(*) AS c FROM toks WHERE tok != '' GROUP BY tok),
spec AS (
  SELECT count(*) AS s_types,
    coalesce(sum(CAST(c AS HUGEINT)), 0) AS nn,
    coalesce(sum(CAST(c AS HUGEINT) * c), 0) AS c2,
    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
    sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
  FROM tf
)
SELECT CAST(nn AS BIGINT) AS n_tokens,
  CAST(s_types AS BIGINT) AS s_types,
  CAST(c2 AS DOUBLE) AS sum_c2,
  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
  CASE WHEN nn > 0
       THEN CAST(10000 * (c2 - nn) AS DOUBLE) / CAST(nn * nn AS DOUBLE)
       END AS yule_k,
  CASE WHEN nn > 1
       THEN CAST(c2 - nn AS DOUBLE) / CAST(nn * (nn - 1) AS DOUBLE)
       END AS simpson_d,
  CASE WHEN s_types > 0
       THEN CAST(f2 AS DOUBLE) / CAST(s_types AS DOUBLE) END AS sichel_s
FROM spec
"""


STAGED_QUERIES = {
    "q_somers_d": q_somers_d,
    "q_tau_c": q_tau_c,
    "q_fleiss_kappa": q_fleiss_kappa,
    "q_weighted_kappa": q_weighted_kappa,
    "q_bowker": q_bowker,
    "q_signed_rank": q_signed_rank,
    "q_cvm2": q_cvm2,
    "q_cox_stuart": q_cox_stuart,
    "q_seasonal_mk": q_seasonal_mk,
    "q_buishand": q_buishand,
    "q_nelson_aalen": q_nelson_aalen,
    "q_gehan": q_gehan,
    "q_yule_k": q_yule_k,
}

STAGED_ORACLES = {
    "q_somers_d": _SOMERS_SQL,
    "q_tau_c": _TAUC_SQL,
    "q_fleiss_kappa": _FLEISS_SQL,
    "q_weighted_kappa": _WKAPPA_SQL,
    "q_bowker": _BOWKER_SQL,
    "q_signed_rank": _SIGNED_RANK_SQL,
    "q_cvm2": _CVM2_SQL,
    "q_cox_stuart": _COX_STUART_SQL,
    "q_seasonal_mk": _SEASONAL_MK_SQL,
    "q_buishand": _BUISHAND_SQL,
    "q_nelson_aalen": _NELSON_AALEN_SQL,
    "q_gehan": _GEHAN_SQL,
    "q_yule_k": _YULE_SQL,
}
