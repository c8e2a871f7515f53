"""Early-staged registry faces for the r18 driver-window tail.

The r15, r16 and r17 tails are already pre-planned (staging_r15.py /
staging_r16.py / staging_r17.py — docs/DRIVER_WINDOW.md), so this
continuation wave stages three windows out.  Same contracts as every
staged batch: harness-green at three SFs while staged, registered only
into the window they open in.  The q_rand_index oracle COMPOSES the
registered q_kmeans oracle SQL (the q_mrr / q_ndcg pattern), so its
build is deferred to ``build_oracles``.

ALLOWED_BNLJ entries to add at the r18 registration:

    "q_rand_index": "three 1-row pair-count aggregates (cells, row
        margins, column margins) broadcast-folded — the q_anova_cells
        1-row shape, three times",
    "q_gk_tau": "1-row (N, sum n_c^2) totals broadcast onto the
        bounded x-category rows (the q_anova_cells shape)",
    "q_variance_ratio": "1-row (s2_max, s2_min) fold broadcast onto
        the 7 weekday moment rows",
    "q_t_closeness": "bounded sensitive-domain grid: the 5-segment
        value frame (x 1-row total) broadcast onto the 25 nation
        classes",
    "q_hoover_index": "1-row (n, T) totals broadcast onto the
        per-customer unit rows (the runs_test_daily median-fold
        shape)",
    "q_dunn_pairs": "the k-row kruskal_cells frame self-paired on a
        bounded inequality grid (k(k-1)/2 rows, broadcast) — plus the
        kruskal_cells singleton-fold it inherits",

(q_foster_stuart and q_longest_run are window/equi-join only;
q_lin_ccc / q_mcc are one global aggregate; q_transitivity is a 1-row
aggregate over the q_triangles node stats; q_reciprocity is a bounded
self equi-join on the swapped arc key; q_durbin_rank is
collapse+window+equi-joins — no BNLJ in those seven.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q_foster_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foster-Stuart records trend (operators/stats.py:
    foster_stuart_cells) over the daily order-count series per order
    priority: upper/lower record counts, d = U - L (monotone trend),
    s = U + L (range widening).  The record-counting complement to
    q_mann_kendall / q_cox_stuart on the same calendar — all exact
    integers, one window pair per group, no division anywhere."""
    from npm_mirror_spark.operators.stats import foster_stuart_cells

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return foster_stuart_cells(daily, "o_orderpriority", "day", "n")


_FOSTER_STUART_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS g, CAST(o_orderdate AS DATE) AS day,
         count(*) AS n
  FROM orders GROUP BY 1, 2),
f AS (
  SELECT g,
    n > max(n) OVER (PARTITION BY g ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS up,
    n < min(n) OVER (PARTITION BY g ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS lo
  FROM daily)
SELECT g AS o_orderpriority,
  count(*) AS n_days,
  CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS upper_records,
  CAST(sum(CASE WHEN lo THEN 1 ELSE 0 END) AS BIGINT) AS lower_records,
  CAST(sum(CASE WHEN up THEN 1 ELSE 0 END)
       - sum(CASE WHEN lo THEN 1 ELSE 0 END) AS BIGINT) AS d_stat,
  CAST(sum(CASE WHEN up THEN 1 ELSE 0 END)
       + sum(CASE WHEN lo THEN 1 ELSE 0 END) AS BIGINT) AS s_stat
FROM f GROUP BY 1 ORDER BY 1
"""


def q_longest_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest same-sign run census (operators/stats.py:
    longest_run_cells) over daily event counts per event type, signed
    against each type's exact lower median — the extreme-value twin of
    q_runs_test (run COUNT can look nominal while one pathological
    streak hides inside).  All exact integers: per-group median off
    the distinct-value prefix, gaps-and-islands via a row_number
    difference, one (group, sign, island) groupBy."""
    from npm_mirror_spark.operators.stats import longest_run_cells

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400)
        .cast("bigint")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return longest_run_cells(daily, "event_type", "d", "n")


_LONGEST_RUN_SQL = """
WITH daily AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         count(*) AS x
  FROM events GROUP BY 1, 2),
vals AS (SELECT g, x, count(*) AS c FROM daily GROUP BY 1, 2),
pri AS (
  SELECT g, x, c,
    coalesce(sum(c) OVER (PARTITION BY g ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS p
  FROM vals),
tot AS (SELECT g, sum(c) AS n FROM vals GROUP BY 1),
med AS (
  SELECT pri.g, min(x) AS med
  FROM pri JOIN tot USING (g)
  WHERE p + c >= CAST(ceil(n / 2) AS BIGINT)
  GROUP BY pri.g),
signed AS (
  SELECT daily.g, d, CASE WHEN x > med THEN 1 ELSE -1 END AS s
  FROM daily JOIN med USING (g) WHERE x <> med),
isl AS (
  SELECT g, s,
    row_number() OVER (PARTITION BY g ORDER BY d)
      - row_number() OVER (PARTITION BY g, s ORDER BY d) AS i
  FROM signed),
runs AS (SELECT g, s, i, count(*) AS len FROM isl GROUP BY 1, 2, 3)
SELECT g AS event_type,
  CAST(sum(len) AS BIGINT) AS n_signed,
  count(*) AS n_runs,
  CAST(max(len) AS BIGINT) AS longest_run,
  CAST(coalesce(max(CASE WHEN s = 1 THEN len END), 0) AS BIGINT)
    AS longest_plus,
  CAST(coalesce(max(CASE WHEN s = -1 THEN len END), 0) AS BIGINT)
    AS longest_minus
FROM runs GROUP BY 1 ORDER BY 1
"""


def q_gk_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal tau cells (operators/stats.py:gk_tau_cells):
    how much of the Gini variation of order STATUS is explained by
    order PRIORITY — the variation-based PRE beside the error-based
    q_gk_lambda and the ordinal q_gk_gamma.  One row per priority
    with exact integer cells and pre_term = (N * q_x) / n_x, one IEEE
    division per bounded row; the scalar tau is the consumer
    one-liner (float sum in data-dependent category order)."""
    from npm_mirror_spark.operators.stats import gk_tau_cells

    o = _t(spark, sf_dir, "orders")
    return gk_tau_cells(o, "o_orderpriority", "o_orderstatus")


_GK_TAU_SQL = """
WITH cont AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y, count(*) AS n
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
  GROUP BY 1, 2),
px AS (
  SELECT x, CAST(sum(n) AS BIGINT) AS n_x,
         CAST(sum(CAST(n * n AS DECIMAL(38,0))) AS DOUBLE) AS q_x
  FROM cont GROUP BY 1),
py AS (SELECT y, sum(n) AS ny FROM cont GROUP BY 1),
g AS (
  SELECT CAST(sum(ny) AS DOUBLE) AS n_total,
         CAST(sum(CAST(ny * ny AS DECIMAL(38,0))) AS DOUBLE)
           AS sum_col_sq
  FROM py)
SELECT x AS o_orderpriority, n_x, q_x, n_total, sum_col_sq,
  (n_total * q_x) / CAST(n_x AS DOUBLE) AS pre_term
FROM px CROSS JOIN g ORDER BY 1
"""


def q_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hartley Fmax variance-homogeneity census (operators/stats.py:
    variance_ratio_cells) of order totals across the 7 weekday groups
    — the raw-second-moment complement to the rank dispersions
    (q_conover_scale / q_rank_scale) and the median deviations
    (q_brown_forsythe) on the same calendar.  Exact cents cells in
    DECIMAL(38,0); one division per group for s^2 and one more for
    the flat-repeated fmax."""
    from npm_mirror_spark.operators.stats import variance_ratio_cells

    o = _t(spark, sf_dir, "orders")
    g = o.select(
        F.weekday(F.col("o_orderdate").cast("date")).alias("wd"),
        "o_totalprice",
    )
    return variance_ratio_cells(g, "wd", "o_totalprice")


_VARIANCE_RATIO_SQL = """
WITH s AS (
  SELECT isodow(CAST(o_orderdate AS DATE)) - 1 AS wd,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
m AS (
  SELECT wd, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS sum_c,
         CAST(sum(CAST(v * v AS DECIMAL(38,0))) AS DOUBLE) AS sumsq_c
  FROM s GROUP BY 1),
c AS (
  SELECT wd, n_g, sum_c, sumsq_c,
    CASE WHEN n_g >= 2 THEN
      (CAST(n_g AS DOUBLE) * sumsq_c - sum_c * sum_c)
      / (CAST(n_g AS DOUBLE) * (CAST(n_g AS DOUBLE) - 1.0))
    END AS s2
  FROM m),
f AS (SELECT max(s2) AS s2_max, min(s2) AS s2_min FROM c)
SELECT wd, n_g, sum_c, sumsq_c, s2, s2_max, s2_min,
  CASE WHEN s2_min > 0 THEN s2_max / s2_min END AS fmax
FROM c CROSS JOIN f ORDER BY wd
"""


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/checks.py:t_closeness_report):
    per-nation variational distance between the nation's market-
    segment distribution and the table-wide one — the third leg of
    the privacy tier after q_kanonymity's k-anonymity / l-diversity
    columns (a class can clear both and still leak by DISTRIBUTION).
    tvd_num is an exact integer with denominators cleared; tvd is one
    IEEE division."""
    from npm_mirror_spark.operators.checks import t_closeness_report

    c = _t(spark, sf_dir, "customer")
    return t_closeness_report(c, ["c_nationkey"], "c_mktsegment")


_T_CLOSENESS_SQL = """
WITH cv AS (
  SELECT c_nationkey AS q, c_mktsegment AS v, count(*) AS ngv
  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2),
cls AS (SELECT q, sum(ngv) AS ng FROM cv GROUP BY 1),
vals AS (SELECT v, sum(ngv) AS nv FROM cv GROUP BY 1),
tot AS (SELECT sum(nv) AS nn FROM vals),
grid AS (
  SELECT cls.q, cls.ng, vals.v, vals.nv, tot.nn
  FROM cls CROSS JOIN vals CROSS JOIN tot),
filled AS (
  SELECT grid.q, grid.ng, grid.nv, grid.nn,
         coalesce(cv.ngv, 0) AS ngv
  FROM grid LEFT JOIN cv ON grid.q = cv.q AND grid.v = cv.v)
SELECT q AS c_nationkey,
  CAST(max(ng) AS BIGINT) AS n_class,
  CAST(sum(abs(CAST(ngv AS DECIMAL(38,0)) * nn
               - CAST(nv AS DECIMAL(38,0)) * ng)) AS DOUBLE)
    AS tvd_num,
  CAST(sum(abs(CAST(ngv AS DECIMAL(38,0)) * nn
               - CAST(nv AS DECIMAL(38,0)) * ng)) AS DOUBLE)
    / (2.0 * CAST(max(ng) AS DOUBLE) * CAST(max(nn) AS DOUBLE))
    AS tvd
FROM filled GROUP BY 1 ORDER BY 1
"""


def q_lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin concordance (operators/checks.py:lin_ccc_cells) between
    each order's header total and the cents-sum of its line prices —
    the reconciliation AGREEMENT verdict q_fk_audit (existence) and
    q_corr_moments (correlation) don't give: CCC penalizes scale and
    shift off the 45-degree line, and needs no sqrt, so the whole
    chain is exact cells + one division."""
    from npm_mirror_spark.operators.checks import lin_ccc_cells

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ls = li.groupBy("l_orderkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
        ).alias("y")
    )
    j = o.join(ls, o["o_orderkey"] == ls["l_orderkey"]).select(
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("x"),
        "y",
    )
    return lin_ccc_cells(j, F.col("x"), F.col("y"))


_LIN_CCC_SQL = """
WITH ls AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM lineitem GROUP BY 1),
p AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x, y
  FROM orders JOIN ls ON o_orderkey = l_orderkey),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_pairs,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
         CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
  FROM p)
SELECT n_pairs, sx, sy, sxx, syy, sxy,
  2.0 * (n_pairs * sxy - sx * sy) AS ccc_num,
  ((n_pairs * sxx - sx * sx) + (n_pairs * syy - sy * sy)
   + (sx - sy) * (sx - sy)) AS ccc_den,
  CASE WHEN ((n_pairs * sxx - sx * sx) + (n_pairs * syy - sy * sy)
             + (sx - sy) * (sx - sy)) <> 0
    THEN 2.0 * (n_pairs * sxy - sx * sy)
         / ((n_pairs * sxx - sx * sx) + (n_pairs * syy - sy * sy)
            + (sx - sy) * (sx - sy))
  END AS ccc
FROM m
"""


def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index (operators/checks.py:hoover_cells)
    over per-customer revenue — the L1 inequality verdict beside the
    Gini faces (q_source_gini) and q_hhi: the single largest vertical
    gap of the Lorenz diagram, i.e. the share of revenue that would
    have to move between customers to equalize them.  Exact integer
    deviations against a 1-row (n, T) broadcast fold; one division."""
    from npm_mirror_spark.operators.checks import hoover_cells

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
        ).alias("rev_c")
    )
    return hoover_cells(per_cust, F.col("rev_c"))


_HOOVER_SQL = """
WITH u AS (
  SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS DECIMAL(38,0)) AS x
  FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS tt FROM u),
d AS (
  SELECT sum(abs(u.x * CAST(t.n AS DECIMAL(38,0)) - t.tt)) AS s
  FROM u CROSS JOIN t)
SELECT t.n AS n_units,
  CAST(t.tt AS DOUBLE) AS total_value,
  CAST(d.s AS DOUBLE) AS abs_dev_sum,
  CAST(d.s AS DOUBLE)
    / (2.0 * CAST(t.n AS DOUBLE) * CAST(t.tt AS DOUBLE)) AS hoover
FROM t CROSS JOIN d
"""


def q_rand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index (operators/checks.py:ari_cells) between
    the q_kmeans Lloyd assignment and the embeddings' ground-truth
    label column — the chance-corrected agreement verdict the
    clustering tier had no face for (accuracy is meaningless across
    label permutations; ARI is permutation-invariant, 0-expected
    under independence).  The oracle COMPOSES the already-verified
    q_kmeans oracle SQL (three unrolled Lloyd rounds), so the whole
    train->assign->agree chain is driver-checkable; all cells are
    DOUBLED pair counts (no halving), one final division."""
    from npm_mirror_spark.operators import similarity as sim_ops
    from npm_mirror_spark.operators.checks import ari_cells

    e = _t(spark, sf_dir, "embeddings")
    model = sim_ops.train_kmeans(e, k=8, n_iter=3)
    asg = sim_ops.kmeans_assign(e, model["centroids_q"])
    j = asg.join(e.select("vec_id", "label"), "vec_id")
    return ari_cells(j, "cluster", "label")


def _rand_index_oracle(ORACLES: dict[str, str]) -> str:
    """Compose the verified q_kmeans oracle SQL into the ARI replay
    (the q_mrr / q_ndcg composition pattern).  Deferred to
    ``build_oracles``."""
    return f"""
WITH asg AS ({ORACLES["q_kmeans"]}),
j AS (
  SELECT asg.cluster AS a, e.label AS b
  FROM asg JOIN embeddings e USING (vec_id)),
cont AS (
  SELECT a, b, count(*) AS n FROM j
  WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY 1, 2),
cells AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_items,
         CAST(sum(CAST(n * (n - 1) AS DECIMAL(38,0))) AS DOUBLE)
           AS pairs2_cells
  FROM cont),
ra AS (
  SELECT CAST(count(*) AS BIGINT) AS n_a_classes,
         CAST(sum(CAST(na * (na - 1) AS DECIMAL(38,0))) AS DOUBLE)
           AS pairs2_a
  FROM (SELECT sum(n) AS na FROM cont GROUP BY a)),
rb AS (
  SELECT CAST(count(*) AS BIGINT) AS n_b_classes,
         CAST(sum(CAST(nb * (nb - 1) AS DECIMAL(38,0))) AS DOUBLE)
           AS pairs2_b
  FROM (SELECT sum(n) AS nb FROM cont GROUP BY b))
SELECT n_items, n_a_classes, n_b_classes,
  pairs2_cells, pairs2_a, pairs2_b,
  CAST(n_items AS DOUBLE) * (CAST(n_items AS DOUBLE) - 1.0)
    AS pairs2_total,
  CASE WHEN (CAST(n_items AS DOUBLE) * (CAST(n_items AS DOUBLE) - 1.0)
             * (pairs2_a + pairs2_b) - 2.0 * pairs2_a * pairs2_b) <> 0
    THEN 2.0 * (CAST(n_items AS DOUBLE)
                * (CAST(n_items AS DOUBLE) - 1.0) * pairs2_cells
                - pairs2_a * pairs2_b)
         / (CAST(n_items AS DOUBLE) * (CAST(n_items AS DOUBLE) - 1.0)
            * (pairs2_a + pairs2_b) - 2.0 * pairs2_a * pairs2_b)
  END AS ari
FROM cells CROSS JOIN ra CROSS JOIN rb
"""


def q_dunn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn post-hoc pairwise mean-rank comparison (operators/
    stats.py:dunn_pairs_cells) over document lengths by language —
    the follow-up q_kruskal's omnibus H points at but cannot answer
    (WHICH languages differ).  Reuses the pooled doubled midrank sums
    kruskal_cells emits, so no second rank pass; per ordered pair the
    mean-rank difference is one IEEE division on an exact-int-valued
    numerator.  The oracle COMPOSES the registered q_kruskal SQL."""
    from npm_mirror_spark.operators.stats import dunn_pairs_cells

    d = _t(spark, sf_dir, "documents")
    return dunn_pairs_cells(d, "n_chars", "lang")


def _dunn_pairs_oracle(ORACLES: dict[str, str]) -> str:
    """Compose the verified q_kruskal oracle SQL into the pairwise
    replay.  Deferred to ``build_oracles``."""
    return f"""
WITH k AS ({ORACLES["q_kruskal"]}),
a AS (SELECT lang AS lang_a, n_i AS n_a, rank_sum_x2 AS r2_a FROM k),
b AS (SELECT lang AS lang_b, n_i AS n_b, rank_sum_x2 AS r2_b FROM k)
SELECT lang_a, lang_b, n_a, n_b, r2_a, r2_b,
  r2_a * CAST(n_b AS DOUBLE) - r2_b * CAST(n_a AS DOUBLE)
    AS diff_num_x2,
  (r2_a * CAST(n_b AS DOUBLE) - r2_b * CAST(n_a AS DOUBLE))
    / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
    AS mean_rank_diff
FROM a JOIN b ON lang_a < lang_b
ORDER BY lang_a, lang_b
"""


def q_durbin_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incomplete-block rank deviation census (operators/stats.py:
    durbin_rank_cells — the Durbin/Skillings-Mack family): event
    types ranked WITHIN each epoch-day by daily count, each type's
    doubled rank sum against its own null mean Sigma(k_b+1) — the
    friedman complement for blocks where not every treatment shows
    up.  dev_x2 is an exact integer-valued double; NO division
    anywhere in the face."""
    from npm_mirror_spark.operators.stats import durbin_rank_cells

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400)
        .cast("bigint")
        .alias("d"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    return durbin_rank_cells(daily, "d", "event_type", "n")


_DURBIN_RANK_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS b,
         event_type AS t, count(*) AS x
  FROM events GROUP BY 1, 2),
vb AS (SELECT b, x, count(*) AS cx FROM daily GROUP BY 1, 2),
pri AS (
  SELECT b, x, cx,
    coalesce(sum(cx) OVER (PARTITION BY b ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS prior
  FROM vb),
sizes AS (SELECT b, count(*) AS kb FROM daily GROUP BY 1),
ranked AS (
  SELECT daily.t, 2 * prior + cx + 1 AS r2, kb + 1 AS kb1
  FROM daily
  JOIN pri ON daily.b = pri.b AND daily.x = pri.x
  JOIN sizes ON daily.b = sizes.b)
SELECT t AS event_type,
  CAST(count(*) AS BIGINT) AS blocks_present,
  CAST(sum(CAST(r2 AS DECIMAL(38,0))) AS DOUBLE) AS rank_sum_x2,
  CAST(sum(CAST(kb1 AS DECIMAL(38,0))) AS DOUBLE) AS null_mean_x2,
  CAST(sum(CAST(r2 AS DECIMAL(38,0))) AS DOUBLE)
    - CAST(sum(CAST(kb1 AS DECIMAL(38,0))) AS DOUBLE) AS dev_x2
FROM ranked GROUP BY 1 ORDER BY 1
"""


def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation cells (operators/classifier.py:mcc_cells)
    for the q_classifier_eval scorer (doc length >= 500 chars) against
    the keyword label — the balanced single-number verdict the
    confusion counts + AUC face stops short of.  MCC needs a sqrt, so
    the face emits the SIGNED SQUARE (num*|num|/den_sq, one division
    on exact-integer cells); |mcc| = sqrt(|mcc_signed_sq|) is the
    consumer one-liner."""
    from npm_mirror_spark.operators.classifier import mcc_cells

    d = _t(spark, sf_dir, "documents")
    return mcc_cells(
        d,
        F.col("text").contains("spark"),
        F.col("n_chars") >= 500,
    )


_MCC_SQL = """
WITH s AS (
  SELECT (text LIKE '%spark%') AS l, (n_chars >= 500) AS p
  FROM documents),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
    CAST(sum(CASE WHEN l AND p THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(sum(CASE WHEN NOT l AND p THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(sum(CASE WHEN NOT l AND NOT p THEN 1 ELSE 0 END) AS BIGINT)
      AS tn,
    CAST(sum(CASE WHEN l AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM s),
m AS (
  SELECT n_rows, tp, fp, tn, fn,
    CAST(CAST(tp AS HUGEINT) * CAST(tn AS HUGEINT)
         - CAST(fp AS HUGEINT) * CAST(fn AS HUGEINT) AS DOUBLE)
      AS mcc_num,
    CAST(CAST(tp + fp AS HUGEINT) * CAST(tp + fn AS HUGEINT)
         * CAST(tn + fp AS HUGEINT) * CAST(tn + fn AS HUGEINT)
         AS DOUBLE) AS mcc_den_sq
  FROM c)
SELECT n_rows, tp, fp, tn, fn, mcc_num, mcc_den_sq,
  CASE WHEN mcc_den_sq > 0
    THEN (mcc_num * abs(mcc_num)) / mcc_den_sq END AS mcc_signed_sq
FROM m
"""


def q_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global transitivity (operators/graph.py:transitivity_cells)
    of the q_triangles co-purchase slice: 3T / wedges as ONE exact
    division — the hub-weighted global verdict the per-node local
    coefficients (q_triangles' lcc) don't give, and the two
    disagreeing flags hub-centered clustering.  The oracle COMPOSES
    the registered q_triangles SQL and just sums it."""
    from npm_mirror_spark.operators.graph import (
        basket_pairs,
        transitivity_cells,
        triangle_counts,
    )

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .where(F.col("l_orderkey") % 5 == 2)
    )
    edges = basket_pairs(li, "l_orderkey", "l_partkey", max_basket=64)
    return transitivity_cells(triangle_counts(edges))


def _transitivity_oracle(ORACLES: dict[str, str]) -> str:
    """Compose the verified q_triangles oracle SQL into the global
    transitivity fold.  Deferred to ``build_oracles``."""
    return f"""
WITH t AS ({ORACLES["q_triangles"]})
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
  CAST(sum(CAST(deg AS DECIMAL(38,0))) AS DOUBLE) AS deg_sum,
  CAST(sum(CAST(deg * (deg - 1) AS DECIMAL(38,0))) AS DOUBLE)
    AS wedges_x2,
  CAST(sum(CAST(triangles AS DECIMAL(38,0))) AS DOUBLE) AS tri_x3,
  CASE WHEN CAST(sum(CAST(deg * (deg - 1) AS DECIMAL(38,0)))
             AS DOUBLE) > 0
    THEN (2.0 * CAST(sum(CAST(triangles AS DECIMAL(38,0))) AS DOUBLE))
         / CAST(sum(CAST(deg * (deg - 1) AS DECIMAL(38,0))) AS DOUBLE)
  END AS transitivity
FROM t
"""


def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed reciprocity (operators/graph.py:reciprocity_cells)
    of the event-type transition graph (the q_event_transitions arcs,
    self-loops dropped): what share of arcs — and of transition FLOW
    (Garlaschelli-Loffredo min-weight share) — is answered in the
    reverse direction?  The asymmetry verdict the symmetric
    co-occurrence graphs can't carry; exact counts, two single
    divisions."""
    from pyspark.sql import Window

    from npm_mirror_spark.operators.graph import reciprocity_cells

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    arcs = (
        e.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return reciprocity_cells(arcs)


_RECIPROCITY_SQL = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS s,
         event_type AS d
  FROM events),
tr AS (
  SELECT s, d, count(*) AS w FROM seq
  WHERE s IS NOT NULL AND s <> d GROUP BY 1, 2),
j AS (
  SELECT t.w, coalesce(r.w, 0) AS wr
  FROM tr t LEFT JOIN tr r ON t.s = r.d AND t.d = r.s)
SELECT CAST(count(*) AS BIGINT) AS n_arcs,
  CAST(sum(CASE WHEN wr > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_reciprocated,
  CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE) AS sum_w,
  CAST(sum(CAST(least(w, wr) AS DECIMAL(38,0))) AS DOUBLE)
    AS sum_w_min,
  CAST(sum(CASE WHEN wr > 0 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS reciprocity,
  CAST(sum(CAST(least(w, wr) AS DECIMAL(38,0))) AS DOUBLE)
    / CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE) AS w_reciprocity
FROM j
"""


STAGED_QUERIES = {
    "q_foster_stuart": q_foster_stuart,
    "q_longest_run": q_longest_run,
    "q_gk_tau": q_gk_tau,
    "q_variance_ratio": q_variance_ratio,
    "q_t_closeness": q_t_closeness,
    "q_lin_ccc": q_lin_ccc,
    "q_hoover_index": q_hoover_index,
    "q_rand_index": q_rand_index,
    "q_dunn_pairs": q_dunn_pairs,
    "q_durbin_rank": q_durbin_rank,
    "q_mcc": q_mcc,
    "q_transitivity": q_transitivity,
    "q_reciprocity": q_reciprocity,
}

STAGED_ORACLES: dict[str, str] = {
    "q_foster_stuart": _FOSTER_STUART_SQL,
    "q_longest_run": _LONGEST_RUN_SQL,
    "q_gk_tau": _GK_TAU_SQL,
    "q_variance_ratio": _VARIANCE_RATIO_SQL,
    "q_t_closeness": _T_CLOSENESS_SQL,
    "q_lin_ccc": _LIN_CCC_SQL,
    "q_hoover_index": _HOOVER_SQL,
    "q_durbin_rank": _DURBIN_RANK_SQL,
    "q_mcc": _MCC_SQL,
    "q_reciprocity": _RECIPROCITY_SQL,
}


def build_oracles(registry_oracles: dict[str, str]) -> dict[str, str]:
    """Complete ``STAGED_ORACLES`` against the registry (q_rand_index
    nests the q_kmeans oracle SQL; q_dunn_pairs nests q_kruskal;
    q_transitivity nests q_triangles) and return it — the
    staging_r13/staging_r17 build_oracles pattern; idempotent."""
    STAGED_ORACLES["q_rand_index"] = _rand_index_oracle(registry_oracles)
    STAGED_ORACLES["q_dunn_pairs"] = _dunn_pairs_oracle(registry_oracles)
    STAGED_ORACLES["q_transitivity"] = _transitivity_oracle(
        registry_oracles
    )
    return STAGED_ORACLES
