"""Early-staged registry faces for the r19 driver-window tail.

The r15–r18 tails are already fully pre-planned (staging_r15/16/17/18
— docs/DRIVER_WINDOW.md), so this late-r14 wave stages four windows
out: the graph-partition QUALITY tier — the verdicts the structural
faces (q_communities, q_triangles, q_kcore) compute partitions for
but never score.  Same contracts as every staged batch; the
q_modularity / q_conductance oracles COMPOSE the registered
q_communities SQL (labels) around the q_triangles edge CTE, deferred
to ``build_oracles``.

ALLOWED_BNLJ entries to add at the r19 registration:

    "q_modularity": "1-row m fold + 1-row term-sum fold broadcast
        onto the community rows (the q_anova_cells shape, twice)",
    "q_conductance": "1-row m fold broadcast onto the community
        rows",
    "q_attr_assortativity": "three 1-row aggregates (edge/same
        counts, category masses) broadcast-combined",
    "q_lift_gains": "1-row (N, P) totals broadcast onto the
        distinct-score prefix rows, plus _with_prior_sums' (min,max)
        stats row (the q_spearman shape)",
    "q_lorenz": "1-row (N, T) totals broadcast onto the
        distinct-value prefix rows, plus the same prior-sums stats
        row",
    "q_rich_club": "two 1-row conditional aggregates (per-k edge and
        node counts over the literal threshold grid)
        broadcast-combined",
    "q_pacf": "the 3-row lag-literal frame broadcast onto the daily
        series for the pair join, plus the 1-row totals fold",

(The graph three otherwise equi-join on node id / attribute key.)

Edge parity note: the oracles rebuild the q_triangles ``raw`` CTE
(DISTINCT co-purchase pairs on the 1/5 order slice) WITHOUT the
operator's max_basket=64 guard — identical on TPC-H-shaped baskets
(<= 7 items; the q_triangles precedent, documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_RAW_EDGES = """raw AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x JOIN lineitem y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  WHERE x.l_orderkey % 5 = 2)"""


def _sliced_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from npm_mirror_spark.operators.graph import basket_pairs

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .where(F.col("l_orderkey") % 5 == 2)
    )
    return basket_pairs(li, "l_orderkey", "l_partkey", max_basket=64)


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity (operators/graph.py:modularity_cells) of the
    q_communities label-propagation partition over the sliced
    co-purchase graph — the quality verdict the partition face itself
    never reports.  q_term_x4m2 is an exact integer per community and
    the flat modularity is ONE division of the exact integer term sum
    by 4m^2.  The oracle COMPOSES the registered q_communities SQL."""
    from npm_mirror_spark.operators.graph import (
        label_propagation,
        modularity_cells,
    )

    edges = _sliced_edges(spark, sf_dir)
    labels = label_propagation(edges, n_rounds=2)
    return modularity_cells(edges, labels)


def _modularity_oracle(ORACLES: dict[str, str]) -> str:
    """Compose the verified q_communities oracle SQL (labels) around
    the q_triangles edge CTE.  Deferred to ``build_oracles``."""
    return f"""
WITH {_RAW_EDGES},
lab AS ({ORACLES["q_communities"]}),
deg AS (
  SELECT id, count(*) AS deg FROM (
    SELECT a AS id FROM raw UNION ALL SELECT b FROM raw) GROUP BY id),
vol AS (
  SELECT lab.label AS l, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg.deg) AS BIGINT) AS degree_sum
  FROM lab JOIN deg ON deg.id = lab.id GROUP BY 1),
ee AS (
  SELECT la.label AS ca, lb.label AS cb
  FROM raw JOIN lab la ON la.id = raw.a
           JOIN lab lb ON lb.id = raw.b),
intr AS (
  SELECT ca AS l, CAST(count(*) AS BIGINT) AS internal
  FROM ee WHERE ca = cb GROUP BY 1),
m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM raw),
cells AS (
  SELECT vol.l, vol.n_nodes,
         CAST(coalesce(intr.internal, 0) AS BIGINT) AS internal_edges,
         vol.degree_sum, m.m_edges,
         CAST(CAST(4 * m.m_edges * coalesce(intr.internal, 0)
                   - vol.degree_sum * vol.degree_sum
              AS DECIMAL(38,0)) AS DOUBLE) AS q_term_x4m2
  FROM vol LEFT JOIN intr ON intr.l = vol.l CROSS JOIN m),
tot AS (
  SELECT CAST(sum(CAST(q_term_x4m2 AS DECIMAL(38,0))) AS DOUBLE) AS qs
  FROM cells)
SELECT l AS label, n_nodes, internal_edges, degree_sum, m_edges,
  q_term_x4m2,
  qs / (4.0 * CAST(m_edges AS DOUBLE) * CAST(m_edges AS DOUBLE))
    AS modularity
FROM cells CROSS JOIN tot ORDER BY label
"""


def q_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance (operators/graph.py:
    conductance_cells) of the q_communities partition — the boundary
    verdict beside q_modularity's internal-density one: cut / min(vol,
    2m - vol), each cut edge credited to both sides.  Exact integer
    cells, one division per community.  The oracle COMPOSES the
    registered q_communities SQL."""
    from npm_mirror_spark.operators.graph import (
        conductance_cells,
        label_propagation,
    )

    edges = _sliced_edges(spark, sf_dir)
    labels = label_propagation(edges, n_rounds=2)
    return conductance_cells(edges, labels)


def _conductance_oracle(ORACLES: dict[str, str]) -> str:
    """Compose the verified q_communities oracle SQL (labels) around
    the q_triangles edge CTE.  Deferred to ``build_oracles``."""
    return f"""
WITH {_RAW_EDGES},
lab AS ({ORACLES["q_communities"]}),
deg AS (
  SELECT id, count(*) AS deg FROM (
    SELECT a AS id FROM raw UNION ALL SELECT b FROM raw) GROUP BY id),
vol AS (
  SELECT lab.label AS l, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg.deg) AS BIGINT) AS degree_sum
  FROM lab JOIN deg ON deg.id = lab.id GROUP BY 1),
ee AS (
  SELECT la.label AS ca, lb.label AS cb
  FROM raw JOIN lab la ON la.id = raw.a
           JOIN lab lb ON lb.id = raw.b),
cr AS (SELECT ca, cb FROM ee WHERE ca <> cb),
cut AS (
  SELECT l, CAST(count(*) AS BIGINT) AS cut_edges FROM (
    SELECT ca AS l FROM cr UNION ALL SELECT cb FROM cr) GROUP BY 1),
m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM raw)
SELECT vol.l AS label, vol.n_nodes, vol.degree_sum,
  CAST(coalesce(cut.cut_edges, 0) AS BIGINT) AS cut_edges, m.m_edges,
  CASE WHEN least(vol.degree_sum, 2 * m.m_edges - vol.degree_sum) > 0
    THEN CAST(coalesce(cut.cut_edges, 0) AS DOUBLE)
         / CAST(least(vol.degree_sum,
                      2 * m.m_edges - vol.degree_sum) AS DOUBLE)
  END AS conductance
FROM vol LEFT JOIN cut ON cut.l = vol.l CROSS JOIN m
ORDER BY label
"""


def q_attr_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman categorical assortativity (operators/graph.py:
    attr_assortativity_cells) of the co-purchase graph by part BRAND —
    do baskets mix brands or stick to them, beyond what brand degree
    mass predicts?  The homophily verdict beside the structural degree
    assortativity face; exact mixing-matrix cells with denominators
    cleared, one division."""
    from npm_mirror_spark.operators.graph import attr_assortativity_cells

    edges = _sliced_edges(spark, sf_dir)
    attrs = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_brand").alias("cat")
    )
    return attr_assortativity_cells(edges, attrs)


_ATTR_ASSORTATIVITY_SQL = f"""
WITH {_RAW_EDGES},
ee AS (
  SELECT pa.p_brand AS cx, pb.p_brand AS cy
  FROM raw JOIN part pa ON pa.p_partkey = raw.a
           JOIN part pb ON pb.p_partkey = raw.b),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS m_edges,
         CAST(2 * sum(CASE WHEN cx = cy THEN 1 ELSE 0 END) AS BIGINT)
           AS same_x2
  FROM ee),
mass AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cats,
         CAST(sum(CAST(mm * mm AS DECIMAL(38,0))) AS DOUBLE)
           AS sum_cat_mass_sq
  FROM (SELECT c, count(*) AS mm FROM (
          SELECT cx AS c FROM ee UNION ALL SELECT cy FROM ee)
        GROUP BY 1))
SELECT m_edges, n_cats, same_x2, sum_cat_mass_sq,
  2.0 * CAST(m_edges AS DOUBLE) * CAST(same_x2 AS DOUBLE)
    - sum_cat_mass_sq AS assort_num,
  (2.0 * CAST(m_edges AS DOUBLE)) * (2.0 * CAST(m_edges AS DOUBLE))
    - sum_cat_mass_sq AS assort_den,
  CASE WHEN (2.0 * CAST(m_edges AS DOUBLE))
            * (2.0 * CAST(m_edges AS DOUBLE))
            - sum_cat_mass_sq <> 0
    THEN (2.0 * CAST(m_edges AS DOUBLE) * CAST(same_x2 AS DOUBLE)
          - sum_cat_mass_sq)
         / ((2.0 * CAST(m_edges AS DOUBLE))
            * (2.0 * CAST(m_edges AS DOUBLE)) - sum_cat_mass_sq)
  END AS assortativity
FROM m CROSS JOIN mass
"""


def q_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative-gains table (operators/classifier.py:
    lift_gains_cells) for the q_classifier_eval fixture (n_chars
    score, keyword label) — the targeting verdict beside the
    threshold confusion counts, the rank AUC and the reliability
    bins: acting on the top score decile, how many times the base
    rate do we capture?  Tie-safe integer bucketing off the
    descending bucketed prefix; every report column one division."""
    from npm_mirror_spark.operators.classifier import lift_gains_cells

    d = _t(spark, sf_dir, "documents")
    return lift_gains_cells(
        d, "n_chars", F.col("text").contains("spark"), k=10
    )


_LIFT_GAINS_SQL = """
WITH vals AS (
  SELECT n_chars AS x, count(*) AS c,
         sum(CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END) AS p
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
pri AS (
  SELECT x, c, p,
    coalesce(sum(c) OVER (ORDER BY x DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS prior
  FROM vals),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS pp
  FROM vals),
b AS (
  SELECT CAST(prior * 10 AS BIGINT) // n AS bk, c, p, n, pp
  FROM pri CROSS JOIN tot),
gb AS (
  SELECT bk, CAST(sum(c) AS BIGINT) AS n_d,
         CAST(sum(p) AS BIGINT) AS pos_d,
         CAST(max(n) AS BIGINT) AS n_total,
         CAST(max(pp) AS BIGINT) AS pos_total
  FROM b GROUP BY 1),
cm AS (
  SELECT bk, n_d, pos_d,
    CAST(sum(n_d) OVER (ORDER BY bk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_n,
    CAST(sum(pos_d) OVER (ORDER BY bk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_pos,
    n_total, pos_total
  FROM gb)
SELECT bk AS bucket, n_d, pos_d, cum_n, cum_pos, n_total, pos_total,
  CASE WHEN pos_total > 0 AND n_d > 0
    THEN (CAST(pos_d AS DOUBLE) * CAST(n_total AS DOUBLE))
         / (CAST(n_d AS DOUBLE) * CAST(pos_total AS DOUBLE)) END
    AS lift,
  CASE WHEN pos_total > 0
    THEN CAST(cum_pos AS DOUBLE) / CAST(pos_total AS DOUBLE) END
    AS gain,
  CAST(cum_n AS DOUBLE) / CAST(n_total AS DOUBLE) AS depth
FROM cm ORDER BY bucket
"""


def q_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve decile points (operators/checks.py:lorenz_cells)
    over per-customer revenue — the whole concentration curve whose
    single numbers q_hoover_index (max vertical gap) and the Gini
    faces (area) already report.  Tie-safe ascending integer
    bucketing; decimal value masses; one division per share."""
    from npm_mirror_spark.operators.checks import lorenz_cells

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
        ).alias("rev_c")
    )
    return lorenz_cells(per_cust, F.col("rev_c"), k=10)


_LORENZ_SQL = """
WITH u AS (
  SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY o_custkey),
vals AS (SELECT x, count(*) AS c FROM u GROUP BY 1),
mass AS (
  SELECT x, c,
         CAST(CAST(x AS DECIMAL(38,0)) * c AS DECIMAL(38,0)) AS m
  FROM vals),
pri AS (
  SELECT x, c, m,
    coalesce(sum(c) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS prior
  FROM mass),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(m) AS DECIMAL(38,0)) AS t
  FROM mass),
b AS (
  SELECT CAST(prior * 10 AS BIGINT) // n AS bk, c, m, n, t
  FROM pri CROSS JOIN tot),
gb AS (
  SELECT bk, CAST(sum(c) AS BIGINT) AS n_u,
         CAST(sum(m) AS DECIMAL(38,0)) AS vs,
         CAST(max(n) AS BIGINT) AS n_total,
         CAST(max(t) AS DECIMAL(38,0)) AS tt
  FROM b GROUP BY 1),
cm AS (
  SELECT bk, n_u, CAST(vs AS DOUBLE) AS v_sum,
    CAST(sum(n_u) OVER (ORDER BY bk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_n,
    CAST(CAST(sum(vs) OVER (ORDER BY bk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DECIMAL(38,0)) AS DOUBLE) AS cum_v,
    n_total, CAST(tt AS DOUBLE) AS v_total
  FROM gb)
SELECT bk AS bucket, n_u, v_sum, cum_n, cum_v, n_total, v_total,
  CAST(cum_n AS DOUBLE) / CAST(n_total AS DOUBLE) AS pop_share,
  CASE WHEN v_total <> 0 THEN cum_v / v_total END AS value_share
FROM cm ORDER BY bucket
"""


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient census (operators/graph.py:
    rich_club_cells) of the co-purchase slice — do the high-degree
    parts preferentially co-occur with EACH OTHER, beyond what the
    assortativity scalar can see?  phi(k) over the literal threshold
    grid k in (1,2,4,8,16); exact integer cells, one division per
    bounded row."""
    from npm_mirror_spark.operators.graph import rich_club_cells

    return rich_club_cells(_sliced_edges(spark, sf_dir))


_RICH_CLUB_SQL = f"""
WITH {_RAW_EDGES},
deg AS (
  SELECT id, count(*) AS deg FROM (
    SELECT a AS id FROM raw UNION ALL SELECT b FROM raw) GROUP BY id),
emin AS (
  SELECT least(da.deg, db.deg) AS md
  FROM raw JOIN deg da ON da.id = raw.a
           JOIN deg db ON db.id = raw.b),
ks AS (SELECT * FROM (VALUES (1), (2), (4), (8), (16)) t(k)),
cells AS (
  SELECT ks.k,
    (SELECT CAST(coalesce(sum(CASE WHEN deg > ks.k THEN 1 ELSE 0 END),
                          0) AS BIGINT) FROM deg) AS n_rich,
    (SELECT CAST(coalesce(sum(CASE WHEN md > ks.k THEN 1 ELSE 0 END),
                          0) AS BIGINT) FROM emin) AS e_rich
  FROM ks)
SELECT k, n_rich, e_rich,
  CASE WHEN n_rich >= 2
    THEN (2.0 * CAST(e_rich AS DOUBLE))
         / (CAST(n_rich AS DOUBLE) * (CAST(n_rich AS DOUBLE) - 1.0))
  END AS phi
FROM cells ORDER BY k
"""


def q_ess_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective-sample-size audit (operators/checks.py:
    ess_cells) of activity-weighted users per event type — if users
    are sampled proportionally to their event count (the
    activity-mass sampling a naive event-level split implies), how
    many equally-weighted users is each type's sample worth?  The
    design-effect verdict beside the mix faces (q_temperature_mix
    reweights sources; this measures what a weighting COSTS)."""
    from npm_mirror_spark.operators.checks import ess_cells

    e = _t(spark, sf_dir, "events")
    units = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("w")
    )
    return ess_cells(units, "event_type", F.col("w"))


_ESS_AUDIT_SQL = """
WITH u AS (
  SELECT event_type AS g, user_id, count(*) AS w
  FROM events GROUP BY 1, 2)
SELECT g AS event_type,
  CAST(count(*) AS BIGINT) AS n_units,
  CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE) AS sum_w,
  CAST(sum(CAST(w AS DECIMAL(38,0)) * w) AS DOUBLE) AS sum_w2,
  CASE WHEN CAST(sum(CAST(w AS DECIMAL(38,0)) * w) AS DOUBLE) > 0
    THEN (CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE)
          * CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE))
         / CAST(sum(CAST(w AS DECIMAL(38,0)) * w) AS DOUBLE) END
    AS ess,
  (CASE WHEN CAST(sum(CAST(w AS DECIMAL(38,0)) * w) AS DOUBLE) > 0
    THEN (CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE)
          * CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE))
         / CAST(sum(CAST(w AS DECIMAL(38,0)) * w) AS DOUBLE) END)
    / CAST(count(*) AS DOUBLE) AS ess_ratio
FROM u GROUP BY 1 ORDER BY 1
"""


def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF/PACF cells to lag 3 (operators/temporal.py:pacf_cells) over
    daily order counts — the Box-Jenkins order diagnostic beside
    q_autocorr's lag-1 squared dodge: covariance-RATIO ACF (no sqrt,
    denominators cleared to exact integers) and the unrolled
    Durbin-Levinson PACF as a fixed IEEE sequence on the reported
    ratios."""
    from npm_mirror_spark.operators.temporal import pacf_cells

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return pacf_cells(daily, "day", "n")


_PACF_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x
  FROM orders GROUP BY 1),
g AS (
  SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(x AS BIGINT) AS x
  FROM daily),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(count(*) AS DOUBLE) AS nn,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS ss,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx
  FROM g),
ks AS (SELECT * FROM (VALUES (1), (2), (3)) t(k)),
pairs AS (
  SELECT ks.k, a.x AS xa, b.x AS xb
  FROM g a CROSS JOIN ks JOIN g b ON b.d = a.d + ks.k),
per AS (
  SELECT k, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CAST(xa AS DECIMAL(38,0)) * xb) AS DOUBLE) AS sab,
         CAST(sum(CAST(xa AS DECIMAL(38,0))) AS DOUBLE) AS a,
         CAST(sum(CAST(xb AS DECIMAL(38,0))) AS DOUBLE) AS b
  FROM pairs GROUP BY 1),
pvt AS (
  SELECT max(CASE WHEN k = 1 THEN m END) AS m1,
         max(CASE WHEN k = 2 THEN m END) AS m2,
         max(CASE WHEN k = 3 THEN m END) AS m3,
         max(CASE WHEN k = 1 THEN sab END) AS sab1,
         max(CASE WHEN k = 2 THEN sab END) AS sab2,
         max(CASE WHEN k = 3 THEN sab END) AS sab3,
         max(CASE WHEN k = 1 THEN a END) AS a1,
         max(CASE WHEN k = 2 THEN a END) AS a2,
         max(CASE WHEN k = 3 THEN a END) AS a3,
         max(CASE WHEN k = 1 THEN b END) AS b1,
         max(CASE WHEN k = 2 THEN b END) AS b2,
         max(CASE WHEN k = 3 THEN b END) AS b3
  FROM per),
one AS (
  SELECT tot.n0 AS n_days, tot.nn AS nn, tot.ss AS ss,
         tot.sxx AS sxx,
         nn * nn * sab1 - nn * ss * (a1 + b1)
           + CAST(m1 AS DOUBLE) * ss * ss AS c1x,
         nn * nn * sab2 - nn * ss * (a2 + b2)
           + CAST(m2 AS DOUBLE) * ss * ss AS c2x,
         nn * nn * sab3 - nn * ss * (a3 + b3)
           + CAST(m3 AS DOUBLE) * ss * ss AS c3x
  FROM tot CROSS JOIN pvt),
staged AS (
  SELECT n_days, nn * nn * sxx - nn * ss * ss AS c0,
         coalesce(c1x, 0.0) AS c1, coalesce(c2x, 0.0) AS c2,
         coalesce(c3x, 0.0) AS c3
  FROM one),
rr AS (
  SELECT n_days, c0, c1, c2, c3,
         CASE WHEN c0 > 0 THEN c1 / c0 END AS r1,
         CASE WHEN c0 > 0 THEN c2 / c0 END AS r2,
         CASE WHEN c0 > 0 THEN c3 / c0 END AS r3
  FROM staged),
p2 AS (
  SELECT rr.*, r1 AS pacf1,
         CASE WHEN 1.0 - r1 * r1 <> 0
           THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS pacf2
  FROM rr)
SELECT n_days, c0, c1, c2, c3, r1, r2, r3, pacf1, pacf2,
  CASE WHEN 1.0 - (r1 * (1.0 - pacf2)) * r1 - pacf2 * r2 <> 0
    THEN (r3 - (r1 * (1.0 - pacf2)) * r2 - pacf2 * r1)
         / (1.0 - (r1 * (1.0 - pacf2)) * r1 - pacf2 * r2)
  END AS pacf3
FROM p2
"""


STAGED_QUERIES = {
    "q_modularity": q_modularity,
    "q_conductance": q_conductance,
    "q_attr_assortativity": q_attr_assortativity,
    "q_lift_gains": q_lift_gains,
    "q_lorenz": q_lorenz,
    "q_rich_club": q_rich_club,
    "q_ess_audit": q_ess_audit,
    "q_pacf": q_pacf,
}

STAGED_ORACLES: dict[str, str] = {
    "q_attr_assortativity": _ATTR_ASSORTATIVITY_SQL,
    "q_lift_gains": _LIFT_GAINS_SQL,
    "q_lorenz": _LORENZ_SQL,
    "q_rich_club": _RICH_CLUB_SQL,
    "q_ess_audit": _ESS_AUDIT_SQL,
    "q_pacf": _PACF_SQL,
}


def build_oracles(registry_oracles: dict[str, str]) -> dict[str, str]:
    """Complete ``STAGED_ORACLES`` against the registry (q_modularity
    and q_conductance nest the q_communities oracle SQL) and return
    it — the staging_r17/r18 build_oracles pattern; idempotent."""
    STAGED_ORACLES["q_modularity"] = _modularity_oracle(registry_oracles)
    STAGED_ORACLES["q_conductance"] = _conductance_oracle(
        registry_oracles
    )
    return STAGED_ORACLES
