"""The r13-registered face batch (staged in r12, lifted in r13).

History: these 12 faces were written in r12, when the driver window had
frozen with all 23 tail slots taken (the 12 lifted faces_r12.py
registrations + 11 staleness re-checks), and the hard rule since r11 is
that new faces land ONLY in free tail slots of the round that registers
them (docs/DRIVER_WINDOW.md) — so they shipped here as STAGED faces:
fully face-shaped (each callable takes (spark, sf_dir) and returns a
DataFrame) with their DuckDB oracles, driven by the SAME harness
comparison as the registry (tests/test_r12_ops.py), but NOT in
``queries.QUERIES``.  The r13 rotation registered them: ``queries.py``
merges ``STAGED_QUERIES`` / ``STAGED_ORACLES`` into the registry at
import time and rotates all 12 into the r13 window tail, so they are
driver-visible and covered by tests/test_oracle_parity.py like every
other registered face.  This module stays their permanent home (same
one-module-per-batch shape faces_r12.py uses); registration order
within the batch is the ``STAGED_QUERIES`` dict order.

Every face follows the registry contracts: driver-hashable output
types only (no decimal/array/map), aliased columns matching the oracle
exactly, bounded plans (no unguarded cross products), and the
exact-integer / fixed-IEEE-expression determinism the stats tier pins
(floats only as ONE fixed IEEE op sequence on exact-int-valued inputs;
cross-row float sums are refused and left to consumers).

Plan-lint note: 7 of the 12 faces plan a BroadcastNestedLoopJoin; their
`tests/test_plans.py::ALLOWED_BNLJ` entries (added with the r13
registration, pre-documented here while staged) are the allowlisted
1-row-fold and bounded-grid classes — each verified bounded:

    "q_page_trend": "1-row (k, n) completeness frame broadcast per
        treatment (the q_friedman shape)",
    "q_quade": "1-row k-frame broadcast onto the per-(block, treatment)
        cells (the q_friedman completeness shape)",
    "q_conover_scale": "_with_prior_sums' single-row (min,max) z2-range
        broadcast for the prefix-sum buckets",
    "q_cliff_delta": "zero-filled (value-axis x k-group) grid build,
        bounded by the ordinal-domain contract (the q_jonckheere /
        q_gk_gamma bounded-grid class)",
    "q_digit_pref": "single-row corpus-count broadcast onto the 10-digit
        axis (the q_benford shape)",
    "q_hoeffding": "zero-filled (x-domain x y-domain) grid build + two
        k-bounded axis-midrank frames broadcast (the q_gk_gamma
        bounded-grid class)",
    "q_mrr": "probes (vec_id<5, contract-small) broadcast to corpus —
        inherited from the allowlisted q_cosine_topk / q_ann_recall
        shape its exact arm reuses",

(q_pettitt plans NO BNLJ at all: the U_t double sum collapses to two
bounded prefix windows via the U_t = U_{t-1} + V_t identity — see
pettitt_cells.  q_logrank, q_mantel_haenszel, q_km-style
q_aalen_johansen and q_ngram_novelty plan only equi joins / bounded
windows — no BNLJ.)

The r13 WINDOW_TAIL as registered (docs/DRIVER_WINDOW.md and
queries.py carry the live copy)::

    WINDOW_TAIL: tuple[str, ...] = (
        "q_logrank", "q_mantel_haenszel", "q_page_trend", "q_pettitt",
        "q_conover_scale", "q_digit_pref", "q_mrr", "q_ngram_novelty",
        "q_quade", "q_cliff_delta", "q_hoeffding", "q_aalen_johansen",
        "q_cosine_topk_arrow", "q_cosine_dup_pairs", "q_ann_ivf",
        "q_ivf_dup_pairs", "q_semdedup", "q_ann_recall",
        "q_top_events_page", "q_mode_per_user", "q_order_priority_check",
        "q_small_quantity_revenue", "q_returned_item_revenue",
    )
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Haenszel survival) cells: did RETURNED lines
    (arm A = l_returnflag 'R') ship on a different time curve than the
    rest, stratified by order priority?  Duration and censoring exactly
    as q_km_events (time from order date to shipment; open-status lines
    censored).  (operators/temporal.py logrank_cells; the chi-square
    (sum o_minus_e_a)^2 / (sum var_term) is a consumer one-liner — the
    two sums are the only ops the face refuses, per the cells
    contract.)"""
    from npm_mirror_spark.operators.temporal import logrank_cells

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
    return logrank_cells(j, "prio", "dur", "ev", in_a=F.col("ret"))


_LOGRANK_SQL = """
WITH src AS (
  SELECT o.o_orderpriority AS g,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS t,
         CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END AS e,
         coalesce(l.l_returnflag = 'R', FALSE) AS a
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  -- NULL alignment with the Spark face (the q_km_events oracle's
  -- convention, review finding): a NULL linestatus/date makes the
  -- face's ev/dur NULL and logrank_cells drops the row, so the
  -- oracle drops it too instead of CASE-mapping NULL to censored
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
  CAST(da AS DOUBLE)
    - CAST(nra AS DOUBLE) * CAST(d AS DOUBLE) / CAST(nr AS DOUBLE)
    AS o_minus_e_a,
  CASE WHEN nr > 1 THEN
    CAST(d AS DOUBLE)
      * (CAST(nra AS DOUBLE) / CAST(nr AS DOUBLE))
      * (1.0 - CAST(nra AS DOUBLE) / CAST(nr AS DOUBLE))
      * (CAST(nr AS DOUBLE) - CAST(d AS DOUBLE))
      / (CAST(nr AS DOUBLE) - 1.0)
  ELSE 0.0 END AS var_term
FROM risk WHERE d > 0 ORDER BY prio, t
"""


def q_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel stratified 2x2 cells: does a line being RETURNED
    (exposure) associate with it being a LARGE order line (quantity >
    25, outcome), within line-number strata?  The confounder-adjusted
    association the pooled q_chisq cannot give (Simpson's paradox
    bait).  OR_MH = sum(mh_num)/sum(mh_den) and the CMH chi-square are
    consumer one-liners over this bounded table.  (operators/checks.py
    mantel_haenszel_cells.)"""
    from npm_mirror_spark.operators.checks import mantel_haenszel_cells

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").alias("ln"),
        (F.col("l_returnflag") == "R").alias("ret"),
        (F.col("l_quantity") > 25).alias("big"),
    )
    return mantel_haenszel_cells(
        li, "ln", exposed=F.col("ret"), outcome=F.col("big")
    )


_MH_SQL = """
WITH g AS (
  SELECT l_linenumber AS ln,
         coalesce(l_returnflag = 'R', FALSE) AS x,
         coalesce(l_quantity > 25, FALSE) AS y
  FROM lineitem WHERE l_linenumber IS NOT NULL
),
per AS (
  SELECT ln,
    sum(CASE WHEN x AND y THEN 1 ELSE 0 END) AS a,
    sum(CASE WHEN x AND NOT y THEN 1 ELSE 0 END) AS b,
    sum(CASE WHEN NOT x AND y THEN 1 ELSE 0 END) AS c,
    sum(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END) AS d,
    count(*) AS n
  FROM g GROUP BY ln
)
SELECT ln, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
  CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
  CAST(n AS BIGINT) AS n,
  CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS mh_num,
  CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS mh_den
FROM per ORDER BY ln
"""


def q_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L ordered-trend cells: blocks = days, ordered treatments
    = the four six-hour slots of the day, value = the slot's event
    count — does intra-day volume RISE monotonically through the day,
    consistently across days?  The blocked twin of q_jonckheere's
    unblocked ordered question and the ordered twin of q_friedman's
    unordered blocked one.  (operators/stats.py page_trend_cells.)
    Fixture note: lineitem blocks (orders) don't work here — line
    numbers repeat within multi-line orders, so no complete blocks
    exist; the day x slot design is complete almost everywhere.
    """
    from npm_mirror_spark.operators.stats import page_trend_cells

    ev = _t(spark, sf_dir, "events")
    slots = ev.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"),
        (F.hour("ts").cast("int") / F.lit(6)).cast("int").alias("slot"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return page_trend_cells(slots, "d", "slot", "n")


_PAGE_SQL = """
WITH g AS (
  SELECT date_trunc('day', ts) AS b,
         CAST(CAST(extract(hour FROM ts) AS INTEGER) // 6 AS INTEGER) AS t,
         count(*) AS x
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
k AS (SELECT count(DISTINCT t) AS k FROM g),
blocks AS (
  SELECT b FROM g GROUP BY b
  HAVING count(*) = (SELECT k FROM k)
     AND count(DISTINCT t) = (SELECT k FROM k)
),
gc AS (SELECT g.* FROM g JOIN blocks USING (b)),
vb AS (SELECT b, x, count(*) AS cx FROM gc GROUP BY b, x),
pri AS (
  SELECT b, x, cx,
    coalesce(sum(cx) OVER (PARTITION BY b ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
  FROM vb
),
ranked AS (
  SELECT gc.t, 2 * pri.p + pri.cx + 1 AS mr2
  FROM gc JOIN pri ON gc.b = pri.b AND gc.x = pri.x
),
per_t AS (
  SELECT t, count(*) AS n_blocks, sum(CAST(mr2 AS HUGEINT)) AS r2
  FROM ranked GROUP BY t
),
kn AS (SELECT count(DISTINCT t) AS k_treatments FROM gc),
wrank AS (
  SELECT t, CAST(row_number() OVER (ORDER BY t) AS INTEGER) AS w
  FROM (SELECT DISTINCT t FROM gc)
)
SELECT per_t.t AS slot, wrank.w, per_t.n_blocks, kn.k_treatments,
  CAST(r2 AS DOUBLE) AS rank_sum_x2,
  CAST(wrank.w AS DOUBLE) * CAST(r2 AS DOUBLE) AS l_term_x2
FROM per_t JOIN wrank ON per_t.t = wrank.t CROSS JOIN kn
ORDER BY slot
"""


def q_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank changepoint cells over the daily event-count
    series: for every prospective split day, the exact Mann-Whitney
    shift statistic U_t — argmax |U_t| is the distribution-free change
    point q_changepoint's SSE split can't robustly give on heavy-tailed
    days.  (operators/temporal.py pettitt_cells.)"""
    from npm_mirror_spark.operators.temporal import pettitt_cells

    ev = _t(spark, sf_dir, "events")
    daily = ev.where(F.col("ts").isNotNull()).groupBy(
        # epoch-day bigint, the q_new_users_daily convention: a
        # date_trunc timestamp renders differently across the two
        # engines' canonicalizers
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    return pettitt_cells(daily, "d", "n")


_PETTITT_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d, count(*) AS x
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
vc AS (SELECT x, count(*) AS cd FROM daily GROUP BY x),
pri AS (
  SELECT x, cd,
    coalesce(sum(cd) OVER (ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
    sum(cd) OVER () AS n
  FROM vc
),
v AS (SELECT x, 2 * below + cd - n AS v, n FROM pri),
j AS (SELECT daily.d, v.v, v.n FROM daily JOIN v USING (x))
SELECT d, CAST(n AS BIGINT) AS n_days,
  CAST(sum(v) OVER (ORDER BY d
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS u_t
FROM j ORDER BY d
"""


def q_conover_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conover squared-ranks scale cells over document lengths by
    source — the rank-based spread companion to q_brown_forsythe
    (same "did a source's length distribution widen?" question, robust
    to the heavy tails where BF's z-means lose power).
    (operators/stats.py conover_scale_cells.)"""
    from npm_mirror_spark.operators.stats import conover_scale_cells

    d = _t(spark, sf_dir, "documents")
    return conover_scale_cells(d, "n_chars", "source")


_CONOVER_SQL = """
WITH g AS (
  SELECT source AS gg, n_chars AS x FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
),
vg AS (SELECT gg, x, count(*) AS c FROM g GROUP BY 1, 2),
wc AS (
  SELECT gg, x, c,
    sum(c) OVER (PARTITION BY gg ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(c) OVER (PARTITION BY gg) AS n
  FROM vg
),
med AS (
  SELECT gg,
    min(CASE WHEN cum >= (n + 1) // 2 THEN x END) AS mlo,
    min(CASE WHEN cum >= n // 2 + 1 THEN x END) AS mhi
  FROM wc GROUP BY gg
),
z AS (
  SELECT g.gg,
    abs(2 * CAST(g.x AS HUGEINT) - (CAST(m.mlo AS HUGEINT) + m.mhi)) AS z2
  FROM g JOIN med m ON g.gg = m.gg
),
zg AS (SELECT gg, z2, count(*) AS cg FROM z GROUP BY 1, 2),
vals AS (SELECT z2, sum(cg) AS c FROM zg GROUP BY z2),
pri AS (
  SELECT z2, c,
    coalesce(sum(c) OVER (ORDER BY z2
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
  FROM vals
),
j AS (
  SELECT zg.gg, zg.cg, 2 * pri.p + pri.c + 1 AS mr2
  FROM zg JOIN pri ON zg.z2 = pri.z2
)
SELECT gg AS source, CAST(sum(cg) AS BIGINT) AS n_i,
  CAST(sum(CAST(cg AS HUGEINT) * mr2 * mr2) AS DOUBLE) AS sum_sq_rank_x4,
  CAST(sum(CAST(cg AS HUGEINT) * mr2 * mr2 * mr2 * mr2) AS DOUBLE)
    AS sum_quad_rank_x16
FROM j GROUP BY gg ORDER BY source
"""


def q_digit_pref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit preference audit of order totals — the terminal-digit
    companion to q_benford's first-digit screen: rounding habits and
    fabricated amounts spike specific last digits where organic
    measurements stay ~uniform.  (operators/checks.py
    digit_preference_cells.)"""
    from npm_mirror_spark.operators.checks import digit_preference_cells

    o = _t(spark, sf_dir, "orders")
    return digit_preference_cells(o, "o_totalprice")


_DIGIT_SQL = """
WITH d AS (
  SELECT CAST(abs(CAST(trunc(o_totalprice) AS BIGINT)) % 10 AS INTEGER)
    AS digit
  FROM orders WHERE o_totalprice IS NOT NULL
),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
t AS (SELECT count(*) AS tt FROM d),
axis AS (SELECT CAST(unnest(generate_series(0, 9)) AS INTEGER) AS digit),
f AS (
  SELECT axis.digit, coalesce(c.n, 0) AS n, t.tt
  FROM axis CROSS JOIN t LEFT JOIN c ON axis.digit = c.digit
)
SELECT digit, CAST(n AS BIGINT) AS n,
  CAST(10 * n - tt AS BIGINT) AS dev_x10,
  CAST((10 * n - tt) * (10 * n - tt) AS BIGINT) AS sq_dev_x100
FROM f ORDER BY digit
"""


def q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-eval MRR cells: per probe, the RANK at which the IVF
    ANN surfaces the TRUE nearest neighbor (exact brute-force top-1),
    and its reciprocal — the position-sensitive companion to
    q_ann_recall's set-overlap recall (a list that buries the true hit
    at rank 3 recalls 1.0 but MRRs 0.33).  Same probes / k / nprobe /
    deterministic centroids as q_ann_ivf, so the oracle COMPOSES the
    two already-verified oracle SQLs (the q_capture_recapture pattern).
    rank = 0 and rr = 0.0 when the true neighbor is missing from the
    shortlist; rr is ONE fixed IEEE division on an exact int.  MRR =
    avg(rr) is the consumer one-liner this face refuses (a float mean
    over data-dependent probe order)."""
    from npm_mirror_spark.operators import similarity as sim_ops
    from npm_mirror_spark.queries import _ivf_centroids

    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    tru = sim_ops.cosine_topk(e, probes, k=1).select(
        "probe_id", F.col("neighbor_id").alias("true_nn")
    )
    cand = sim_ops.ivf_topk(
        e, probes, _ivf_centroids(e), k=3, nprobe=2
    ).select(
        F.col("probe_id").alias("__p"),
        F.col("neighbor_id").alias("__n"),
        F.col("rank").alias("__r"),
    )
    j = tru.join(
        cand,
        (tru["probe_id"] == cand["__p"]) & (tru["true_nn"] == cand["__n"]),
        "left",
    )
    return j.select(
        "probe_id",
        "true_nn",
        F.coalesce(F.col("__r"), F.lit(0)).cast("int").alias("rank"),
        F.when(
            F.col("__r").isNotNull(),
            F.lit(1.0) / F.col("__r").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rr"),
    ).orderBy("probe_id")


def _mrr_oracle(ORACLES: dict[str, str]) -> str:
    """Compose the verified q_cosine_topk / q_ann_ivf oracle SQL into
    the MRR replay (the q_capture_recapture composition pattern: this
    face's oracle can never drift from the registered fixtures').
    Deferred to ``build_oracles`` — queries.py imports this module
    mid-initialization, before its ORACLES literal exists."""
    return f"""
WITH tru AS (
  SELECT probe_id, neighbor_id AS true_nn
  FROM ({ORACLES["q_cosine_topk"]}) WHERE rank = 1 AND probe_id < 5
),
cand AS (
  SELECT probe_id, neighbor_id, rank FROM ({ORACLES["q_ann_ivf"]})
),
j AS (
  SELECT t.probe_id, t.true_nn, c.rank
  FROM tru t LEFT JOIN cand c
    ON t.probe_id = c.probe_id AND t.true_nn = c.neighbor_id
)
SELECT probe_id, CAST(true_nn AS BIGINT) AS true_nn,
  CAST(coalesce(rank, 0) AS INTEGER) AS rank,
  CASE WHEN rank IS NOT NULL THEN 1.0 / CAST(rank AS DOUBLE)
       ELSE 0.0 END AS rr
FROM j ORDER BY probe_id
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty: the fraction of each source's
    distinct trigram types that appear there FIRST in doc_id order —
    the curation freshness signal dedup alone can't give (a source can
    pass near-dup checks yet re-state n-grams the corpus already
    holds).  (operators/text.py ngram_novelty.)"""
    from npm_mirror_spark.operators.text import ngram_novelty

    d = _t(spark, sf_dir, "documents")
    return ngram_novelty(d, "text", "doc_id", "source", n=3)


def _ngram_novelty_oracle(_NORM: str) -> str:
    """Replay with the registry's shared normalization/shingle CTEs
    (the _NORM/trigram construction q_minhash_pairs et al. verify).
    Deferred to ``build_oracles`` — queries.py imports this module
    mid-initialization, before ``_NORM`` is defined."""
    return f"""
WITH norm AS (
  SELECT doc_id, source, {_NORM} AS t FROM documents
  WHERE text IS NOT NULL AND source IS NOT NULL
),
w AS (SELECT doc_id, source, str_split(t, ' ') AS w, t FROM norm),
sh AS (SELECT doc_id, source,
  CASE WHEN len(w) >= 3
    THEN list_transform(generate_series(1, len(w)-2),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    ELSE [t] END AS shingles
  FROM w),
ex AS (SELECT DISTINCT doc_id, source, unnest(shingles) AS s FROM sh),
f AS (SELECT s, min(doc_id) AS fd FROM ex GROUP BY s),
j AS (SELECT ex.source, ex.doc_id, f.fd FROM ex JOIN f ON ex.s = f.s)
SELECT source, CAST(count(*) AS BIGINT) AS n_types,
  CAST(sum(CASE WHEN doc_id = fd THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
  CAST(sum(CASE WHEN doc_id = fd THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS novelty
FROM j GROUP BY source ORDER BY source
"""


def q_quade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade block-weighted rank cells over daily event-type counts —
    the third member of the blocked family (q_friedman unordered,
    q_page_trend ordered, Quade RANGE-WEIGHTED: days where types
    actually diverge count more).  (operators/stats.py quade_cells.)"""
    from npm_mirror_spark.operators.stats import quade_cells

    ev = _t(spark, sf_dir, "events")
    daily = ev.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.col("event_type").alias("t"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return quade_cells(daily, "d", "t", "n")


_QUADE_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, event_type AS t, count(*) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
k AS (SELECT count(DISTINCT t) AS k FROM daily),
blocks AS (
  SELECT d FROM daily GROUP BY d
  HAVING count(*) = (SELECT k FROM k)
     AND count(DISTINCT t) = (SELECT k FROM k)
),
gc AS (SELECT daily.* FROM daily JOIN blocks USING (d)),
vb AS (SELECT d, n AS x, count(*) AS cx FROM gc GROUP BY 1, 2),
pri AS (
  SELECT d, x, cx,
    coalesce(sum(cx) OVER (PARTITION BY d ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
  FROM vb
),
ranked AS (
  SELECT gc.d, gc.t, 2 * pri.p + pri.cx + 1 AS mr2
  FROM gc JOIN pri ON gc.d = pri.d AND gc.n = pri.x
),
rng AS (SELECT d, max(n) - min(n) AS rg FROM gc GROUP BY d),
rcol AS (SELECT rg, count(*) AS cr FROM rng GROUP BY rg),
rpri AS (
  SELECT rg, cr,
    coalesce(sum(cr) OVER (ORDER BY rg
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rp
  FROM rcol
),
rrank AS (
  SELECT rng.d, 2 * rpri.rp + rpri.cr + 1 AS mrange2
  FROM rng JOIN rpri ON rng.rg = rpri.rg
),
kn AS (SELECT count(DISTINCT t) AS kt FROM gc),
cells AS (
  SELECT ranked.t, kn.kt,
    CAST(rrank.mrange2 AS HUGEINT) * (ranked.mr2 - (kn.kt + 1)) AS term
  FROM ranked JOIN rrank ON ranked.d = rrank.d CROSS JOIN kn
)
SELECT t, CAST(count(*) AS BIGINT) AS n_blocks,
  CAST(kt AS BIGINT) AS k_treatments,
  CAST(sum(term) AS DOUBLE) AS s_x4,
  CAST(sum(term * term) AS DOUBLE) AS ss_x16
FROM cells GROUP BY t, kt ORDER BY t
"""


def q_cliff_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta dominance census between document sources on
    length — the ordinal effect size q_rank_sum/q_kruskal leave out:
    per source pair, the exact (gt, lt, ties) pair counts and delta in
    [-1, 1].  (operators/stats.py cliff_delta_cells; the jonckheere
    grid machinery, so the value axis rides the same ordinal-domain
    contract.)"""
    from npm_mirror_spark.operators.stats import cliff_delta_cells

    d = _t(spark, sf_dir, "documents")
    return cliff_delta_cells(d, "n_chars", "source")


_CLIFF_SQL = """
WITH g AS (
  SELECT source AS gg, n_chars AS x FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
),
vg AS (SELECT gg, x, count(*) AS c FROM g GROUP BY 1, 2),
axis AS (SELECT DISTINCT x FROM vg),
grps AS (SELECT DISTINCT gg FROM vg),
grid AS (
  SELECT grps.gg, axis.x, coalesce(vg.c, 0) AS c
  FROM axis CROSS JOIN grps
  LEFT JOIN vg ON vg.gg = grps.gg AND vg.x = axis.x
),
pri AS (
  SELECT gg, x, c,
    coalesce(sum(c) OVER (PARTITION BY gg ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p,
    sum(c) OVER (PARTITION BY gg) AS n
  FROM grid
),
per AS (
  SELECT a.gg AS g_lo, b.gg AS g_hi,
    max(a.n) AS nlo, max(b.n) AS nhi,
    sum(CAST(b.c AS HUGEINT) * a.p) AS gt,
    sum(CAST(b.c AS HUGEINT) * a.c) AS ties
  FROM pri a JOIN pri b ON a.x = b.x AND a.gg < b.gg
  GROUP BY 1, 2
)
SELECT g_lo, g_hi,
  CAST(nlo AS BIGINT) AS n_lo, CAST(nhi AS BIGINT) AS n_hi,
  CAST(gt AS DOUBLE) AS gt,
  CAST(CAST(nlo AS HUGEINT) * nhi - gt - ties AS DOUBLE) AS lt,
  CAST(ties AS DOUBLE) AS ties,
  CAST(gt - (CAST(nlo AS HUGEINT) * nhi - gt - ties) AS DOUBLE)
    / CAST(CAST(nlo AS HUGEINT) * nhi AS DOUBLE) AS delta
FROM per ORDER BY g_lo, g_hi
"""


def q_hoeffding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D independence cells between line number and
    quantity — consistent against ANY dependence shape, where
    q_spearman/q_kendall_tau only see monotone association and q_chisq
    needs categories.  (operators/checks.py hoeffding_d_cells; the
    jonckheere/gamma 2-D dominance grid, so both axes ride the
    ordinal-domain contract.)"""
    from npm_mirror_spark.operators.checks import hoeffding_d_cells

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").alias("ln"),
        # floor, not a bare cast — the q_jonckheere cross-engine guard
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
    )
    return hoeffding_d_cells(li, "ln", "qty")


_HOEFFDING_SQL = """
WITH g AS (
  SELECT l_linenumber AS x, CAST(floor(l_quantity) AS BIGINT) AS y
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
),
cells AS (SELECT x, y, count(*) AS c FROM g GROUP BY 1, 2),
xa AS (SELECT DISTINCT x FROM cells),
ya AS (SELECT DISTINCT y FROM cells),
grid AS (
  SELECT xa.x, ya.y, coalesce(cells.c, 0) AS c
  FROM xa CROSS JOIN ya
  LEFT JOIN cells ON cells.x = xa.x AND cells.y = ya.y
),
pre AS (
  SELECT x, y, c,
    coalesce(sum(c) OVER (PARTITION BY x ORDER BY y
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS el,
    coalesce(sum(c) OVER (PARTITION BY y ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS le
  FROM grid
),
f AS (
  SELECT x, y, c,
    4 * coalesce(sum(el) OVER (PARTITION BY y ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + 2 * le + 2 * el + c AS q4
  FROM pre
),
xm AS (
  SELECT x,
    2 * coalesce(sum(cx) OVER (ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cx + 1
      AS r2
  FROM (SELECT x, sum(c) AS cx FROM cells GROUP BY x)
),
ym AS (
  SELECT y,
    2 * coalesce(sum(cy) OVER (ORDER BY y
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cy + 1
      AS s2
  FROM (SELECT y, sum(c) AS cy FROM cells GROUP BY y)
)
SELECT f.x AS ln, f.y AS qty, CAST(f.c AS BIGINT) AS c,
  CAST(xm.r2 AS BIGINT) AS r2, CAST(ym.s2 AS BIGINT) AS s2,
  CAST(f.q4 AS BIGINT) AS q4
FROM f JOIN xm ON f.x = xm.x JOIN ym ON f.y = ym.y
WHERE f.c > 0
ORDER BY ln, qty
"""


def q_aalen_johansen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen–Johansen competing-risks event table over shipping
    durations: a line exits by being RETURNED (cause R) or KEPT
    (causes A/N) when it finishes; open-status lines are censored —
    per (priority stratum, event time, cause) the shared risk set and
    cause-specific event counts the cumulative-incidence estimator
    needs (per-cause KM curves would overestimate every cause).
    (operators/temporal.py aalen_johansen_cells — the survival tier's
    third member after q_km_events and q_logrank.)"""
    from npm_mirror_spark.operators.temporal import aalen_johansen_cells

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
        F.col("l_returnflag").alias("flag"),
    )
    return aalen_johansen_cells(j, "prio", "dur", "ev", "flag")


_AJ_SQL = """
WITH src AS (
  SELECT o.o_orderpriority AS g,
    date_diff('day', o.o_orderdate, l.l_shipdate) AS t,
    CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END AS e,
    l.l_returnflag AS k
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  -- NULL alignment with the Spark face (the q_km_events/q_logrank
  -- oracle convention): NULL stratum/dates/linestatus rows drop, and
  -- an EVENT row with NULL cause drops (the operator's filter)
  WHERE o.o_orderpriority IS NOT NULL AND l.l_linestatus IS NOT NULL
    AND l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND (l.l_linestatus <> 'F' OR l.l_returnflag IS NOT NULL)
),
per_t AS (
  SELECT g, t, count(*) AS n, sum(e) AS d, sum(1 - e) AS c
  FROM src GROUP BY g, t
),
risk AS (
  SELECT g, t, d, c,
    sum(n) OVER (PARTITION BY g)
      - coalesce(sum(n) OVER (PARTITION BY g ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nr
  FROM per_t
),
pc AS (
  SELECT g, t, k, count(*) AS dk FROM src WHERE e = 1 GROUP BY g, t, k
)
SELECT pc.g AS prio, CAST(pc.t AS INTEGER) AS t, pc.k AS flag,
  CAST(pc.dk AS BIGINT) AS d_cause, CAST(risk.d AS BIGINT) AS d,
  CAST(risk.c AS BIGINT) AS c, CAST(risk.nr AS BIGINT) AS n_risk
FROM pc JOIN risk ON pc.g = risk.g AND pc.t = risk.t
ORDER BY prio, t, flag
"""


STAGED_QUERIES = {
    "q_logrank": q_logrank,
    "q_mantel_haenszel": q_mantel_haenszel,
    "q_page_trend": q_page_trend,
    "q_pettitt": q_pettitt,
    "q_conover_scale": q_conover_scale,
    "q_digit_pref": q_digit_pref,
    "q_mrr": q_mrr,
    "q_ngram_novelty": q_ngram_novelty,
    "q_quade": q_quade,
    "q_cliff_delta": q_cliff_delta,
    "q_hoeffding": q_hoeffding,
    "q_aalen_johansen": q_aalen_johansen,
}

STAGED_ORACLES = {
    "q_logrank": _LOGRANK_SQL,
    "q_mantel_haenszel": _MH_SQL,
    "q_page_trend": _PAGE_SQL,
    "q_pettitt": _PETTITT_SQL,
    "q_conover_scale": _CONOVER_SQL,
    "q_digit_pref": _DIGIT_SQL,
    "q_quade": _QUADE_SQL,
    "q_cliff_delta": _CLIFF_SQL,
    "q_hoeffding": _HOEFFDING_SQL,
    "q_aalen_johansen": _AJ_SQL,
}


def build_oracles(registry_oracles: dict[str, str]) -> dict[str, str]:
    """Complete ``STAGED_ORACLES`` against the registry (q_mrr nests the
    q_cosine_topk / q_ann_ivf oracle SQL; q_ngram_novelty replays the
    registry's shared ``_NORM`` normalization) and return it.  Called
    once from queries.py after its ORACLES literal and ``_NORM`` are
    fully built (the faces_r12.build_oracles pattern); idempotent."""
    from npm_mirror_spark.queries import _NORM

    STAGED_ORACLES["q_mrr"] = _mrr_oracle(registry_oracles)
    STAGED_ORACLES["q_ngram_novelty"] = _ngram_novelty_oracle(_NORM)
    return STAGED_ORACLES
