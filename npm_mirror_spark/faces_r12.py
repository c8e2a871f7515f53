"""The r12-registered face batch (staged in r11, lifted in r12).

History: these 12 faces were written in r11, when the driver window had
frozen with ZERO free tail slots, so under the register-into-window-only
rule (docs/DRIVER_WINDOW.md) they shipped here as STAGED faces — fully
face-shaped, oracle-backed, driven by the same harness comparison as the
registry (tests/test_r11_ops.py) — but NOT in ``queries.QUERIES``.  The
r12 rotation registered them: ``queries.py`` merges ``R12_QUERIES`` /
``R12_ORACLES`` into the registry at import time and rotates all 12 into
the r12 window tail, so they are driver-visible and covered by
tests/test_oracle_parity.py like every other registered face.  This
module stays their permanent home (same one-module-per-batch shape the
operators/ packages use); registration order within the batch is the
``R12_QUERIES`` dict order.

Every face follows the registry contracts: driver-hashable output
types only (no decimal/array/map), aliased columns matching the oracle
exactly, bounded plans (no unguarded cross products), and the
exact-integer / fixed-IEEE-expression determinism the stats tier pins.

Plan-lint note: 9 of the 12 faces plan a BroadcastNestedLoopJoin; their
`tests/test_plans.py::ALLOWED_BNLJ` entries (added with the r12
registration) are the already-allowlisted q_kappa 1-row-fold class and
the q_gap_fill bounded-grid class — each verified bounded here.

The ``q_capture_recapture`` oracle composes the registry's (already
driver-green) ``q_minhash_pairs`` / ``q_simhash_pairs`` oracle SQL; to
keep this module import-clean (queries.py imports US at its top, before
its ORACLES dict exists), the composition is deferred: ``build_oracles``
takes the registry dict and completes ``R12_ORACLES``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, event_type, n) — the complete-block fixture the blocked
    designs (Friedman, Cochran Q) and the per-type day series (DW)
    share."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.col("event_type").alias("t"),
    ).agg(F.count(F.lit(1)).alias("n"))


_DAILY_SQL = """
daily AS (
  SELECT date_trunc('day', ts) AS d, event_type AS t, count(*) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
)
"""


def q_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman blocked rank test over daily event-type counts: blocks
    = days, treatments = event types — did any type's daily volume rank
    persistently higher across days?  (operators/stats.py
    friedman_cells; the reference has no statistics surface — SURVEY
    §2.9 extension.)"""
    from npm_mirror_spark.operators.stats import friedman_cells

    return friedman_cells(_daily_counts(spark, sf_dir), "d", "t", "n")


def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe spread-homogeneity cells over document lengths by
    source — did a source's length DISTRIBUTION widen even where means
    held?  (operators/stats.py brown_forsythe_cells.)"""
    from npm_mirror_spark.operators.stats import brown_forsythe_cells

    d = _t(spark, sf_dir, "documents")
    return brown_forsythe_cells(d, "n_chars", "source")


def q_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra ordered-trend cells: does line quantity
    trend with line number within orders?  Ordered groups =
    l_linenumber, value = integer quantity.  (operators/stats.py
    jonckheere_cells.)"""
    from npm_mirror_spark.operators.stats import jonckheere_cells

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").alias("ln"),
        # floor, not a bare cast: Spark cast('long') truncates toward
        # zero while DuckDB CAST rounds — floor() is identical in both
        # (quantities are integral in the fixture; latent-divergence
        # guard, review finding)
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
    )
    return jonckheere_cells(li, "qty", "ln")


def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson lag-1 statistic per event type over its daily
    count series — the residual-independence audit for the volume
    trend dashboards.  (operators/stats.py durbin_watson_by.)"""
    from npm_mirror_spark.operators.stats import durbin_watson_by

    return durbin_watson_by(_daily_counts(spark, sf_dir), "t", "d", "n")


def q_gk_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman–Kruskal gamma between line number and quantity — the
    signed ordinal association chi-square is blind to.
    (operators/checks.py gk_gamma.)"""
    from npm_mirror_spark.operators.checks import gk_gamma

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").alias("ln"),
        # floor, not a bare cast — see q_jonckheere
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
    )
    return gk_gamma(li, "ln", "qty")


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over k paired binary outcomes: blocks = days,
    treatments = event types, success = the day's count for that type
    above the GLOBAL daily mean (cross-multiplied integer test
    n * n_cells > total, so no division enters) — did any type's
    above-average days cluster differently?  (operators/checks.py
    cochran_q_cells.)"""
    from npm_mirror_spark.operators.checks import cochran_q_cells

    daily = _daily_counts(spark, sf_dir)
    tot = daily.agg(
        F.count(F.lit(1)).alias("__cells"),
        F.sum("n").alias("__total"),
    )
    flagged = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        "t",
        (
            F.col("n").cast("decimal(38,0)") * F.col("__cells").cast("decimal(38,0)")
            > F.col("__total").cast("decimal(38,0)")
        ).alias("succ"),
    )
    return cochran_q_cells(flagged, "d", "t", "succ")


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve over the documents corpus: token types
    needed to cover 50/90/95/99% of running text.
    (operators/text.py vocab_coverage.)"""
    from npm_mirror_spark.operators.text import vocab_coverage

    d = _t(spark, sf_dir, "documents")
    return vocab_coverage(d, "text")


def q_km_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier event table: time from order date to line shipment
    by return flag, a line 'censored' when its status is still open
    (l_linestatus = 'O').  (operators/temporal.py km_cells.)"""
    from npm_mirror_spark.operators.temporal import km_cells

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_linestatus", "l_returnflag"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("dur"),
        (F.col("l_linestatus") == "F").cast("int").alias("ev"),
    )
    return km_cells(j, "flag", "dur", "ev")


def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test cells over document lengths by source —
    the outlier-robust location companion to q_kruskal/q_anova_cells.
    (operators/stats.py mood_median_cells.)"""
    from npm_mirror_spark.operators.stats import mood_median_cells

    d = _t(spark, sf_dir, "documents")
    return mood_median_cells(d, "n_chars", "source")


def q_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness lower bound + Good–Turing missing
    mass over the documents corpus.  (operators/text.py
    vocab_richness.)"""
    from npm_mirror_spark.operators.text import vocab_richness

    d = _t(spark, sf_dir, "documents")
    return vocab_richness(d, "text")


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture–recapture estimate of the TRUE near-dup pair
    count from two independent detectors — MinHash/LSH vs SimHash
    blocking over the dup-injected corpus (the q_minhash_pairs /
    q_simhash_pairs fixtures): the dedup-recall audit neither method
    alone can give.  (operators/checks.py capture_recapture.)
    Independence caveat: the two signatures share normalization, so
    the estimate is a lower-bound-leaning audit number, not a census.
    """
    from npm_mirror_spark.operators.checks import capture_recapture
    from npm_mirror_spark.operators.dedup import (
        minhash_candidate_pairs,
        simhash_pairs,
    )
    from npm_mirror_spark.queries import _docs_with_dups

    # Deliberately NOT persisting the shared corpus subplan: a measured
    # A/B (docs/BENCH_NOTES.md r13) showed zero wall-clock change at
    # sf0.1 — the face's cost lives in the banding-join shuffles, not
    # the duplicated scans — and at 100 TB a corpus-sized cache write
    # costs more than the pruned parquet re-scan it saves.  The pair
    # sets (tiny, consumed twice) ARE persisted inside
    # capture_recapture.
    docs = _docs_with_dups(spark, sf_dir)
    m = minhash_candidate_pairs(docs, "text", "doc_id", num_hashes=8, bands=4)
    s = simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    return capture_recapture(m, s)


R12_QUERIES = {
    "q_friedman": q_friedman,
    "q_brown_forsythe": q_brown_forsythe,
    "q_jonckheere": q_jonckheere,
    "q_durbin_watson": q_durbin_watson,
    "q_gk_gamma": q_gk_gamma,
    "q_cochran_q": q_cochran_q,
    "q_vocab_coverage": q_vocab_coverage,
    "q_km_events": q_km_events,
    "q_mood_median": q_mood_median,
    "q_vocab_richness": q_vocab_richness,
    "q_capture_recapture": q_capture_recapture,
}


_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _capture_recapture_oracle(minhash_sql: str, simhash_sql: str) -> str:
    """Compose the existing (already driver-green) minhash/simhash pair
    oracles into the capture-recapture replay — the two pair sets are
    replayed by the exact SQL the registry already verifies, nested as
    CTE subqueries, so this face's oracle can never drift from the
    registered fixtures'.  The SQL arrives as arguments (not an import
    of queries.ORACLES) so this module imports cleanly while queries.py
    is still mid-initialization; ``build_oracles`` does the wiring."""
    return f"""
WITH m AS ({minhash_sql}),
s AS ({simhash_sql}),
ma AS (SELECT DISTINCT id_a, id_b FROM m),
sb AS (SELECT DISTINCT id_a, id_b FROM s),
na AS (SELECT count(*) AS n_a FROM ma),
nb AS (SELECT count(*) AS n_b FROM sb),
ov AS (SELECT count(*) AS o FROM ma JOIN sb USING (id_a, id_b))
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  CAST(o AS BIGINT) AS overlap,
  CAST(CAST(n_a + 1 AS HUGEINT) * (n_b + 1) AS DOUBLE)
    / CAST(o + 1 AS DOUBLE) - 1.0 AS chapman_est
FROM na CROSS JOIN nb CROSS JOIN ov
"""


R12_ORACLES = {
    "q_friedman": f"""
WITH {_DAILY_SQL},
k AS (SELECT count(DISTINCT t) AS k FROM daily),
blocks AS (
  SELECT d FROM daily GROUP BY d
  HAVING count(*) = (SELECT k FROM k)
     AND count(DISTINCT t) = (SELECT k FROM k)
),
gc AS (SELECT daily.* FROM daily JOIN blocks USING (d)),
ranked AS (
  SELECT t,
    2 * coalesce(count(*) OVER (
          PARTITION BY d ORDER BY n
          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + count(*) OVER (PARTITION BY d ORDER BY n RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
      + 1 AS mr2
  FROM gc
),
per_t AS (
  SELECT t, count(*) AS n_blocks, sum(CAST(mr2 AS HUGEINT)) AS r2
  FROM ranked GROUP BY t
),
kn AS (
  SELECT count(DISTINCT t) AS k_treatments, count(DISTINCT d) AS n
  FROM gc
)
SELECT t,
  n_blocks,
  k_treatments,
  CAST(r2 AS DOUBLE) AS rank_sum_x2,
  CAST(r2 AS DOUBLE) / CAST(2 * n_blocks AS DOUBLE) AS mean_rank,
  CAST(r2 - CAST(n AS HUGEINT) * (k_treatments + 1) AS DOUBLE)
    * CAST(r2 - CAST(n AS HUGEINT) * (k_treatments + 1) AS DOUBLE)
    AS chi2_term_x4
FROM per_t CROSS JOIN kn
ORDER BY t
""",
    "q_brown_forsythe": """
WITH vg AS (
  SELECT source AS g, n_chars AS x, count(*) AS c
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1, 2
),
wc AS (
  SELECT g, x, c,
    sum(c) OVER (PARTITION BY g ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(c) OVER (PARTITION BY g) AS n
  FROM vg
),
med AS (
  SELECT g,
    min(CASE WHEN cum >= (n + 1) // 2 THEN x END) AS mlo,
    min(CASE WHEN cum >= n // 2 + 1 THEN x END) AS mhi
  FROM wc GROUP BY g
),
z AS (
  SELECT d.source AS g,
    abs(2 * CAST(d.n_chars AS HUGEINT) - (CAST(m.mlo AS HUGEINT) + m.mhi)) AS z2
  FROM documents d JOIN med m ON d.source = m.g
  WHERE d.n_chars IS NOT NULL
),
per AS (
  SELECT g, count(*) AS n_i,
    sum(z2) AS s,
    sum(z2 * z2) AS q
  FROM z GROUP BY g
),
tot AS (SELECT count(*) AS n_total, sum(z2) AS st FROM z)
SELECT g AS source,
  n_i,
  CAST(s AS DOUBLE) AS sum_i,
  CAST(s AS DOUBLE) / CAST(n_i AS DOUBLE) AS mean_i,
  CAST(CAST(n_i AS HUGEINT) * q - s * s AS DOUBLE) / CAST(n_i AS DOUBLE)
    AS within_ss,
  CAST(n_i AS DOUBLE)
    * ((CAST(s AS DOUBLE) / CAST(n_i AS DOUBLE)
        - CAST(st AS DOUBLE) / CAST(n_total AS DOUBLE))
       * (CAST(s AS DOUBLE) / CAST(n_i AS DOUBLE)
          - CAST(st AS DOUBLE) / CAST(n_total AS DOUBLE)))
    AS between_term,
  n_total,
  CAST(st AS DOUBLE) / CAST(n_total AS DOUBLE) AS grand_mean
FROM per CROSS JOIN tot
ORDER BY source
""",
    "q_jonckheere": """
WITH vg AS (
  SELECT l_linenumber AS g, CAST(floor(l_quantity) AS BIGINT) AS x, count(*) AS c
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY 1, 2
),
axis AS (SELECT DISTINCT x FROM vg),
grps AS (SELECT DISTINCT g FROM vg),
grid AS (
  SELECT grps.g, axis.x, coalesce(vg.c, 0) AS c
  FROM axis CROSS JOIN grps
  LEFT JOIN vg ON vg.g = grps.g AND vg.x = axis.x
),
pri AS (
  SELECT g, x, c,
    coalesce(sum(c) OVER (PARTITION BY g ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS p,
    sum(c) OVER (PARTITION BY g) AS n
  FROM grid
)
SELECT a.g AS g_lo, b.g AS g_hi,
  CAST(a.n AS BIGINT) AS n_lo, CAST(b.n AS BIGINT) AS n_hi,
  CAST(sum(CAST(b.c AS HUGEINT) * (2 * a.p + a.c)) AS DOUBLE) AS u_x2
FROM pri a JOIN pri b ON a.x = b.x AND a.g < b.g
GROUP BY 1, 2, 3, 4
ORDER BY g_lo, g_hi
""",
    "q_durbin_watson": f"""
WITH {_DAILY_SQL},
tot AS (
  SELECT t, count(*) AS nn, sum(CAST(n AS HUGEINT)) AS s
  FROM daily GROUP BY t
),
ne AS (
  SELECT daily.t, tot.nn,
    CAST(tot.nn AS HUGEINT) * daily.n - tot.s AS ne,
    lag(CAST(tot.nn AS HUGEINT) * daily.n - tot.s)
      OVER (PARTITION BY daily.t ORDER BY daily.d, daily.n) AS nep
  FROM daily JOIN tot ON daily.t = tot.t
),
agg AS (
  SELECT t, max(nn) AS n,
    sum(CASE WHEN nep IS NOT NULL THEN (ne - nep) * (ne - nep)
             ELSE 0 END) AS num,
    sum(ne * ne) AS den
  FROM ne GROUP BY t
)
SELECT t, n,
  CAST(num AS DOUBLE) AS num,
  CAST(den AS DOUBLE) AS den,
  CASE WHEN den > 0 AND n > 1
       THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS dw
FROM agg ORDER BY t
""",
    "q_gk_gamma": """
WITH g AS (
  SELECT l_linenumber AS x, CAST(floor(l_quantity) AS BIGINT) AS y
  FROM lineitem WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
),
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
)
SELECT (SELECT count(*) FROM g) AS n_rows,
  (SELECT count(*) FROM cells) AS n_cells,
  CAST(cc AS DOUBLE) AS concordant,
  CAST(dd AS DOUBLE) AS discordant,
  CASE WHEN cc + dd > 0
       THEN CAST(cc - dd AS DOUBLE) / CAST(cc + dd AS DOUBLE) END AS gamma
FROM tot
""",
    "q_cochran_q": f"""
WITH {_DAILY_SQL},
gtot AS (SELECT count(*) AS cells, sum(CAST(n AS HUGEINT)) AS total FROM daily),
flagged AS (
  SELECT d, t,
    CASE WHEN CAST(n AS HUGEINT) * gtot.cells > gtot.total
         THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN gtot
),
k AS (SELECT count(DISTINCT t) AS k FROM flagged),
per_b AS (
  SELECT d, count(*) AS nr, count(DISTINCT t) AS nt, sum(s) AS bs
  FROM flagged GROUP BY d
),
complete AS (
  SELECT d, bs FROM per_b
  WHERE nr = (SELECT k FROM k) AND nt = (SELECT k FROM k)
),
gc AS (SELECT f.* FROM flagged f JOIN complete USING (d)),
per_t AS (SELECT t, sum(CAST(s AS HUGEINT)) AS tj FROM gc GROUP BY t),
bsums AS (
  SELECT count(*) AS n_blocks,
    sum(CAST(bs AS HUGEINT)) AS sb,
    sum(CAST(bs AS HUGEINT) * bs) AS sb2
  FROM complete
),
tsums AS (
  SELECT count(*) AS k_treatments,
    sum(tj) AS g, sum(tj * tj) AS t2
  FROM per_t
)
SELECT t,
  CAST(tj AS DOUBLE) AS t_j,
  k_treatments,
  n_blocks,
  CAST(sb AS DOUBLE) AS sum_b,
  CAST(sb2 AS DOUBLE) AS sum_b2,
  CASE WHEN CAST(k_treatments AS HUGEINT) * sb - sb2 > 0
       THEN CAST((CAST(k_treatments AS HUGEINT) - 1)
                 * (CAST(k_treatments AS HUGEINT) * t2 - g * g) AS DOUBLE)
            / CAST(CAST(k_treatments AS HUGEINT) * sb - sb2 AS DOUBLE)
       END AS q_stat
FROM per_t CROSS JOIN bsums CROSS JOIN tsums
ORDER BY t
""",
    "q_vocab_coverage": f"""
WITH n AS (SELECT {_NORM} AS t FROM documents),
toks AS (
  SELECT unnest(str_split(t, ' ')) AS tok FROM n
),
tf AS (
  SELECT tok, count(*) AS c FROM toks WHERE tok != '' GROUP BY tok
),
cls AS (
  SELECT c, count(*) AS types, CAST(c AS HUGEINT) * count(*) AS mass
  FROM tf GROUP BY c
),
pri AS (
  SELECT c, types, mass,
    coalesce(sum(types) OVER (ORDER BY c DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ptypes,
    coalesce(sum(mass) OVER (ORDER BY c DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pmass
  FROM cls
),
tot AS (SELECT sum(types) AS tt, sum(mass) AS tm FROM cls),
thr AS (
  SELECT * FROM (VALUES (50, 100), (90, 100), (95, 100), (99, 100))
    AS v(p_num, p_den)
),
crossed AS (
  SELECT thr.p_num, thr.p_den, max(pri.c) AS cutoff_count
  FROM pri CROSS JOIN tot CROSS JOIN thr
  WHERE (pri.pmass + pri.mass) * thr.p_den >= CAST(thr.p_num AS HUGEINT) * tot.tm
  GROUP BY 1, 2
)
SELECT crossed.p_num, crossed.p_den, crossed.cutoff_count,
  CAST(pri.ptypes + pri.types AS BIGINT) AS k_types,
  CAST(pri.pmass + pri.mass AS DOUBLE) AS covered_mass,
  CAST(tot.tt AS BIGINT) AS total_types,
  CAST(tot.tm AS DOUBLE) AS total_mass
FROM crossed
JOIN pri ON pri.c = crossed.cutoff_count
CROSS JOIN tot
ORDER BY p_num, p_den
""",
    "q_km_events": """
WITH j AS (
  SELECT l.l_returnflag AS flag,
    date_diff('day', o.o_orderdate, l.l_shipdate) AS dur,
    CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END AS ev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  -- NULL alignment with the Spark face (review finding): a NULL
  -- linestatus/date makes the face's ev/dur NULL and km_cells drops
  -- the row, so the oracle must drop it too
  WHERE l.l_linestatus IS NOT NULL
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
  CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c
FROM cum ORDER BY flag, t
""",
}

R12_ORACLES["q_mood_median"] = """
WITH g AS (
  SELECT source AS g, n_chars AS x FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
),
vals AS (SELECT x, count(*) AS c FROM g GROUP BY x),
wc AS (
  SELECT x, c,
    sum(c) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM vals
),
tot AS (SELECT sum(c) AS n FROM vals),
med AS (
  SELECT CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN x END) AS HUGEINT)
       + min(CASE WHEN cum >= n // 2 + 1 THEN x END) AS med2
  FROM wc CROSS JOIN tot
)
SELECT g.g AS source,
  CAST(sum(CASE WHEN 2 * CAST(x AS HUGEINT) > med2 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
  CAST(sum(CASE WHEN 2 * CAST(x AS HUGEINT) < med2 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
  CAST(sum(CASE WHEN 2 * CAST(x AS HUGEINT) = med2 THEN 1 ELSE 0 END) AS BIGINT) AS n_at,
  count(*) AS n_i,
  CAST(med2 AS DOUBLE) AS med2_x
FROM g CROSS JOIN med
GROUP BY g.g, med2
ORDER BY source
"""

R12_ORACLES["q_vocab_richness"] = f"""
WITH n AS (SELECT {_NORM} AS t FROM documents),
toks AS (SELECT unnest(str_split(t, ' ')) AS tok FROM n),
tf AS (SELECT tok, count(*) AS c FROM toks WHERE tok != '' GROUP BY tok),
o AS (
  SELECT count(*) AS s_obs,
    sum(CAST(c AS HUGEINT)) AS nn,
    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
    sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
  FROM tf
)
SELECT CAST(s_obs AS BIGINT) AS s_obs,
  CAST(nn AS DOUBLE) AS n_tokens,
  CAST(f1 AS BIGINT) AS f1,
  CAST(f2 AS BIGINT) AS f2,
  CAST(s_obs AS DOUBLE)
    + (CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0))
      / (2.0 * CAST(f2 + 1 AS DOUBLE)) AS chao1,
  CAST(f1 AS DOUBLE) / CAST(nn AS DOUBLE) AS gt_p0
FROM o
"""

def build_oracles(registry_oracles: dict[str, str]) -> dict[str, str]:
    """Complete ``R12_ORACLES`` against the registry's oracle dict (the
    capture-recapture oracle nests the minhash/simhash pair SQL) and
    return it.  Called once from queries.py after its ORACLES literal is
    fully built; idempotent."""
    R12_ORACLES["q_capture_recapture"] = _capture_recapture_oracle(
        registry_oracles["q_minhash_pairs"], registry_oracles["q_simhash_pairs"]
    )
    return R12_ORACLES


def q_hilbert_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard range audit of a Hilbert-curve layout over the
    (l_partkey, l_suppkey) plane — the q_zorder audit's locality-upgrade
    twin (operators/layout.py with_hilbert_key / hilbert_shard_stats):
    16 shards, per-shard count and min/max in BOTH dimensions, every
    number an exact integer (integer-div scaling + the bit-exact
    rotate-and-accumulate transform), so the oracle replays the key
    bit-for-bit with the identical unrolled steps."""
    from npm_mirror_spark.operators.layout import hilbert_shard_stats

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return hilbert_shard_stats(
        li, ["l_partkey", "l_suppkey"], bits=8, shard_bits=4
    ).orderBy("shard")


def _hilbert_oracle(bits: int = 8, shard_bits: int = 4) -> str:
    """Mechanically unroll the Hilbert xy->d steps as chained CTEs —
    the same one-projection-per-bit-level structure the Spark operator
    stages, so the two engines execute literally the same arithmetic."""
    steps = []
    prev = "s0"
    for i, level in enumerate(range(bits - 1, -1, -1), 1):
        s = 1 << level
        steps.append(f"""
s{i} AS (
  SELECT pk, sk,
    d + {s}::BIGINT * {s}::BIGINT * CAST(xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                    (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)) AS BIGINT) AS d,
    CASE WHEN (y & {s}) > 0 THEN x
         WHEN (x & {s}) > 0 THEN {s - 1}::BIGINT - y
         ELSE y END AS x,
    CASE WHEN (y & {s}) > 0 THEN y
         WHEN (x & {s}) > 0 THEN {s - 1}::BIGINT - x
         ELSE x END AS y
  FROM {prev}
)""")
        prev = f"s{i}"
    top = (1 << bits) - 1
    shift = 2 * bits - shard_bits
    return f"""
WITH src AS (
  SELECT l_partkey AS pk, l_suppkey AS sk FROM lineitem
),
b AS (
  SELECT min(pk) AS lox, max(pk) AS hix, min(sk) AS loy, max(sk) AS hiy
  FROM src
),
s0 AS (
  SELECT pk, sk,
    CASE WHEN hix - lox <= 0 THEN 0::BIGINT
         ELSE ((pk - lox) * {top}) // (hix - lox) END AS x,
    CASE WHEN hiy - loy <= 0 THEN 0::BIGINT
         ELSE ((sk - loy) * {top}) // (hiy - loy) END AS y,
    0::BIGINT AS d
  FROM src CROSS JOIN b
),{",".join(steps)}
SELECT CAST(d >> {shift} AS INTEGER) AS shard,
  count(*) AS n_rows,
  CAST(min(pk) AS BIGINT) AS min_l_partkey,
  CAST(max(pk) AS BIGINT) AS max_l_partkey,
  CAST(min(sk) AS BIGINT) AS min_l_suppkey,
  CAST(max(sk) AS BIGINT) AS max_l_suppkey
FROM {prev}
GROUP BY 1 ORDER BY shard
"""


R12_QUERIES["q_hilbert_audit"] = q_hilbert_audit
R12_ORACLES["q_hilbert_audit"] = _hilbert_oracle()
