"""Staged registry faces for the r13 driver-window tail.

The r12 window froze with all 23 tail slots taken (the 12 lifted
faces_r12.py registrations + 11 staleness re-checks), and the hard rule
since r11 is that new faces land ONLY in free tail slots of the round
that registers them (docs/DRIVER_WINDOW.md) — so r12's new operators
ship here: fully face-shaped (each callable takes (spark, sf_dir) and
returns a DataFrame) with their DuckDB oracles, driven by the SAME
harness comparison as the registry (tests/test_r12_ops.py), but NOT in
``queries.QUERIES``.  The r13 rotation lifts these dicts into the
registry exactly the way the r12 rotation lifted faces_r12.py.

Every face follows the registry contracts: driver-hashable output
types only (no decimal/array/map), aliased columns matching the oracle
exactly, bounded plans (no unguarded cross products), and the
exact-integer / fixed-IEEE-expression determinism the stats tier pins
(floats only as ONE fixed IEEE op sequence on exact-int-valued inputs;
cross-row float sums are refused and left to consumers).

Plan-lint note for the r13 rotation: faces that plan a
BroadcastNestedLoopJoin are pre-documented here with the
`tests/test_plans.py::ALLOWED_BNLJ` entries they need when registered
(all verified bounded; the shapes are the allowlisted 1-row-fold and
bounded-grid classes):

    "q_page_trend": "1-row (k, n) completeness frame broadcast per
        treatment (the q_friedman shape)",
    "q_pettitt": "deliberate broadcast non-equi pair join on the
        CALENDAR-DAY axis (bounded by construction — the q_mann_kendall
        contract) + 1-row n_days fold",
    "q_ansari_bradley": "1-row global (N, doubled-score-total) frame
        broadcast onto the per-group fold",
    "q_hoeffding_d": "zero-filled bounded (x-domain x y-domain) grid
        prefix build (the q_gk_gamma ordinal-domain contract) + 1-row
        n fold",
    "q_digit_pref": "single-row corpus-count broadcast onto the 10-digit
        axis (the q_benford shape)",
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
  WHERE o.o_orderpriority IS NOT NULL
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


STAGED_QUERIES = {
    "q_logrank": q_logrank,
    "q_mantel_haenszel": q_mantel_haenszel,
}

STAGED_ORACLES = {
    "q_logrank": _LOGRANK_SQL,
    "q_mantel_haenszel": _MH_SQL,
}
