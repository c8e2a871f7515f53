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
Neither face plans a BNLJ (both are one day-axis collapse + bounded
windows + a 1-row fold) — no ALLOWED_BNLJ entries needed at
registration.
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
