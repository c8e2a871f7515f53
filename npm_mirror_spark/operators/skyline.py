"""Skyline (Pareto-frontier) operator — classic multi-criteria OLAP.

``skyline2d`` returns the rows not DOMINATED on two criteria: row q
dominates row p when q is no worse on both (``minimize`` ≤, ``maximize``
≥) and strictly better on at least one.  The textbook sort-based
reduction makes this a one-pass prefix problem: with

- ``M<(x)``  = max of ``maximize`` over rows with ``minimize`` < x, and
- ``M=(x)``  = max of ``maximize`` over rows with ``minimize`` = x,

p is dominated  ⇔  ``M<(p.min) >= p.max``  ∨  ``M=(p.min) > p.max``.
(The first clause covers dominators strictly better on the minimize
axis; the second covers equal-minimize dominators strictly better on
the maximize axis.  Equal-on-both rows never dominate each other, so
duplicates co-survive — the standard skyline definition.)

``M=`` is one groupBy; ``M<`` is a strictly-prior running max over the
distinct ``minimize`` axis, computed with :func:`_with_prior_max` — the
max twin of ``classifier._with_prior_sums``'s order-preserving
two-level bucket prefix, so no window ever orders the full distinct
axis on one reducer (distinct prices ≈ N at 100 TB).  Everything else
is one equi-join back on the ``minimize`` value.

The reference has no skyline operator; this extends the analytics
surface (Börzsönyi/Kossmann/Stocker, "The Skyline Operator", ICDE'01 —
the SQL NOT EXISTS form from that paper is the independent pytest
cross-check in tests/test_skyline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_prior_max(
    grouped: DataFrame,
    order_col: str,
    val_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Adds ``__prior_max``: max of ``val_col`` over all rows with a
    strictly smaller ``order_col`` (NULL when none) — the running-MAX
    twin of :func:`classifier._with_prior_sums`, same two-level shape:
    order-preserving value-range buckets from a broadcast 1-row
    (min, max) frame, a bounded ≤``n_buckets``-row offset window, and a
    per-bucket window PARTITIONED BY ``__bkt``.  ``grouped`` must be
    distinct on ``order_col`` (callers collapse first), which makes
    "strictly prior" a plain ``rowsBetween(unboundedPreceding, -1)``.
    """
    from pyspark.sql import Window

    from npm_mirror_spark.operators.classifier import _range_stats

    s = F.col(order_col)
    stats = grouped.agg(*_range_stats(s))
    span = F.col("__mx") - F.col("__mn")
    s_d = s.cast("double")
    bkt = (
        F.when(s.isNull(), F.lit(-1))
        .when(F.isnan(s_d), F.lit(n_buckets - 1))
        .when(s_d == F.lit(float("inf")), F.lit(n_buckets - 1))
        .when(s_d == F.lit(float("-inf")), F.lit(0))
        .when(span.isNull() | (span <= 0), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((s_d - F.col("__mn")) / span * n_buckets).cast(
                    "int"
                ),
            )
        )
    )
    g = (
        grouped.crossJoin(F.broadcast(stats))
        .withColumn("__bkt", bkt)
        .drop("__mn", "__mx")
    )
    per_bucket = g.groupBy("__bkt").agg(F.max(val_col).alias("__bt"))
    wb = Window.orderBy(F.col("__bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "__bkt", F.max("__bt").over(wb).alias("__off")
    )
    ww = (
        Window.partitionBy("__bkt")
        .orderBy(s.asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = g.join(F.broadcast(offsets), "__bkt").withColumn(
        "__prior_max", F.greatest(F.col("__off"), F.max(val_col).over(ww))
    )
    return out.drop("__bkt", "__off")


def skyline2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Rows on the 2-D Pareto frontier (minimize one column, maximize
    the other).  Cost: one distinct-value collapse on ``minimize``, the
    bounded two-level prefix max, one equi-join back — no self-join, no
    quadratic candidate set."""
    per_min = df.groupBy(minimize).agg(F.max(maximize).alias("__meq"))
    pri = _with_prior_max(per_min, minimize, "__meq").select(
        minimize, "__meq", "__prior_max"
    )
    j = df.join(pri, minimize)
    dominated = (
        F.coalesce(F.col("__prior_max") >= F.col(maximize), F.lit(False))
    ) | (F.col("__meq") > F.col(maximize))
    return j.filter(~dominated).drop("__meq", "__prior_max")
