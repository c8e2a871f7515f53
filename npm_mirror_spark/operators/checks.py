"""Data-quality constraint checking: declarative table contracts
evaluated in ONE pass (the Deequ/Great-Expectations pattern, Spark-first).

A 100 TB ingest needs its gate BEFORE downstream jobs consume bad data,
and the gate must not cost a scan per rule: every constraint here
compiles to an aggregate expression over the SAME single scan — Spark
computes all of them in one job with map-side partial aggregation
(uniqueness adds the one count_distinct shuffle Spark plans for it).
The reference validates per-record shape inline
(data_pipeline/npm-mirror/app/changes_consumer.py checks doc fields as
it consumes); table-level contracts are extension surface for the
analytics store.

Exactness contract: every metric is a ratio of exact counts (or an
exact min/max), so the DuckDB oracle reproduces each value and verdict
bit-for-bit — no sampling, no sketches.

Constraint kinds (each a (name, kind, column, threshold) row in the
report, metric semantics in [0, 1] unless noted):

- ``completeness``   fraction of rows with col NOT NULL  >= threshold
- ``uniqueness``     distinct(col) / count(col non-null) >= threshold
- ``in_set``         fraction of NON-NULL values in the allowed set
                     >= threshold (vacuously 1.0 on all-null)
- ``matches``        fraction of NON-NULL values matching a Java/RE2
                     common-subset regex >= threshold
- ``min_value``      min(col) >= threshold (metric = the min itself)
- ``max_value``      max(col) <= threshold (metric = the max itself)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _metric(kind: str, column: str, arg) -> F.Column:
    c = F.col(column)
    n = F.count(F.lit(1)).cast("double")
    nn = F.count(c).cast("double")  # count() skips NULLs
    if kind == "completeness":
        # vacuously complete on an empty table (0/0 would be NaN)
        return F.when(F.count(F.lit(1)) > 0, nn / n).otherwise(F.lit(1.0))
    if kind == "uniqueness":
        return F.when(
            F.count(c) > 0, F.count_distinct(c).cast("double") / nn
        ).otherwise(F.lit(1.0))
    if kind == "in_set":
        hits = F.sum(c.isin(list(arg)).cast("long")).cast("double")
        return F.when(F.count(c) > 0, hits / nn).otherwise(F.lit(1.0))
    if kind == "matches":
        hits = F.sum(
            c.cast("string").rlike(arg).cast("long")
        ).cast("double")
        return F.when(F.count(c) > 0, hits / nn).otherwise(F.lit(1.0))
    if kind == "min_value":
        return F.min(c).cast("double")
    if kind == "max_value":
        return F.max(c).cast("double")
    raise ValueError(f"unknown constraint kind: {kind}")


def constraint_report(
    df: DataFrame,
    constraints: list[tuple],
) -> DataFrame:
    """Evaluate ``constraints`` — tuples of
    ``(name, kind, column, threshold)`` or
    ``(name, kind, column, threshold, arg)`` where ``arg`` is the
    allowed-value set (``in_set``) or the regex (``matches``) — and
    return one row per constraint:
    (name, kind, column, metric, threshold, ok).

    One aggregation job over one scan: each metric is an aggregate
    expression; the single result row explodes back into per-constraint
    rows via ``inline`` (a driver-free pivot — the report stays a
    DataFrame a gate can join or a sink can persist).
    """
    if not constraints:
        raise ValueError("need at least one constraint")
    metric_cols = []
    for i, spec in enumerate(constraints):
        name, kind, column, threshold = spec[:4]
        arg = spec[4] if len(spec) > 4 else None
        metric_cols.append(_metric(kind, column, arg).alias(f"__m_{i}"))
    agg = df.agg(*metric_cols)
    structs = []
    for i, spec in enumerate(constraints):
        name, kind, column, threshold = spec[:4]
        m = F.col(f"__m_{i}")
        ok = (
            m <= F.lit(float(threshold))
            if kind == "max_value"
            else m >= F.lit(float(threshold))
        )
        structs.append(
            F.struct(
                F.lit(name).alias("name"),
                F.lit(kind).alias("kind"),
                F.lit(column).alias("column"),
                m.alias("metric"),
                F.lit(float(threshold)).alias("threshold"),
                ok.alias("ok"),
            )
        )
    return agg.select(F.inline(F.array(*structs)))
