"""Temporal joins Spark has no native operator for: as-of and range.

Two implementations each, per the standard playbook:

- **Composition form** (default): equi-join on the key with the temporal
  predicate, then argmax-per-left-row. Correct everywhere; the fan-out is
  bounded by rows-per-key. The 100 TB refinement is a per-(key,
  time-bucket) latest-right rollup joined on the bucket (turns O(history)
  candidates per left row into O(1)) — same results, extra equi keys.
- **Arrow kernel form**: cogrouped ``applyInPandas`` running
  ``pd.merge_asof`` per key — for when groups fit in memory and the
  composition's candidate fan-out dominates.

The DuckDB oracle uses the explicit window formulation (not DuckDB's
native ASOF JOIN) so tie-breaking is pinned identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, the latest right row with
    ``right_ts <= left_ts`` on the same key (left join: no match -> NULLs).

    ``right_cols``: right columns carried to the output (``right_ts``
    itself may be included). ``tiebreak``: right columns ordering equal
    timestamps — pass a unique key for deterministic (oracle-checkable)
    output.
    """
    l = left.withColumn("__lid", F.monotonically_increasing_id())
    r = right.select(on, *dict.fromkeys([right_ts, *right_cols]))
    joined = l.join(r, (l[on] == r[on]) & (r[right_ts] <= l[left_ts]), "left")
    order = [F.desc_nulls_last(right_ts)] + [
        F.desc_nulls_last(c) for c in (tiebreak or [])
    ]
    w = Window.partitionBy("__lid").orderBy(*order)
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__lid")
        .drop(r[on])
    )
    if right_ts not in right_cols:
        out = out.drop(r[right_ts])
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """merge_asof form: cogroup per key, sort, pd.merge_asof (backward).
    Same semantics as ``asof_join`` up to tie handling (merge_asof keeps
    the last right row in sort order at equal timestamps); per-key data
    must fit one worker. ``right_cols`` must not contain ``right_ts``."""
    lfields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    rmap = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_schema = ", ".join(lfields + [f"{c} {rmap[c]}" for c in right_cols])
    rsel = right.select(on, right_ts, *right_cols)
    lcols = [f.name for f in left.schema.fields]

    def kernel(l_pdf, r_pdf):
        import pandas as _pd

        l_sorted = l_pdf.sort_values(left_ts)
        if len(r_pdf) == 0:
            for c in right_cols:
                l_sorted[c] = None
            return l_sorted[lcols + right_cols]
        r_sorted = r_pdf.sort_values(right_ts)[[right_ts, *right_cols]]
        merged = _pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            suffixes=("", "__r"),
        )
        return merged[lcols + right_cols]

    return left.groupBy(on).cogroup(rsel.groupBy(on)).applyInPandas(kernel, out_schema)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """Exact as-of join with BOUNDED fan-out — the 100 TB form.

    The plain composition joins every left row to its key's whole right
    history. Here each left row meets only (a) rights in its own time
    bucket and (b) ONE pre-aggregated 'latest right before this bucket'
    row, so the fan-out is O(bucket density), independent of history
    length. The prev-latest is computed by threading marker rows for the
    left buckets through a running ``max(struct)`` window per key —
    markers sort before same-bucket rights, so each marker sees exactly
    the strictly-earlier history. Results are identical to ``asof_join``
    (asserted in tests); only the join topology changes.
    """
    from pyspark.sql.types import StructField, StructType

    B = int(bucket_seconds) * 1_000_000
    pay_cols = list(dict.fromkeys([right_ts, *tiebreak, *right_cols]))
    r = right.select(on, *pay_cols)
    pay_schema = StructType(
        [StructField(c, r.schema[c].dataType) for c in pay_cols]
    )
    pay = F.struct(*pay_cols)  # ordered: ts, tiebreaks, payload -> max = argmax

    l = (
        left.withColumn("__lid", F.monotonically_increasing_id())
        .withColumn("__lb", F.floor(F.unix_micros(F.col(left_ts).cast("timestamp")) / B))
    )
    rr = r.withColumn(
        "__rb", F.floor(F.unix_micros(F.col(right_ts).cast("timestamp")) / B)
    ).select(
        F.col(on).alias("__rk"), F.col("__rb"), pay.alias("__pay")
    )

    # (a) same-bucket candidates, fan-out bounded by bucket occupancy
    same = (
        l.join(
            rr,
            (l[on] == rr["__rk"]) & (l["__lb"] == rr["__rb"]),
            "left",
        )
        .withColumn(
            "__cand",
            F.when(F.col("__pay")[right_ts] <= F.col(left_ts), F.col("__pay")),
        )
        .select("__lid", "__cand")
    )

    # (b) latest right strictly before each needed bucket: markers (flag 0)
    # sort before same-bucket rights (flag 1) in the running-max window
    markers = (
        l.select(F.col(on).alias("__rk"), F.col("__lb").alias("__rb"))
        .distinct()
        .withColumn("__flag", F.lit(0))
        .withColumn("__pay", F.lit(None).cast(pay_schema))
    )
    rights_flagged = rr.withColumn("__flag", F.lit(1))
    w = (
        Window.partitionBy("__rk")
        .orderBy("__rb", "__flag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = (
        markers.unionByName(rights_flagged)
        .withColumn("__run", F.max("__pay").over(w))
        .filter(F.col("__flag") == 0)
        .select("__rk", "__rb", F.col("__run").alias("__cand"))
    )
    via_prev = l.join(
        prev, (l[on] == prev["__rk"]) & (l["__lb"] == prev["__rb"]), "left"
    ).select("__lid", "__cand")

    best = (
        same.unionByName(via_prev)
        .groupBy("__lid")
        .agg(F.max("__cand").alias("__best"))
    )
    out = l.join(best, "__lid", "left")
    for c in pay_cols:
        if c in right_cols:
            out = out.withColumn(c, F.col("__best")[c])
    return out.drop("__lid", "__lb", "__best")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
) -> DataFrame:
    """All (left, right) pairs on the same key with
    ``left_ts + lower <= right_ts <= left_ts + upper`` — the interval
    join. Declared as equi-join + range predicates: the pairs are
    co-partitioned by the key and the range evaluates as a post-join
    filter. At scale, bucketize the time axis into extra equi keys to
    bound the per-key fan-out."""
    cond = (
        (left[on] == right[on])
        & (right[right_ts] >= left[left_ts] + lower)
        & (right[right_ts] <= left[left_ts] + upper)
    )
    return left.join(right, cond, "inner").drop(right[on])
