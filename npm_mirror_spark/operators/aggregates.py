"""Aggregations / grouping / windows (SURVEY.md §2.4, A1-A8).

Scale notes:
- ``argmax_latest`` / ``retention_topn`` shuffle once on the group key, then
  sort within partitions — the canonical top-N-per-group plan. At 100 TB the
  win is that ONLY the group key shuffles the fat rows once; no driver-side
  loops (the reference iterates directories one by one,
  organize-NAS.py:74-78).
- Window + ``row_number`` is preferred over ``max_by`` where a deterministic
  tiebreak matters (oracle hashing): ties broken by explicit secondary keys.
- Singleton aggregates (max_seq, lag's global max) reduce map-side to one
  row per partition before the final single-partition exchange — cheap at
  any scale; the scalar is then broadcast-joined, never collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def argmax_latest(
    df: DataFrame, group: list[str], order: list[Column], keep_rank_col: bool = False
) -> DataFrame:
    """A1: per group, the row with the max ordering key — the reference's
    'latest JSON file per package dir' (organize-NAS.py:20-28,40).

    ``order`` columns must form a deterministic total order within a group.
    """
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out if keep_rank_col else out.drop("__rn")


def retention_topn(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    n: int = 5,
    rank_col: str | None = None,
) -> DataFrame:
    """A2 (keep side): newest-N-per-group — the reference's
    OLD_PACKAGE_VERSIONS_LIMIT=5 zip retention (changes_consumer.py:25,
    220-243), declaratively: rank desc by recency, keep rank <= n.
    """
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def retention_gc(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    n: int = 5,
) -> DataFrame:
    """A2 (delete side): the rows the retention rule evicts (rank > n) —
    these feed the deletion-log sink (K4, changes_consumer.py:209-216).
    """
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") > n).drop("__rn")


def retention_gc_tombstone_guard(
    df: DataFrame,
    group: list[str],
    asc_order: list[Column],
    tombstone: Column,
    n: int = 5,
) -> DataFrame:
    """A2 with the reference's exact nuance (changes_consumer.py:230-243):
    deleting the oldest artifacts, SKIP any whose immediate successor (next
    newer file) is a Deleted- tombstone — the tombstone marks the end of a
    package generation and the predecessor is kept as its last good state.

    Declaratively: rank ascending by age, candidates are ranks <= count-n,
    minus rows whose ``lead()`` is a tombstone. One shuffle + one sorted
    window pass, same cost as plain retention.
    """
    w = Window.partitionBy(*group).orderBy(*asc_order)
    wall = Window.partitionBy(*group)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(wall))
        .withColumn("__next_tomb", F.lead(tombstone).over(w))
        .filter(
            (F.col("__rn") <= F.col("__cnt") - n)
            & ~F.coalesce(F.col("__next_tomb"), F.lit(False))
        )
        .drop("__rn", "__cnt", "__next_tomb")
    )


def count_by(df: DataFrame, *group: str, alias: str = "n") -> DataFrame:
    """A3/A8: event counters as groupBy counts (map-side partial agg —
    Spark's HashAggregate does the combine before the shuffle)."""
    return df.groupBy(*group).agg(F.count(F.lit(1)).alias(alias))


def max_seq(df: DataFrame, seq_col: str, floor: int | None = None, alias: str = "start_seq") -> DataFrame:
    """A4/J3: running-max seq + the producer's start-seq reconciliation
    (max over kafka last msg / file store / config, producer.ts:61-97) —
    ``greatest()`` over a singleton aggregate.
    """
    agg = F.max(F.col(seq_col))
    if floor is not None:
        agg = F.greatest(agg, F.lit(floor))
    return df.agg(agg.alias(alias))


def lag_per_group(
    df: DataFrame, group: str, seq_col: str, alias: str = "lag"
) -> DataFrame:
    """A5: newest_seq - last_seq (producer.ts:206-243) generalized per
    group: global max minus per-group max. The singleton global aggregate is
    broadcast into the per-group result — no second shuffle of the big side.
    """
    per_group = df.groupBy(group).agg(F.max(seq_col).alias("__grp_max"))
    global_max = df.agg(F.max(seq_col).alias("__glob_max"))
    return (
        per_group.join(F.broadcast(global_max))
        .select(
            F.col(group),
            (F.col("__glob_max") - F.col("__grp_max")).alias(alias),
        )
    )


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_minutes: int | None = None,
) -> DataFrame:
    """Sequential-pattern (funnel) analysis: per user, how far through the
    ordered ``steps`` sequence they progressed, where each step must occur
    STRICTLY after the previous step's matched event (and, when
    ``within_minutes`` is set, no later than that deadline after it —
    the conversion-window form every funnel report actually uses).

    Spark-first single-shuffle form: one groupBy(user) collects the
    (ts, type) pairs, ``array_sort`` orders them, and an ``aggregate``
    lambda runs the state machine — no per-step self-joins, no O(steps)
    repeated shuffles of the event table. Strict ts guards make the
    result independent of how same-timestamp events tie-break in the
    sort, so a min()-per-step SQL restatement is value-identical (the
    oracle relies on this).

    Returns (user_col, stage): stage in [0, len(steps)].
    """
    evs = df.where(F.col(type_col).isin(list(steps)))
    per_user = evs.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
            )
        ).alias("__evs")
    )
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("ts")
    )

    def advance(acc, e):
        out = acc
        for i, s in enumerate(steps):
            cond = (acc["stage"] == i) & (e["et"] == s)
            if i > 0:
                cond = cond & (e["ts"] > acc["ts"])
                if within_minutes is not None:
                    cond = cond & (
                        e["ts"]
                        <= acc["ts"] + F.expr(f"INTERVAL {within_minutes} MINUTES")
                    )
            out = F.when(
                cond,
                F.struct(F.lit(i + 1).alias("stage"), e["ts"].alias("ts")),
            ).otherwise(out)
        return out

    return per_user.select(
        F.col(user_col),
        F.aggregate("__evs", init, advance)["stage"].alias("stage"),
    )
