"""Skew mitigation: salted two-stage aggregation and salted joins.

At 100 TB some keys are always pathological (the reference's analog: a
handful of npm packages receive most changes; in LLM corpora, boilerplate
documents dominate buckets). AQE's skew-join splitting handles joins; for
aggregations with heavy keys, salting pre-splits each hot key into
``salt_buckets`` sub-keys so the first shuffle spreads load, and a second
(tiny) aggregation merges the partials. Results are identical to the
unsalted plan — only the exchange topology changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    merge_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``aggs`` run per (key, salt); ``merge_aggs`` combine the partials
    (e.g. count -> sum of counts, sum -> sum of sums, max -> max of maxes).
    The salt is deterministic per row content? No — uniform random spread
    is the point; determinism of the FINAL result is guaranteed because
    merge(aggs) is salt-invariant for the supported algebraic aggregates.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_count_by(
    df: DataFrame, key: str, alias: str = "n", salt_buckets: int = 16
) -> DataFrame:
    """Skew-safe count per key: identical answer to groupBy(key).count(),
    but the wide shuffle is keyed on (key, salt) — a single hot key spreads
    over ``salt_buckets`` reducers instead of melting one."""
    return salted_agg(
        df,
        [key],
        aggs=[F.count(F.lit(1)).alias("__partial")],
        merge_aggs=[F.sum("__partial").alias(alias)],
        salt_buckets=salt_buckets,
    )


def skew_report(df: DataFrame, key: str, top_k: int = 5) -> DataFrame:
    """Key-distribution diagnosis for a planned groupBy/join on ``key``
    — the measurement that decides whether :func:`salted_agg` /
    AQE skew handling is needed BEFORE a 100 TB shuffle melts a reducer.

    Returns the ``top_k`` heaviest keys, each row carrying the global
    stats: (key, cnt, n_rows, n_keys, max_count, skew_ratio,
    suggested_salt) where skew_ratio = max_count / mean_count (1.0 =
    perfectly uniform) and suggested_salt = ceil(skew_ratio) — the salt
    bucket count that flattens the hottest key to roughly the mean.

    Cost shape: ONE (key) count shuffle (map-side partials), then
    everything runs on the bounded key-count table — a 1-row stats fold
    and a driver-bounded global top-k (TakeOrdered, never a full sort).
    Exact counts and a fixed-shape double ratio, so the oracle replays
    every value.
    """
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_count"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_k)
    ratio = (
        F.col("max_count").cast("double")
        * F.col("n_keys").cast("double")
        / F.col("n_rows").cast("double")
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        F.col("cnt").cast("long").alias("cnt"),
        "n_rows",
        "n_keys",
        "max_count",
        ratio.alias("skew_ratio"),
        F.ceil(ratio).cast("int").alias("suggested_salt"),
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed equi-join without AQE: explode the small side per salt value,
    salt the big side, join on (key, salt). Same rows out as a plain join;
    the exchange spreads each hot key across ``salt_buckets`` partitions.
    (With AQE's skew-join on, prefer the plain join; this is the explicit
    form for engines/queries where AQE can't see the skew.)"""
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    small_exp = small.withColumn("__salt", F.explode(salts))
    big_salted = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    return big_salted.join(small_exp, [on, "__salt"]).drop("__salt")
