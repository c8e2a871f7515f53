"""Watermarked stream-stream interval join.

The reference pipeline correlates two live feeds (the `_changes` event and
the artifact-fetch completion it triggers — changes_consumer.py:332-370
does it imperatively with one blocking HTTP GET per message). The
Spark-first restatement is a Structured Streaming stream-stream join:
both sides watermarked, the join condition carrying an explicit event-time
interval so the state store can evict rows once the watermark passes
``upper``.

Scale story (the part the imperative form cannot do): state per executor
is bounded by (watermark + interval) x per-key arrival rate, regardless of
total stream length; the join itself is a hash join co-partitioned on the
key, so 1000 executors each hold only their key range's window of state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner-join ``right`` rows onto ``left`` rows with the same ``key``
    where ``right_ts`` falls in [left_ts, left_ts + max_delay].

    Works identically on batch DataFrames (watermarks are a no-op there),
    which is how the test cross-validates the streaming result. Column
    names other than ``key`` must be disjoint between the two sides.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(key, "__rkey")
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").drop("__rkey")
