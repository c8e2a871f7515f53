"""Custom stateful streaming operators.

The reference keeps two pieces of cross-event state outside the data path:
the running last-seq (persisted per message, producer.ts:143,151;
changes_producer.py:73) and the watchdog that flags a stalled or lagging
feed (producer.ts:206-243: restart when last_seq is unchanged for 10
checks, or lag grows past init_lag+200).

Here both become ONE stateful operator over the stream itself:
``applyInPandasWithState`` keyed on a partition key, holding (max_seq,
quiet_batches) in state. Emits one row per key per micro-batch with the
running max and a stalled flag — the declarative form of the watchdog,
checkpointed and replayable like any other state (no side files).

Scale: state is O(keys); each micro-batch's update is a grouped Arrow
batch. For a single global watchdog use a constant key — one state row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WATCHDOG_SCHEMA = "key string, max_seq long, new_changes long, quiet_batches int, stalled boolean"
_STATE_SCHEMA = "max_seq long, quiet_batches int"


def seq_watchdog(
    changes: DataFrame,
    seq_col: str = "seq",
    key_col: str | None = None,
    stall_batches: int = 10,
) -> DataFrame:
    """Running-max-seq + stall detection per key (constant key if None).

    producer.ts watchdog parity: 'stalled' fires after ``stall_batches``
    consecutive batches with no new seq (reference: 10 checks x 20s).
    """
    keyed = changes.withColumn(
        "__wkey", F.lit("global") if key_col is None else F.col(key_col).cast("string")
    ).select("__wkey", F.col(seq_col).alias("__seq"))

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev_max, quiet = state.get if state.exists else (None, 0)
        batch_max, n = None, 0
        for pdf in pdfs:
            s = pdf["__seq"].dropna()
            n += len(s)
            if len(s):
                m = int(s.max())
                batch_max = m if batch_max is None else max(batch_max, m)
        if batch_max is not None and (prev_max is None or batch_max > prev_max):
            new_max, quiet = batch_max if prev_max is None else max(prev_max, batch_max), 0
        else:
            new_max, quiet = prev_max, quiet + 1
        state.update((new_max, quiet))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "max_seq": [new_max],
                "new_changes": [n],
                "quiet_batches": [quiet],
                "stalled": [quiet >= stall_batches],
            }
        )

    return keyed.groupBy("__wkey").applyInPandasWithState(
        update,
        outputStructType=WATCHDOG_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_SCHEMA = "user_id long, stage int"
_FUNNEL_STATE = "stage int, last_ts long"


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The streaming face of ``aggregates.funnel_stages``: per-user funnel
    stage maintained INCREMENTALLY across micro-batches in the state
    store — (stage, ts-of-last-match) per user, O(users) state, emitted
    as an update row per user per batch.

    Within a batch events are sorted by event time and run through the
    same strict-after state machine as the batch operator, so replaying
    the whole feed through this operator equals the batch answer (pinned
    by tests/test_stateful.py). Cross-batch LATE events (arriving after a
    later step already matched) cannot retro-advance — the documented
    trade of incremental monitoring; run the batch form for the exact
    retrospective number.
    """
    keyed = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__et"),
    )
    step_list = list(steps)

    def update(key, pdfs, state: GroupState):
        stage, last_us = state.get if state.exists else (0, None)
        frames = [p for p in pdfs if len(p)]
        if frames:
            ev = pd.concat(frames)
            ev = ev.assign(__us=ev["__ts"].astype("int64")).sort_values("__us")
            for us, et in zip(ev["__us"], ev["__et"]):
                if stage < len(step_list) and et == step_list[stage] and (
                    stage == 0 or (last_us is not None and us > last_us)
                ):
                    stage, last_us = stage + 1, int(us)
        state.update((stage, last_us if last_us is not None else 0))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return keyed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
