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
