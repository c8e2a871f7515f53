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


HH_SCHEMA = "bucket int, item string, est_count long, max_err long"
_HH_STATE = "items array<string>, counts array<long>, errs array<long>"


def streaming_heavy_hitters(
    df: DataFrame,
    item_col: str,
    capacity: int = 64,
    buckets: int = 1,
) -> DataFrame:
    """Space-saving top-k maintained in the state store: which items
    dominate the stream RIGHT NOW — the feed-skew monitor an ingest
    pipeline runs next to the batch `q_heavy_hitters` (which gives the
    exact retrospective answer).

    Space-saving invariants (Metwally et al.): with summary capacity m,
    any item whose true count exceeds N/m is guaranteed present, and
    ``est_count - max_err <= true_count <= est_count``. State is
    O(buckets x capacity) triples — independent of stream length.
    ``buckets`` shards the stream by item hash for parallelism (each
    item maps to exactly one bucket, so per-bucket summaries are
    mergeable by concatenation; one bucket = one global summary).

    Per micro-batch the Arrow kernel pre-aggregates batch counts
    (value_counts) before touching the summary, so update cost is
    O(distinct-items-in-batch), not rows.
    """
    keyed = df.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(buckets))
        .cast("int")
        .alias("bucket"),
        F.col(item_col).cast("string").alias("__item"),
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            items, counts, errs = state.get
            summary = {
                i: [c, e] for i, c, e in zip(items, counts, errs)
            }
        else:
            summary = {}
        frames = [p for p in pdfs if len(p)]
        if frames:
            batch_counts = pd.concat(frames)["__item"].value_counts()
            # deterministic merge order: by descending batch count then item
            for item, c in sorted(
                batch_counts.items(), key=lambda kv: (-kv[1], kv[0])
            ):
                c = int(c)
                if item in summary:
                    summary[item][0] += c
                elif len(summary) < capacity:
                    summary[item] = [c, 0]
                else:
                    evict, (m0, _) = min(
                        summary.items(), key=lambda kv: (kv[1][0], kv[0])
                    )
                    del summary[evict]
                    # inherit the evicted min count as overestimation error
                    summary[item] = [c + m0, m0]
        items = sorted(summary, key=lambda i: (-summary[i][0], i))
        state.update(
            (
                items,
                [summary[i][0] for i in items],
                [summary[i][1] for i in items],
            )
        )
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(items),
                "item": items,
                "est_count": [summary[i][0] for i in items],
                "max_err": [summary[i][1] for i in items],
            }
        )

    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=HH_SCHEMA,
        stateStructType=_HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_SESSION_STATE = "start_us long, end_us long, n long"


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming sessionization: per-user sessions merge ACROSS
    micro-batches in the state store, and a session is emitted exactly
    once — when a later event proves the idle gap exceeded
    ``gap_seconds``. The batch q_sessionize (lag+cumsum) is the exact
    retrospective twin; this is the monitoring face.

    The per-batch kernel is an INTERVAL MERGE, not an append-only fold:
    the carried open session and every in-batch event are sorted by start
    time and coalesced under the gap rule, so an out-of-order event that
    precedes the stored session start correctly LOWERS ``session_start``
    (or, if it is more than the gap before the start, forms its own —
    provably closed — earlier session). All merged sessions except the
    last are emitted closed; the last stays open in state.

    Ordering contract (matches the batch twin, pinned by
    tests/test_stateful.py): arbitrary disorder WITHIN and ACROSS batches
    is handled as long as every event of a session arrives before any
    event that closes it (i.e. before an event > ``gap_seconds`` later
    has been seen in a later batch). Events later than that are genuinely
    late data; pass ``watermark_delay`` (e.g. ``"30 minutes"``) to set an
    event-time watermark so Spark drops them deterministically instead of
    them resurfacing as spurious singleton sessions.

    State per user is one (start_us, end_us, n) triple — O(users), no
    event buffering. Still-open sessions stay in state at stream end (a
    real deployment closes them with a timer/timeout; availableNow test
    drains leave them pending by design).

    Implementation note: written on ``applyInPandasWithState``. Spark 4's
    successor API (``transformWithStateInPandas``) is the drop-in upgrade
    — same grouped-Arrow kernel, typed ValueState instead of the tuple —
    but its driver worker needs the ``protobuf`` package, which this
    container does not ship.
    """
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        frames = [p for p in pdfs if len(p)]
        sessions = [list(state.get)] if state.exists else []
        if frames:
            ev = pd.concat(frames)
            items = sessions + [[int(t), int(t), 1] for t in ev["__us"].dropna()]
            items.sort(key=lambda s: (s[0], s[1]))
            merged: list[list[int]] = []
            for it in items:
                if merged and it[0] - merged[-1][1] <= gap_us:
                    merged[-1][1] = max(merged[-1][1], it[1])
                    merged[-1][2] += it[2]
                else:
                    merged.append(it)
            sessions = merged
        closed = sessions[:-1]
        if sessions:
            state.update(tuple(sessions[-1]))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )

    keyed = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("__ts"),
    )
    if watermark_delay is not None:
        keyed = keyed.withWatermark("__ts", watermark_delay)
    keyed = keyed.withColumn("__us", F.unix_micros(F.col("__ts")))
    return keyed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
