"""Event-time windowed aggregation under a watermark (SURVEY.md §2.7:
the reference processes everything regardless of event time; we add the
late-data story Spark gives for free)."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql import functions as F


def _write_batchfile(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_counts_with_watermark_drop_late(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minutes):
        return {"event_id": i, "ts": (t0 + timedelta(minutes=minutes)).isoformat(), "event_type": "click"}

    # batch 1: events up to minute 25 -> watermark (after propagation) 15
    _write_batchfile(feed / "b1.jsonl", [ev(1, 1), ev(2, 5), ev(3, 12), ev(4, 25)])
    # batch 2: spacer — watermark updates take effect one micro-batch after
    # the data that establishes them (MicroBatchExecution updates the value
    # from the previous batch's stats)
    _write_batchfile(feed / "b2.jsonl", [ev(6, 26)])
    # batch 3: a LATE event for window [0,10) (ts=2 << watermark 16) must be
    # dropped; an in-time event for [30,40) must be counted
    _write_batchfile(feed / "b3.jsonl", [ev(5, 2), ev(7, 35)])
    # the file source orders batches by modification time — make it explicit
    import os
    import time

    now = time.time()
    for i, name in enumerate(["b1.jsonl", "b2.jsonl", "b3.jsonl"]):
        os.utime(feed / name, (now - 120 + 60 * i, now - 120 + 60 * i))

    schema = "event_id long, ts string, event_type string"
    parsed = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(str(feed))
        .select(F.from_json("value", schema).alias("c"))
        .select(F.col("c.event_id"), F.to_timestamp("c.ts").alias("ts"), "c.event_type")
    )
    windowed = (
        parsed.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = []
    q = (
        windowed.writeStream.foreachBatch(
            lambda df, bid: out.extend(
                (r["w"]["start"].isoformat(), r["n"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    counts = {}
    for start, n in out:
        counts[start] = n  # update mode: last write per window wins
    # late event 5 must NOT have bumped window 00:00 beyond its batch-1 count
    assert counts["2024-01-01T00:00:00"] == 2, counts
    assert counts["2024-01-01T00:10:00"] == 1, counts
    assert counts["2024-01-01T00:20:00"] == 2, counts
    assert counts["2024-01-01T00:30:00"] == 1, counts


def test_drop_duplicates_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark = the BOUNDED-state streaming dedup:
    duplicates inside the watermark window collapse, but state for a key
    is dropped once the watermark passes it — a later re-arrival is
    emitted again. (Plain dropDuplicates would hold every key forever;
    this is the knob that makes stream dedup survive an unbounded feed,
    complementing the pipeline's seq-bounded sink anti-join.)"""
    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minutes):
        return {
            "event_id": i,
            "ts": (t0 + timedelta(minutes=minutes)).isoformat(),
        }

    # batch 1: id 1 twice within the window -> one survivor
    _write_batchfile(feed / "b1.jsonl", [ev(1, 0), ev(1, 1), ev(2, 2)])
    # batch 2: advance the watermark far past id 1's state lifetime
    _write_batchfile(feed / "b2.jsonl", [ev(3, 120)])
    # batch 3: spacer — eviction runs with the watermark ESTABLISHED by
    # batch 2 (watermark updates lag one micro-batch)
    _write_batchfile(feed / "b3.jsonl", [ev(4, 125)])
    # batch 4: id 1 re-arrives with a fresh ts after its state expired ->
    # emitted AGAIN (bounded state traded exactly-once for survivability)
    _write_batchfile(feed / "b4.jsonl", [ev(1, 126)])

    import os
    import time

    now = time.time()
    for i, name in enumerate(["b1.jsonl", "b2.jsonl", "b3.jsonl", "b4.jsonl"]):
        os.utime(feed / name, (now - 180 + 45 * i, now - 180 + 45 * i))

    schema = "event_id long, ts string"
    parsed = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(str(feed))
        .select(F.from_json("value", schema).alias("c"))
        .select("c.event_id", F.to_timestamp("c.ts").alias("ts"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = []
    q = (
        parsed.writeStream.foreachBatch(
            lambda df, bid: out.extend(r["event_id"] for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "cp_ddw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert sorted(out) == [1, 1, 2, 3, 4], out  # id 1 once per state lifetime


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with watermarks: same-user event pairs
    within a forward 10-minute bound — the streaming twin of
    operators/temporal.py:range_join. Both sides carry watermarks so the
    join state is bounded (Spark evicts rows older than watermark+bound);
    the drained result must equal the batch range_join on the same data."""
    from npm_mirror_spark.operators.temporal import range_join

    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(40):
        rows.append(
            {
                "event_id": i,
                "ts": (t0 + timedelta(minutes=i * 3 % 47)).isoformat(),
                "user_id": i % 5,
            }
        )
    _write_batchfile(feed / "a.jsonl", rows)

    schema = "event_id long, ts string, user_id long"

    def src():
        return (
            spark.readStream.text(str(feed))
            .select(F.from_json("value", schema).alias("c"))
            .select("c.event_id", F.to_timestamp("c.ts").alias("ts"), "c.user_id")
        )

    a = src().withWatermark("ts", "30 minutes").alias("a")
    b = (
        src()
        .select(
            F.col("user_id"),
            F.col("ts").alias("ts2"),
            F.col("event_id").alias("next_event_id"),
        )
        .withWatermark("ts2", "30 minutes")
        .alias("b")
    )
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("ts2") >= F.col("ts"))
        & (F.col("ts2") <= F.col("ts") + F.expr("INTERVAL 10 MINUTES"))
        & (F.col("next_event_id") != F.col("event_id")),
        "inner",
    ).select("event_id", "next_event_id")

    got = []
    q = (
        joined.writeStream.foreachBatch(
            lambda df, bid: got.extend(
                (r["event_id"], r["next_event_id"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "cp_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_df = spark.createDataFrame(
        [(r["event_id"], datetime.fromisoformat(r["ts"]), r["user_id"]) for r in rows],
        "event_id long, ts timestamp, user_id long",
    )
    expected = (
        range_join(
            batch_df,
            batch_df.select(
                F.col("user_id"),
                F.col("ts").alias("ts2"),
                F.col("event_id").alias("next_event_id"),
            ),
            on="user_id",
            left_ts="ts",
            right_ts="ts2",
            lower=F.expr("INTERVAL 0 SECONDS"),
            upper=F.expr("INTERVAL 10 MINUTES"),
        )
        .filter(F.col("next_event_id") != F.col("event_id"))
        .select("event_id", "next_event_id")
        .collect()
    )
    assert sorted(got) == sorted((r[0], r[1]) for r in expected)
    assert got, "join produced no pairs — fixture degenerate"


def test_session_window_streaming_with_watermark(spark, tmp_path):
    """The q_session_stats groupBy runs UNCHANGED as a watermarked stream:
    session_window merges events within the gap, the watermark finalizes a
    session once event time passes its close, and a later-batch event
    within the gap EXTENDS the open session rather than opening a new one
    (the stateful merge a batch engine can't express)."""
    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minutes, user=1):
        return {
            "event_id": i,
            "ts": (t0 + timedelta(minutes=minutes)).isoformat(),
            "user_id": user,
        }

    # batch 1: two bursts for user 1 separated by > gap (10 min): sessions
    # A {0,2} and B {20}; user 2 one event
    _write_batchfile(feed / "b1.jsonl", [ev(1, 0), ev(2, 2), ev(3, 20), ev(4, 1, user=2)])
    # batch 2: minute 25 is within gap of session B's last event (20) ->
    # must MERGE into B, not start a new session; minute 60 advances the
    # watermark far enough to close everything
    _write_batchfile(feed / "b2.jsonl", [ev(5, 25), ev(6, 60)])

    import os
    import time

    now = time.time()
    for i, name in enumerate(["b1.jsonl", "b2.jsonl"]):
        os.utime(feed / name, (now - 120 + 60 * i, now - 120 + 60 * i))

    schema = "event_id long, ts string, user_id long"
    parsed = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(str(feed))
        .select(F.from_json("value", schema).alias("c"))
        .select("c.event_id", F.to_timestamp("c.ts").alias("ts"), "c.user_id")
    )
    sessions = (
        parsed.withWatermark("ts", "5 minutes")
        .groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    rows = []
    q = (
        sessions.writeStream.foreachBatch(
            lambda df, bid: rows.extend(
                (r["user_id"], r["w"]["start"].isoformat(), r["n_events"])
                for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "cp_sess"))
        .outputMode("append")  # append: only watermark-finalized sessions
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {(u, s): n for u, s, n in rows}
    assert got[(1, "2024-01-01T00:00:00")] == 2  # session A finalized intact
    # session B spans batches: the minute-25 event merged into the
    # minute-20 session instead of opening a new one
    assert got[(1, "2024-01-01T00:20:00")] == 2
    assert got[(2, "2024-01-01T00:01:00")] == 1
