"""Stateful watchdog + enrichment seam tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from npm_mirror_spark.sources import changes as ch
from npm_mirror_spark.streaming.enrichment import fetch_artifacts, latest_tarball_urls
from npm_mirror_spark.streaming.stateful import seq_watchdog


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    evs = ch.generate_changes(n=60, seed=3)
    third = len(evs) // 3
    # three files -> with maxFilesPerTrigger=1, three micro-batches
    for i, chunk in enumerate([evs[:third], evs[third : 2 * third], evs[2 * third :]]):
        ch.write_jsonl(chunk, str(d / f"part{i}.jsonl"))
    # a fourth file with NO new seqs (stall: redelivery of old data)
    ch.write_jsonl(evs[:5], str(d / "part3_stale.jsonl"))
    return str(d), evs


def test_seq_watchdog_state_across_batches(spark, feed_dir, tmp_path):
    path, evs = feed_dir
    parsed = ch.read_changes_stream(spark, path, max_files_per_trigger=1)
    wd = seq_watchdog(parsed, seq_col="seq", stall_batches=1)
    out_rows = []

    def sink(df, bid):
        out_rows.extend(df.collect())

    q = (
        wd.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(out_rows) >= 2, "one state update per micro-batch"
    max_seqs = [r["max_seq"] for r in out_rows]
    assert max_seqs == sorted(max_seqs), "running max must be monotone"
    assert max_seqs[-1] == max(e["seq"] for e in evs)
    # the stale batch advanced nothing -> quiet_batches>0 and stalled fires
    assert out_rows[-1]["new_changes"] >= 0
    assert any(r["stalled"] for r in out_rows), "stall detection must fire on the stale batch"


def test_enrichment_fetch_batched(spark, feed_dir):
    path, _ = feed_dir
    parsed = ch.read_changes_batch(spark, path).filter(F.col("doc").isNotNull())
    urls = latest_tarball_urls(parsed)
    enriched = fetch_artifacts(urls)
    rows = enriched.collect()
    assert len(rows) == urls.count()
    ok = [r for r in rows if r["status"] == 200]
    assert ok and all(r["content_sha256"] and r["content_len"] > 0 for r in ok)
    bad = [r for r in rows if r["status"] in (404, 500)]
    for r in bad:
        assert r["content_sha256"] is None and r["content_len"] == 0
    # determinism: same URL -> same digest (idempotent re-fetch)
    again = {r["seq"]: r["content_sha256"] for r in fetch_artifacts(urls).collect()}
    assert all(again[r["seq"]] == r["content_sha256"] for r in rows)


def test_enrichment_placement_after_filter(spark, feed_dir):
    """The size/status filters must run BEFORE the fetch stage (the
    mirror.ts pushdown, F3): here by construction — the mapInPandas input
    is already filtered, which the plan shows as Filter under the Python
    evaluator node."""
    path, _ = feed_dir
    parsed = ch.read_changes_batch(spark, path)
    small = parsed.filter(
        (F.col("doc").isNotNull()) & (F.col("artifact_size") <= 5_000_000)
    )
    enriched = fetch_artifacts(latest_tarball_urls(small))
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    import re

    pos_py = plan.find("MapInPandas")
    pos_filter = plan.find("Filter")
    assert pos_py != -1 and pos_filter != -1 and pos_py < pos_filter, (
        "filter must sit below (after in text order) the Python stage"
    )


def test_streaming_funnel_matches_batch_replay(spark, tmp_path):
    """Per-user funnel stage accumulates across micro-batches, and a full
    replay through the stateful operator equals the batch funnel."""
    from datetime import datetime

    from npm_mirror_spark.operators.aggregates import funnel_stages
    from npm_mirror_spark.streaming.stateful import streaming_funnel

    def ev(u, minute, et):
        return {
            "user_id": u,
            "ts": datetime(2024, 1, 1, 9, minute).isoformat(),
            "event_type": et,
        }

    feed = tmp_path / "feed"
    feed.mkdir()
    b1 = [ev(1, 0, "view"), ev(2, 0, "view"), ev(2, 1, "click")]
    b2 = [ev(1, 5, "click"), ev(1, 10, "purchase"), ev(2, 2, "view")]
    for name, rows in (("b1.jsonl", b1), ("b2.jsonl", b2)):
        (feed / name).write_text("\n".join(json.dumps(r) for r in rows))

    schema = "user_id long, ts string, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .select("user_id", F.to_timestamp("ts").alias("ts"), "event_type")
    )
    steps = ["view", "click", "purchase"]
    out = {}

    def sink(df, bid):
        for r in df.collect():
            out[r["user_id"]] = r["stage"]  # update mode: last write wins

    q = (
        streaming_funnel(stream, steps)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp_funnel"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_df = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["event_type"]) for r in
         spark.read.schema(schema).json(str(feed))
         .select("user_id", F.to_timestamp("ts").alias("ts"), "event_type")
         .collect()],
        "user_id long, ts timestamp, event_type string",
    )
    expected = {
        r["user_id"]: r["stage"]
        for r in funnel_stages(batch_df, "user_id", "ts", "event_type", steps).collect()
    }
    assert out == expected == {1: 3, 2: 2}


def test_streaming_heavy_hitters_space_saving_bounds(spark, tmp_path):
    """Space-saving invariants across micro-batches: the dominant item is
    present with est_count >= true count >= est_count - max_err, and the
    summary never exceeds its capacity even when the stream's distinct
    count does."""
    from collections import Counter

    from npm_mirror_spark.streaming.stateful import streaming_heavy_hitters

    feed = tmp_path / "feed"
    feed.mkdir()
    # batch 1: 'hot' dominates among filler items; batch 2: more hot +
    # enough fresh distinct items to force evictions at capacity 8
    b1 = ["hot"] * 30 + [f"cold{i}" for i in range(10)]
    b2 = ["hot"] * 25 + ["warm"] * 12 + [f"x{i}" for i in range(10)]
    for name, rows in (("b1.jsonl", b1), ("b2.jsonl", b2)):
        (feed / name).write_text("\n".join(json.dumps({"pkg": r}) for r in rows))
    true = Counter(b1 + b2)

    stream = (
        spark.readStream.schema("pkg string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    last = {}

    def sink(df, bid):
        rows = df.collect()
        if rows:
            last.clear()
            last.update({r["item"]: (r["est_count"], r["max_err"]) for r in rows})

    q = (
        streaming_heavy_hitters(stream, "pkg", capacity=8)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp_hh"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(last) <= 8, "summary exceeded capacity"
    for item in ("hot", "warm"):
        assert item in last, f"dominant item {item} evicted"
        est, err = last[item]
        assert est - err <= true[item] <= est, (item, est, err, true[item])
    # exact count for the never-evicted top item
    assert last["hot"] == (55, 0)


def test_streaming_sessionize_closes_across_batches(spark, tmp_path):
    """transformWithStateInPandas sessionizer: a session spanning two
    micro-batches merges in state; a later event past the idle gap closes
    it with the exact (start, end, count); the still-open trailing session
    is NOT emitted (pending by design under availableNow)."""
    from datetime import datetime

    from npm_mirror_spark.streaming.stateful import streaming_sessionize

    def ev(u, minute):
        return {"user_id": u, "ts": datetime(2024, 1, 1, 9, minute).isoformat()}

    feed = tmp_path / "feed"
    feed.mkdir()
    # user 1: events at 9:00, 9:10 (batch 1) and 9:20 (batch 2) — one
    # session; then 10:20 (gap 60 min > 30) closes it and opens another.
    # user 2: single event, never closed.
    b1 = [ev(1, 0), ev(1, 10), ev(2, 5)]
    b2 = [ev(1, 20)]
    b3 = [{"user_id": 1, "ts": datetime(2024, 1, 1, 10, 20).isoformat()}]
    # distinct mtimes: the file source orders batches by modification
    # time, and same-second writes would drain out of order
    import os
    import time

    base = time.time() - 100
    for i, (name, rows) in enumerate(
        (("b1.jsonl", b1), ("b2.jsonl", b2), ("b3.jsonl", b3))
    ):
        path = feed / name
        path.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(path, (base + i * 10, base + i * 10))

    stream = (
        spark.readStream.schema("user_id long, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .select("user_id", F.to_timestamp("ts").alias("ts"))
    )
    out = []

    def sink(df, bid):
        out.extend(df.collect())

    q = (
        streaming_sessionize(stream, gap_seconds=1800)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp_sess"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(out) == 1, f"expected exactly one closed session, got {out}"
    r = out[0]
    assert r["user_id"] == 1
    assert r["n_events"] == 3
    assert r["session_start"] == datetime(2024, 1, 1, 9, 0)
    assert r["session_end"] == datetime(2024, 1, 1, 9, 20)


def test_streaming_sessionize_out_of_order_replay(spark, tmp_path):
    """Out-of-order events ACROSS a micro-batch boundary, under a
    watermark. The interval-merge kernel must (a) lower session_start
    when a late event precedes the stored start within the gap, (b) emit
    a late event more than the gap BEFORE the stored start as its own
    closed earlier session, and (c) drop events older than the watermark
    instead of surfacing them as spurious sessions — the three paths the
    old max-merge fold got wrong."""
    import os
    import time
    from datetime import datetime

    from npm_mirror_spark.streaming.stateful import streaming_sessionize

    def ev(u, h, m):
        return {"user_id": u, "ts": datetime(2024, 1, 1, h, m).isoformat()}

    # user 1: b1 has 9:00, 9:20; b2 delivers LATE 8:50 (within gap before
    #   stored start -> start lowers), then 10:30 closes -> (8:50-9:20, 3).
    # user 2: b1 has 12:00; b2 delivers LATE 10:00 (> gap before stored
    #   start -> separate, provably-closed earlier singleton).
    # user 3: b1 unsorted (9:30 before 9:00); b2 extends with 9:45; b3's
    #   11:00 closes -> (9:00-9:45, 3).
    # user 4: b3 delivers 7:00 after b2's max event time 12:00 advanced
    #   the watermark to 12:00 - 4h = 8:00 -> dropped, never emitted.
    b1 = [ev(1, 9, 0), ev(1, 9, 20), ev(3, 9, 30), ev(3, 9, 0)]
    b2 = [ev(1, 8, 50), ev(2, 12, 0), ev(3, 9, 45)]
    b3 = [ev(1, 10, 30), ev(2, 10, 0), ev(4, 7, 0), ev(3, 11, 0)]

    feed = tmp_path / "feed"
    feed.mkdir()
    base = time.time() - 100
    for i, rows in enumerate((b1, b2, b3)):
        path = feed / f"b{i}.jsonl"
        path.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(path, (base + i * 10, base + i * 10))

    stream = (
        spark.readStream.schema("user_id long, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .select("user_id", F.to_timestamp("ts").alias("ts"))
    )
    got = []

    q = (
        streaming_sessionize(stream, gap_seconds=1800, watermark_delay="4 hours")
        .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "cp_ooo"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got_t = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got
    )
    assert got_t == [
        (1, datetime(2024, 1, 1, 8, 50), datetime(2024, 1, 1, 9, 20), 3),
        (2, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 0), 1),
        (3, datetime(2024, 1, 1, 9, 0), datetime(2024, 1, 1, 9, 45), 3),
    ], got_t
