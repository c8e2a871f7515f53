"""dropDuplicatesWithinWatermark: redelivered rows inside the watermark
horizon are dropped with BOUNDED state (keys evict once the watermark
passes), which is the scale-correct form of streaming dedup — the
alternative (dropDuplicates on an unwatermarked stream) keeps every key
forever. Models the reference's redelivered-seq suppression
(changes_consumer.py seq tracking) without the unbounded key set."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

BASE = datetime(2024, 1, 1, 12, 0, 0)


def test_redelivery_dropped_state_bounded(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    rows = [
        {"seq": 1, "ts": BASE.isoformat()},
        {"seq": 2, "ts": (BASE + timedelta(seconds=30)).isoformat()},
        {"seq": 2, "ts": (BASE + timedelta(seconds=31)).isoformat()},  # redelivery
        {"seq": 3, "ts": (BASE + timedelta(minutes=5)).isoformat()},
    ]
    (feed / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows))

    stream = spark.readStream.schema("seq long, ts timestamp").json(str(feed))
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["seq"]
    )
    out = tmp_path / "out"
    q = (
        deduped.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .option("path", str(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(r.seq for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 2, 3]
