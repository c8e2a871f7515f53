"""Stream-stream interval join: the streaming result must equal the batch
join of the same data, late rows beyond the interval must not match, and
the state store must actually be exercised (two independent file streams)."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from npm_mirror_spark.streaming.stream_join import interval_join

BASE = datetime(2024, 1, 1, 12, 0, 0)


def _write(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows))


def _feeds(tmp_path):
    imp_dir = tmp_path / "impressions"
    clk_dir = tmp_path / "clicks"
    imp_dir.mkdir()
    clk_dir.mkdir()
    imps = [
        {"imp_id": i, "user_id": i % 3, "imp_ts": (BASE + timedelta(minutes=i)).isoformat()}
        for i in range(12)
    ]
    # one click inside the 10-minute window, one outside, one wrong user
    clks = [
        {"click_id": 100, "user_id": 0, "click_ts": (BASE + timedelta(minutes=2)).isoformat()},
        {"click_id": 101, "user_id": 1, "click_ts": (BASE + timedelta(minutes=30)).isoformat()},
        {"click_id": 102, "user_id": 2, "click_ts": (BASE + timedelta(hours=5)).isoformat()},
    ]
    _write(imp_dir / "b1.jsonl", imps[:6])
    _write(imp_dir / "b2.jsonl", imps[6:])
    _write(clk_dir / "b1.jsonl", clks)
    return imp_dir, clk_dir


IMP_SCHEMA = "imp_id long, user_id long, imp_ts timestamp"
CLK_SCHEMA = "click_id long, user_id long, click_ts timestamp"


def _run_stream(spark, tmp_path, imp_dir, clk_dir):
    imps = (
        spark.readStream.schema(IMP_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(imp_dir))
    )
    clks = spark.readStream.schema(CLK_SCHEMA).json(str(clk_dir))
    joined = interval_join(imps, clks, "user_id", "imp_ts", "click_ts")
    out = tmp_path / "out"
    q = (
        joined.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .option("path", str(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(out))


def test_stream_join_matches_batch(spark, tmp_path):
    imp_dir, clk_dir = _feeds(tmp_path)
    got = _run_stream(spark, tmp_path, imp_dir, clk_dir)

    imps_b = spark.read.schema(IMP_SCHEMA).json(str(imp_dir))
    clks_b = spark.read.schema(CLK_SCHEMA).json(str(clk_dir))
    want = interval_join(imps_b, clks_b, "user_id", "imp_ts", "click_ts")

    got_rows = {tuple(r) for r in got.select("imp_id", "click_id").collect()}
    want_rows = {tuple(r) for r in want.select("imp_id", "click_id").collect()}
    assert got_rows == want_rows
    assert got_rows, "join produced nothing — window/key logic broken"
    # the 5-hours-late click must never match any impression
    assert not any(c == 102 for _, c in got_rows)


def test_stream_join_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    """Restart semantics: drain, then add new click files and restart with
    the SAME checkpoint — the second run must emit only the new matches
    (no reprocessing of already-joined pairs)."""
    imp_dir, clk_dir = _feeds(tmp_path)
    first = _run_stream(spark, tmp_path, imp_dir, clk_dir)
    n_first = first.count()
    assert n_first > 0

    _write(
        clk_dir / "b2.jsonl",
        [
            {
                "click_id": 103,
                "user_id": 2,
                "click_ts": (BASE + timedelta(minutes=3)).isoformat(),
            }
        ],
    )
    second = _run_stream(spark, tmp_path, imp_dir, clk_dir)
    got = [
        tuple(r)
        for r in second.select("imp_id", "click_id").collect()
    ]
    # the run must grow by exactly the new click's matches (user-2
    # impressions whose 10-min window covers 12:03) — nothing replayed
    new_pairs = [p for p in got if p[1] == 103]
    assert len(got) == n_first + len(new_pairs)
    assert len(new_pairs) == len(set(new_pairs)) > 0


def test_late_click_beyond_watermark_is_dropped(spark, tmp_path):
    """The 30-minute watermark must actually bound state: a click whose
    event time is hours behind the already-advanced global watermark is
    DROPPED even though a matching impression exists — the documented
    trade that keeps stream-stream join state finite. (The batch run of
    the same data, where watermarks are a no-op, finds the match.)"""
    import time

    imp_dir = tmp_path / "imps"
    clk_dir = tmp_path / "clicks"
    imp_dir.mkdir()
    clk_dir.mkdir()
    far = BASE + timedelta(hours=3)
    _write(
        imp_dir / "imps.jsonl",
        [
            {"imp_id": 1, "user_id": 7, "imp_ts": BASE.isoformat()},
            {"imp_id": 2, "user_id": 8, "imp_ts": far.isoformat()},
        ],
    )
    # batch 1 advances the watermark to ~2.5h; batch 2 lets end-of-batch
    # state cleanup evict the stale impression under that watermark;
    # batch 3's click (event time BASE+2min, matching imp 1) then finds
    # no state — dropped. (Eviction runs at batch END, so the advanced
    # watermark needs one intermediate batch to take effect.)
    _write(
        clk_dir / "a.jsonl",
        [{"click_id": 50, "user_id": 9, "click_ts": far.isoformat()}],
    )
    time.sleep(1.1)
    _write(
        clk_dir / "b.jsonl",
        [{"click_id": 52, "user_id": 9, "click_ts": (far + timedelta(minutes=1)).isoformat()}],
    )
    time.sleep(1.1)
    _write(
        clk_dir / "c.jsonl",
        [{"click_id": 51, "user_id": 7, "click_ts": (BASE + timedelta(minutes=2)).isoformat()}],
    )

    imps = spark.readStream.schema(IMP_SCHEMA).json(str(imp_dir))
    clks = (
        spark.readStream.schema(CLK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(clk_dir))
    )
    joined = interval_join(imps, clks, "user_id", "imp_ts", "click_ts")
    out = tmp_path / "out"
    q = (
        joined.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .option("path", str(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.click_id for r in spark.read.parquet(str(out)).collect()}
    assert 51 not in got, "late click joined — watermark did not bound state"

    # same data in batch mode (watermark no-op) DOES contain the match
    imps_b = spark.read.schema(IMP_SCHEMA).json(str(imp_dir))
    clks_b = spark.read.schema(CLK_SCHEMA).json(str(clk_dir))
    batch = interval_join(imps_b, clks_b, "user_id", "imp_ts", "click_ts")
    assert 51 in {r.click_id for r in batch.collect()}


def test_interval_bounds_are_inclusive_exclusive_correct(spark):
    """Boundary semantics: click exactly at imp_ts and exactly at
    imp_ts + max_delay both match (closed interval); one second past
    does not."""
    rows_i = [(1, 7, BASE)]
    rows_c = [
        (10, 7, BASE),
        (11, 7, BASE + timedelta(minutes=10)),
        (12, 7, BASE + timedelta(minutes=10, seconds=1)),
    ]
    imps = spark.createDataFrame(rows_i, "imp_id long, user_id long, imp_ts timestamp")
    clks = spark.createDataFrame(rows_c, "click_id long, user_id long, click_ts timestamp")
    got = {
        r.click_id
        for r in interval_join(imps, clks, "user_id", "imp_ts", "click_ts").collect()
    }
    assert got == {10, 11}
