"""funnel_stages semantics on constructed event streams: strict ordering,
conversion deadline, insensitivity to input row order."""

from __future__ import annotations

from datetime import datetime

from npm_mirror_spark.operators.aggregates import funnel_stages


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, h, m), t) for (u, h, m, t) in rows],
        "user_id long, ts timestamp, event_type string",
    )


STEPS = ["view", "click", "purchase"]


def _stages(spark, rows, **kw):
    df = _df(spark, rows)
    return {
        r["user_id"]: r["stage"]
        for r in funnel_stages(df, "user_id", "ts", "event_type", STEPS, **kw).collect()
    }


def test_full_and_partial_paths(spark):
    rows = [
        (1, 9, 0, "view"), (1, 9, 5, "click"), (1, 9, 10, "purchase"),
        (2, 9, 0, "view"), (2, 9, 5, "click"),
        (3, 9, 0, "view"),
        (4, 9, 0, "click"), (4, 9, 5, "purchase"),  # never viewed -> 0
    ]
    assert _stages(spark, rows) == {1: 3, 2: 2, 3: 1, 4: 0}


def test_step_order_is_strict(spark):
    # click BEFORE the first view does not count; a later one does
    rows = [(1, 8, 0, "click"), (1, 9, 0, "view"), (1, 10, 0, "click")]
    assert _stages(spark, rows) == {1: 2}
    # purchase between view and click doesn't skip the click step
    rows = [(2, 9, 0, "view"), (2, 9, 30, "purchase")]
    assert _stages(spark, rows) == {2: 1}


def test_simultaneous_events_do_not_advance(spark):
    # strict '>': a click at exactly the view timestamp is not "after" it
    rows = [(1, 9, 0, "view"), (1, 9, 0, "click")]
    assert _stages(spark, rows) == {1: 1}


def test_conversion_deadline(spark):
    rows = [
        (1, 9, 0, "view"), (1, 9, 20, "click"),   # within 30 min
        (2, 9, 0, "view"), (2, 10, 0, "click"),   # 60 min: too late
    ]
    assert _stages(spark, rows, within_minutes=30) == {1: 2, 2: 1}
    # deadline measures from the MATCHED step, not the first event:
    # click at +20, purchase at +45 is within 30 of the click
    rows = [(3, 9, 0, "view"), (3, 9, 20, "click"), (3, 9, 45, "purchase")]
    assert _stages(spark, rows, within_minutes=30) == {3: 3}


def test_insensitive_to_row_order(spark):
    rows = [(1, 9, 10, "purchase"), (1, 9, 0, "view"), (1, 9, 5, "click")]
    assert _stages(spark, rows) == {1: 3}
