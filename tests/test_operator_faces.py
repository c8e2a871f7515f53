"""Behavioral coverage for public operator functions that are API
surface rather than query-face internals (SURVEY §2 rows F5-F9, the
audio codec pair, and the explicit salted-join scale regime).  These
back the registry invariant test_every_public_operator_function_is_
referenced: every public function in operators/ must be exercised by
SOMETHING — a query face, another operator, or a test like these."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.operators.filters import (
    filter_http_ok,
    retention_eligible,
    route_by_flag,
    stage_router,
)


def test_filter_http_ok_keeps_only_200(spark):
    df = spark.createDataFrame(
        [(1, 200), (2, 404), (3, 500), (4, 200)], "id int, fetch_status int"
    )
    out = filter_http_ok(df).collect()
    assert sorted(r["id"] for r in out) == [1, 4]
    # declarative predicate: must reach the scan as a pushable filter
    assert "Filter" in filter_http_ok(df)._jdf.queryExecution().simpleString()


def test_retention_eligible_exact_slack_only(spark):
    # eligible iff mod_cnt - ver_cnt == 2 (created+modified keys only)
    df = spark.createDataFrame(
        [(1, 5, 3), (2, 6, 3), (3, 4, 2), (4, 2, 0)],
        "id int, mod_cnt int, ver_cnt int",
    )
    out = retention_eligible(df, "mod_cnt", "ver_cnt").collect()
    assert sorted(r["id"] for r in out) == [1, 3, 4]


def test_route_by_flag_routes_both_ways(spark):
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, True)], "id int, deleted boolean"
    )
    out = {
        r["id"]: r["route"]
        for r in route_by_flag(df, "deleted", "deletion_log", "records").collect()
    }
    assert out == {1: "deletion_log", 2: "records", 3: "deletion_log"}


def test_stage_router_tags_destination(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 20_000_000), (3, 7)], "id int, size long"
    )
    routed = stage_router(
        df,
        F.when(F.col("size") > 10_000_000, F.lit("oversize")).otherwise(
            F.lit("records")
        ),
    )
    out = {r["id"]: r["stage"] for r in routed.collect()}
    assert out == {1: "records", 2: "oversize", 3: "records"}


def test_pcm16_codec_round_trips():
    import numpy as np

    from npm_mirror_spark.operators.multimodal import (
        decode_pcm16,
        encode_pcm16,
    )

    samples = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    assert (decode_pcm16(encode_pcm16(samples)) == samples).all()
    assert decode_pcm16(b"").size == 0


def test_salted_broadcast_join_matches_plain_join(spark):
    from npm_mirror_spark.operators.skew import salted_broadcast_join

    # hot key 7 dominates — the skew regime the explicit salt targets
    big = spark.createDataFrame(
        [(7, i) for i in range(200)] + [(k, k) for k in range(5)],
        "k int, payload int",
    )
    small = spark.createDataFrame(
        [(7, "hot"), (1, "a"), (3, "b")], "k int, label string"
    )
    got = sorted(
        (r["k"], r["payload"], r["label"])
        for r in salted_broadcast_join(big, small, "k", salt_buckets=4).collect()
    )
    want = sorted(
        (r["k"], r["payload"], r["label"])
        for r in big.join(small, "k").collect()
    )
    assert got == want
