"""As-of join: composition form vs merge_asof kernel form agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.operators.temporal import asof_join, asof_join_pandas


def test_asof_forms_agree(spark, sf_dir):
    from npm_mirror_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("odate"),
        F.col("o_orderkey").alias("okey"),
    )
    comp = asof_join(
        ev, orders, on="user_id", left_ts="ts", right_ts="odate",
        right_cols=["odate", "okey"], tiebreak=["okey"],
    )
    kern = asof_join_pandas(
        ev, orders.select("user_id", "odate", "okey"),
        on="user_id", left_ts="ts", right_ts="odate", right_cols=["okey"],
    )
    c = {r["event_id"]: (r["odate"], r["okey"]) for r in comp.collect()}
    k = {r["event_id"]: r["okey"] for r in kern.collect()}
    assert set(c) == set(k)
    # timestamps always agree; keys may differ only on odate ties (the
    # kernel keeps sort-order-last, the composition keeps max okey)
    odate_by_key = {
        (r["user_id"], r["okey"]): r["odate"] for r in orders.collect()
    }
    users = {r["event_id"]: r["user_id"] for r in ev.collect()}
    for eid, (odate, okey) in c.items():
        if k[eid] != okey:
            assert odate_by_key[(users[eid], k[eid])] == odate, eid


def test_asof_bucketed_equals_plain(spark, sf_dir):
    """The bounded-fan-out form must return exactly the plain form's
    answer, for bucket widths smaller and larger than the data span."""
    from npm_mirror_spark.operators.temporal import asof_join_bucketed
    from npm_mirror_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("odate"),
        F.col("o_orderkey").alias("okey"),
    )
    plain = {
        r["event_id"]: (r["odate"], r["okey"])
        for r in asof_join(
            ev, orders, on="user_id", left_ts="ts", right_ts="odate",
            right_cols=["odate", "okey"], tiebreak=["okey"],
        ).collect()
    }
    for bucket in (86_400, 86_400 * 365 * 50):
        got = {
            r["event_id"]: (r["odate"], r["okey"])
            for r in asof_join_bucketed(
                ev, orders, on="user_id", left_ts="ts", right_ts="odate",
                right_cols=["odate", "okey"], tiebreak=["okey"],
                bucket_seconds=bucket,
            ).collect()
        }
        assert got == plain, f"bucket={bucket}"


def test_asof_bucketed_same_bucket_and_no_match(spark):
    """Left and right in the SAME bucket (prev-latest is null) and a right
    strictly after the left (no match at all)."""
    from npm_mirror_spark.operators.temporal import asof_join_bucketed

    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00"), (2, 20, "2024-01-01 10:00:00")],
        "id long, k long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 09:00:00", 1), (20, "2024-01-01 11:00:00", 2)],
        "k long, rts string, val long",
    ).withColumn("rts", F.to_timestamp("rts"))
    out = {
        r["id"]: r["val"]
        for r in asof_join_bucketed(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rts", "val"], tiebreak=["val"], bucket_seconds=86_400,
        ).collect()
    }
    assert out == {1: 1, 2: None}


def test_asof_no_match_yields_nulls(spark):
    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00")], "id long, k long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2025-01-01 00:00:00", 77)], "k long, rts string, val long"
    ).withColumn("rts", F.to_timestamp("rts"))
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_cols=["rts", "val"], tiebreak=["val"],
    ).collect()
    assert len(out) == 1 and out[0]["val"] is None and out[0]["rts"] is None
