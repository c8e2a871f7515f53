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


# ---- r8 wave: boundary-sweep coverage, CUSUM, lag-1 autocorr ----


def _epoch_day(s):
    import datetime as dt

    return (dt.date.fromisoformat(s) - dt.date(1970, 1, 1)).days


def _brute_coverage(intervals, max_days):
    """intervals: [(key, start_iso, n_days)] -> {key: (covered,
    islands, first, last)} via explicit day sets."""
    from collections import defaultdict

    days = defaultdict(set)
    for k, s, n in intervals:
        d0 = _epoch_day(s)
        for d in range(d0, d0 + min(n, max_days) + 1):
            days[k].add(d)
    out = {}
    for k, ds in days.items():
        sd = sorted(ds)
        islands = 1 + sum(
            1 for a, b in zip(sd, sd[1:]) if b > a + 1
        )
        out[k] = (len(sd), islands, sd[0], sd[-1])
    return out


def test_interval_coverage_matches_day_sets(spark):
    from npm_mirror_spark.operators.temporal import interval_coverage_days

    # overlap, nesting, exact adjacency (no gap), gap, clamp, duplicate
    intervals = [
        (1, "2024-01-01", 5),   # 01-01..01-06
        (1, "2024-01-04", 2),   # nested-overlap ..01-06
        (1, "2024-01-07", 1),   # adjacent -> same island
        (1, "2024-02-01", 0),   # singleton island after a gap
        (2, "2024-01-10", 100), # clamped to 30
        (2, "2024-01-10", 100), # exact duplicate interval
        (3, "2024-03-01", 3),
        (3, "2024-03-10", 3),   # second island
    ]
    df = spark.createDataFrame(intervals, ["k", "s", "n"])
    got = {
        r["k"]: (
            r["covered_days"],
            r["n_islands"],
            r["first_day"],
            r["last_day"],
        )
        for r in interval_coverage_days(
            df, "k", F.col("s").cast("date"), F.col("n"), max_days=30
        ).collect()
    }
    assert got == _brute_coverage(intervals, 30)


def test_cusum_finds_planted_level_shift(spark):
    from npm_mirror_spark.operators.temporal import cusum_changepoint

    # 10 days at rate 2, then 10 days at rate 12 -> split at day 9
    rows = [
        (f"2024-01-{d:02d}", 2 if d <= 10 else 12) for d in range(1, 21)
    ]
    df = spark.createDataFrame(rows, ["day", "cnt"])
    r = cusum_changepoint(df, "day", "cnt").collect()[0]
    assert r["m"] == 20 and r["total"] == 10 * 2 + 10 * 12
    # brute force the integer deviation maximum
    cnts = [c for _, c in rows]
    m, tot = len(cnts), sum(cnts)
    devs = []
    s = 0
    for k, c in enumerate(cnts, start=1):
        s += c
        devs.append((abs(m * s - k * tot), _epoch_day(rows[k - 1][0])))
    best = max(devs, key=lambda t: (t[0], -t[1]))
    assert int(r["dev_num"]) == best[0]
    assert r["day_star"] == best[1] == _epoch_day("2024-01-10")
    assert abs(r["dev_frac"] - best[0] / (m * tot)) < 1e-15


def test_autocorr_exact_moments_and_sign(spark):
    from npm_mirror_spark.operators.temporal import autocorr1_daily

    # alternating series -> strong NEGATIVE lag-1 autocorrelation;
    # one missing day breaks that pair out of the join
    rows = [
        ("2024-01-01", 1), ("2024-01-02", 9), ("2024-01-03", 1),
        ("2024-01-04", 9), ("2024-01-05", 1), ("2024-01-07", 9),
    ]
    df = spark.createDataFrame(rows, ["day", "cnt"])
    r = autocorr1_daily(df, "day", "cnt").collect()[0]
    by_day = {_epoch_day(d): c for d, c in rows}
    pairs = [
        (c, by_day[d + 1]) for d, c in by_day.items() if d + 1 in by_day
    ]
    m = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    assert r["m_pairs"] == m == 4
    assert (int(r["s_x"]), int(r["s_y"])) == (sx, sy)
    assert (int(r["s_xx"]), int(r["s_yy"]), int(r["s_xy"])) == (
        sxx, syy, sxy,
    )
    num = m * sxy - sx * sy
    d1 = m * sxx - sx * sx
    d2 = m * syy - sy * sy
    assert int(r["r_num"]) == num
    assert r["r_sign"] == -1
    assert abs(r["r2"] - (num / d1) * (num / d2)) < 1e-12


def test_binseg_changepoint_matches_brute_force(spark):
    from npm_mirror_spark.operators.temporal import binseg_changepoint

    # clear level shift after day 5
    data = [(f"2024-01-{i:02d}", 10 + (i % 2)) for i in range(1, 6)] + [
        (f"2024-01-{i:02d}", 30 + (i % 3)) for i in range(6, 12)
    ]
    df = spark.createDataFrame(data, "day string, n long")
    row = binseg_changepoint(df, "day", "n").collect()[0]
    xs = [x for _, x in data]
    m = len(xs)

    def sse(seg):
        n = len(seg)
        s, q = sum(seg), sum(v * v for v in seg)
        return (n * q - s * s) / n

    best = min(
        ((sse(xs[:k]) + sse(xs[k:]), k) for k in range(1, m)),
    )
    assert row["n_left"] == best[1] == 5
    assert abs(row["sse_split"] - best[0]) < 1e-9
    assert abs(row["sse_total"] - sse(xs)) < 1e-9
    assert row["gain"] > 0
    assert abs(row["mean_left"] - sum(xs[:5]) / 5) < 1e-12
    assert abs(row["mean_right"] - sum(xs[5:]) / 6) < 1e-12


def test_binseg_changepoint_constant_series_gain_zero(spark):
    from npm_mirror_spark.operators.temporal import binseg_changepoint

    df = spark.createDataFrame(
        [(f"2024-02-{i:02d}", 7) for i in range(1, 9)], "day string, n long"
    )
    row = binseg_changepoint(df, "day", "n").collect()[0]
    assert row["sse_split"] == 0.0 and row["gain"] == 0.0
    # tie on cost: smallest day wins (deterministic argmin)
    assert row["n_left"] == 1


def test_binseg_changepoint_degenerate_series_returns_zero_rows(spark):
    """A 0- or 1-day series has no split candidate; the face must
    return ZERO rows like the oracle's ORDER BY ... LIMIT 1, not the
    agg(min(struct)) all-NULL row (advisor finding r10)."""
    from npm_mirror_spark.operators.temporal import binseg_changepoint

    one = spark.createDataFrame([("2024-01-01", 5)], "day string, x long")
    assert binseg_changepoint(one, "day", "x").count() == 0
    empty = spark.createDataFrame([], "day string, x long")
    assert binseg_changepoint(empty, "day", "x").count() == 0
