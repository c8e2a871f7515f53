"""Per-group OLS trend (operators/aggregates.py:linear_trend): numpy
parity, degenerate groups, and the one-job moment shape."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from npm_mirror_spark.operators.aggregates import linear_trend


def test_trend_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(7)
    rows = []
    truth = {"up": (0.5, 3.0), "down": (-1.25, 10.0)}
    for g, (m, b) in truth.items():
        xs = rng.integers(0, 10_000, size=200)
        for x in xs:
            rows.append((g, int(x), m * float(x) + b))
    df = spark.createDataFrame(rows, "g string, x long, y double")
    got = {r["g"]: r for r in linear_trend(df, ["g"], "x", "y").collect()}
    for g, (m, b) in truth.items():
        assert got[g]["n"] == 200
        assert abs(got[g]["slope"] - m) < 1e-9, g
        assert abs(got[g]["intercept"] - b) < 1e-6, g
    # noisy group: compare against numpy lstsq fit
    xs = rng.integers(0, 5_000, size=500)
    ys = 2.0 * xs + 1.0 + rng.normal(0, 5.0, size=500)
    # quantize y so the decimal(18,4) moment cast is EXACT (the
    # operator's stated contract for y precision)
    ys = np.round(ys, 4)
    df2 = spark.createDataFrame(
        [("n", int(x), float(y)) for x, y in zip(xs, ys)],
        "g string, x long, y double",
    )
    r = linear_trend(df2, ["g"], "x", "y").first()
    m_np, b_np = np.polyfit(xs.astype(float), ys, 1)
    assert abs(r["slope"] - m_np) < 1e-7
    assert abs(r["intercept"] - b_np) < 1e-4


def test_trend_degenerate_groups_are_null(spark):
    df = spark.createDataFrame(
        [("const_x", 5, 1.0), ("const_x", 5, 2.0), ("single", 3, 9.0)],
        "g string, x long, y double",
    )
    rows = {r["g"]: r for r in linear_trend(df, ["g"], "x", "y").collect()}
    assert rows["const_x"]["slope"] is None
    assert rows["const_x"]["intercept"] is None
    assert rows["single"]["slope"] is None


def test_trend_is_one_aggregation_job(spark):
    """Plan shape: a single hash-aggregate pair over one scan — no join,
    no window, no second pass."""
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(50)], "g string, x long, y double"
    )
    plan = linear_trend(df, ["g"], "x", "y")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


def test_trend_excludes_null_and_nonfinite_rows(spark):
    """A NULL x / NaN y row must be excluded entirely (n, sums), not
    silently skew the moments."""
    clean = spark.createDataFrame(
        [("g", i, 2.0 * i) for i in range(10)], "g string, x long, y double"
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [("g", None, 5.0), ("g", 3, float("nan"))],
            "g string, x long, y double",
        )
    )
    a = linear_trend(clean, ["g"], "x", "y").first()
    b = linear_trend(dirty, ["g"], "x", "y").first()
    assert (a["n"], a["slope"], a["intercept"]) == (b["n"], b["slope"], b["intercept"])
    assert a["n"] == 10


def test_weighted_percentile_matches_brute_force(spark):
    """Crafted weights: the weighted median must be the value where
    cumulative mass crosses half — brute-force expansion agrees; an
    extreme-weight row dominates; p=1 returns the max value."""
    from npm_mirror_spark.operators.aggregates import weighted_percentile_by

    rows = [("a", 1, 1), ("a", 2, 1), ("a", 3, 100), ("a", 4, 1),
            ("b", 10, 5), ("b", 20, 5)]
    df = spark.createDataFrame(rows, "g string, v int, w int")

    def brute(vals, p):
        exp = sorted([v for v, w in vals for _ in range(w)])
        # smallest value whose cumulative weight reaches p of total
        tot, c = len(exp), 0
        for v in sorted(set(exp)):
            c += sum(1 for x in exp if x == v)
            if c >= p * tot:
                return v

    got = {
        r["g"]: (r["p_value"], r["total_weight"])
        for r in weighted_percentile_by(df, ["g"], "v", "w", 1, 2).collect()
    }
    assert got["a"] == (brute([(1, 1), (2, 1), (3, 100), (4, 1)], 0.5), 103)
    assert got["a"][0] == 3  # the heavy row IS the weighted median
    assert got["b"] == (10, 10)  # cw(10)=5, 5*2 >= 10 -> 10
    p100 = {
        r["g"]: r["p_value"]
        for r in weighted_percentile_by(df, ["g"], "v", "w", 1, 1).collect()
    }
    assert p100 == {"a": 4, "b": 20}


def test_weighted_percentile_double_axis_and_edges(spark):
    """The r8 bucketed rewrite's new paths: a high-cardinality DOUBLE
    value axis (many distinct values spread across range buckets), NaN /
    +-Inf edge buckets, NULL values, and a tiny n_buckets that forces
    multi-value buckets — all must reproduce the brute-force weighted
    percentile (Spark sort order: NULL, -Inf, finite, +Inf, NaN)."""
    import math

    from npm_mirror_spark.operators.aggregates import weighted_percentile_by

    vals = [(i * 0.37 + (i % 7) * 0.001) for i in range(200)]
    rows = [("a", v, (i % 5) + 1) for i, v in enumerate(vals)]
    rows += [("b", float("-inf"), 3), ("b", 1.5, 1), ("b", float("inf"), 1),
             ("b", float("nan"), 1), ("b", None, 2)]
    df = spark.createDataFrame(rows, "g string, v double, w int")

    def brute(pairs, num, den):
        def key(v):
            if v is None:
                return (0, 0.0)
            if isinstance(v, float) and math.isnan(v):
                return (2, 0.0)
            return (1, v)

        tot = sum(w for _, w in pairs)
        c = 0
        for v, w in sorted(pairs, key=lambda p: key(p[0])):
            c += w
            # NULL weights count toward the axis front but NULL itself
            # is never reported (F.min skips it) — the operator's
            # contract since r7; the next value also passes since the
            # cumulative only grows.
            if c * den >= num * tot and v is not None:
                return v, tot

    for num, den in [(1, 2), (1, 4), (9, 10), (1, 1)]:
        got = {
            r["g"]: (r["p_value"], r["total_weight"])
            for r in weighted_percentile_by(
                df, ["g"], "v", "w", num, den, n_buckets=8
            ).collect()
        }
        a_pairs = [(v, (i % 5) + 1) for i, v in enumerate(vals)]
        b_pairs = [(float("-inf"), 3), (1.5, 1), (float("inf"), 1),
                   (float("nan"), 1), (None, 2)]
        exp_a = brute(a_pairs, num, den)
        exp_b = brute(b_pairs, num, den)
        assert got["a"] == exp_a, (num, den, got["a"], exp_a)
        gb, eb = got["b"], exp_b
        assert gb[1] == eb[1]
        if eb[0] is None or (isinstance(eb[0], float) and math.isnan(eb[0])):
            assert gb[0] is None or math.isnan(gb[0])
        else:
            assert gb[0] == eb[0], (num, den, gb, eb)
