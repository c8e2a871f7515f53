"""Property-based adversaries for the r10 k-sample stats contract: every
reported float must be the documented FIXED sequence of correctly-rounded
IEEE ops on exact-integer-valued doubles — so a pure-Python replay of the
same op order must match BIT-FOR-BIT (==, not approx).  A drift here is
exactly the class that goes driver-red while looking "close enough"
locally."""

from __future__ import annotations

import pytest as _pytest

# slow tier (r15, r14 verdict item 1): algorithm re-derivation /
# brute-force sweep suite — guards development-time regressions,
# not per-round results.  Runs with --runslow / SPARK_GRAFT_SLOW_TESTS=1.
pytestmark = _pytest.mark.slow


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# two groups of small ints; each group needs >= 2 rows for a variance
_GROUPS = st.tuples(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=25),
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=25),
)


@given(_GROUPS)
@settings(**_SETTINGS)
def test_welch_t_is_bit_exact_vs_python_replay(spark, groups):
    from npm_mirror_spark.operators.stats import welch_t

    xa, xb = groups
    rows = [(x, 1) for x in xa] + [(x, 0) for x in xb]
    df = spark.createDataFrame(rows, "x long, a int")
    r = welch_t(df, "x", F.col("a") == 1).collect()[0]

    n1, n2 = len(xa), len(xb)
    s1, s2 = sum(xa), sum(xb)
    q1, q2 = sum(x * x for x in xa), sum(x * x for x in xb)
    m1 = float(s1) / float(n1)
    m2 = float(s2) / float(n2)
    v1 = float(n1 * q1 - s1 * s1) / float(n1 * (n1 - 1))
    v2 = float(n2 * q2 - s2 * s2) / float(n2 * (n2 - 1))
    se1 = v1 / float(n1)
    se2 = v2 / float(n2)
    se = se1 + se2
    d = m1 - m2
    assert (r["mean_a"], r["mean_b"], r["var_a"], r["var_b"]) == (m1, m2, v1, v2)
    if se > 0:
        assert r["t2"] == (d * d) / se
        assert r["welch_df"] == (se * se) / (
            (se1 * se1) / float(n1 - 1) + (se2 * se2) / float(n2 - 1)
        )


@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 500)),
        min_size=3,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_kruskal_cells_bit_exact_vs_python_replay(spark, data):
    from fractions import Fraction

    from npm_mirror_spark.operators.stats import kruskal_cells

    df = spark.createDataFrame(data, "g string, x long")
    got = {r["g"]: r for r in kruskal_cells(df, "x", "g").collect()}
    vals = sorted(x for _, x in data)
    mid2 = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        mid2[vals[i]] = i + 1 + j  # doubled midrank
        i = j
    for g in {g for g, _ in data}:
        xs = [x for gg, x in data if gg == g]
        r2 = sum(mid2[x] for x in xs)
        row = got[g]
        assert row["n_i"] == len(xs)
        assert row["rank_sum_x2"] == float(r2)
        assert row["mean_rank"] == float(r2) / float(2 * len(xs))
        assert row["h_term"] == (float(r2) * float(r2)) / float(4 * len(xs))
    # rank-sum conservation: sum of doubled rank sums = n(n+1)
    n = len(vals)
    assert sum(Fraction(r["rank_sum_x2"]) for r in got.values()) == n * (n + 1)


@given(
    st.lists(
        st.tuples(st.sampled_from("pqr"), st.integers(0, 1000)),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_anova_cells_bit_exact_vs_python_replay(spark, data):
    from npm_mirror_spark.operators.stats import anova_cells

    df = spark.createDataFrame(data, "g string, x long")
    got = {r["g"]: r for r in anova_cells(df, "x", "g").collect()}
    n = len(data)
    st_ = sum(x for _, x in data)
    gm = float(st_) / float(n)
    for g in {g for g, _ in data}:
        xs = [x for gg, x in data if gg == g]
        ni, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        row = got[g]
        mean_i = float(s) / float(ni)
        assert row["sum_i"] == float(s)
        assert row["mean_i"] == mean_i
        assert row["within_ss"] == float(ni * q - s * s) / float(ni)
        assert row["between_term"] == float(ni) * ((mean_i - gm) * (mean_i - gm))
        assert row["grand_mean"] == gm
