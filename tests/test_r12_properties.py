"""Property-based bit-exactness adversaries for the r12 operator batch
(the test_r11_properties discipline): every reported float must be the
documented FIXED sequence of correctly-rounded IEEE ops on
exact-integer-valued doubles, so a pure-Python replay of the same op
order must match BIT-FOR-BIT (==, not approx)."""

from __future__ import annotations

import pytest as _pytest

# slow tier (r15, r14 verdict item 1): algorithm re-derivation /
# brute-force sweep suite — guards development-time regressions,
# not per-round results.  Runs with --runslow / SPARK_GRAFT_SLOW_TESTS=1.
pytestmark = _pytest.mark.slow


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mid2(vals: list[int]) -> dict[int, int]:
    """Doubled midranks of a multiset: value -> 2*midrank."""
    vals = sorted(vals)
    out, i = {}, 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        out[vals[i]] = i + 1 + j
        i = j
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 1)),
        min_size=2,
        max_size=30,
    ),
    st.lists(st.booleans(), min_size=30, max_size=30),
)
@settings(**_SETTINGS)
def test_logrank_bit_exact_vs_python_replay(spark, te, arms):
    """o_minus_e_a and var_term replayed in the documented op order on
    the exact risk-set integers."""
    from npm_mirror_spark.operators.temporal import logrank_cells
    from pyspark.sql import functions as F

    data = [("g", t, e, bool(a)) for (t, e), a in zip(te, arms)]
    df = spark.createDataFrame(data, "g string, t int, e int, a boolean")
    got = {
        r["t"]: r
        for r in logrank_cells(df, "g", "t", "e", F.col("a")).collect()
    }

    times = sorted({t for t, e, in te})
    rows = [(t, e, a) for (t, e), a in zip(te, arms)]
    for t0 in times:
        d = sum(1 for t, e, a in rows if t == t0 and e == 1)
        if d == 0:
            assert t0 not in got
            continue
        nr = sum(1 for t, _, _ in rows if t >= t0)
        nra = sum(1 for t, _, a in rows if t >= t0 and a)
        da = sum(1 for t, e, a in rows if t == t0 and e == 1 and a)
        r = got[t0]
        assert (r["n"], r["d"], r["n_a"], r["d_a"]) == (nr, d, nra, da)
        assert r["o_minus_e_a"] == float(da) - float(nra) * float(d) / float(nr)
        if nr > 1:
            fa = float(nra) / float(nr)
            want = (
                float(d) * fa * (1.0 - fa) * (float(nr) - float(d))
                / (float(nr) - 1.0)
            )
        else:
            want = 0.0
        assert r["var_term"] == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.booleans(),
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_mantel_haenszel_bit_exact_vs_python_replay(spark, data):
    from npm_mirror_spark.operators.checks import mantel_haenszel_cells
    from pyspark.sql import functions as F

    df = spark.createDataFrame(data, "s string, x boolean, y boolean")
    got = {
        r["s"]: r
        for r in mantel_haenszel_cells(
            df, "s", F.col("x"), F.col("y")
        ).collect()
    }
    strata = {s for s, _, _ in data}
    assert set(got) == strata
    for s0 in strata:
        rows = [(x, y) for s, x, y in data if s == s0]
        a = sum(1 for x, y in rows if x and y)
        b = sum(1 for x, y in rows if x and not y)
        c = sum(1 for x, y in rows if not x and y)
        d = sum(1 for x, y in rows if not x and not y)
        n = len(rows)
        r = got[s0]
        assert (r["a"], r["b"], r["c"], r["d"], r["n"]) == (a, b, c, d, n)
        assert r["mh_num"] == float(a) * float(d) / float(n)
        assert r["mh_den"] == float(b) * float(c) / float(n)
        assert a + b + c + d == n


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["b1", "b2", "b3", "b4", "b5"]),
            st.sampled_from([1, 2, 3]),
            st.integers(0, 50),
        ),
        min_size=3,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),
    )
)
@settings(**_SETTINGS)
def test_page_trend_conservation_and_w(spark, data):
    """Page inherits Friedman's rank conservation: Sigma_j 2R_j =
    n*k*(k+1); w is exactly the 1..k order of the treatment axis; and
    l_term_x2 = w * rank_sum_x2 bit-for-bit."""
    from npm_mirror_spark.operators.stats import page_trend_cells

    df = spark.createDataFrame(data, "b string, t int, x long")
    out = page_trend_cells(df, "b", "t", "x").collect()
    k = len({t for _, t, _ in data})
    by_block: dict[str, list] = {}
    for b, t, x in data:
        by_block.setdefault(b, []).append(t)
    n = sum(
        1
        for b, ts in by_block.items()
        if len(ts) == k and len(set(ts)) == k
    )
    if n == 0:
        assert out == []
        return
    assert sum(r["rank_sum_x2"] for r in out) == n * k * (k + 1)
    treatments = sorted({t for _, t, _ in data})
    for r in out:
        assert r["w"] == treatments.index(r["t"]) + 1
        assert r["l_term_x2"] == float(r["w"]) * r["rank_sum_x2"]


@given(
    st.lists(st.integers(0, 8), min_size=2, max_size=40),
)
@settings(**_SETTINGS)
def test_pettitt_identity_vs_double_sum(spark, xs):
    """The prefix identity must equal the literal double sum for every
    split point; U at the last day is always 0."""
    from npm_mirror_spark.operators.temporal import pettitt_cells

    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "d long, x long")
    got = {r["d"]: r["u_t"] for r in pettitt_cells(df, "d", "x").collect()}
    sgn = lambda a: (a > 0) - (a < 0)
    for t in range(1, len(xs) + 1):
        want = sum(
            sgn(xs[i] - xs[j]) for i in range(t) for j in range(t, len(xs))
        )
        assert got[t - 1] == want
    assert got[len(xs) - 1] == 0


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 12)),
        min_size=4,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_conover_scale_bit_exact_vs_python_replay(spark, data):
    from npm_mirror_spark.operators.stats import conover_scale_cells

    df = spark.createDataFrame(data, "g string, x long")
    got = {r["g"]: r for r in conover_scale_cells(df, "x", "g").collect()}
    by_g: dict[str, list[int]] = {}
    for g, x in data:
        by_g.setdefault(g, []).append(x)
    z2s = []
    for g, xs in by_g.items():
        s = sorted(xs)
        n = len(s)
        med2 = s[(n + 1) // 2 - 1] + s[n // 2]
        z2s += [(g, abs(2 * x - med2)) for x in xs]
    ranks = _mid2([v for _, v in z2s])
    for g in by_g:
        s2 = sum(ranks[v] ** 2 for gg, v in z2s if gg == g)
        s4 = sum(ranks[v] ** 4 for gg, v in z2s if gg == g)
        assert got[g]["n_i"] == len(by_g[g])
        assert got[g]["sum_sq_rank_x4"] == float(s2)
        assert got[g]["sum_quad_rank_x16"] == float(s4)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["b1", "b2", "b3", "b4"]),
            st.sampled_from(["t1", "t2", "t3"]),
            st.integers(0, 30),
        ),
        min_size=3,
        max_size=24,
        unique_by=lambda r: (r[0], r[1]),
    )
)
@settings(**_SETTINGS)
def test_quade_bit_exact_vs_python_replay(spark, data):
    from npm_mirror_spark.operators.stats import quade_cells

    df = spark.createDataFrame(data, "b string, t string, x long")
    out = {r["t"]: r for r in quade_cells(df, "b", "t", "x").collect()}

    k = len({t for _, t, _ in data})
    by_block: dict[str, list[tuple[str, int]]] = {}
    for b, t, x in data:
        by_block.setdefault(b, []).append((t, x))
    complete = {
        b: rows
        for b, rows in by_block.items()
        if len(rows) == k and len({t for t, _ in rows}) == k
    }
    if not complete:
        assert out == {}
        return
    rranks = _mid2(
        [max(x for _, x in rows) - min(x for _, x in rows)
         for rows in complete.values()]
    )
    s: dict[str, int] = {}
    ss: dict[str, int] = {}
    for b, rows in complete.items():
        mr = _mid2([x for _, x in rows])
        rng = max(x for _, x in rows) - min(x for _, x in rows)
        for t, x in rows:
            term = rranks[rng] * (mr[x] - (k + 1))
            s[t] = s.get(t, 0) + term
            ss[t] = ss.get(t, 0) + term * term
    for t in s:
        assert out[t]["n_blocks"] == len(complete)
        assert out[t]["s_x4"] == float(s[t])
        assert out[t]["ss_x16"] == float(ss[t])
    assert sum(s.values()) == 0


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 6)),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_cliff_delta_census_vs_double_loop(spark, data):
    from npm_mirror_spark.operators.stats import cliff_delta_cells

    df = spark.createDataFrame(data, "g string, x long")
    out = {
        (r["g_lo"], r["g_hi"]): r
        for r in cliff_delta_cells(df, "x", "g").collect()
    }
    by_g: dict[str, list[int]] = {}
    for g, x in data:
        by_g.setdefault(g, []).append(x)
    gs = sorted(by_g)
    for i, lo in enumerate(gs):
        for hi in gs[i + 1:]:
            gt = sum(1 for a in by_g[lo] for b in by_g[hi] if b > a)
            lt = sum(1 for a in by_g[lo] for b in by_g[hi] if b < a)
            ties = sum(1 for a in by_g[lo] for b in by_g[hi] if b == a)
            r = out[(lo, hi)]
            assert (r["gt"], r["lt"], r["ties"]) == (gt, lt, ties)
            assert r["delta"] == (float(gt) - float(lt)) / float(
                len(by_g[lo]) * len(by_g[hi])
            )


@given(st.lists(st.floats(0, 1e6, allow_nan=False), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_digit_pref_counts_and_zero_sum(spark, vals):
    from npm_mirror_spark.operators.checks import digit_preference_cells

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r for r in digit_preference_cells(df, "v").collect()}
    want: dict[int, int] = {}
    for v in vals:
        want[int(v) % 10] = want.get(int(v) % 10, 0) + 1
    n = len(vals)
    assert set(out) == set(range(10))  # zero-filled full axis
    for d in range(10):
        r = out[d]
        assert r["n"] == want.get(d, 0)
        assert r["dev_x10"] == 10 * want.get(d, 0) - n
        assert r["sq_dev_x100"] == (10 * want.get(d, 0) - n) ** 2
    # structural identity over the FULL axis
    assert sum(r["dev_x10"] for r in out.values()) == 0


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_hoeffding_cells_phi_convention(spark, pts):
    """q4 equals the literal phi-convention double loop on arbitrary
    tie-heavy grids; structural identity Sigma_cells c*q4 =
    Sigma_i Q4_i."""
    from npm_mirror_spark.operators.checks import hoeffding_d_cells

    df = spark.createDataFrame(pts, "x long, y long")
    out = {(r["x"], r["y"]): r for r in hoeffding_d_cells(df, "x", "y").collect()}

    def phi(a, b):
        return 2 if a < b else (1 if a == b else 0)

    for (a, b), r in out.items():
        assert r["q4"] == sum(phi(u, a) * phi(v, b) for u, v in pts)
    assert sum(r["c"] * r["q4"] for r in out.values()) == sum(
        phi(u, a) * phi(v, b) for a, b in pts for u, v in pts
    )
