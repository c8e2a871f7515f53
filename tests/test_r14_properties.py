"""Property-based bit-exactness adversaries for the r14 operator batch
(the test_r13_properties discipline): every reported float must be the
documented FIXED sequence of correctly-rounded IEEE ops on
exact-integer-valued operands, so a pure-Python replay of the same op
order must match BIT-FOR-BIT (==, not approx), and every reported
integer must equal the literal brute-force definition."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(st.lists(st.integers(-50, 50), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_jarque_bera_bit_exact_vs_brute(spark, xs):
    from npm_mirror_spark.operators.stats import moments_jb_cells

    df = spark.createDataFrame([(v,) for v in xs], "x long")
    r = moments_jb_cells(df, "x").collect()[0]
    n = len(xs)
    s1 = sum(xs)
    s2 = sum(v * v for v in xs)
    s3 = sum(v**3 for v in xs)
    s4 = sum(v**4 for v in xs)
    m2 = n * s2 - s1 * s1
    m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
    m4 = n**3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1**4
    assert (r["n_rows"], r["s1"]) == (n, float(s1))
    assert (r["m2_xn"], r["m3_xn2"], r["m4_xn3"]) == (
        float(m2), float(m3), float(m4),
    )
    if m2 > 0:
        m2d, m3d, m4d = float(m2), float(m3), float(m4)
        skew_sq = (m3d * m3d) / (m2d * m2d * m2d)
        kurt = m4d / (m2d * m2d)
        jb = float(n) / 6.0 * (
            (m3d * m3d) / (m2d * m2d * m2d)
            + (m4d / (m2d * m2d) - 3.0) * (m4d / (m2d * m2d) - 3.0) / 4.0
        )
        assert (r["skew_sq"], r["kurt_b2"], r["jb"]) == (skew_sq, kurt, jb)
    else:
        assert r["jb"] is None


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.booleans()),
        min_size=2,
        max_size=40,
    ).filter(lambda xs: any(a for _, a in xs) and any(not a for _, a in xs))
)
@settings(**_SETTINGS)
def test_kuiper_bit_exact_vs_brute(spark, rows):
    from npm_mirror_spark.operators.stats import kuiper_2samp_cells

    df = spark.createDataFrame(rows, "v long, a boolean")
    r = kuiper_2samp_cells(df, "v", F.col("a")).collect()[0]
    a = sorted(v for v, f in rows if f)
    b = sorted(v for v, f in rows if not f)
    n1, n2 = len(a), len(b)
    dp = dm = 0
    for v in sorted({v for v, _ in rows}):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        diff = ca * n2 - cb * n1
        dp = max(dp, diff)
        dm = max(dm, -diff)
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert (r["d_plus_num"], r["d_minus_num"]) == (float(dp), float(dm))
    assert r["v_num"] == float(dp + dm)
    assert r["v"] == float(dp + dm) / float(n1 * n2)


@given(
    st.lists(
        st.tuples(st.integers(-6, 6), st.booleans()),
        min_size=2,
        max_size=30,
    ).filter(lambda xs: any(a for _, a in xs) and any(not a for _, a in xs))
)
@settings(**_SETTINGS)
def test_hodges_lehmann_bit_exact_vs_brute(spark, rows):
    """hl2 replayed from the literal sorted pairwise-difference list:
    lower + upper median by index."""
    from npm_mirror_spark.operators.stats import hodges_lehmann_2samp

    df = spark.createDataFrame(rows, "v long, a boolean")
    r = hodges_lehmann_2samp(df, "v", F.col("a")).collect()[0]
    a = [v for v, f in rows if f]
    b = [v for v, f in rows if not f]
    diffs = sorted(x - y for x in a for y in b)
    n = len(diffs)
    hl2 = diffs[(n - 1) // 2] + diffs[n // 2]
    assert (r["n1"], r["n2"], r["n_pairs"]) == (
        len(a), len(b), float(len(a) * len(b)),
    )
    assert r["hl2_x"] == float(hl2)
    assert r["hl"] == float(hl2) / 2.0


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(1, 4)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_cuzick_bit_exact_vs_brute(spark, rows):
    """t_x2 replayed from literal doubled midranks; E, tie and score
    sums from the raw definition."""
    from npm_mirror_spark.operators.stats import cuzick_trend_cells

    df = spark.createDataFrame(rows, "v long, l long")
    r = cuzick_trend_cells(df, "v", "l").collect()[0]
    vals = sorted(v for v, _ in rows)
    mr2 = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        mr2[vals[i]] = i + 1 + j  # 2*below + ties + 1 == i + j + 1
        i = j
    n = len(rows)
    t2 = sum(l * mr2[v] for v, l in rows)
    sum_ln = sum(l for _, l in rows)
    sum_l2n = sum(l * l for _, l in rows)
    from collections import Counter

    cnt = Counter(vals)
    tcube = sum(t**3 - t for t in cnt.values())
    assert (r["n_rows"], r["k_groups"]) == (n, len({l for _, l in rows}))
    assert r["t_x2"] == float(t2)
    assert r["e_t_x2"] == float((n + 1) * sum_ln)
    assert (r["sum_ln"], r["sum_l2n"], r["tie_cube_sum"]) == (
        float(sum_ln), float(sum_l2n), float(tcube),
    )


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_blomqvist_bit_exact_vs_brute(spark, xy):
    from npm_mirror_spark.operators.checks import blomqvist_beta_cells

    df = spark.createDataFrame(xy, "x long, y long")
    r = blomqvist_beta_cells(df, "x", "y").collect()[0]

    def med2(vals):
        vals = sorted(vals)
        n = len(vals)
        return vals[(n - 1) // 2] + vals[n // 2]

    mx = med2([x for x, _ in xy])
    my = med2([y for _, y in xy])
    pp = pm = mp = mm = on = 0
    for x, y in xy:
        if 2 * x == mx or 2 * y == my:
            on += 1
        elif 2 * x > mx and 2 * y > my:
            pp += 1
        elif 2 * x > mx and 2 * y < my:
            pm += 1
        elif 2 * x < mx and 2 * y > my:
            mp += 1
        else:
            mm += 1
    assert (r["n_rows"], r["n_on"]) == (len(xy), on)
    assert (r["n_pp"], r["n_pm"], r["n_mp"], r["n_mm"]) == (pp, pm, mp, mm)
    assert (r["med2_x"], r["med2_y"]) == (float(mx), float(my))
    off = pp + pm + mp + mm
    if off:
        assert r["beta"] == float(pp + mm - pm - mp) / float(off)
    else:
        assert r["beta"] is None


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 2), st.integers(1, 3)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_krippendorff_bit_exact_vs_brute(spark, triples):
    """(unit, value, repeat): each unit capped at 3 ratings; alpha
    replayed through the coincidence-matrix definition with exact
    Fractions, then the SAME final IEEE expression."""
    from collections import defaultdict

    from npm_mirror_spark.operators.checks import krippendorff_alpha_cells

    per_unit = defaultdict(list)
    for u, v, rep in triples:
        for _ in range(rep):
            if len(per_unit[u]) < 3:
                per_unit[u].append(v)
    rows = [(f"u{u}", v) for u, vs in per_unit.items() for v in vs]
    df = spark.createDataFrame(rows, "u string, v string")
    r = krippendorff_alpha_cells(df, "u", "v").collect()[0]
    pairable = {u: vs for u, vs in per_unit.items() if len(vs) >= 2}
    n_dropped = sum(1 for vs in per_unit.values() if len(vs) < 2)
    nr = sum(len(vs) for vs in pairable.values())
    so2 = 0
    for vs in pairable.values():
        m = len(vs)
        disag = sum(
            1 for i in range(m) for j in range(m) if i != j and vs[i] != vs[j]
        )
        so2 += disag * (2 if m == 2 else 1)
    margins = defaultdict(int)
    for vs in pairable.values():
        for v in vs:
            margins[v] += 1
    msq = sum(c * c for c in margins.values())
    assert (r["n_units"], r["n_dropped"], r["n_ratings"]) == (
        len(pairable), n_dropped, nr,
    )
    assert (r["disagree_x2"], r["margin_sq_sum"]) == (float(so2), float(msq))
    den = 2 * (nr * nr - msq)
    if den > 0:
        assert r["alpha"] == 1.0 - float(nr - 1) * float(so2) / float(den)
    else:
        assert r["alpha"] is None


@given(
    st.lists(st.integers(0, 30), min_size=2, max_size=25, unique=True),
    st.integers(1, 9),
    st.data(),
)
@settings(**_SETTINGS)
def test_morans_bit_exact_vs_brute(spark, days, lag, data):
    from npm_mirror_spark.operators.temporal import morans_lag_cells

    xs = {d: data.draw(st.integers(-20, 20)) for d in days}
    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=d), x)
            for d, x in xs.items()]
    df = spark.createDataFrame(rows, "d date, x long")
    r = morans_lag_cells(df, "d", "x", lag_days=lag).collect()[0]
    n = len(days)
    s1 = sum(xs.values())
    s2 = sum(v * v for v in xs.values())
    m2 = n * s2 - s1 * s1
    pairs = [(d, d + lag) for d in days if d + lag in xs]
    pp = sum((n * xs[a] - s1) * (n * xs[b] - s1) for a, b in pairs)
    sd = sum((xs[b] - xs[a]) ** 2 for a, b in pairs)
    assert (r["n_days"], r["lag_days"], r["n_pairs"]) == (n, lag, len(pairs))
    assert (r["pair_prod_xn2"], r["sq_diff_sum"], r["m2_xn"]) == (
        float(pp), float(sd), float(m2),
    )
    if pairs and m2 > 0:
        assert r["morans_i"] == float(pp) / (float(len(pairs)) * float(m2))
        assert r["gearys_c"] == (
            float(n) * (float(n) - 1.0) * float(sd)
            / (2.0 * float(len(pairs)) * float(m2))
        )
    else:
        assert r["morans_i"] is None and r["gearys_c"] is None
