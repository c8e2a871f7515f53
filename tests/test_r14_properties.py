"""Property-based bit-exactness adversaries for the r14 operator batch
(the test_r13_properties discipline): every reported float must be the
documented FIXED sequence of correctly-rounded IEEE ops on
exact-integer-valued operands, so a pure-Python replay of the same op
order must match BIT-FOR-BIT (==, not approx), and every reported
integer must equal the literal brute-force definition."""

from __future__ import annotations

import pytest as _pytest

# slow tier (r15, r14 verdict item 1): algorithm re-derivation /
# brute-force sweep suite — guards development-time regressions,
# not per-round results.  Runs with --runslow / SPARK_GRAFT_SLOW_TESTS=1.
pytestmark = _pytest.mark.slow


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


# ===================== r16-staged wave (second r14 batch) ==============


def _mr2_map(vals):
    """value -> doubled midrank of a multiset."""
    vals = sorted(vals)
    out, i = {}, 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        out[vals[i]] = i + 1 + j
        i = j
    return out


def _q2_type2(vals, num, den):
    """Doubled type-2 quantile at p = num/den (1-based order stats)."""
    vals = sorted(vals)
    n = len(vals)
    j, r = (n * num) // den, (n * num) % den
    return vals[j - 1] + vals[j] if r == 0 else 2 * vals[j]


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from("ABC"),
                  st.integers(-5, 5)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_cronbach_bit_exact_vs_brute(spark, triples):
    from collections import defaultdict

    from npm_mirror_spark.operators.checks import cronbach_alpha_cells

    # one rating per (subject, item): keep the first
    seen = {}
    for u, i, v in triples:
        seen.setdefault((u, i), v)
    rows = [(u, i, v) for (u, i), v in seen.items()]
    df = spark.createDataFrame(rows, "u long, i string, v long")
    r = cronbach_alpha_cells(df, "u", "i", "v").collect()[0]
    items = sorted({i for _, i, _ in rows})
    k = len(items)
    by_u = defaultdict(dict)
    for u, i, v in rows:
        by_u[u][i] = v
    complete = {u: d for u, d in by_u.items() if len(d) == k}
    n = len(complete)
    ia = 0
    for i in items:
        vs = [complete[u][i] for u in complete]
        ia += n * sum(v * v for v in vs) - sum(vs) ** 2
    ts = [sum(d.values()) for d in complete.values()]
    at = n * sum(t * t for t in ts) - sum(ts) ** 2
    # k_items counts items among COMPLETE subjects (0 when none are
    # complete — alpha is NULL either way)
    assert (r["n_subjects"], r["k_items"]) == (n, k if complete else 0)
    assert r["n_dropped"] == len(by_u) - n
    assert (r["item_var_sum_xn2"], r["total_var_xn2"]) == (
        float(ia), float(at),
    )
    if k >= 2 and at > 0:
        assert r["alpha"] == float(k) / (float(k) - 1.0) * (
            1.0 - float(ia) / float(at)
        )
    else:
        assert r["alpha"] is None


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 2)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_gwet_ac1_bit_exact_vs_brute(spark, pairs):
    from collections import defaultdict

    from npm_mirror_spark.operators.checks import gwet_ac1_cells

    m = 2
    by_u = defaultdict(list)
    for u, v in pairs:
        if len(by_u[u]) < m:
            by_u[u].append(v)
    rows = [(f"u{u}", f"c{v}") for u, vs in by_u.items() for v in vs]
    df = spark.createDataFrame(rows, "u string, v string")
    r = gwet_ac1_cells(df, "u", "v", m).collect()[0]
    complete = {u: vs for u, vs in by_u.items() if len(vs) == m}
    n = len(complete)
    from collections import Counter

    agree = 0
    margins = Counter()
    for vs in complete.values():
        c = Counter(vs)
        agree += sum(x * (x - 1) for x in c.values())
        margins.update(vs)
    msq = sum(c * c for c in margins.values())
    kcat = len(margins)
    assert (r["n_units"], r["n_dropped"]) == (n, len(by_u) - n)
    assert (r["agree_pairs"], r["margin_sq_sum"]) == (float(agree), float(msq))
    if n > 0:
        pa = float(agree) / float(n * m * (m - 1))
        assert r["pa"] == pa
        if kcat >= 2:
            m2n2 = m * m * n * n
            pe = float(m2n2 - msq) / (float(kcat - 1) * float(m2n2))
            assert r["pe"] == pe
            if pe != 1.0:
                assert r["ac1"] == (pa - pe) / (1.0 - pe)


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_footrule_bit_exact_vs_brute(spark, xy):
    from npm_mirror_spark.operators.checks import footrule_cells

    df = spark.createDataFrame(xy, "x long, y long")
    r = footrule_cells(df, "x", "y").collect()[0]
    mx = _mr2_map([x for x, _ in xy])
    my = _mr2_map([y for _, y in xy])
    d1 = sum(abs(mx[x] - my[y]) for x, y in xy)
    d2 = sum((mx[x] - my[y]) ** 2 for x, y in xy)
    assert (r["n_rows"], r["footrule_x2"], r["sq_diff_x4"]) == (
        len(xy), float(d1), float(d2),
    )


@given(st.lists(st.integers(-30, 30), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_robust_shape_bit_exact_vs_brute(spark, xs):
    from npm_mirror_spark.operators.stats import robust_shape_cells

    df = spark.createDataFrame([(v,) for v in xs], "x long")
    r = robust_shape_cells(df, "x").collect()[0]
    es = {i: _q2_type2(xs, i, 8) for i in range(1, 8)}
    assert r["n_rows"] == len(xs)
    for i in range(1, 8):
        assert r[f"e{i}_2"] == float(es[i]), i
    iqr = es[6] - es[2]
    if iqr > 0:
        assert r["bowley"] == (
            (float(es[6]) + float(es[2]) - 2.0 * float(es[4]))
            / (float(es[6]) - float(es[2]))
        )
        assert r["moors"] == (
            ((float(es[7]) - float(es[5])) + (float(es[3]) - float(es[1])))
            / (float(es[6]) - float(es[2]))
        )
    else:
        assert r["bowley"] is None and r["moors"] is None


@given(st.lists(st.integers(-30, 30), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_tukey_fences_bit_exact_vs_brute(spark, xs):
    from npm_mirror_spark.operators.stats import tukey_fence_cells

    df = spark.createDataFrame([(v,) for v in xs], "x long")
    r = tukey_fence_cells(df, "x").collect()[0]
    q1, q2, q3 = (_q2_type2(xs, i, 4) for i in (1, 2, 3))
    lo4, hi4 = 5 * q1 - 3 * q3, 5 * q3 - 3 * q1
    nlo = sum(1 for v in xs if 4 * v < lo4)
    nhi = sum(1 for v in xs if 4 * v > hi4)
    assert (r["q1_2"], r["med2"], r["q3_2"]) == (
        float(q1), float(q2), float(q3),
    )
    assert (r["lo_fence_x4"], r["hi_fence_x4"]) == (float(lo4), float(hi4))
    assert (r["n_low_out"], r["n_high_out"]) == (nlo, nhi)
    assert r["out_rate"] == float(nlo + nhi) / float(len(xs))


@given(
    st.lists(
        st.tuples(st.integers(-9, 9), st.booleans()),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_trimmed_cells_bit_exact_vs_brute(spark, rows):
    from npm_mirror_spark.operators.stats import trimmed_cells

    df = spark.createDataFrame(rows, "v long, a boolean")
    out = {r["in_a"]: r for r in trimmed_cells(df, "v", F.col("a")).collect()}
    for flag in (True, False):
        vs = sorted(v for v, a in rows if a == flag)
        if not vs:
            assert flag not in out
            continue
        n = len(vs)
        g = n // 5
        trimmed = vs[g: n - g]
        win = [vs[g]] * g + trimmed + [vs[n - g - 1]] * g
        r = out[flag]
        assert (r["n_i"], r["g_trim"], r["trim_n"]) == (n, g, n - 2 * g)
        assert r["trim_sum"] == float(sum(trimmed))
        assert r["win_sum"] == float(sum(win))
        assert r["win_sumsq"] == float(sum(v * v for v in win))
        assert r["trim_mean"] == float(sum(trimmed)) / float(n - 2 * g)


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 2), st.integers(-9, 9)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_aligned_ranks_bit_exact_vs_brute(spark, triples):
    from collections import defaultdict

    from npm_mirror_spark.operators.stats import aligned_ranks_cells

    seen = {}
    for b, t, v in triples:
        seen.setdefault((b, t), v)
    rows = [(f"b{b}", f"t{t}", v) for (b, t), v in seen.items()]
    df = spark.createDataFrame(rows, "b string, t string, v long")
    got = {r["t"]: r for r in aligned_ranks_cells(df, "b", "t", "v").collect()}
    ts = sorted({t for _, t, _ in rows})
    k = len(ts)
    by_b = defaultdict(dict)
    for b, t, v in rows:
        by_b[b][t] = v
    complete = {b: d for b, d in by_b.items() if len(d) == k}
    if not complete:
        assert got == {}
        return
    aligned = {}
    for b, d in complete.items():
        bs = sum(d.values())
        for t, v in d.items():
            aligned[(b, t)] = k * v - bs
    mr2 = _mr2_map(list(aligned.values()))
    rsum = defaultdict(int)
    for (b, t), a in aligned.items():
        rsum[t] += mr2[a]
    tsq = sum(mr2[a] ** 2 for a in aligned.values())
    bsum = defaultdict(int)
    for (b, t), a in aligned.items():
        bsum[b] += mr2[a]
    bsq = sum(v * v for v in bsum.values())
    for t in ts:
        r = got[t]
        assert (r["n_blocks"], r["k_treatments"]) == (len(complete), k)
        assert r["r_x2"] == float(rsum[t])
        assert r["total_sq_x4"] == float(tsq)
        assert r["block_sq_sum_x4"] == float(bsq)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3), st.integers(0, 2)),
        min_size=2,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_partial_tau_bit_exact_vs_brute(spark, xyz):
    import math

    from npm_mirror_spark.operators.checks import partial_tau_cells

    df = spark.createDataFrame(xyz, "x long, y long, z long")
    r = partial_tau_cells(df, "x", "y", "z").collect()[0]

    def tau_b(pairs):
        n = len(pairs)
        c = d = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                (a1, b1), (a2, b2) = pairs[i], pairs[j]
                if a1 == a2 and b1 == b2:
                    continue
                elif a1 == a2:
                    tx += 1
                elif b1 == b2:
                    ty += 1
                elif (a1 < a2) == (b1 < b2):
                    c += 1
                else:
                    d += 1
        p = n * (n - 1) // 2
        # tied_x counts ALL pairs tied on x (incl. both-tied)
        txall = p - c - d - ty
        tyall = p - c - d - tx
        denx, deny = p - txall, p - tyall
        if denx <= 0 or deny <= 0:
            return None
        return float(c - d) / math.sqrt(float(denx * deny))

    txy = tau_b([(x, y) for x, y, _ in xyz])
    txz = tau_b([(x, z) for x, _, z in xyz])
    tyz = tau_b([(y, z) for _, y, z in xyz])
    assert r["tau_xy"] == txy and r["tau_xz"] == txz and r["tau_yz"] == tyz
    if None not in (txy, txz, tyz):
        rad = (1.0 - txz * txz) * (1.0 - tyz * tyz)
        if rad > 0:
            assert r["tau_partial"] == (txy - txz * tyz) / math.sqrt(rad)
        else:
            assert r["tau_partial"] is None
    else:
        assert r["tau_partial"] is None


@given(
    st.lists(
        st.tuples(st.integers(-15, 15), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_shift_function_bit_exact_vs_brute(spark, rows):
    from npm_mirror_spark.operators.stats import shift_function_cells

    df = spark.createDataFrame(rows, "v long, a boolean")
    got = {r["octile"]: r for r in
           shift_function_cells(df, "v", F.col("a")).collect()}
    assert sorted(got) == list(range(1, 8))
    for flag, col in ((True, "qa_2"), (False, "qb_2")):
        vs = sorted(v for v, a in rows if a == flag)
        for i in range(1, 8):
            if not vs:
                assert got[i][col] is None
                continue
            assert got[i][col] == float(_q2_type2(vs, i, 8)), (flag, i)
    a_vals = sorted(v for v, a in rows if a)
    b_vals = sorted(v for v, a in rows if not a)
    for i in range(1, 8):
        if a_vals and b_vals:
            assert got[i]["diff_x2"] == float(
                _q2_type2(a_vals, i, 8) - _q2_type2(b_vals, i, 8)
            )
        else:
            assert got[i]["diff_x2"] is None
