"""Property-based bit-exactness adversaries for the r13 operator batch
(the test_r12_properties discipline): every reported float must be the
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
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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
        st.tuples(st.integers(0, 4), st.integers(0, 3)),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_ordinal_assoc_bit_exact_vs_brute(spark, xy):
    """All five coefficients replayed from the literal O(n^2) pair
    loop in the documented op order (tau_b through math.sqrt — the
    same correctly-rounded IEEE sqrt)."""
    from npm_mirror_spark.operators.checks import ordinal_assoc_cells

    df = spark.createDataFrame(xy, "x long, y long")
    r = ordinal_assoc_cells(df, "x", "y").collect()[0]
    n = len(xy)
    c = d = tx = ty = txy = 0
    for i in range(n):
        for j in range(i + 1, n):
            (xi, yi), (xj, yj) = xy[i], xy[j]
            if xi == xj and yi == yj:
                txy += 1
            elif xi == xj:
                tx += 1
            elif yi == yj:
                ty += 1
            elif (xi < xj) == (yi < yj):
                c += 1
            else:
                d += 1
    p = n * (n - 1) // 2
    assert (r["concordant"], r["discordant"]) == (c, d)
    assert (r["tied_x_only"], r["tied_y_only"], r["tied_xy"]) == (tx, ty, txy)
    assert r["pairs_total"] == p
    s = c - d
    txi, tyi = tx + txy, ty + txy  # pairs tied on x / on y (incl both)
    assert r["gamma"] == (float(s) / float(c + d) if c + d > 0 else None)
    assert r["somers_dyx"] == (
        float(s) / float(p - txi) if p - txi > 0 else None
    )
    assert r["somers_dxy"] == (
        float(s) / float(p - tyi) if p - tyi > 0 else None
    )
    if p - txi > 0 and p - tyi > 0:
        assert r["tau_b"] == float(s) / math.sqrt(float((p - txi) * (p - tyi)))
    else:
        assert r["tau_b"] is None
    dx = len({x for x, _ in xy})
    dy = len({y for _, y in xy})
    m = min(dx, dy)
    if m > 1:
        assert r["tau_c"] == float(2 * m * s) / float(n * n * (m - 1))
    else:
        assert r["tau_c"] is None


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 2), st.integers(0, 2),
                  st.integers(0, 2)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_fleiss_bit_exact_vs_brute(spark, panels):
    """kappa replayed from the exact-integer restatement on literal
    per-subject category counts (3 raters per subject)."""
    from npm_mirror_spark.operators.checks import fleiss_kappa_cells

    rows = [
        (f"s{sid}", f"c{c}") for sid, a, b, c2 in panels for c in (a, b, c2)
    ]
    df = spark.createDataFrame(rows, "s string, k string")
    r = fleiss_kappa_cells(df, "s", "k", 3).collect()[0]
    nsub = len(panels)
    q = 0
    cj: Counter = Counter()
    for sid, a, b, c2 in panels:
        nij = Counter((a, b, c2))
        q += sum(v * v for v in nij.values())
        cj.update(nij)
    s = sum(v * v for v in cj.values())
    t = nsub * 3
    assert (r["n_subjects"], r["q_sum"], r["s_sum"]) == (nsub, q, s)
    assert r["p_bar"] == float(q - t) / float(t * 2)
    assert r["p_e"] == float(s) / float(t * t)
    kden = 2 * (t * t - s)
    if kden != 0:
        assert r["kappa"] == float((q - t) * t - s * 2) / float(kden)
    else:
        assert r["kappa"] is None


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_weighted_kappa_bit_exact_vs_brute(spark, ab):
    from npm_mirror_spark.operators.checks import weighted_kappa_cells

    df = spark.createDataFrame(ab, "a long, b long")
    r = weighted_kappa_cells(df, "a", "b").collect()[0]
    n = len(ab)
    d_o = sum(abs(a - b) for a, b in ab)
    rm, cm = Counter(a for a, _ in ab), Counter(b for _, b in ab)
    d_e = sum(
        abs(i - j) * rm[i] * cm[j] for i in rm for j in cm
    )
    assert (r["n"], r["d_o"], r["d_e_num"]) == (n, d_o, d_e)
    if d_e > 0:
        assert r["kappa_w"] == 1.0 - float(d_o * n) / float(d_e)
    else:
        assert r["kappa_w"] is None


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_bowker_bit_exact_vs_brute(spark, ab):
    from npm_mirror_spark.operators.checks import bowker_cells

    df = spark.createDataFrame(ab, "a long, b long")
    got = {
        (r["cat_lo"], r["cat_hi"]): r for r in bowker_cells(df, "a", "b").collect()
    }
    cells = Counter((a, b) for a, b in ab if a != b)
    pairs = {(min(a, b), max(a, b)) for a, b in cells}
    assert set(got) == pairs
    for lo, hi in pairs:
        nf, nb = cells.get((lo, hi), 0), cells.get((hi, lo), 0)
        r = got[(lo, hi)]
        assert (r["n_lo_hi"], r["n_hi_lo"]) == (nf, nb)
        diff = float(nf - nb)
        assert r["chi_term"] == diff * diff / float(nf + nb)


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_signed_rank_bit_exact_vs_brute(spark, xy):
    from npm_mirror_spark.operators.stats import signed_rank_cells

    df = spark.createDataFrame(xy, "x long, y long")
    r = signed_rank_cells(df, "x", "y").collect()[0]
    ds = [x - y for x, y in xy]
    nz = [d for d in ds if d != 0]
    mid2 = _mid2([abs(d) for d in nz])
    wp = sum(mid2[abs(d)] for d in nz if d > 0)
    wm = sum(mid2[abs(d)] for d in nz if d < 0)
    assert (r["n_pairs"], r["n_zero"], r["n_nonzero"]) == (
        len(ds),
        len(ds) - len(nz),
        len(nz),
    )
    assert (r["w_plus_x2"], r["w_minus_x2"]) == (wp, wm)
    if nz:
        assert r["rank_biserial"] == float(wp - wm) / float(
            len(nz) * (len(nz) + 1)
        )
    else:
        assert r["rank_biserial"] is None


@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_cvm2_bit_exact_vs_brute(spark, va):
    from npm_mirror_spark.operators.stats import cvm2_cells

    df = spark.createDataFrame(va, "v long, a boolean")
    out = cvm2_cells(df, "v", F.col("a")).collect()
    n1 = sum(1 for _, a in va if a)
    n2 = len(va) - n1
    vals = sorted({v for v, _ in va})
    assert [r["v"] for r in out] == vals
    ca = cb = 0
    for r, v in zip(out, vals):
        a = sum(1 for vv, aa in va if vv == v and aa)
        b = sum(1 for vv, aa in va if vv == v and not aa)
        ca, cb = ca + a, cb + b
        assert (r["cnt_a"], r["cnt_b"], r["cum_a"], r["cum_b"]) == (a, b, ca, cb)
        assert r["diff_num"] == ca * n2 - cb * n1
        assert r["w"] == a + b


@given(st.lists(st.integers(0, 8), min_size=2, max_size=25))
@settings(**_SETTINGS)
def test_cox_stuart_bit_exact_vs_brute(spark, series):
    from npm_mirror_spark.operators.temporal import cox_stuart_cells

    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), x)
            for i, x in enumerate(series)]
    df = spark.createDataFrame(rows, "d date, x long")
    r = cox_stuart_cells(df, "d", "x").collect()[0]
    n = len(series)
    h = n // 2
    shift = n - h
    pairs = [(series[i], series[i + shift]) for i in range(h)]
    assert (r["n_days"], r["n_pairs"]) == (n, h)
    assert r["n_pos"] == sum(1 for a, b in pairs if b > a)
    assert r["n_neg"] == sum(1 for a, b in pairs if b < a)
    assert r["n_tie"] == sum(1 for a, b in pairs if b == a)
    if h:
        assert r["pos_share"] == float(r["n_pos"]) / float(h)


@given(st.lists(st.integers(0, 6), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_seasonal_mk_bit_exact_vs_brute(spark, series):
    from npm_mirror_spark.operators.temporal import seasonal_mk_cells

    base = dt.date(2024, 1, 1)
    rows = [(base + dt.timedelta(days=i), x) for i, x in enumerate(series)]
    df = spark.createDataFrame(rows, "d date, x long")
    got = {r["season"]: r for r in seasonal_mk_cells(df, "d", "x").collect()}
    by_season: dict[int, list[int]] = {}
    for (day, x) in rows:
        s = day.isoweekday() % 7 + 1  # Spark dayofweek: Sunday = 1
        by_season.setdefault(s, []).append(x)
    assert set(got) == set(by_season)
    for s, vals in by_season.items():
        conc = disc = ties = 0
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                if vals[j] > vals[i]:
                    conc += 1
                elif vals[j] < vals[i]:
                    disc += 1
                else:
                    ties += 1
        r = got[s]
        assert (r["n_days"], r["n_pairs"]) == (len(vals), conc + disc + ties)
        assert (r["n_concordant"], r["n_discordant"], r["n_ties"]) == (
            conc,
            disc,
            ties,
        )
        assert r["s_stat"] == conc - disc


@given(st.lists(st.integers(0, 20), min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_buishand_bit_exact_vs_brute(spark, series):
    from npm_mirror_spark.operators.temporal import buishand_cells

    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), x)
            for i, x in enumerate(series)]
    df = spark.createDataFrame(rows, "d date, x long")
    out = buishand_cells(df, "d", "x").collect()
    n, total = len(series), sum(series)
    p = 0
    for r, x in zip(out, series):
        p += x
        assert (r["x"], r["p_k"], r["n_days"], r["total"]) == (x, p, n, total)
        assert r["n_sk_scaled"] == n * p - r["k"] * total
    assert out[-1]["n_sk_scaled"] == 0.0


@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(0, 1)),
        min_size=2,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_nelson_aalen_bit_exact_vs_brute(spark, te):
    from npm_mirror_spark.operators.temporal import nelson_aalen_cells

    data = [("g", t, e) for t, e in te]
    df = spark.createDataFrame(data, "g string, t int, e int")
    got = {r["t"]: r for r in nelson_aalen_cells(df, "g", "t", "e").collect()}
    for t0 in sorted({t for t, _ in te}):
        d = sum(1 for t, e in te if t == t0 and e == 1)
        if d == 0:
            assert t0 not in got
            continue
        nr = sum(1 for t, _ in te if t >= t0)
        r = got[t0]
        assert (r["n_risk"], r["d"]) == (nr, d)
        assert r["na_term"] == float(d) / float(nr)
        assert r["var_term"] == float(d) * (float(nr) - float(d)) / (
            float(nr) * float(nr) * float(nr)
        )


@given(
    st.lists(
        st.tuples(st.integers(1, 10), st.integers(0, 1), st.booleans()),
        min_size=2,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_gehan_bit_exact_vs_brute(spark, tea):
    """w_o_minus_e_a is the EXACT integer n*d_a - n_a*d; w2_var_term
    replays the one documented division."""
    from npm_mirror_spark.operators.temporal import gehan_cells

    data = [("g", t, e, bool(a)) for t, e, a in tea]
    df = spark.createDataFrame(data, "g string, t int, e int, a boolean")
    got = {
        r["t"]: r
        for r in gehan_cells(df, "g", "t", "e", F.col("a")).collect()
    }
    for t0 in sorted({t for t, _, _ in tea}):
        d = sum(1 for t, e, _ in tea if t == t0 and e == 1)
        if d == 0:
            assert t0 not in got
            continue
        nr = sum(1 for t, _, _ in tea if t >= t0)
        nra = sum(1 for t, _, a in tea if t >= t0 and a)
        da = sum(1 for t, e, a in tea if t == t0 and e == 1 and a)
        r = got[t0]
        assert r["w_o_minus_e_a"] == nr * da - nra * d
        if nr > 1:
            assert r["w2_var_term"] == float(
                d * nra * (nr - nra) * (nr - d)
            ) / float(nr - 1)
        else:
            assert r["w2_var_term"] == 0.0


@given(st.lists(st.sampled_from("ab cd e".split() + ["ff"]), max_size=30))
@settings(**_SETTINGS)
def test_yule_k_bit_exact_vs_brute(spark, words):
    from npm_mirror_spark.operators.text import yule_k_cells

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    r = yule_k_cells(df, "text").collect()[0]
    tf = Counter(words)
    n, c2 = sum(tf.values()), sum(c * c for c in tf.values())
    assert (r["n_tokens"], r["s_types"], r["sum_c2"]) == (n, len(tf), c2)
    assert r["f1"] == sum(1 for c in tf.values() if c == 1)
    assert r["f2"] == sum(1 for c in tf.values() if c == 2)
    if n > 0:
        assert r["yule_k"] == float(10000 * (c2 - n)) / float(n * n)
    if n > 1:
        assert r["simpson_d"] == float(c2 - n) / float(n * (n - 1))


@given(st.lists(st.integers(0, 5), min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_turning_point_bit_exact_vs_brute(spark, series):
    from npm_mirror_spark.operators.temporal import turning_point_cells

    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), x)
            for i, x in enumerate(series)]
    df = spark.createDataFrame(rows, "d date, x long")
    r = turning_point_cells(df, "d", "x").collect()[0]
    n = len(series)
    turns = sum(
        1
        for i in range(1, n - 1)
        if (series[i - 1] < series[i] > series[i + 1])
        or (series[i - 1] > series[i] < series[i + 1])
    )
    assert (r["n_days"], r["n_interior"], r["n_turning"]) == (
        n,
        max(0, n - 2),
        turns,
    )
    if n >= 2:
        assert r["expected_turning"] == 2.0 * float(n - 2) / 3.0


@given(st.lists(st.integers(0, 8), min_size=2, max_size=25))
@settings(**_SETTINGS)
def test_bartels_rvn_bit_exact_vs_brute(spark, series):
    from npm_mirror_spark.operators.temporal import bartels_rvn_cells

    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), x)
            for i, x in enumerate(series)]
    df = spark.createDataFrame(rows, "d date, x long")
    r = bartels_rvn_cells(df, "d", "x").collect()[0]
    mid2 = _mid2(series)
    r2 = [mid2[x] for x in series]
    n = len(series)
    nm = sum((r2[i] - r2[i + 1]) ** 2 for i in range(n - 1))
    dd = sum((v - (n + 1)) ** 2 for v in r2)
    assert (r["n_days"], r["nm_x4"], r["d_x4"]) == (n, nm, dd)
    if dd > 0:
        assert r["rvn"] == float(nm) / float(dd)
    else:
        assert r["rvn"] is None


@given(
    st.integers(2, 5),
    st.integers(2, 6),
    st.data(),
)
@settings(**_SETTINGS)
def test_kendall_w_bit_exact_vs_brute(spark, k, nb, data):
    """s_x4, tie_sum and W replayed from literal within-block doubled
    midranks on complete random designs."""
    from npm_mirror_spark.operators.stats import kendall_w_cells

    vals = [
        [data.draw(st.integers(0, 4)) for _ in range(k)] for _ in range(nb)
    ]
    rows = [
        (f"b{i}", f"t{j}", vals[i][j]) for i in range(nb) for j in range(k)
    ]
    df = spark.createDataFrame(rows, "b string, t string, x long")
    r = kendall_w_cells(df, "b", "t", "x").collect()[0]
    r2sums = [0] * k
    tie_sum = 0
    for block in vals:
        mid2 = _mid2(block)
        for j, x in enumerate(block):
            r2sums[j] += mid2[x]
        cnt = Counter(block)
        tie_sum += sum(c**3 - c for c in cnt.values())
    s_x4 = sum((r2 - nb * (k + 1)) ** 2 for r2 in r2sums)
    assert (r["n_blocks"], r["k_treatments"]) == (nb, k)
    assert (r["s_x4"], r["tie_sum"]) == (s_x4, tie_sum)
    den = nb * nb * (k**3 - k) - nb * tie_sum
    if den > 0:
        assert r["w"] == float(3 * s_x4) / float(den)
    else:
        assert r["w"] is None


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_icc_bit_exact_vs_brute(spark, panels):
    from npm_mirror_spark.operators.checks import icc_cells

    rows = [
        (f"s{i}", v) for i, triple in enumerate(panels) for v in triple
    ]
    df = spark.createDataFrame(rows, "s string, x long")
    r = icc_cells(df, "s", "x", 3).collect()[0]
    n = len(panels)
    si = [sum(t) for t in panels]
    qi = [sum(v * v for v in t) for t in panels]
    s, s2, q = sum(si), sum(v * v for v in si), sum(qi)
    ssb = n * s2 - s * s
    ssw = 3 * q - s2
    assert (r["n_subjects"], r["ssb_xnk"], r["ssw_xk"]) == (n, ssb, ssw)
    num, den = ssb * 2 - ssw * (n - 1), ssb * 2 + 2 * (n - 1) * ssw
    if den != 0:
        assert r["icc"] == float(num) / float(den)
    else:
        assert r["icc"] is None


@given(st.lists(st.integers(0, 10), min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_dixon_bit_exact_vs_brute(spark, series):
    from npm_mirror_spark.operators.stats import dixon_q_cells

    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), x)
            for i, x in enumerate(series)]
    df = spark.createDataFrame(rows, "d date, x long")
    r = dixon_q_cells(df, "d", "x").collect()[0]
    s = sorted(series)
    x_min2 = s[1] if len(s) > 1 else None
    x_max2 = s[-2] if len(s) > 1 else None
    assert (r["x_min"], r["x_max"], r["n_days"]) == (s[0], s[-1], len(s))
    if len(s) > 1:
        assert (r["x_min2"], r["x_max2"]) == (x_min2, x_max2)
    if s[-1] > s[0]:
        assert r["q_low"] == float(x_min2 - s[0]) / float(s[-1] - s[0])
        assert r["q_high"] == float(s[-1] - x_max2) / float(s[-1] - s[0])
    else:
        assert r["q_low"] is None and r["q_high"] is None


@given(st.lists(st.integers(0, 12), min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_grubbs_bit_exact_vs_brute(spark, series):
    from npm_mirror_spark.operators.stats import grubbs_cells

    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), x)
            for i, x in enumerate(series)]
    df = spark.createDataFrame(rows, "d date, x long")
    r = grubbs_cells(df, "d", "x").collect()[0]
    n, t = len(series), sum(series)
    devs = [n * x - t for x in series]
    best = max(range(n), key=lambda i: (abs(devs[i]), -i))
    assert (r["n_days"], r["total"], r["sum_sq"]) == (
        n, t, sum(x * x for x in series)
    )
    assert r["max_dev_xn"] == abs(devs[best])
    assert r["at_day"] == dt.date(2024, 1, 1) + dt.timedelta(days=best)
    assert r["dev_sign"] == (1 if devs[best] > 0 else -1 if devs[best] < 0 else 0)


@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_rank_scale_bit_exact_vs_brute(spark, va):
    from npm_mirror_spark.operators.stats import rank_scale_cells

    df = spark.createDataFrame(va, "v long, a boolean")
    r = rank_scale_cells(df, "v", F.col("a")).collect()[0]
    mid2 = _mid2([v for v, _ in va])
    np1 = len(va) + 1
    a_vals = [v for v, a in va if a]
    assert (r["n1"], r["n2"]) == (len(a_vals), len(va) - len(a_vals))
    assert r["r_a_x2"] == sum(mid2[v] for v in a_vals)
    assert r["ab_a_x2"] == sum(
        np1 - abs(mid2[v] - np1) for v in a_vals
    )
    assert r["u_a_x4"] == sum(mid2[v] ** 2 for v in a_vals)
    assert r["v_a_x4"] == sum((2 * np1 - mid2[v]) ** 2 for v in a_vals)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_gk_lambda_bit_exact_vs_brute(spark, xy):
    from npm_mirror_spark.operators.checks import gk_lambda

    df = spark.createDataFrame(xy, "x long, y long")
    r = gk_lambda(df, "x", "y").collect()[0]
    cells = Counter(xy)
    n = len(xy)
    smx = sum(
        max(c for (xx, _), c in cells.items() if xx == x0)
        for x0 in {x for x, _ in xy}
    )
    smy = sum(
        max(c for (_, yy), c in cells.items() if yy == y0)
        for y0 in {y for _, y in xy}
    )
    ymarg = Counter(y for _, y in xy)
    xmarg = Counter(x for x, _ in xy)
    mny, mnx = max(ymarg.values()), max(xmarg.values())
    assert (r["n_rows"], r["sum_max_y_given_x"], r["max_y_margin"]) == (
        n, smx, mny
    )
    assert (r["sum_max_x_given_y"], r["max_x_margin"]) == (smy, mnx)
    assert r["lambda_yx"] == (
        float(smx - mny) / float(n - mny) if n - mny > 0 else None
    )
    assert r["lambda_xy"] == (
        float(smy - mnx) / float(n - mnx) if n - mnx > 0 else None
    )
