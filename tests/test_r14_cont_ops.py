"""r14 continuation operator batch: unit tests with hand-computed
expectations plus bit-exactness property adversaries for the eight
operators staged into the r18 window tail (staging_r18.py) — records
trend, longest-run census, Goodman-Kruskal tau, Hartley Fmax,
t-closeness, Lin CCC, Hoover index, Adjusted Rand.  Oracle parity for
the whole staged batch runs in the staged-sweep test at the bottom
(the test_r14_ops.py staged-r16/r17 discipline)."""

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

D = dt.date


# --------------------------------------------------- foster_stuart_cells


def test_foster_stuart_hand_example(spark):
    """[3,1,4,1,5]: upper records at 4 and 5 (U=2); lower record at the
    first 1 only (the second 1 ties the running min, strict) -> L=1."""
    from npm_mirror_spark.operators.stats import foster_stuart_cells

    rows = [("A", D(2024, 1, i + 1), v) for i, v in enumerate([3, 1, 4, 1, 5])]
    df = spark.createDataFrame(rows, "g string, d date, x long")
    r = foster_stuart_cells(df, "g", "d", "x").collect()[0]
    assert (r["n_days"], r["upper_records"], r["lower_records"]) == (5, 2, 1)
    assert (r["d_stat"], r["s_stat"]) == (1, 3)


def test_foster_stuart_monotone_and_constant(spark):
    """Strictly increasing: every day after the first is an upper
    record; constant series: no records at all (strict comparisons)."""
    from npm_mirror_spark.operators.stats import foster_stuart_cells

    inc = [("I", D(2024, 1, i + 1), i) for i in range(6)]
    const = [("C", D(2024, 1, i + 1), 7) for i in range(4)]
    df = spark.createDataFrame(inc + const, "g string, d date, x long")
    out = {r["g"]: r for r in foster_stuart_cells(df, "g", "d", "x").collect()}
    assert (out["I"]["upper_records"], out["I"]["lower_records"]) == (5, 0)
    assert out["I"]["d_stat"] == 5
    assert (out["C"]["upper_records"], out["C"]["lower_records"]) == (0, 0)


@given(st.lists(st.integers(0, 6), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_foster_stuart_brute(spark, xs):
    from npm_mirror_spark.operators.stats import foster_stuart_cells

    rows = [("G", D(2020, 1, 1) + dt.timedelta(days=i), v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, d date, x long")
    r = foster_stuart_cells(df, "g", "d", "x").collect()[0]
    u = sum(1 for i in range(1, len(xs)) if xs[i] > max(xs[:i]))
    lo = sum(1 for i in range(1, len(xs)) if xs[i] < min(xs[:i]))
    assert (r["n_days"], r["upper_records"], r["lower_records"]) == (
        len(xs), u, lo,
    )
    assert (r["d_stat"], r["s_stat"]) == (u - lo, u + lo)


# ----------------------------------------------------- longest_run_cells


def test_longest_run_hand_example(spark):
    """[1..6]: lower median = 3 (rank ceil(6/2)); dropping it leaves
    signs [-,-,+,+,+] -> runs of 2 and 3."""
    from npm_mirror_spark.operators.stats import longest_run_cells

    rows = [("A", D(2024, 1, i + 1), v) for i, v in enumerate([1, 2, 3, 4, 5, 6])]
    df = spark.createDataFrame(rows, "g string, d date, x long")
    r = longest_run_cells(df, "g", "d", "x").collect()[0]
    assert (r["n_signed"], r["n_runs"]) == (5, 2)
    assert (r["longest_run"], r["longest_plus"], r["longest_minus"]) == (3, 3, 2)


def test_longest_run_alternating_and_one_sided(spark):
    """Alternating off-median values give all runs of length 1; a group
    whose every off-median day is above the median has longest_minus=0."""
    from npm_mirror_spark.operators.stats import longest_run_cells

    alt = [("A", D(2024, 1, i + 1), v) for i, v in enumerate([0, 9, 0, 9, 0, 9, 5])]
    up = [("U", D(2024, 1, i + 1), v) for i, v in enumerate([1, 1, 8, 9])]
    df = spark.createDataFrame(alt + up, "g string, d date, x long")
    out = {r["g"]: r for r in longest_run_cells(df, "g", "d", "x").collect()}
    # A: median is lower median of [0,0,0,5,9,9,9] -> 5? rank ceil(7/2)=4
    # -> 4th smallest = 5; off-median: three 0s (minus) and three 9s
    # (plus) alternating by day -> longest run 1 on both sides.
    assert (out["A"]["longest_plus"], out["A"]["longest_minus"]) == (1, 1)
    assert out["A"]["n_runs"] == 6
    # U: median = lower median of [1,1,8,9] -> rank 2 -> 1; both 1s are
    # dropped as exact-median days; 8,9 are consecutive plus days.
    assert (out["U"]["n_signed"], out["U"]["longest_plus"]) == (2, 2)
    assert out["U"]["longest_minus"] == 0


@given(st.lists(st.integers(0, 4), min_size=2, max_size=30))
@settings(**_SETTINGS)
def test_longest_run_brute(spark, xs):
    from npm_mirror_spark.operators.stats import longest_run_cells

    rows = [("G", D(2020, 1, 1) + dt.timedelta(days=i), v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, d date, x long")
    got = longest_run_cells(df, "g", "d", "x").collect()
    sx = sorted(xs)
    med = sx[(len(xs) + 1) // 2 - 1]
    signs = [1 if v > med else -1 for v in xs if v != med]
    if not signs:
        assert got == []
        return
    runs: list[tuple[int, int]] = []
    for s in signs:
        if runs and runs[-1][0] == s:
            runs[-1] = (s, runs[-1][1] + 1)
        else:
            runs.append((s, 1))
    r = got[0]
    assert (r["n_signed"], r["n_runs"]) == (len(signs), len(runs))
    assert r["longest_run"] == max(n for _, n in runs)
    assert r["longest_plus"] == max([n for s, n in runs if s == 1], default=0)
    assert r["longest_minus"] == max([n for s, n in runs if s == -1], default=0)


# --------------------------------------------------------- gk_tau_cells


def test_gk_tau_hand_example(spark):
    """2x2 with a/u=2, a/v=1, b/v=3: q_a=5, q_b=9, col sums (2,4) ->
    sum_col_sq=20; pre_terms 10 and 18; consumer tau = (28-20)/(36-20)
    = 0.5."""
    from npm_mirror_spark.operators.stats import gk_tau_cells

    rows = [("a", "u")] * 2 + [("a", "v")] + [("b", "v")] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    out = {r["x"]: r for r in gk_tau_cells(df, "x", "y").collect()}
    assert (out["a"]["n_x"], out["a"]["q_x"]) == (3, 5.0)
    assert (out["b"]["n_x"], out["b"]["q_x"]) == (3, 9.0)
    assert out["a"]["sum_col_sq"] == 20.0 and out["a"]["n_total"] == 6.0
    assert (out["a"]["pre_term"], out["b"]["pre_term"]) == (10.0, 18.0)
    tau = (10.0 + 18.0 - 20.0) / (36.0 - 20.0)
    assert tau == 0.5


def test_gk_tau_perfect_and_independent(spark):
    """Perfect prediction (x determines y): consumer tau = 1.  A
    single x category: tau undefined (denominator 0 when y marginals
    concentrate) stays a consumer concern; cells remain exact."""
    from npm_mirror_spark.operators.stats import gk_tau_cells

    rows = [("a", "u")] * 3 + [("b", "v")] * 2
    df = spark.createDataFrame(rows, "x string, y string")
    out = gk_tau_cells(df, "x", "y").collect()
    n = 5.0
    sum_c2 = 9.0 + 4.0
    terms = sum(r["pre_term"] for r in out)
    assert (terms - sum_c2) / (n * n - sum_c2) == 1.0


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_gk_tau_bit_exact_vs_brute(spark, pairs):
    from npm_mirror_spark.operators.stats import gk_tau_cells

    df = spark.createDataFrame(pairs, "x long, y long")
    out = gk_tau_cells(df, "x", "y").collect()
    from collections import Counter

    cont = Counter(pairs)
    nx = Counter(x for x, _ in pairs)
    ny = Counter(y for _, y in pairs)
    n = float(len(pairs))
    sum_c2 = float(sum(v * v for v in ny.values()))
    assert len(out) == len(nx)
    for r in out:
        x = r["x"]
        qx = float(sum(c * c for (xx, _), c in cont.items() if xx == x))
        assert (r["n_x"], r["q_x"]) == (nx[x], qx)
        assert (r["n_total"], r["sum_col_sq"]) == (n, sum_c2)
        assert r["pre_term"] == (n * qx) / float(nx[x])


# ------------------------------------------------- variance_ratio_cells


def test_variance_ratio_hand_example(spark):
    """A=[1.00,3.00] cents var 20000; B=[1.00,2.00] cents var 5000 ->
    fmax = 4 on every row."""
    from npm_mirror_spark.operators.stats import variance_ratio_cells

    rows = [("A", 1.0), ("A", 3.0), ("B", 1.0), ("B", 2.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in variance_ratio_cells(df, "g", "v").collect()}
    assert (out["A"]["s2"], out["B"]["s2"]) == (20000.0, 5000.0)
    for r in out.values():
        assert (r["s2_max"], r["s2_min"], r["fmax"]) == (20000.0, 5000.0, 4.0)


def test_variance_ratio_degenerate_groups(spark):
    """A singleton group has NULL s2 and is ignored by the max/min
    fold; a zero-variance group drives s2_min to 0 -> fmax NULL."""
    from npm_mirror_spark.operators.stats import variance_ratio_cells

    rows = [("S", 5.0), ("Z", 2.0), ("Z", 2.0), ("W", 1.0), ("W", 2.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in variance_ratio_cells(df, "g", "v").collect()}
    assert out["S"]["s2"] is None
    assert out["Z"]["s2"] == 0.0
    assert out["W"]["fmax"] is None and out["W"]["s2_min"] == 0.0


@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 300)),
        min_size=2,
        max_size=40,
    ).filter(
        lambda xs: all(
            sum(1 for g, _ in xs if g == k) >= 2 for k in {g for g, _ in xs}
        )
    )
)
@settings(**_SETTINGS)
def test_variance_ratio_bit_exact_vs_brute(spark, pairs):
    """Inputs are v/100 doubles (2-dp exact); the s2 replay is the
    documented fixed sequence (n*sumsq - sum^2) / (n*(n-1))."""
    from npm_mirror_spark.operators.stats import variance_ratio_cells

    df = spark.createDataFrame(
        [(str(g), c / 100.0) for g, c in pairs], "g string, v double"
    )
    out = {r["g"]: r for r in variance_ratio_cells(df, "g", "v").collect()}
    groups = {str(g) for g, _ in pairs}
    s2s = {}
    for g in groups:
        cs = [c for gg, c in pairs if str(gg) == g]
        n, s, ss = float(len(cs)), float(sum(cs)), float(sum(c * c for c in cs))
        s2s[g] = (n * ss - s * s) / (n * (n - 1.0))
        r = out[g]
        assert (r["n_g"], r["sum_c"], r["sumsq_c"]) == (len(cs), s, ss)
        assert r["s2"] == s2s[g]
    mx, mn = max(s2s.values()), min(s2s.values())
    for r in out.values():
        assert (r["s2_max"], r["s2_min"]) == (mx, mn)
        assert r["fmax"] == (mx / mn if mn > 0 else None)


# ---------------------------------------------------- t_closeness_report


def test_t_closeness_hand_example(spark):
    """g1={u,u,v}, g2={u}; global (u:3, v:1), N=4.  tvd(g1) =
    (|8-9|+|4-3|)/(2*3*4) = 1/12; tvd(g2) = (|4-3|+|0-1|)/(2*1*4)
    = 1/4 — the missing (g2,v) cell MUST contribute."""
    from npm_mirror_spark.operators.checks import t_closeness_report

    rows = [("g1", "u"), ("g1", "u"), ("g1", "v"), ("g2", "u")]
    df = spark.createDataFrame(rows, "q string, s string")
    out = {r["q"]: r for r in t_closeness_report(df, ["q"], "s").collect()}
    assert (out["g1"]["n_class"], out["g1"]["tvd_num"]) == (3, 2.0)
    assert out["g1"]["tvd"] == 2.0 / 24.0
    assert (out["g2"]["n_class"], out["g2"]["tvd_num"]) == (1, 2.0)
    assert out["g2"]["tvd"] == 2.0 / 8.0


def test_t_closeness_uniform_class_is_zero(spark):
    """A class whose distribution equals the global one has tvd = 0."""
    from npm_mirror_spark.operators.checks import t_closeness_report

    rows = [("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")]
    df = spark.createDataFrame(rows, "q string, s string")
    for r in t_closeness_report(df, ["q"], "s").collect():
        assert r["tvd_num"] == 0.0 and r["tvd"] == 0.0


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_t_closeness_brute(spark, rows):
    from npm_mirror_spark.operators.checks import t_closeness_report

    df = spark.createDataFrame(rows, "q long, s long")
    out = {r["q"]: r for r in t_closeness_report(df, ["q"], "s").collect()}
    from collections import Counter

    nv = Counter(s for _, s in rows)
    nn = len(rows)
    for q in {q for q, _ in rows}:
        cls = [s for qq, s in rows if qq == q]
        ng = len(cls)
        cg = Counter(cls)
        num = float(sum(abs(cg.get(v, 0) * nn - nv[v] * ng) for v in nv))
        r = out[q]
        assert (r["n_class"], r["tvd_num"]) == (ng, num)
        assert r["tvd"] == num / (2.0 * float(ng) * float(nn))


# ------------------------------------------------------------- ari_cells


def test_ari_identical_and_independent(spark):
    """Identical partitions -> ARI 1; the 2x2 all-ones contingency ->
    ARI -0.5 (the textbook Hubert-Arabie example)."""
    from npm_mirror_spark.operators.checks import ari_cells

    same = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 2), (2, 2)], "a int, b int"
    )
    r = ari_cells(same, "a", "b").collect()[0]
    assert (r["n_items"], r["pairs2_cells"], r["ari"]) == (4, 4.0, 1.0)
    anti = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2)], "a int, b int"
    )
    r = ari_cells(anti, "a", "b").collect()[0]
    assert (r["pairs2_cells"], r["ari"]) == (0.0, -0.5)


def test_ari_permutation_invariant(spark):
    """Relabeling either side must not move any cell or the index."""
    from npm_mirror_spark.operators.checks import ari_cells

    base = [(1, 1), (1, 1), (1, 2), (2, 2), (2, 2), (3, 3)]
    perm = [(a, {1: 9, 2: 7, 3: 8}[b]) for a, b in base]
    r1 = ari_cells(
        spark.createDataFrame(base, "a int, b int"), "a", "b"
    ).collect()[0]
    r2 = ari_cells(
        spark.createDataFrame(perm, "a int, b int"), "a", "b"
    ).collect()[0]
    assert r1 == r2


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2)),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_ari_bit_exact_vs_brute(spark, pairs):
    from npm_mirror_spark.operators.checks import ari_cells

    df = spark.createDataFrame(pairs, "a long, b long")
    r = ari_cells(df, "a", "b").collect()[0]
    from collections import Counter

    cont = Counter(pairs)
    na = Counter(a for a, _ in pairs)
    nb = Counter(b for _, b in pairs)
    n = len(pairs)
    p2c = float(sum(c * (c - 1) for c in cont.values()))
    p2a = float(sum(c * (c - 1) for c in na.values()))
    p2b = float(sum(c * (c - 1) for c in nb.values()))
    assert (r["n_items"], r["n_a_classes"], r["n_b_classes"]) == (
        n, len(na), len(nb),
    )
    assert (r["pairs2_cells"], r["pairs2_a"], r["pairs2_b"]) == (
        p2c, p2a, p2b,
    )
    c2 = float(n) * (float(n) - 1.0)
    num = 2.0 * (c2 * p2c - p2a * p2b)
    den = c2 * (p2a + p2b) - 2.0 * p2a * p2b
    assert r["ari"] == (num / den if den != 0 else None)


# --------------------------------------------------------- lin_ccc_cells


def test_lin_ccc_hand_examples(spark):
    """y == x -> CCC 1; y = 2x over x=[1,2] -> CCC = 2/7 (textbook
    moments: varx=.25, vary=1, cov=.5 -> 1/3.5)."""
    from npm_mirror_spark.operators.checks import lin_ccc_cells

    eq = spark.createDataFrame([(1, 1), (2, 2)], "x long, y long")
    r = lin_ccc_cells(eq, F.col("x"), F.col("y")).collect()[0]
    assert r["ccc"] == 1.0
    sc = spark.createDataFrame([(1, 2), (2, 4)], "x long, y long")
    r = lin_ccc_cells(sc, F.col("x"), F.col("y")).collect()[0]
    assert (r["ccc_num"], r["ccc_den"], r["ccc"]) == (4.0, 14.0, 2.0 / 7.0)


def test_lin_ccc_shift_penalized_but_r_blind(spark):
    """y = x + 10 has perfect Pearson r but CCC < 1 — the whole point
    of the agreement coefficient."""
    from npm_mirror_spark.operators.checks import lin_ccc_cells

    df = spark.createDataFrame([(i, i + 10) for i in range(5)], "x long, y long")
    r = lin_ccc_cells(df, F.col("x"), F.col("y")).collect()[0]
    assert 0.0 < r["ccc"] < 1.0


@given(
    st.lists(
        st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_lin_ccc_bit_exact_vs_brute(spark, pairs):
    from npm_mirror_spark.operators.checks import lin_ccc_cells

    df = spark.createDataFrame(pairs, "x long, y long")
    r = lin_ccc_cells(df, F.col("x"), F.col("y")).collect()[0]
    n = float(len(pairs))
    sx = float(sum(x for x, _ in pairs))
    sy = float(sum(y for _, y in pairs))
    sxx = float(sum(x * x for x, _ in pairs))
    syy = float(sum(y * y for _, y in pairs))
    sxy = float(sum(x * y for x, y in pairs))
    num = 2.0 * (n * sxy - sx * sy)
    den = (n * sxx - sx * sx) + (n * syy - sy * sy) + (sx - sy) * (sx - sy)
    assert (r["n_pairs"], r["sx"], r["sy"]) == (n, sx, sy)
    assert (r["sxx"], r["syy"], r["sxy"]) == (sxx, syy, sxy)
    assert (r["ccc_num"], r["ccc_den"]) == (num, den)
    assert r["ccc"] == (num / den if den != 0 else None)


# ---------------------------------------------------------- hoover_cells


def test_hoover_hand_examples(spark):
    """[1,3]: |2-4|+|6-4| = 4 over 2*2*4 -> 0.25; equal values -> 0;
    one unit holding everything -> (n-1)/n = 0.5 for n=2."""
    from npm_mirror_spark.operators.checks import hoover_cells

    df = spark.createDataFrame([(1,), (3,)], "x long")
    r = hoover_cells(df, F.col("x")).collect()[0]
    assert (r["n_units"], r["total_value"], r["abs_dev_sum"]) == (2, 4.0, 4.0)
    assert r["hoover"] == 0.25
    eq = spark.createDataFrame([(5,), (5,), (5,)], "x long")
    assert hoover_cells(eq, F.col("x")).collect()[0]["hoover"] == 0.0
    onehot = spark.createDataFrame([(8,), (0,)], "x long")
    assert hoover_cells(onehot, F.col("x")).collect()[0]["hoover"] == 0.5


@given(st.lists(st.integers(0, 100), min_size=1, max_size=40).filter(sum))
@settings(**_SETTINGS)
def test_hoover_brute(spark, xs):
    from npm_mirror_spark.operators.checks import hoover_cells

    df = spark.createDataFrame([(v,) for v in xs], "x long")
    r = hoover_cells(df, F.col("x")).collect()[0]
    n, t = len(xs), sum(xs)
    dev = float(sum(abs(n * v - t) for v in xs))
    assert (r["n_units"], r["total_value"], r["abs_dev_sum"]) == (
        n, float(t), dev,
    )
    assert r["hoover"] == dev / (2.0 * float(n) * float(t))
    assert 0.0 <= r["hoover"] < 1.0


# ------------------------------- staged r18 faces (staging_r18)


def test_r18_staged_faces_match_oracles(spark, sf_dir):
    """The r14 continuation staged batch clears the registry-identical
    harness bar; the q_rand_index oracle composes the registry
    q_kmeans SQL (the q_mrr / q_ndcg deferral pattern)."""
    from npm_mirror_spark import plans
    from npm_mirror_spark.queries import ORACLES, QUERIES
    from npm_mirror_spark.staging_r18 import (
        STAGED_QUERIES as Q18,
        build_oracles,
    )
    from tests.oracle_harness import compare, duckdb_con

    O18 = build_oracles(ORACLES)
    assert set(Q18) == set(O18) and not set(Q18) & set(QUERIES)
    # BNLJ only in the faces whose shapes the module doc pre-documents
    # (1-row folds, bounded sensitive-domain grid)
    documented_bnlj = {
        "q_rand_index", "q_gk_tau", "q_variance_ratio", "q_t_closeness",
        "q_hoover_index",
    }
    con = duckdb_con(sf_dir)
    for name, q in Q18.items():
        df = q(spark, sf_dir)
        problems = compare(df, con, O18[name])
        assert not problems, f"{name}: {problems}"
        text = plans.explain_str(df, "simple")
        assert "CartesianProduct" not in text, name
        if name not in documented_bnlj:
            assert "BroadcastNestedLoopJoin" not in text, name
