"""Two-sample statistics: the bounded-window Spark forms must agree
with direct brute-force computation (midranks / ECDFs materialized in
Python) on synthetic tie-heavy data and satisfy the exact identities
(U1 + U2 = n1*n2, D symmetric under group swap)."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from npm_mirror_spark.operators.stats import ks_2samp, rank_sum_test

# tie-heavy two-group sample: value, group flag
DATA = [
    (1, 1), (1, 0), (1, 0),
    (2, 1), (2, 1),
    (3, 0),
    (5, 1), (5, 0), (5, 0), (5, 1),
    (8, 0),
    (9, 1),
]


def _brute_u1(data):
    """Doubled rank-sum and U1 via explicit midranks (Fractions)."""
    vals = sorted(v for v, _ in data)
    ranks = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        # rows i..j-1 (1-based ranks i+1..j) share midrank
        ranks[vals[i]] = Fraction(i + 1 + j, 2)
        i = j
    n1 = sum(1 for _, a in data if a)
    n2 = len(data) - n1
    r1 = sum(ranks[v] for v, a in data if a)
    u1 = r1 - Fraction(n1 * (n1 + 1), 2)
    return n1, n2, 2 * r1, 2 * u1


def _brute_ks(data):
    n1 = sum(1 for _, a in data if a)
    n2 = len(data) - n1
    best = None
    for v in sorted({v for v, _ in data}):
        c1 = sum(1 for x, a in data if a and x <= v)
        c2 = sum(1 for x, a in data if not a and x <= v)
        gap = abs(c1 * n2 - c2 * n1)
        if best is None or gap > best[0]:
            best = (gap, v)
    return n1, n2, best[0], best[1]


def test_rank_sum_matches_brute_force(spark):
    df = spark.createDataFrame(DATA, ["v", "a"])
    row = rank_sum_test(df, "v", F.col("a") == 1).collect()[0]
    n1, n2, r1x2, u1x2 = _brute_u1(DATA)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert int(row["r1_x2"]) == r1x2
    assert int(row["u1_x2"]) == u1x2
    assert abs(row["auc"] - float(Fraction(u1x2, 2 * n1 * n2))) < 1e-15


def test_rank_sum_auc_complement_under_swap(spark):
    """U1 + U2 = n1*n2 exactly, so auc_A + auc_B = 1."""
    df = spark.createDataFrame(DATA, ["v", "a"])
    a = rank_sum_test(df, "v", F.col("a") == 1).collect()[0]
    b = rank_sum_test(df, "v", F.col("a") == 0).collect()[0]
    assert int(a["u1_x2"]) + int(b["u1_x2"]) == 2 * a["n1"] * a["n2"]
    assert abs(a["auc"] + b["auc"] - 1.0) < 1e-15


def test_ks_matches_brute_force(spark):
    df = spark.createDataFrame(DATA, ["v", "a"])
    row = ks_2samp(df, "v", F.col("a") == 1).collect()[0]
    n1, n2, d_num, at_v = _brute_ks(DATA)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert int(row["d_num"]) == d_num
    assert row["at_value"] == at_v
    assert abs(row["d"] - d_num / (n1 * n2)) < 1e-15


def test_ks_symmetric_under_swap(spark):
    df = spark.createDataFrame(DATA, ["v", "a"])
    a = ks_2samp(df, "v", F.col("a") == 1).collect()[0]
    b = ks_2samp(df, "v", F.col("a") == 0).collect()[0]
    assert int(a["d_num"]) == int(b["d_num"])
    assert a["at_value"] == b["at_value"]


def test_identical_groups_have_zero_d_and_half_auc(spark):
    # each value appears once per group -> ECDFs coincide, AUC = 1/2
    data = [(v, g) for v in (1, 2, 3, 7) for g in (0, 1)]
    df = spark.createDataFrame(data, ["v", "a"])
    ks = ks_2samp(df, "v", F.col("a") == 1).collect()[0]
    rs = rank_sum_test(df, "v", F.col("a") == 1).collect()[0]
    assert int(ks["d_num"]) == 0
    assert abs(rs["auc"] - 0.5) < 1e-15


# --- spearman_rho / runs_test_daily / mann_kendall_daily (r9 wiring) ------

PAIRS = [
    (1, 10), (1, 12), (2, 11), (2, 11), (3, 9),
    (5, 20), (5, 20), (8, 15), (9, 30), (9, 30),
]


def _brute_spearman(pairs):
    """Exact doubled-midrank moments with Python ints."""

    def doubled_ranks(vals):
        out = []
        for v in vals:
            below = sum(1 for w in vals if w < v)
            ties = sum(1 for w in vals if w == v)
            out.append(2 * below + ties + 1)
        return out

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    rx, ry = doubled_ranks(xs), doubled_ranks(ys)
    n = len(pairs)
    s_rx, s_ry = sum(rx), sum(ry)
    s_rxx = sum(a * a for a in rx)
    s_ryy = sum(b * b for b in ry)
    s_rxy = sum(a * b for a, b in zip(rx, ry))
    num = n * s_rxy - s_rx * s_ry
    d1 = n * s_rxx - s_rx * s_rx
    d2 = n * s_ryy - s_ry * s_ry
    return n, s_rx, s_ry, s_rxx, s_ryy, s_rxy, num, d1, d2


def test_spearman_matches_brute_force(spark):
    from npm_mirror_spark.operators.stats import spearman_rho

    df = spark.createDataFrame(PAIRS + [(None, 5), (7, None)], "x int, y int")
    r = spearman_rho(df, "x", "y").collect()[0]
    n, s_rx, s_ry, s_rxx, s_ryy, s_rxy, num, d1, d2 = _brute_spearman(PAIRS)
    assert r["n_rows"] == n  # NULL rows pairwise-excluded
    assert int(r["s_rx"]) == s_rx and int(r["s_ry"]) == s_ry
    assert int(r["s_rxx"]) == s_rxx and int(r["s_ryy"]) == s_ryy
    assert int(r["s_rxy"]) == s_rxy
    assert int(r["rho_num"]) == num
    assert int(r["rho_d1"]) == d1 and int(r["rho_d2"]) == d2
    assert abs(r["rho2"] - (num / d1) * (num / d2)) < 1e-12
    assert r["rho_sign"] == (1 if num > 0 else -1 if num < 0 else 0)


def test_spearman_monotone_is_perfect(spark):
    from npm_mirror_spark.operators.stats import spearman_rho

    up = spark.createDataFrame(
        [(i, i * i) for i in range(1, 30)], "x int, y long"
    )
    r = up.transform(lambda d: spearman_rho(d, "x", "y")).collect()[0]
    assert abs(r["rho2"] - 1.0) < 1e-12 and r["rho_sign"] == 1
    down = spark.createDataFrame(
        [(i, -i * i) for i in range(1, 30)], "x int, y long"
    )
    r = spearman_rho(down, "x", "y").collect()[0]
    assert abs(r["rho2"] - 1.0) < 1e-12 and r["rho_sign"] == -1


DAILY = [
    ("2024-01-01", 5), ("2024-01-02", 9), ("2024-01-03", 2),
    ("2024-01-04", 9), ("2024-01-05", 5), ("2024-01-06", 7),
    ("2024-01-07", 1), ("2024-01-08", 8), ("2024-01-09", 3),
]


def _brute_runs(series):
    vals = sorted(v for _, v in series)
    n = len(vals)
    need = -(-n // 2)  # ceil(n/2)
    med = next(v for v in vals if sum(1 for w in vals if w <= v) >= need)
    signs = [1 if v > med else -1 for _, v in series if v != med]
    runs = sum(
        1 for i, s in enumerate(signs) if i == 0 or signs[i - 1] != s
    )
    return (
        sum(1 for s in signs if s > 0),
        sum(1 for s in signs if s < 0),
        runs,
        med,
    )


def test_runs_test_matches_brute_force(spark):
    from npm_mirror_spark.operators.stats import runs_test_daily

    df = spark.createDataFrame(DAILY, "day string, n long")
    r = runs_test_daily(df, "day", "n").collect()[0]
    n_plus, n_minus, n_runs, med = _brute_runs(DAILY)
    assert (r["n_plus"], r["n_minus"], r["n_runs"], r["median_x"]) == (
        n_plus, n_minus, n_runs, med,
    )


def test_runs_test_alternating_maximizes_runs(spark):
    from npm_mirror_spark.operators.stats import runs_test_daily

    series = [
        (f"2024-02-{d:02d}", 10 if d % 2 else 1) for d in range(1, 11)
    ]
    df = spark.createDataFrame(series, "day string, n long")
    r = runs_test_daily(df, "day", "n").collect()[0]
    # lower median is 1, so the five 1-days drop as exact-median;
    # the surviving five 10-days form ONE run
    assert r["median_x"] == 1
    assert (r["n_plus"], r["n_minus"], r["n_runs"]) == (5, 0, 1)


def _brute_mk(series):
    days = sorted(series)
    n = len(days)
    conc = disc = ties = 0
    for i in range(n):
        for j in range(i + 1, n):
            if days[j][1] > days[i][1]:
                conc += 1
            elif days[j][1] < days[i][1]:
                disc += 1
            else:
                ties += 1
    return n, n * (n - 1) // 2, conc, disc, ties


def test_mann_kendall_matches_brute_force(spark):
    from npm_mirror_spark.operators.stats import mann_kendall_daily

    df = spark.createDataFrame(DAILY, "day string, n long")
    r = mann_kendall_daily(df, "day", "n").collect()[0]
    n, pairs, conc, disc, ties = _brute_mk(DAILY)
    assert (r["n_days"], r["n_pairs"]) == (n, pairs)
    assert (r["n_concordant"], r["n_discordant"], r["n_ties"]) == (
        conc, disc, ties,
    )
    assert r["s_stat"] == conc - disc
    assert abs(r["s_over_pairs"] - (conc - disc) / pairs) < 1e-12


def test_mann_kendall_monotone_and_constant(spark):
    from npm_mirror_spark.operators.stats import mann_kendall_daily

    up = spark.createDataFrame(
        [(f"2024-03-{d:02d}", d * 3) for d in range(1, 13)],
        "day string, n long",
    )
    r = mann_kendall_daily(up, "day", "n").collect()[0]
    assert r["s_stat"] == r["n_pairs"] and r["s_over_pairs"] == 1.0
    flat = spark.createDataFrame(
        [(f"2024-03-{d:02d}", 7) for d in range(1, 13)],
        "day string, n long",
    )
    r = mann_kendall_daily(flat, "day", "n").collect()[0]
    assert r["s_stat"] == 0 and r["n_ties"] == r["n_pairs"]


def test_theil_sen_brute_force_and_robustness(spark):
    """Median of pairwise slopes against an independent numpy replica,
    plus the robustness property that motivates the operator: one wild
    outlier day moves least-squares but leaves Theil-Sen at the true
    slope."""
    import itertools

    from npm_mirror_spark.operators.stats import theil_sen_daily

    series = [(f"2024-03-{d:02d}", 10 + 2 * d) for d in range(1, 13)]
    series[5] = ("2024-03-06", 5000)  # one corrupted day
    df = spark.createDataFrame(series, "day string, n long")
    r = theil_sen_daily(df, "day", "n").collect()[0]

    days = list(range(1, 13))
    xs = [n for _, n in series]
    slopes = sorted(
        (xs[j] - xs[i]) / (days[j] - days[i])
        for i, j in itertools.combinations(range(12), 2)
    )
    import math

    lower_med = slopes[math.ceil(len(slopes) / 2) - 1]
    assert r["n_days"] == 12
    assert r["n_pairs"] == 66
    assert r["median_slope"] == lower_med
    # the uncorrupted slope is 2; the outlier cannot move the median
    assert r["median_slope"] == 2.0


def test_mad_outliers_brute_force_per_group(spark):
    from npm_mirror_spark.operators.stats import mad_outliers_by

    import math

    data = [("a", v) for v in [1, 2, 2, 3, 4, 100]] + [
        ("b", v) for v in [10, 10, 10, 10]
    ] + [("c", v) for v in [5, 7, 9, 11, 13, 15, 1000, -1000]]
    df = spark.createDataFrame(data, "g string, x long")
    got = {
        r["g"]: r for r in mad_outliers_by(df, "g", "x", k=3).collect()
    }

    def lower_median(vs):
        s = sorted(vs)
        return s[math.ceil(len(s) / 2) - 1]

    from collections import defaultdict

    by = defaultdict(list)
    for g, v in data:
        by[g].append(v)
    for g, vs in by.items():
        m = lower_median(vs)
        mad = lower_median([abs(v - m) for v in vs])
        n_out = sum(1 for v in vs if abs(v - m) > 3 * mad)
        assert got[g]["n"] == len(vs)
        assert got[g]["median"] == m, (g, got[g]["median"], m)
        assert got[g]["mad"] == mad, (g, got[g]["mad"], mad)
        assert got[g]["n_outliers"] == n_out, g
        assert abs(got[g]["outlier_frac"] - n_out / len(vs)) < 1e-12
    # group b is constant: MAD = 0, everything within 0 of the median
    assert got["b"]["mad"] == 0 and got["b"]["n_outliers"] == 0


# ---------------------------------------------------------------------------
# r10 late batch: welch_t / kruskal_cells / kendall_tau_daily / anova_cells
# ---------------------------------------------------------------------------


def test_welch_t_matches_brute_force(spark):
    from npm_mirror_spark.operators.stats import welch_t

    data = [(3, 1), (5, 1), (7, 1), (9, 1), (2, 0), (2, 0), (4, 0), (6, 0), (11, 0)]
    df = spark.createDataFrame(data, "x int, a int")
    row = welch_t(df, "x", F.col("a") == 1).collect()[0]
    xa = [x for x, a in data if a]
    xb = [x for x, a in data if not a]
    n1, n2 = len(xa), len(xb)
    m1, m2 = sum(xa) / n1, sum(xb) / n2
    v1 = sum((x - m1) ** 2 for x in xa) / (n1 - 1)
    v2 = sum((x - m2) ** 2 for x in xb) / (n2 - 1)
    se = v1 / n1 + v2 / n2
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert abs(row["mean_a"] - m1) < 1e-12 and abs(row["mean_b"] - m2) < 1e-12
    assert abs(row["var_a"] - v1) < 1e-12 and abs(row["var_b"] - v2) < 1e-12
    assert abs(row["t2"] - (m1 - m2) ** 2 / se) < 1e-12
    dfw = se * se / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert abs(row["welch_df"] - dfw) < 1e-9


def test_welch_t_identical_groups_zero_t2(spark):
    from npm_mirror_spark.operators.stats import welch_t

    data = [(v, a) for v in (1, 4, 4, 9) for a in (0, 1)]
    df = spark.createDataFrame(data, "x int, a int")
    row = welch_t(df, "x", F.col("a") == 1).collect()[0]
    assert row["t2"] == 0.0
    assert row["var_a"] == row["var_b"]


def test_kruskal_cells_matches_brute_force(spark):
    from npm_mirror_spark.operators.stats import kruskal_cells

    data = [
        ("a", 1), ("a", 3), ("a", 3), ("a", 7),
        ("b", 3), ("b", 5), ("b", 5),
        ("c", 2), ("c", 5), ("c", 9), ("c", 9),
    ]
    df = spark.createDataFrame(data, "g string, x int")
    rows = {r["g"]: r for r in kruskal_cells(df, "x", "g").collect()}
    vals = sorted(x for _, x in data)
    mid = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        mid[vals[i]] = Fraction(i + 1 + j, 2)
        i = j
    n = len(vals)
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(vals).values())
    for g in ("a", "b", "c"):
        xs = [x for gg, x in data if gg == g]
        r = sum(mid[x] for x in xs)
        row = rows[g]
        assert row["n_i"] == len(xs)
        assert row["rank_sum_x2"] == float(2 * r)
        assert abs(row["mean_rank"] - float(r / len(xs))) < 1e-12
        assert abs(row["h_term"] - float(r * r / len(xs))) < 1e-9
        assert row["n_total"] == n
        assert row["tie_cubes"] == float(tie)
    # rank sums over all groups must total n(n+1)/2
    assert sum(r["rank_sum_x2"] for r in rows.values()) == n * (n + 1)


def test_kendall_tau_matches_brute_force(spark):
    from npm_mirror_spark.operators.stats import kendall_tau_daily

    # (day, x, y) with ties in both axes
    data = [
        ("2024-01-01", 1, 5), ("2024-01-02", 3, 5), ("2024-01-03", 3, 2),
        ("2024-01-04", 7, 8), ("2024-01-05", 2, 8), ("2024-01-06", 9, 9),
    ]
    df = spark.createDataFrame(data, "day string, x int, y int")
    row = kendall_tau_daily(df, "day", "x", "y").collect()[0]
    pts = [(x, y) for _, x, y in data]
    c = d = tx = ty = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0 and dx != 0 and dy != 0:
                d += 1
    n0 = len(pts) * (len(pts) - 1) // 2
    assert row["n_days"] == len(pts) and row["n_pairs"] == n0
    assert (row["n_concordant"], row["n_discordant"]) == (c, d)
    assert (row["ties_x"], row["ties_y"]) == (tx, ty)
    assert row["tau_num"] == c - d
    expect = ((c - d) ** 2 / ((n0 - tx) * (n0 - ty))) * (1 if c >= d else -1)
    assert abs(row["tau_b_sq_signed"] - expect) < 1e-12


def test_kendall_tau_perfect_monotone(spark):
    from npm_mirror_spark.operators.stats import kendall_tau_daily

    data = [(f"2024-01-{i:02d}", i, i * 10) for i in range(1, 9)]
    df = spark.createDataFrame(data, "day string, x int, y int")
    row = kendall_tau_daily(df, "day", "x", "y").collect()[0]
    assert row["n_discordant"] == 0 and row["ties_x"] == 0
    assert row["tau_b_sq_signed"] == 1.0


def test_anova_cells_matches_brute_force(spark):
    from npm_mirror_spark.operators.stats import anova_cells

    data = [("a", 2), ("a", 4), ("a", 6), ("b", 1), ("b", 1), ("c", 9), ("c", 3), ("c", 6)]
    df = spark.createDataFrame(data, "g string, x int")
    rows = {r["g"]: r for r in anova_cells(df, "x", "g").collect()}
    n = len(data)
    gm = sum(x for _, x in data) / n
    for g in ("a", "b", "c"):
        xs = [x for gg, x in data if gg == g]
        m = sum(xs) / len(xs)
        row = rows[g]
        assert row["n_i"] == len(xs)
        assert row["sum_i"] == float(sum(xs))
        assert abs(row["mean_i"] - m) < 1e-12
        assert abs(row["within_ss"] - sum((x - m) ** 2 for x in xs)) < 1e-9
        assert abs(row["between_term"] - len(xs) * (m - gm) ** 2) < 1e-9
        assert row["n_total"] == n and abs(row["grand_mean"] - gm) < 1e-12
    # decomposition identity: total SS = sum within + sum between
    total_ss = sum((x - gm) ** 2 for _, x in data)
    got = sum(r["within_ss"] for r in rows.values()) + sum(
        r["between_term"] for r in rows.values()
    )
    assert abs(got - total_ss) < 1e-9


def test_poisson_bootstrap_matches_brute_force(spark):
    import hashlib

    from npm_mirror_spark.operators.stats import (
        _POISSON1_CDF,
        poisson_bootstrap_mean,
    )

    rows = [(i, 10 + 7 * i) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, x long")
    got = {
        r["resample"]: (r["n_eff"], r["sum_wx"], r["mean"])
        for r in poisson_bootstrap_mean(df, "id", "x", 4).collect()
    }

    def weight(b, i):
        hx = hashlib.md5(f"{b // 5}:{i}".encode()).hexdigest()
        slot = b % 5
        u = int(hx[slot * 6 : slot * 6 + 6], 16) / 16777216.0
        for k, c in enumerate(_POISSON1_CDF):
            if u < c:
                return k
        return 7

    for b in range(4):
        ws = [(weight(b, i), x) for i, x in rows]
        n = sum(w for w, _ in ws)
        s = sum(w * x for w, x in ws)
        assert got[b][0] == n
        assert got[b][1] == float(s)
        assert abs(got[b][2] - s / n) < 1e-12


def test_poisson_bootstrap_rejects_bad_b(spark):
    import pytest

    from npm_mirror_spark.operators.stats import poisson_bootstrap_mean

    df = spark.createDataFrame([(1, 1)], "id long, x long")
    with pytest.raises(ValueError):
        poisson_bootstrap_mean(df, "id", "x", 0)


def test_welch_t_zero_variance_reports_null(spark):
    from npm_mirror_spark.operators.stats import welch_t

    df = spark.createDataFrame(
        [(5, 1), (5, 1), (9, 0), (9, 0)], "x long, a int"
    )
    row = welch_t(df, "x", F.col("a") == 1).collect()[0]
    assert row["var_a"] == 0.0 and row["var_b"] == 0.0
    assert row["t2"] is None and row["welch_df"] is None


def test_kendall_tau_fully_tied_axis_reports_null(spark):
    from npm_mirror_spark.operators.stats import kendall_tau_daily

    data = [(f"2024-01-{i:02d}", 7, i) for i in range(1, 6)]
    df = spark.createDataFrame(data, "day string, x int, y int")
    row = kendall_tau_daily(df, "day", "x", "y").collect()[0]
    assert row["ties_x"] == row["n_pairs"]
    assert row["tau_b_sq_signed"] is None


def test_welch_t_null_predicate_rows_land_in_group_b(spark):
    """A row whose in_a predicate evaluates to NULL joins group B
    (coalesce-to-FALSE contract, advisor finding r10) — previously such
    rows were silently dropped from both groups."""
    from npm_mirror_spark.operators.stats import welch_t

    df = spark.createDataFrame(
        [(10, "en"), (20, "en"), (30, "de"), (40, None), (50, None)],
        "x long, lang string",
    )
    row = welch_t(df, "x", F.col("lang") == "en").collect()[0]
    assert row["n1"] == 2
    assert row["n2"] == 3  # 'de' + the two NULL-lang rows
    assert row["mean_b"] == (30 + 40 + 50) / 3


def test_kendall_tau_null_measure_rows_excluded(spark):
    """A day with a NULL measure is excluded up front (advisor finding
    r10) — previously it inflated n_pairs while landing in none of
    concordant/discordant/ties."""
    from npm_mirror_spark.operators.stats import kendall_tau_daily

    data = [
        ("2024-01-01", 1, 10),
        ("2024-01-02", 2, None),
        ("2024-01-03", 3, 30),
        ("2024-01-04", None, 40),
    ]
    df = spark.createDataFrame(data, "day string, x int, y int")
    row = kendall_tau_daily(df, "day", "x", "y").collect()[0]
    assert row["n_days"] == 2
    assert row["n_pairs"] == 1
    assert (
        row["n_concordant"]
        + row["n_discordant"]
        + row["ties_x"]
        + row["ties_y"]
        >= row["n_pairs"]
    )
    assert row["n_concordant"] == 1
