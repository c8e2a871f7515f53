"""Property-based bit-exactness adversaries for the r11 operator batch
(the test_ksample_properties discipline): every reported float must be
the documented FIXED sequence of correctly-rounded IEEE ops on
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
    """Doubled midranks of a sorted multiset: value -> 2*midrank."""
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
        st.tuples(
            st.sampled_from(["b1", "b2", "b3", "b4"]),
            st.sampled_from(["t1", "t2", "t3"]),
            st.integers(0, 100),
        ),
        min_size=3,
        max_size=24,
        unique_by=lambda r: (r[0], r[1]),
    )
)
@settings(**_SETTINGS)
def test_friedman_bit_exact_vs_python_replay(spark, data):
    from npm_mirror_spark.operators.stats import friedman_cells

    df = spark.createDataFrame(data, "b string, t string, x long")
    got = {r["t"]: r for r in friedman_cells(df, "b", "t", "x").collect()}

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
        assert got == {}
        return
    n = len(complete)
    r2: dict[str, int] = {}
    for rows in complete.values():
        m2 = _mid2([x for _, x in rows])
        for t, x in rows:
            r2[t] = r2.get(t, 0) + m2[x]
    for t, row in got.items():
        assert row["n_blocks"] == n and row["k_treatments"] == k
        assert row["rank_sum_x2"] == float(r2[t])
        assert row["mean_rank"] == float(r2[t]) / float(2 * n)
        dev = r2[t] - n * (k + 1)
        assert row["chi2_term_x4"] == float(dev) * float(dev)
    # doubled rank sums over all treatments conserve n*k*(k+1)
    assert sum(r2.values()) == n * k * (k + 1)


@given(
    st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 200)),
        min_size=2,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_brown_forsythe_bit_exact_vs_python_replay(spark, data):
    from npm_mirror_spark.operators.stats import brown_forsythe_cells

    df = spark.createDataFrame(data, "g string, x long")
    got = {r["g"]: r for r in brown_forsythe_cells(df, "x", "g").collect()}
    groups = {g for g, _ in data}
    z2_all: list[tuple[str, int]] = []
    for g in groups:
        xs = sorted(x for gg, x in data if gg == g)
        n = len(xs)
        med2 = xs[(n + 1) // 2 - 1] + xs[n // 2]
        z2_all += [(g, abs(2 * x - med2)) for x in xs]
    nt = len(z2_all)
    stot = sum(z for _, z in z2_all)
    gm = float(stot) / float(nt)
    for g in groups:
        zs = [z for gg, z in z2_all if gg == g]
        ni, s, q = len(zs), sum(zs), sum(z * z for z in zs)
        row = got[g]
        assert row["n_i"] == ni and row["sum_i"] == float(s)
        assert row["within_ss"] == float(ni * q - s * s) / float(ni)
        mean_i = float(s) / float(ni)
        assert row["between_term"] == float(ni) * ((mean_i - gm) * (mean_i - gm))


@given(
    st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 50)),
        min_size=2,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_jonckheere_bit_exact_vs_pairwise_bruteforce(spark, data):
    from npm_mirror_spark.operators.stats import jonckheere_cells

    df = spark.createDataFrame(data, "g int, x long")
    got = {
        (r["g_lo"], r["g_hi"]): r
        for r in jonckheere_cells(df, "x", "g").collect()
    }
    groups = sorted({g for g, _ in data})
    for i, ga in enumerate(groups):
        for gb in groups[i + 1:]:
            xa = [x for g, x in data if g == ga]
            xb = [x for g, x in data if g == gb]
            u2 = sum(
                2 if a < b else (1 if a == b else 0) for a in xa for b in xb
            )
            row = got[(ga, gb)]
            assert row["u_x2"] == float(u2)
            assert row["n_lo"] == len(xa) and row["n_hi"] == len(xb)
    # every ordered pair must be present
    assert len(got) == len(groups) * (len(groups) - 1) // 2


@given(
    st.lists(st.integers(0, 1000), min_size=2, max_size=25, unique=False)
)
@settings(**_SETTINGS)
def test_durbin_watson_bit_exact_vs_python_replay(spark, xs):
    from npm_mirror_spark.operators.stats import durbin_watson_by

    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, o int, x long")
    r = durbin_watson_by(df, "g", "o", "x").collect()[0]
    n, s = len(xs), sum(xs)
    ne = [n * x - s for x in xs]
    num = sum((b - a) ** 2 for a, b in zip(ne, ne[1:]))
    den = sum(e * e for e in ne)
    assert (r["num"], r["den"]) == (float(num), float(den))
    if den > 0 and n > 1:
        assert r["dw"] == float(num) / float(den)
    else:
        assert r["dw"] is None


@given(
    st.lists(
        st.tuples(st.integers(1, 4), st.integers(1, 4)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_gk_gamma_bit_exact_vs_pairwise_bruteforce(spark, data):
    from npm_mirror_spark.operators.checks import gk_gamma

    df = spark.createDataFrame(data, "x int, y int")
    r = gk_gamma(df, "x", "y").collect()[0]
    conc = disc = 0
    for i, (xa, ya) in enumerate(data):
        for xb, yb in data[i + 1:]:
            if xa == xb or ya == yb:
                continue
            if (xa < xb) == (ya < yb):
                conc += 1
            else:
                disc += 1
    assert (r["concordant"], r["discordant"]) == (float(conc), float(disc))
    if conc + disc:
        assert r["gamma"] == float(conc - disc) / float(conc + disc)
    else:
        assert r["gamma"] is None


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["b1", "b2", "b3"]),
            st.sampled_from(["t1", "t2"]),
            st.integers(0, 1),
        ),
        min_size=2,
        max_size=18,
        unique_by=lambda r: (r[0], r[1]),
    )
)
@settings(**_SETTINGS)
def test_cochran_q_bit_exact_vs_python_replay(spark, data):
    from npm_mirror_spark.operators.checks import cochran_q_cells

    df = spark.createDataFrame(data, "b string, t string, s int")
    got = {r["t"]: r for r in cochran_q_cells(df, "b", "t", "s").collect()}
    k = len({t for _, t, _ in data})
    by_block: dict[str, list[tuple[str, int]]] = {}
    for b, t, s in data:
        by_block.setdefault(b, []).append((t, s))
    complete = {
        b: rows for b, rows in by_block.items()
        if len(rows) == k and len({t for t, _ in rows}) == k
    }
    tj: dict[str, int] = {t: 0 for _, t, _ in data}
    bs = []
    for rows in complete.values():
        bs.append(sum(s for _, s in rows))
        for t, s in rows:
            tj[t] += s
    g = sum(tj.values())
    t2 = sum(v * v for v in tj.values())
    sb, sb2 = sum(bs), sum(b * b for b in bs)
    den = k * sb - sb2
    for t, row in got.items():
        assert row["t_j"] == float(tj[t])
        assert row["n_blocks"] == len(complete)
        if den > 0:
            assert row["q_stat"] == float((k - 1) * (k * t2 - g * g)) / float(den)
        else:
            assert row["q_stat"] is None


@given(
    st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 300)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_mood_median_bit_exact_vs_python_replay(spark, data):
    from npm_mirror_spark.operators.stats import mood_median_cells

    df = spark.createDataFrame(data, "g string, x long")
    got = {r["g"]: r for r in mood_median_cells(df, "x", "g").collect()}
    xs = sorted(x for _, x in data)
    n = len(xs)
    med2 = xs[(n + 1) // 2 - 1] + xs[n // 2]
    for g in {g for g, _ in data}:
        vals = [x for gg, x in data if gg == g]
        row = got[g]
        assert row["n_above"] == sum(1 for x in vals if 2 * x > med2)
        assert row["n_below"] == sum(1 for x in vals if 2 * x < med2)
        assert row["n_at"] == sum(1 for x in vals if 2 * x == med2)
        assert row["med2_x"] == float(med2)


@given(st.text(alphabet="ab ", min_size=0, max_size=60))
@settings(**_SETTINGS)
def test_vocab_richness_bit_exact_vs_python_replay(spark, text):
    from npm_mirror_spark.operators.text import vocab_richness

    df = spark.createDataFrame([(text,)], "text string")
    toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
    r = vocab_richness(df, "text").collect()
    if not toks:
        # empty corpus: the fold still returns one row with zero counts
        # and NULL/percent-free estimates (division by N=0 -> NULL)
        assert r[0]["s_obs"] == 0
        return
    from collections import Counter

    cnt = Counter(toks)
    s_obs, nn = len(cnt), sum(cnt.values())
    f1 = sum(1 for v in cnt.values() if v == 1)
    f2 = sum(1 for v in cnt.values() if v == 2)
    row = r[0]
    assert (row["s_obs"], row["n_tokens"], row["f1"], row["f2"]) == (
        s_obs, float(nn), f1, f2,
    )
    assert row["chao1"] == float(s_obs) + (
        float(f1) * (float(f1) - 1.0)
    ) / (2.0 * float(f2 + 1))
    assert row["gt_p0"] == float(f1) / float(nn)


@given(
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)), max_size=12),
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)), max_size=12),
)
@settings(**_SETTINGS)
def test_capture_recapture_bit_exact(spark, pa, pb):
    from npm_mirror_spark.operators.checks import capture_recapture

    pa = [p for p in pa if p[0] < p[1]] or [(0, 1)]
    pb = [p for p in pb if p[0] < p[1]] or [(0, 1)]
    a = spark.createDataFrame(pa, "id_a int, id_b int")
    b = spark.createDataFrame(pb, "id_a int, id_b int")
    r = capture_recapture(a, b).collect()[0]
    sa, sb_ = set(pa), set(pb)
    m = len(sa & sb_)
    assert (r["n_a"], r["n_b"], r["overlap"]) == (len(sa), len(sb_), m)
    assert r["chapman_est"] == float((len(sa) + 1) * (len(sb_) + 1)) / float(
        m + 1
    ) - 1.0


@given(
    st.lists(
        st.tuples(
            st.sampled_from("ab"),
            st.integers(0, 20),
            st.integers(0, 1),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_km_cells_bit_exact_vs_python_replay(spark, data):
    from npm_mirror_spark.operators.temporal import km_cells

    df = spark.createDataFrame(data, "g string, t int, e int")
    got = {
        (r["g"], r["t"]): (r["n_risk"], r["d"], r["c"])
        for r in km_cells(df, "g", "t", "e").collect()
    }
    want = {}
    for g in {g for g, _, _ in data}:
        rows = [(t, e) for gg, t, e in data if gg == g]
        total = len(rows)
        for t in sorted({t for t, _ in rows}):
            at_t = [e for tt, e in rows if tt == t]
            n_risk = total - sum(1 for tt, _ in rows if tt < t)
            want[(g, t)] = (n_risk, sum(at_t), len(at_t) - sum(at_t))
    assert got == want


@given(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=50),
    st.tuples(st.integers(1, 99), st.just(100)),
)
@settings(**_SETTINGS)
def test_vocab_coverage_bit_exact_vs_python_replay(spark, tokens, thr):
    from collections import Counter

    from npm_mirror_spark.operators.text import vocab_coverage

    text = " ".join(tokens)
    df = spark.createDataFrame([(text,)], "text string")
    rows = vocab_coverage(df, "text", (thr,)).collect()
    num, den = thr
    cnt = Counter(tokens)
    classes = Counter(cnt.values())  # count -> n types
    total_mass = sum(c * n for c, n in classes.items())
    total_types = sum(classes.values())
    # descending cumulative; crossing class = max c with cum >= p
    cum_mass = cum_types = 0
    best = None
    for c in sorted(classes, reverse=True):
        cum_mass += c * classes[c]
        cum_types += classes[c]
        if cum_mass * den >= num * total_mass:
            best = (c, cum_types, cum_mass)
            break
    assert best is not None and len(rows) == 1
    r = rows[0]
    assert (r["cutoff_count"], r["k_types"], r["covered_mass"]) == (
        best[0], best[1], float(best[2]),
    )
    assert (r["total_types"], r["total_mass"]) == (total_types, float(total_mass))


@given(
    st.lists(
        st.tuples(
            st.integers(1, 8),      # duration
            st.integers(0, 1),      # event
            st.booleans(),          # arm A
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_logrank_cells_bit_exact_vs_python_replay(spark, data):
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.temporal import logrank_cells

    rows = [("g", t, e, 1 if a else 0) for t, e, a in data]
    df = spark.createDataFrame(rows, "g string, t int, e int, arm int")
    got = {
        r["t"]: r
        for r in logrank_cells(df, "g", "t", "e", F.col("arm") == 1).collect()
    }
    times = sorted({t for t, e, _ in data if e == 1})
    assert set(got) == set(times)
    for t in times:
        n = sum(1 for tt, _, _ in data if tt >= t)
        na = sum(1 for tt, _, a in data if tt >= t and a)
        d = sum(e for tt, e, _ in data if tt == t)
        da = sum(e for tt, e, a in data if tt == t and a)
        r = got[t]
        assert (r["n"], r["d"], r["n_a"], r["d_a"]) == (n, d, na, da)
        assert r["o_minus_e_a"] == float(da) - float(na) * float(d) / float(n)
        if n > 1:
            frac = float(na) / float(n)
            assert r["var_term"] == float(d) * frac * (1.0 - frac) * (
                float(n) - float(d)
            ) / (float(n) - 1.0)
        else:
            assert r["var_term"] == 0.0


@given(
    st.lists(
        st.tuples(
            st.sampled_from("st"),
            st.booleans(),
            st.booleans(),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_mantel_haenszel_bit_exact_vs_python_replay(spark, data):
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.checks import mantel_haenszel_cells

    rows = [(s, 1 if x else 0, 1 if y else 0) for s, x, y in data]
    df = spark.createDataFrame(rows, "s string, x int, y int")
    got = {
        r["s"]: r
        for r in mantel_haenszel_cells(
            df, "s", F.col("x") == 1, F.col("y") == 1
        ).collect()
    }
    for s in {s for s, _, _ in data}:
        sub = [(x, y) for ss, x, y in data if ss == s]
        a = sum(1 for x, y in sub if x and y)
        b = sum(1 for x, y in sub if x and not y)
        c = sum(1 for x, y in sub if not x and y)
        d = sum(1 for x, y in sub if not x and not y)
        n = len(sub)
        r = got[s]
        assert (r["a"], r["b"], r["c"], r["d"], r["n"]) == (a, b, c, d, n)
        assert r["mh_num"] == float(a) * float(d) / float(n)
        assert r["mh_den"] == float(b) * float(c) / float(n)
