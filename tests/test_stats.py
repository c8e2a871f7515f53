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
